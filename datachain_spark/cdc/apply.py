"""CDC merge-apply: one microbatch of I/U/D events → LakeTable upsert.

This is the Spark-first rebuild of the reference's delta/diff machinery:
- the reference recomputes a keyed diff of the source and unions it with
  the previous dataset version (/root/reference/src/datachain/delta.py:240-396,
  diff classifier /root/reference/src/datachain/diff/__init__.py:27-163);
- here each microbatch is deduped last-writer-wins over (ts, lsn) per key
  (the window the north rule asks for), then merged into only the touched
  hash-buckets of the target (anti-join out superseded rows, union the
  after-images), and committed atomically with a ledger row — the
  exactly-once analog of the reference's checkpoint skip/continue
  (/root/reference/src/datachain/query/dataset.py:998-1073).

Exactly-once, two layers:
1. (job_id, batch_id) ledger in the snapshot manifest — a replayed batch is
   detected and skipped before any work (mirrors find_checkpoint skip).
2. per-bucket high-watermark LSN filter — duplicate deliveries of
   individual events (same lsn, later batch) are dropped even when the
   batch itself is new; an entirely-stale batch short-circuits to a no-op
   without committing a version (mirrors the reference's empty-diff
   short-circuit, /root/reference/src/datachain/delta.py:373-375).

Scale notes:
- LWW window partitions by the FULL key (conv_id, turn_idx) — hot
  conversations (thousands of turns) do not skew it because turn_idx
  spreads them.
- The merge reads only touched buckets (bucket-pruned manifest read) and
  rewrites only those buckets: cost is O(batch + touched-bucket data),
  never O(table).
- The write repartitions on (bucket, salt(key)) with an explicit partition
  count, so a hot conversation's bucket is written by `files_per_bucket`
  parallel tasks (salted skew mitigation, per the north rule) and file
  counts stay bounded.
"""

from __future__ import annotations

import os
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datachain_spark.cdc.normalize import normalize_text_udf
from datachain_spark.lake.table import LSN_COL, LakeTable

KEY_COLS = ["conv_id", "turn_idx"]
META_COLS = {"lsn", "batch_id", "op", "batch"}


def transcripts_schema_v1() -> T.StructType:
    """Initial target schema (BASELINE.json input_hint, minus `tool`,
    which arrives via mid-stream schema evolution — FIXTURES.md §1)."""
    return T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("role", T.StringType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("ts", T.TimestampType(), True),
        ]
    )


def _payload_fields(events: DataFrame) -> list[T.StructField]:
    return [f for f in events.schema.fields if f.name not in META_COLS]


def apply_batch(
    spark: SparkSession,
    table: LakeTable,
    events: DataFrame,
    job_id: str,
    batch_id: int,
    files_per_bucket: int = 2,
    normalize: bool = True,
) -> dict[str, Any]:
    """Apply one microbatch. Returns lineage metrics (also committed into
    the snapshot ledger). Idempotent: replaying any committed batch — or a
    batch whose events are all below the per-bucket high watermarks — is a
    no-op that commits nothing."""
    if table.batch_committed(job_id, batch_id):
        return {"batch_id": batch_id, "skipped": "ledger"}

    snap = table.snapshot()
    target_schema = snap.schema

    # ---- schema evolution (mergeSchema-style union-by-name) ----
    # A structurally new payload column evolves the target schema iff it
    # carries data in this batch; an all-null phantom column (e.g. a
    # wide-schema streaming source padding old files) is ignored.
    new_fields: list[T.StructField] = []
    for f in _payload_fields(events):
        if f.name in target_schema.fieldNames():
            continue
        if events.filter(F.col(f.name).isNotNull()).take(1):
            new_fields.append(T.StructField(f.name, f.dataType, True))
        else:
            events = events.drop(f.name)
    evolved_schema = (
        T.StructType(list(target_schema.fields) + new_fields) if new_fields else target_schema
    )
    out_cols = evolved_schema.fieldNames()

    # ---- bucket + high-watermark dedup of re-delivered events ----
    ev = events.withColumn("bucket", table.bucket_expr(*KEY_COLS[:1]))
    if snap.watermarks:
        wm_df = spark.createDataFrame(
            [(b, lsn) for b, lsn in snap.watermarks.items()], "bucket int, _wm long"
        )
        ev = ev.join(F.broadcast(wm_df), "bucket", "left").filter(
            F.col("lsn") > F.coalesce(F.col("_wm"), F.lit(-1))
        ).drop("_wm")

    # ---- last-writer-wins per key over (ts, lsn) ----
    w = Window.partitionBy(*KEY_COLS).orderBy(F.col("ts").desc(), F.col("lsn").desc())
    dedup = (
        ev.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    )
    if normalize and "text" in dedup.columns:
        dedup = dedup.withColumn("text", normalize_text_udf(F.col("text")))
    dedup = dedup.persist()

    # one small agg for lineage counts + per-bucket watermarks
    stats = (
        dedup.groupBy("bucket")
        .agg(
            F.max("lsn").alias("hwm"),
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("op") == "D").cast("long")).alias("n_del"),
        )
        .collect()
    )
    if not stats:
        dedup.unpersist()
        return {"batch_id": batch_id, "skipped": "stale"}  # no-change short-circuit

    touched = sorted(r["bucket"] for r in stats)
    watermark_updates = {r["bucket"]: r["hwm"] for r in stats}
    rows_in = sum(r["n"] for r in stats)
    rows_deleted = sum(r["n_del"] for r in stats)
    rows_upserted = rows_in - rows_deleted

    # ---- merge into touched buckets only ----
    existing = table.read(spark, buckets=touched, with_meta=True)
    for f in new_fields:  # null-backfill evolved columns on the old rows
        existing = existing.withColumn(f.name, F.lit(None).cast(f.dataType))
    existing = existing.withColumn("bucket", table.bucket_expr(*KEY_COLS[:1]))

    batch_keys = dedup.select(*KEY_COLS)
    upserts = dedup.filter(F.col("op") != "D").select(
        *out_cols, F.col("lsn").alias(LSN_COL), "bucket"
    )
    merged = (
        existing.select(*out_cols, LSN_COL, "bucket")
        .join(batch_keys, KEY_COLS, "left_anti")
        .unionByName(upserts)
    )

    # ---- salted bucket-partitioned write (bounded files, skew-spread) ----
    out_dir = table.data_dir(f"job={job_id}", f"batch={batch_id:09d}")
    n_parts = max(1, len(touched) * files_per_bucket)
    (
        merged.withColumn(
            "_salt", F.pmod(F.xxhash64(*KEY_COLS), F.lit(files_per_bucket))
        )
        .repartition(n_parts, "bucket", "_salt")
        .drop("_salt")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(out_dir)
    )
    dedup.unpersist()

    # ---- collect written files, commit atomically with the ledger ----
    new_bucket_files: dict[int, list[str]] = {b: [] for b in touched}
    for entry in os.listdir(out_dir):
        if not entry.startswith("bucket="):
            continue
        b = int(entry.split("=", 1)[1])
        bdir = os.path.join(out_dir, entry)
        files = [
            os.path.relpath(os.path.join(bdir, f), table.root)
            for f in os.listdir(bdir)
            if f.endswith(".parquet")
        ]
        new_bucket_files.setdefault(b, []).extend(sorted(files))

    ledger = {
        "job_id": job_id,
        "batch_id": batch_id,
        "rows_in": rows_in,
        "rows_upserted": rows_upserted,
        "rows_deleted": rows_deleted,
        "committed_at": time.time(),
        "partitions": [
            {"partition_id": int(r["bucket"]), "high_watermark_lsn": int(r["hwm"])}
            for r in stats
        ],
    }
    version = table.commit(
        new_bucket_files,
        schema=evolved_schema if new_fields else None,
        watermark_updates=watermark_updates,
        ledger=ledger,
    )
    return {
        "batch_id": batch_id,
        "version": version,
        "rows_in": rows_in,
        "rows_upserted": rows_upserted,
        "rows_deleted": rows_deleted,
        "buckets_touched": len(touched),
        "evolved": [f.name for f in new_fields],
    }


def replay_feed_dir(
    spark: SparkSession,
    table_root: str,
    feed_dir: str,
    job_id: str = "replay",
    num_buckets: int = 32,
    upto_batch: int | None = None,
    normalize: bool = True,
) -> tuple[LakeTable, list[dict[str, Any]]]:
    """Batch-mode replay of a write_feed output directory, in lsn order.
    Resumable: re-running over a partially-applied table skips committed
    batches via the ledger and stale events via the watermarks."""
    from datachain_spark.cdc.feed import feed_batch_dirs

    if LakeTable.exists(table_root):
        table = LakeTable(table_root)
    else:
        table = LakeTable.create(table_root, transcripts_schema_v1(), num_buckets=num_buckets)
    metrics = []
    for batch_id, d in feed_batch_dirs(feed_dir):
        if upto_batch is not None and batch_id > upto_batch:
            break
        events = spark.read.parquet(d)
        metrics.append(
            apply_batch(spark, table, events, job_id, batch_id, normalize=normalize)
        )
    return table, metrics
