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
- Merge-on-read: the batch is written as NEW segments (after-images +
  delete tombstones, stamped with `_lsn`) appended to the touched buckets;
  apply cost is O(batch), never O(table). LWW resolution happens at read
  (bucket-local window) and is erased by amortized compaction. A
  copy-on-write merge (read + anti-join + rewrite touched buckets) was
  measured 3x slower even at 2M events and is quadratic over a bulk
  replay — at 10^10 events it is infeasible.
- LWW window partitions by the FULL key (conv_id, turn_idx) — hot
  conversations (thousands of turns) do not skew it because turn_idx
  spreads them.
- The write repartitions on (bucket, salt(key)) with an explicit partition
  count, so a hot conversation's bucket is written by `files_per_bucket`
  parallel tasks (salted skew mitigation, per the north rule) and file
  counts stay bounded; compaction keeps segments-per-bucket bounded.
"""

from __future__ import annotations

import os
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datachain_spark.cdc.normalize import normalize_text_udf
from datachain_spark.lake.table import DELETED_COL, LSN_COL, LakeTable

KEY_COLS = ["conv_id", "turn_idx"]
META_COLS = {"lsn", "batch_id", "op", "batch"}


class SchemaDriftError(ValueError):
    """Incompatible schema change in the feed (an existing column changed
    type). Added columns evolve automatically; type changes are refused —
    the reference raises the same way
    (/root/reference/src/datachain/delta.py:58-97)."""


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


def _segment_footer_stats(
    table_root: str, out_dir: str
) -> tuple[dict[int, list[str]], dict[int, dict[str, int]]]:
    """Per-bucket (files, {n, n_del, hwm}) from parquet footer metadata —
    driver-side only. At 10^10 scale this is O(files) footer reads of the
    just-written segment (page-cache-hot), the same trick Iceberg uses for
    its manifest column stats."""
    import pyarrow.parquet as pq

    files: dict[int, list[str]] = {}
    stats: dict[int, dict[str, int]] = {}
    if not os.path.isdir(out_dir):
        return files, stats
    for entry in os.listdir(out_dir):
        if not entry.startswith("bucket="):
            continue
        b = int(entry.split("=", 1)[1])
        bdir = os.path.join(out_dir, entry)
        bfiles = sorted(f for f in os.listdir(bdir) if f.endswith(".parquet"))
        if not bfiles:
            continue
        st = {"n": 0, "n_del": 0, "hwm": -1}
        for f in bfiles:
            md = pq.ParquetFile(os.path.join(bdir, f)).metadata
            names = [md.schema.column(i).name for i in range(md.num_columns)]
            i_lsn, i_del = names.index(LSN_COL), names.index(DELETED_COL)
            st["n"] += md.num_rows
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                lsn_s = g.column(i_lsn).statistics
                if lsn_s is not None and lsn_s.max is not None:
                    st["hwm"] = max(st["hwm"], lsn_s.max)
                # non-null _deleted rows are tombstones; num_values is the
                # parquet non-null count
                st["n_del"] += g.column(i_del).num_values
        files[b] = [os.path.relpath(os.path.join(bdir, f), table_root) for f in bfiles]
        stats[b] = st
    return files, stats


def apply_batch(
    spark: SparkSession,
    table: LakeTable,
    events: DataFrame,
    job_id: str,
    batch_id: int,
    files_per_bucket: int = 1,
    max_segments: int = 8,
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
    target_types = {f.name: f.dataType for f in target_schema.fields}
    for f in _payload_fields(events):
        if f.name in target_types:
            if f.dataType != target_types[f.name]:
                raise SchemaDriftError(
                    f"column {f.name!r} changed type "
                    f"{target_types[f.name].simpleString()} -> {f.dataType.simpleString()}"
                )
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
    # watermarks are O(num_buckets) driver-side metadata -> a literal
    # create_map expression beats a per-batch broadcast-join (no exchange,
    # stays inside whole-stage codegen)
    ev = events.withColumn("bucket", table.bucket_expr())
    if snap.watermarks:
        entries = []
        for b, lsn in snap.watermarks.items():
            entries += [F.lit(b), F.lit(lsn)]
        wm = F.element_at(F.create_map(*entries), F.col("bucket"))
        ev = ev.filter(F.col("lsn") > F.coalesce(wm, F.lit(-1)))

    # ---- last-writer-wins per key over (ts, lsn) ----
    # row_number window, rn=1. Measured alternatives: max_by hash-agg is
    # comparable alone but 2.5x slower once the Arrow normalize UDF follows
    # (ObjectHashAggregate output feeds ArrowEvalPython poorly); a
    # single-shuffle mapInPandas dedup is 50% slower (pandas object-dtype
    # sorts). The window key is the FULL (conv_id, turn_idx), so hot
    # conversations do not skew its partitions.
    w = Window.partitionBy(*KEY_COLS).orderBy(F.col("ts").desc(), F.col("lsn").desc())
    dedup = ev.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    if normalize and "text" in dedup.columns:
        dedup = dedup.withColumn("text", normalize_text_udf(F.col("text")))

    # ---- merge-on-read segment: after-images + delete tombstones ----
    # target columns absent from this batch (e.g. a replayed pre-evolution
    # batch against an already-evolved table) are null-filled
    is_del = F.col("op") == "D"
    batch_cols = set(dedup.columns)
    payload = []
    for f in evolved_schema.fields:
        c = f.name
        if c in KEY_COLS:
            payload.append(F.col(c))
        elif c in batch_cols:
            payload.append(F.when(is_del, F.lit(None)).otherwise(F.col(c)).alias(c))
        else:
            payload.append(F.lit(None).cast(f.dataType).alias(c))
    # tombstone marker: true for deletes, NULL (not false) for upserts, so
    # parquet footer null_count yields the delete count without a scan
    deleted_marker = F.when(is_del, F.lit(True)).otherwise(F.lit(None).cast("boolean"))
    segment = dedup.select(
        *payload, F.col("lsn").alias(LSN_COL), deleted_marker.alias(DELETED_COL), "bucket"
    )

    # ---- salted bucket-partitioned append (bounded files, skew-spread) ----
    # task count scales with the session's parallelism, capped by the
    # at-scale layout (buckets x files_per_bucket); partitionBy routes rows
    # to bucket dirs regardless of which task holds them
    out_dir = table.data_dir(f"job={job_id}", f"batch={batch_id:09d}")
    # crash-recovery fast path (the reference's continue-from-partial,
    # query/dataset.py:1221-1360, at segment granularity): if a previous
    # attempt crashed AFTER fully writing this (job,batch) segment but
    # BEFORE the manifest commit, reuse the files instead of recomputing —
    # inputs are identical because the parent snapshot never advanced.
    if not os.path.exists(os.path.join(out_dir, "_SUCCESS")):
        default_par = spark.sparkContext.defaultParallelism
        n_parts = max(1, min(table.num_buckets * files_per_bucket, 2 * default_par))
        (
            segment.withColumn(
                "_salt", F.pmod(F.xxhash64(*KEY_COLS), F.lit(files_per_bucket))
            )
            .repartition(n_parts, "bucket", "_salt")
            .drop("_salt")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(out_dir)
        )

    # ---- lineage stats from parquet footers (driver-side, zero Spark
    # jobs): rows_in = num_rows, per-bucket hwm = max(_lsn) column stat,
    # deletes = non-null _deleted count (tombstones write true, upserts
    # write null exactly so footers carry the split) ----
    new_bucket_files, bstats = _segment_footer_stats(table.root, out_dir)
    if not bstats:
        return {"batch_id": batch_id, "skipped": "stale"}  # no-change short-circuit

    touched = sorted(bstats)
    watermark_updates = {b: s["hwm"] for b, s in bstats.items()}
    rows_in = sum(s["n"] for s in bstats.values())
    rows_deleted = sum(s["n_del"] for s in bstats.values())
    rows_upserted = rows_in - rows_deleted
    buckets_with_deletes = {b for b, s in bstats.items() if s["n_del"]}

    ledger = {
        "job_id": job_id,
        "batch_id": batch_id,
        "rows_in": rows_in,
        "rows_upserted": rows_upserted,
        "rows_deleted": rows_deleted,
        "committed_at": time.time(),
        "partitions": [
            {"partition_id": int(b), "high_watermark_lsn": int(s["hwm"])}
            for b, s in sorted(bstats.items())
        ],
    }
    version = table.commit(
        append_bucket_files=new_bucket_files,
        has_deletes=buckets_with_deletes,
        schema=evolved_schema if new_fields else None,
        watermark_updates=watermark_updates,
        ledger=ledger,
    )
    # amortized MOR compaction: staggered — at most a quarter of the
    # buckets per apply, worst (most segments) first, so the compaction tax
    # per batch is bounded and smooth instead of a periodic full rewrite
    compacted = table.compact(
        spark,
        max_segments=max_segments,
        files_per_bucket=files_per_bucket,
        max_buckets=max(1, table.num_buckets // 4),
    )
    return {
        "batch_id": batch_id,
        "version": version,
        "rows_in": rows_in,
        "rows_upserted": rows_upserted,
        "rows_deleted": rows_deleted,
        "buckets_touched": len(touched),
        "evolved": [f.name for f in new_fields],
        "compacted_version": compacted,
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
        table = LakeTable.create(
            table_root, transcripts_schema_v1(), key_cols=KEY_COLS, num_buckets=num_buckets
        )
    from datachain_spark.cdc.stream import event_stream_schema

    # explicit per-phase schemas skip a schema-inference job per batch
    v2 = event_stream_schema()
    v1 = T.StructType([f for f in v2.fields if f.name != "tool"])
    metrics = []
    for batch_id, d in feed_batch_dirs(feed_dir):
        if upto_batch is not None and batch_id > upto_batch:
            break
        schema = v1 if f"{os.sep}v1{os.sep}" in d else v2
        events = spark.read.schema(schema).parquet(d)
        metrics.append(
            apply_batch(spark, table, events, job_id, batch_id, normalize=normalize)
        )
    return table, metrics
