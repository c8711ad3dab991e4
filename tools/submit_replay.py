"""spark-submit entry point for the CDC replay job.

The north rule's deployment contract: `spark-submit --py-files
dist/datachain_spark.zip tools/submit_replay.py --feed <dir> --table
<dir>` on a multi-executor cluster. This script therefore builds its
session from the submit-provided config (master/executors come from the
spark-submit command line, NEVER hardcoded here) and imports
datachain_spark from the shipped zip — the same artifact every executor's
Python workers unpack.

Prints ONE final JSON line: batches applied/skipped, final row count, and
an order-independent state hash (sum of per-row xxhash64 over the key +
payload columns) so a driver script can assert replay equivalence across
cluster sizes without collecting the table.
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

STATE_COLS = ["conv_id", "turn_idx", "role", "text", "tool"]


def state_fingerprint(df):
    """(rows, hash) — hash is commutative over rows (sum of xxhash64 as
    decimal(38,0)), so it is independent of partitioning and row order:
    identical at any cluster size."""
    h = F.xxhash64(*[F.coalesce(F.col(c).cast("string"), F.lit("∅")) for c in STATE_COLS])
    row = df.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(h.cast("decimal(38,0)")).alias("hash"),
    ).first()
    return int(row["rows"]), int(row["hash"] or 0)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--feed", required=True, help="feed directory (batch=* parquet dirs)")
    ap.add_argument("--table", required=True, help="LakeTable root to apply into")
    ap.add_argument("--job-id", default="submit-replay")
    ap.add_argument(
        "--runs", type=int, default=0,
        help="extra warm replays before the reported one (a 10^10-event "
        "ingest job is steady-state; K>0 measures the warm-JVM rate the "
        "long-running job sustains, discarding one-time JIT/daemon startup)",
    )
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("datachain_spark_cdc_replay")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )

    from datachain_spark.cdc.apply import replay_feed_dir

    for i in range(args.runs):  # warm replays to throwaway tables
        replay_feed_dir(spark, f"{args.table}_warm{i}", args.feed, job_id=args.job_id)
    t0 = time.monotonic()
    table, results = replay_feed_dir(spark, args.table, args.feed, job_id=args.job_id)
    replay_s = time.monotonic() - t0
    events = sum(r.get("rows_in", 0) for r in results if not r.get("skipped"))
    rows, h = state_fingerprint(table.read(spark))
    print(
        json.dumps(
            {
                "batches": len(results),
                "applied": sum(1 for r in results if not r.get("skipped")),
                "skipped": sum(1 for r in results if r.get("skipped")),
                "rows": rows,
                "state_hash": h,
                "version": table.current_version(),
                "events": events,
                "replay_sec": round(replay_s, 2),
                "events_per_sec": round(events / replay_s, 1) if replay_s > 0 else None,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
