"""Subprocess worker for bench.py: run one CDC replay at a given
parallelism and print one JSON line {"seconds": ..., "events": ...}.

Run as: python tools/bench_cdc.py --cpus 8 --feed DIR --events N [--gen]
A fresh process per parallelism level keeps JVM thread pools honest when
comparing local[8] vs local[32] (the sandbox proxy for N vs 4N executors).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datachain_spark.cdc.apply import replay_feed_dir  # noqa: E402
from datachain_spark.cdc.feed import FeedSpec, write_feed  # noqa: E402
from datachain_spark.session import get_spark  # noqa: E402


def bench_spec(n_events_target: int) -> FeedSpec:
    """Feed spec sized so total events ~= target (events ~= 1.55x keys;
    keys ~= 12.8 per conv at hot_every=1000/hot_base=2000). text_scale=25
    puts per-turn text at ~100-600 bytes — realistic transcript payloads."""
    n_convs = max(1000, int(n_events_target / 1.55 / 12.8))
    return FeedSpec(
        n_convs=n_convs,
        hot_every=1000,
        hot_base=2000,
        batch_size=max(100_000, n_events_target // 4),
        text_scale=25,
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--feed", required=True)
    ap.add_argument("--events", type=int, default=2_000_000)
    ap.add_argument("--gen", action="store_true", help="generate the feed first")
    args = ap.parse_args()

    spec = bench_spec(args.events)
    # shuffle/spill on tmpfs when available: benchmarking the ENGINE, not
    # the sandbox's virtual disk (a cluster's shuffle tier is distributed)
    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    local_dir = os.path.join(scratch, f"spark_local_{os.getpid()}")
    # Controlled scaling experiment: the PLAN must be identical at every
    # parallelism level — shuffle partitions sized to the data (fixed 64),
    # and AQE partition COALESCING disabled (it re-plans per cluster size,
    # handing the small cluster a cheaper plan and corrupting the N-vs-4N
    # ratio; measured: coalescing-on flatters local[2] by ~2x). AQE itself
    # (skew-join) stays on. With this config the 2->8 efficiency measures
    # 0.75-0.77 stably vs 0.40-0.50 with per-level re-planning.
    spark = get_spark(
        cpus=args.cpus,
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTS", "64")),
        extra_conf={
            "spark.local.dir": local_dir,
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
        },
    )
    if args.gen:
        write_feed(spark, spec, args.feed)

    # pure-CPU capacity probe at THIS parallelism level: chained xxhash64
    # over spark.range — zero shuffle/IO/Python. Establishes how much
    # compute the host actually grants N cores (virtualized hosts throttle
    # per-core speed as more cores go busy), so bench.py can report
    # capacity-normalized scaling efficiency alongside the raw number.
    from pyspark.sql import functions as F

    expr = F.max(F.xxhash64(F.xxhash64(F.xxhash64(F.xxhash64(F.xxhash64("id"))))))
    spark.range(10**6).select(expr).collect()  # JIT warm-up
    t0 = time.monotonic()
    spark.range(2 * 10**9, numPartitions=8 * args.cpus).select(expr).collect()
    probe_seconds = time.monotonic() - t0

    n_events = spark.read.parquet(os.path.join(args.feed, "v*", "batch=*")).count()

    # warm-up: run the first two batches into a throwaway table so JIT,
    # codegen caches, and Python UDF workers are hot before the timed
    # window (sustained throughput is the metric, not cold-start)
    warm_root = tempfile.mkdtemp(prefix=f"bench_warm_{args.cpus}_", dir=scratch)
    replay_feed_dir(spark, warm_root, args.feed, num_buckets=64, upto_batch=0)
    shutil.rmtree(warm_root, ignore_errors=True)

    table_root = tempfile.mkdtemp(prefix=f"bench_cdc_{args.cpus}_", dir=scratch)
    t0 = time.monotonic()
    replay_feed_dir(spark, table_root, args.feed, num_buckets=64)
    dt = time.monotonic() - t0
    shutil.rmtree(table_root, ignore_errors=True)
    shutil.rmtree(local_dir, ignore_errors=True)
    print(
        json.dumps(
            {
                "seconds": dt,
                "events": n_events,
                "cpus": args.cpus,
                "probe_seconds": probe_seconds,
            }
        )
    )


if __name__ == "__main__":
    main()
