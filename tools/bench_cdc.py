"""Subprocess worker for bench.py: run one CDC replay level and print one
JSON line {"seconds": ..., "events": ..., "probe_seconds": ...}.

Run as: python tools/bench_cdc.py --cpus 8 --feed DIR --events N
        [--gen] [--runs K] [--warm-feed DIR] [--files-per-batch 16]

A fresh process per parallelism LEVEL keeps JVM thread pools honest when
comparing local[8] vs local[32] (the sandbox proxy for N vs 4N executors).
WITHIN the level, the replay runs K+1 times in the one JVM and reports the
best of the last K: this Firecracker host both throttles per-core speed as
cores go busy AND swings +-50% run-to-run, and the first execution of the
full plan at high thread counts pays a multi-second JIT/GC ramp (measured:
identical back-to-back window jobs at local[32] go 7.7s -> 23s -> 9.8s ->
3.8s -> 2.2s steady) — so run 0 is the intensity-matched warm-up and the
best sustained run is the level's capability. The capacity probe runs 3x
and reports the MEDIAN (the probe itself swings +-25% with host throttle).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datachain_spark.cdc.apply import replay_feed_dir  # noqa: E402
from datachain_spark.cdc.feed import FeedSpec, write_feed  # noqa: E402
from datachain_spark.session import get_spark  # noqa: E402


def bench_spec(n_events_target: int, n_batches: int = 4) -> FeedSpec:
    """Feed spec sized so total events ~= target (events ~= 1.55x keys;
    keys ~= 12.8 per conv at hot_every=1000/hot_base=2000). text_scale=25
    puts per-turn text at ~100-600 bytes — realistic transcript payloads."""
    n_convs = max(1000, int(n_events_target / 1.55 / 12.8))
    return FeedSpec(
        n_convs=n_convs,
        hot_every=1000,
        hot_base=2000,
        batch_size=max(100_000, n_events_target // n_batches),
        text_scale=25,
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--feed", required=True)
    ap.add_argument("--events", type=int, default=2_000_000)
    ap.add_argument("--gen", action="store_true", help="generate the feed first")
    ap.add_argument("--runs", type=int, default=1, help="timed replays (best-of)")
    ap.add_argument("--batches", type=int, default=4, help="feed batch count for --gen")
    ap.add_argument(
        "--files-per-batch",
        type=int,
        default=16,
        help="parquet files per feed batch dir; bounds the consumer's scan "
        "parallelism (at production scale a binlog batch is hundreds of "
        "segment files — 64 keeps a 32-core scan stage busy)",
    )
    ap.add_argument(
        "--warm-feed",
        default=None,
        help="smaller feed replayed once for warm-up before the timed runs "
        "(defaults to a run-0 replay of --feed itself)",
    )
    ap.add_argument(
        "--warm-upto",
        type=int,
        default=None,
        help="limit the warm-up replay to batches <= N (cheap warm-up for "
        "the low-parallelism levels, which have no JIT/GC ramp to burn off)",
    )
    ap.add_argument(
        "--probe-only",
        action="store_true",
        help="run ONLY the capacity probe and exit (fresh tiny JVM; used "
        "back-to-back at two levels so both probes sample the same "
        "minutes-scale host-throttle regime)",
    )
    ap.add_argument(
        "--lockstep",
        default=None,
        help="directory for turn-taking coordination: two bench_cdc "
        "processes (roles a and b) alternate timed replays so each "
        "(a_i, b_i) ratio sample comes from one adjacent time window — "
        "the host's minutes-scale throttle drift otherwise lands the two "
        "levels in different regimes and corrupts the N-vs-4N ratio",
    )
    ap.add_argument("--role", choices=["a", "b"], default=None)
    ap.add_argument(
        "--stage-stats",
        action="store_true",
        help="enable the Spark UI and report a per-turn PER-STAGE-CLASS "
        "decomposition (map/shuffle-write walls, reduce/shuffle-read "
        "walls, driver-only gaps = turn wall minus the union of stage "
        "windows, executor task-seconds) via the UI REST API — the "
        "paired-bisection instrument for attributing an N->4N residual "
        "to specific stages vs driver serial time. Adds a small listener "
        "overhead; use the SAME flag at both levels of a pair.",
    )
    ap.add_argument(
        "--warm-runs",
        type=int,
        default=1,
        help="full warm-up replays before the timed window (the 32-thread "
        "level needs 2-3 executions of the full plan to reach steady "
        "state; measured ramp on identical jobs: 49s -> 25s -> 19s)",
    )
    args = ap.parse_args()

    spec = bench_spec(args.events, args.batches)
    # shuffle/spill on tmpfs when available: benchmarking the ENGINE, not
    # the sandbox's virtual disk (a cluster's shuffle tier is distributed)
    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    local_dir = os.path.join(scratch, f"spark_local_{os.getpid()}")
    # Controlled scaling experiment: the PLAN must be identical at every
    # parallelism level — shuffle partitions sized to the data (fixed 64),
    # and AQE partition COALESCING disabled (it re-plans per cluster size,
    # handing the small cluster a cheaper plan and corrupting the N-vs-4N
    # ratio; measured: coalescing-on flatters local[2] by ~2x). AQE itself
    # (skew-join) stays on. get_spark's ParallelGC default applies at every
    # level (G1 anti-scaled the 32-thread level 2x — see session.py).
    spark = get_spark(
        cpus=args.cpus,
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTS", "64")),
        extra_conf={
            "spark.local.dir": local_dir,
            **({"spark.ui.enabled": "true", "spark.ui.retainedStages": "5000"}
               if args.stage_stats else {}),
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
            # split size tuned to the feed's file sizes so the scan stage
            # has >= cores tasks at every level (the production knob: the
            # big feed's ~14MB files bin 7-to-a-task under the default
            # 128MB split + 4MB open cost, giving a 32-thread level a
            # 9-task scan stage). FIXED across levels - identical plans.
            "spark.sql.files.maxPartitionBytes": "16m",
            "spark.sql.files.openCostInBytes": "2m",
        },
    )
    if args.gen:
        write_feed(spark, spec, args.feed, files_per_batch=args.files_per_batch)
        if args.runs == 0:  # generate-only invocation
            shutil.rmtree(local_dir, ignore_errors=True)
            print(json.dumps({"generated": args.feed}))
            return

    # pure-CPU capacity probe at THIS parallelism level: chained xxhash64
    # over spark.range — zero shuffle/IO/Python. Establishes how much
    # compute the host actually grants N cores (virtualized hosts throttle
    # per-core speed as more cores go busy), so bench.py can report
    # capacity-normalized scaling efficiency alongside the raw number.
    # Median of 3: the probe itself swings with the throttle.
    from pyspark.sql import functions as F

    expr = F.max(F.xxhash64(F.xxhash64(F.xxhash64(F.xxhash64(F.xxhash64("id"))))))
    spark.range(10**6).select(expr).collect()  # JIT warm-up
    probes = []
    cap_ratios = []
    # Probes run BEFORE the warm-up/replays only: measured on this host,
    # a probe taken after heavy replay work in a small-heap JVM reads up
    # to 40% slower than the same probe pre-replay (aged-heap GC state
    # pollutes the pure-CPU measurement), which silently inflates the
    # capacity denominator of the level that replays longest. Pre-replay,
    # fresh-JVM probes are comparable across levels.
    probe_rows = 4 * 10**9 if args.cpus >= 8 else 2 * 10**9

    def _probe_once(rows: int, n_tasks: int) -> float:
        t0 = time.monotonic()
        spark.range(rows, numPartitions=n_tasks).select(expr).collect()
        return time.monotonic() - t0

    # Shuffle-FABRIC capacity probe: a plan-identical (64 map, 64 reduce)
    # repartition+sort through the same tmpfs shuffle tier the replay
    # uses. Measured r4 (8 vs 32 busy cores, adjacent windows): the pure-
    # ALU probe scales ~2.7-2.9x while this fabric probe scales only
    # ~2.0x — the shuffle path is memory-bandwidth-bound (disabling
    # shuffle compression made the replay 4.7x SLOWER: bytes through the
    # fabric are the scarce resource), and 32 threads on one board share
    # ~2x the bandwidth of 8, where a real 4N-executor cluster brings 4x
    # fabric with its nodes. Reported alongside the ALU probe so the
    # N->4N ratio can be normalized by BOTH estimators.
    def _shuffle_probe_once() -> float:
        t0 = time.monotonic()
        (
            spark.range(2 * 10**7, numPartitions=64)
            .select(F.col("id"), F.xxhash64("id").alias("h"))
            .repartition(64, "h")
            .sortWithinPartitions("h")
            .write.format("noop").mode("overwrite").save()
        )
        return time.monotonic() - t0

    def run_probe() -> None:
        probes.append(
            _probe_once(probe_rows, 8 * args.cpus) * (2 * 10**9 / probe_rows)
        )
        if args.cpus >= 32:
            # SAME-JVM capacity-ratio sample for the 8->32 pair: run the
            # probe with only 8 concurrent tasks (8 busy cores) vs all 32,
            # seconds apart in the same throttle window. Cross-process
            # probe ratios mix different throttle regimes minutes apart and
            # swing 2.2-2.9 on identical hardware; this paired measurement
            # is the defensible denominator.
            t8 = _probe_once(10**9, 8) / 1e9
            t_full = _probe_once(probe_rows, 8 * args.cpus) / probe_rows
            cap_ratios.append(t8 / t_full)

    if args.lockstep and args.role == "b":
        # serialize the whole pre-phase: b probes/warms only after a has
        # probed AND warmed (concurrent heavy phases would contend for
        # every core and corrupt both sides' measurements)
        deadline = time.monotonic() + 900
        while not os.path.exists(os.path.join(args.lockstep, "warm_a")):
            if time.monotonic() > deadline:
                break
            time.sleep(0.3)

    for _ in range(3 if args.cpus >= 8 else 1):
        run_probe()
    _shuffle_probe_once()  # warm the shuffle/noop plan
    shuffle_probes = [_shuffle_probe_once() for _ in range(3)]

    if args.probe_only:
        out = {
            "cpus": args.cpus,
            "probe_seconds": statistics.median(probes),
            "probe_all": [round(p, 2) for p in probes],
            "shuffle_probe_seconds": statistics.median(shuffle_probes),
        }
        if cap_ratios:
            out["capacity_ratio_8_to_n"] = round(statistics.median(cap_ratios), 3)
        shutil.rmtree(local_dir, ignore_errors=True)
        print(json.dumps(out))
        return

    n_events = spark.read.parquet(os.path.join(args.feed, "v*", "batch=*")).count()

    # warm-up at full intensity: JIT, codegen caches, GC sizing, and Python
    # UDF workers all need the real plan hot before the timed window
    # (sustained throughput is the metric, not cold-start)
    def _wait_for(path: str, timeout_s: float = 900.0) -> None:
        deadline = time.monotonic() + timeout_s
        while not os.path.exists(path):
            if time.monotonic() > deadline:
                return  # degrade to solo timing rather than hang forever
            time.sleep(0.3)

    def _mark(name: str) -> None:
        with open(os.path.join(args.lockstep, name), "w") as fh:
            fh.write("1")

    warm_src = args.warm_feed or args.feed
    for _ in range(max(1, args.warm_runs)):
        warm_root = tempfile.mkdtemp(prefix=f"bench_warm_{args.cpus}_", dir=scratch)
        replay_feed_dir(spark, warm_root, warm_src, num_buckets=64, upto_batch=args.warm_upto)
        shutil.rmtree(warm_root, ignore_errors=True)
    if args.lockstep:
        _mark(f"warm_{args.role}")

    times = []
    stage_turns: list[dict] = []
    for i in range(max(1, args.runs)):
        if args.lockstep:
            # strict alternation: a runs turn i after b's turn i-1 (or b's
            # warm-up for turn 0); b runs turn i after a's turn i
            gate = (
                os.path.join(args.lockstep, "warm_b" if i == 0 else f"done_b_{i - 1}")
                if args.role == "a"
                else os.path.join(args.lockstep, f"done_a_{i}")
            )
            _wait_for(gate)
        table_root = tempfile.mkdtemp(prefix=f"bench_cdc_{args.cpus}_", dir=scratch)
        w0 = time.time()
        t0 = time.monotonic()
        replay_feed_dir(spark, table_root, args.feed, num_buckets=64)
        dt = time.monotonic() - t0
        times.append(dt)
        if args.stage_stats:
            stage_turns.append(_stage_decomposition(spark, w0, time.time(), dt))
        shutil.rmtree(table_root, ignore_errors=True)
        if args.lockstep:
            _mark(f"done_{args.role}_{i}")
    shutil.rmtree(local_dir, ignore_errors=True)
    out = {
        "seconds": min(times),
        "all_seconds": [round(t, 2) for t in times],
        "events": n_events,
        "cpus": args.cpus,
        "probe_seconds": statistics.median(probes),
        "probe_all": [round(p, 2) for p in probes],
        "shuffle_probe_seconds": statistics.median(shuffle_probes),
        "shuffle_probe_all": [round(p, 2) for p in shuffle_probes],
    }
    if cap_ratios:
        out["capacity_ratio_8_to_n"] = round(statistics.median(cap_ratios), 3)
        out["capacity_ratio_all"] = [round(c, 3) for c in cap_ratios]
    if stage_turns:
        out["stage_turns"] = stage_turns
    print(json.dumps(out))


def _stage_decomposition(spark, w0: float, w1: float, wall: float) -> dict:
    """Per-turn stage-class decomposition from the UI REST API: sum of
    stage walls for map-side (shuffle-write) and reduce-side
    (shuffle-read) stages, executor task-seconds per class, and the
    DRIVER-ONLY GAP = turn wall minus the union of all stage windows
    (the serial time when no Spark stage is running: job submission,
    footer stats, commits). Stage windows from async compaction overlap
    the next batch's stages — the union handles that; per-class sums
    count each stage's own wall."""
    import datetime
    import json as _json
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    apps = _json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app_id = apps[0]["id"]
    stages = _json.load(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
        )
    )

    def ts(s: str) -> float:
        return datetime.datetime.strptime(
            s.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z"
        ).timestamp()

    wins = []
    for st in stages:
        if not st.get("submissionTime") or not st.get("completionTime"):
            continue
        a, b = ts(st["submissionTime"]), ts(st["completionTime"])
        if a < w0 - 0.5 or b > w1 + 0.5:
            continue
        if st.get("shuffleWriteBytes", 0) > 0:
            cls = "map"
        elif st.get("shuffleReadBytes", 0) > 0:
            cls = "reduce"
        else:
            cls = "other"
        wins.append((a, b, cls, st.get("executorRunTime", 0) / 1000.0))

    union = 0.0
    cur_a = cur_b = None
    for a, b, _, _ in sorted(wins):
        if cur_b is None or a > cur_b:
            if cur_b is not None:
                union += cur_b - cur_a
            cur_a, cur_b = a, b
        else:
            cur_b = max(cur_b, b)
    if cur_b is not None:
        union += cur_b - cur_a

    by: dict[str, dict[str, float]] = {}
    for a, b, cls, ex in wins:
        d = by.setdefault(cls, {"wall": 0.0, "exec_sec": 0.0, "n": 0})
        d["wall"] += b - a
        d["exec_sec"] += ex
        d["n"] += 1
    return {
        "wall": round(wall, 3),
        "stage_active": round(union, 3),
        "driver_gap": round(max(0.0, wall - union), 3),
        "classes": {
            k: {kk: round(vv, 3) for kk, vv in v.items()} for k, v in by.items()
        },
    }


if __name__ == "__main__":
    main()
