"""Extra per-query benchmark harness (guide §1.4 noop-sink isolation).

NOT the frozen driver bench (bench.py is unchanged); this exists so the
optimization round can time individual headline queries, at arbitrary
scale dirs (including the 10x-replicated profiling set from
tools/gen_profile_sf.py), and capture .explain("formatted") per query.

Usage:
  python bench_extra.py SF_DIR CPUS [--runs N] [--plans DIR] [QUERY ...]

Prints one JSON line: {"queries": {name: best_sec}, "sf_dir": ..., "runs": N}
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("cpus", type=int)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans", default=None, help="dir to write explain output")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_intermixed_args()

    import __spark_entry__ as entrymod
    from datachain_spark.session import get_spark

    spark = get_spark(cpus=args.cpus, shuffle_partitions=2 * args.cpus)
    qs = entrymod.queries()
    names = args.queries or list(qs)
    out: dict[str, float] = {}
    build: dict[str, float] = {}
    for name in names:
        t0 = time.monotonic()
        df = qs[name](spark, args.sf_dir)
        build[name] = round(time.monotonic() - t0, 3)
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(args.plans, f"{name}.txt"), "w") as f:
                f.write(buf.getvalue())
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        df.write.format("noop").mode("overwrite").save()  # warm
        times = []
        for _ in range(args.runs):
            t0 = time.monotonic()
            df.write.format("noop").mode("overwrite").save()
            times.append(time.monotonic() - t0)
        out[name] = round(min(times), 3)
        print(f"# {name}: best={out[name]}s build={build[name]}s "
              f"all={[round(t, 3) for t in times]}", file=sys.stderr)
    print(json.dumps({"queries": out, "build_seconds": build,
                      "sf_dir": args.sf_dir, "runs": args.runs}))


if __name__ == "__main__":
    main()
