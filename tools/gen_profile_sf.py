"""Generate a 10x-replicated profiling dataset from sf0.1 (approximates the
driver's sf1.0 scale for optimization-round measurements only — NOT driver
data; correctness is always checked against /root/testdata/sf*).

Each keyed table is unioned 10x with key columns shifted per replica so
joins/groups scale realistically. nation/region stay as-is.

Usage: python tools/gen_profile_sf.py [OUT_DIR]   (default /dev/shm/sf1_synth)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
REPLICAS = 10

# table -> columns shifted by replica * stride
SHIFTS: dict[str, dict[str, int]] = {
    "lineitem": {"l_orderkey": 10_000_000, "l_partkey": 1_000_000, "l_suppkey": 100_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "customer": {"c_custkey": 1_000_000, "c_nationkey": 0},
    "supplier": {"s_suppkey": 100_000, "s_nationkey": 0},
    "part": {"p_partkey": 1_000_000},
    "events": {"event_id": 10_000_000, "user_id": 1_000},
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
}
COPY = ["nation", "region"]


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/dev/shm/sf1_synth"
    from pyspark.sql import functions as F

    from datachain_spark.session import get_spark

    spark = get_spark(cpus=16)
    os.makedirs(out_dir, exist_ok=True)
    for name in COPY:
        df = spark.read.parquet(f"{SRC}/{name}.parquet")
        df.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")
    for name, shifts in SHIFTS.items():
        df = spark.read.parquet(f"{SRC}/{name}.parquet")
        parts = []
        for i in range(REPLICAS):
            p = df
            for col, stride in shifts.items():
                if stride:
                    p = p.withColumn(col, F.col(col) + F.lit(i * stride))
            parts.append(p)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.repartition(16).write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")
        print(f"{name}: done")
    open(os.path.join(out_dir, "_DONE"), "w").close()
    spark.stop()


if __name__ == "__main__":
    main()
