"""Local replica of the driver's correctness gate: run each queries()[name]
on Spark and oracle_sql()[name] on DuckDB at sf0.01, compare row count,
column names, and order-insensitive values (column-name-sorted, like the
driver's value hash). Usage: python tools/check_oracles.py [sf_dir] [names...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from datachain_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if v is None:
        return "\x00__NULL__"  # sortable alongside strings
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v


def normrow(row):
    return tuple(repr(norm(v)) for v in row)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    spark = get_spark(cpus=8, shuffle_partitions=16)
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            failures += 1
            continue
        if sql is None:
            print(f"ROWS-ONLY {name}: {len(srows)} rows, cols={scols}")
            continue
        try:
            rel = con.sql(sql)
            dcols = list(rel.columns)
            dtypes = [str(t) for t in rel.types]
            drows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error {e}")
            failures += 1
            continue
        ok = True
        # The driver hashes TYPED values: duckdb HUGEINT (what sum(int)
        # returns) renders differently from int64 even when the values are
        # equal — exactly the round-1 sessionize/document_pipeline hash
        # failures. Treat any HUGEINT/DECIMAL oracle column as a failure so
        # the local gate catches it before the driver does.
        exotic = [f"{c}:{t}" for c, t in zip(dcols, dtypes) if "HUGEINT" in t or "DECIMAL" in t]
        if exotic:
            print(f"FAIL {name}: oracle emits hash-hazard types {exotic} — CAST them")
            ok = False
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: columns spark={sorted(scols)} duck={sorted(dcols)}")
            ok = False
        if len(srows) != len(drows):
            print(f"FAIL {name}: rows spark={len(srows)} duck={len(drows)}")
            ok = False
        if ok:
            order = sorted(scols)
            sidx = [scols.index(c) for c in order]
            didx = [dcols.index(c) for c in order]
            sset = sorted(
                normrow(tuple(r[i] for i in sidx)) for r in (tuple(x) for x in srows)
            )
            # duckdb timestamps come back tz-naive; spark rows via collect are
            # naive too under UTC session — compare directly
            dset = sorted(normrow(tuple(r[i] for i in didx)) for r in drows)
            if sset != dset:
                bad = next(
                    (i for i, (a, b) in enumerate(zip(sset, dset)) if a != b), None
                )
                print(f"FAIL {name}: value mismatch at sorted-row {bad}:")
                print(f"  spark: {sset[bad] if bad is not None else '?'}")
                print(f"  duck : {dset[bad] if bad is not None else '?'}")
                ok = False
        if ok:
            print(f"OK   {name}: {len(srows)} rows")
        else:
            failures += 1
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
