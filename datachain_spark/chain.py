"""Chain — the DataChain-style chainable user API, Spark-first.

Reproduces the reference's lazy chain surface (`DataChain`,
/root/reference/src/datachain/lib/dc/datachain.py:119) as a thin facade
over a Spark DataFrame: every chain method appends Catalyst operators
instead of the reference's Step list (/root/reference/src/datachain/query/
dataset.py:2140), so there is no custom IR, no subquery nesting, and no
row-wise Python in the relational path. A user of the reference maps:

    dc.read_storage(...)        -> chain.read_parquet/read_csv/read_json
    dc.read_dataset(name, ver)  -> chain.read_dataset (LakeTable snapshot)
    .select/.filter/.mutate     -> same names here
    .merge/.union/.subtract     -> same names (Catalyst joins)
    .diff                       -> same (datachain_spark.diff)
    .group_by(x=func.sum(...))  -> same via pyspark.sql.functions
    .map/.gen/.agg/.batch_map   -> Arrow-vectorized variants (per-row
                                   Python replaced by pandas batches,
                                   reference lib/udf.py:435-636)
    .save(name, version)        -> versioned LakeTable dataset + semver tag
                                   (reference catalog.py:796-890)

Settings like `parallel=N`/`workers=N` (reference query/dispatch.py) do
not exist: Spark executors are the dispatcher.
"""

from __future__ import annotations

import os
import re
from collections.abc import Callable, Iterable, Sequence
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datachain_spark.lake.table import LakeTable

DEFAULT_CATALOG = os.environ.get("DATACHAIN_SPARK_HOME", os.path.expanduser("~/.datachain_spark"))

_PY_TO_SPARK: dict[type, T.DataType] = {
    int: T.LongType(),
    float: T.DoubleType(),
    str: T.StringType(),
    bool: T.BooleanType(),
    bytes: T.BinaryType(),
}


def _dtype(t: Any) -> T.DataType:
    if isinstance(t, T.DataType):
        return t
    if t in _PY_TO_SPARK:
        return _PY_TO_SPARK[t]
    raise TypeError(f"unsupported output type {t!r}")


def _output_schema(output: dict[str, Any]) -> T.StructType:
    return T.StructType([T.StructField(k, _dtype(v), True) for k, v in output.items()])


class C:
    """Column helper mirroring the reference's `C` (query/schema.py:45-64):
    C("a.b") resolves nested fields; .glob() maps to SQL LIKE-style
    matching, .regexp() to rlike."""

    def __new__(cls, name: str) -> Column:  # noqa: D102
        return F.col(name)

    @staticmethod
    def glob(name: str, pattern: str) -> Column:
        # translate glob to SQL LIKE: * -> %, ? -> _
        like = pattern.replace("%", r"\%").replace("_", r"\_").replace("*", "%").replace("?", "_")
        return F.col(name).like(like)

    @staticmethod
    def regexp(name: str, pattern: str) -> Column:
        return F.col(name).rlike(pattern)


class Chain:
    """Lazy chainable dataset. Immutable: every method returns a new Chain."""

    def __init__(self, df: DataFrame, catalog_root: str = DEFAULT_CATALOG):
        self.df = df
        self.catalog_root = catalog_root

    def _evolve(self, df: DataFrame) -> "Chain":
        return Chain(df, self.catalog_root)

    # ---------- schema ----------
    @property
    def schema(self) -> T.StructType:
        return self.df.schema

    @property
    def columns(self) -> list[str]:
        return self.df.columns

    def print_schema(self) -> "Chain":
        self.df.printSchema()
        return self

    # ---------- projections / filters (reference datachain.py:1263-1511) ----------
    def select(self, *names: str) -> "Chain":
        return self._evolve(self.df.select(*names))

    def select_except(self, *names: str) -> "Chain":
        return self._evolve(self.df.drop(*names))

    def mutate(self, **exprs: Column) -> "Chain":
        return self._evolve(self.df.withColumns(dict(exprs)))

    def rename(self, **mapping: str) -> "Chain":
        df = self.df
        for new, old in mapping.items():
            df = df.withColumnRenamed(old, new)
        return self._evolve(df)

    def filter(self, *conds: Column) -> "Chain":
        df = self.df
        for c in conds:  # ANDed, like the reference (datachain.py:2905-2973)
            df = df.filter(c)
        return self._evolve(df)

    # ---------- ordering / limiting (reference datachain.py:1221-1244, 2975-3025) ----------
    def order_by(self, *cols: str | Column, descending: bool = False) -> "Chain":
        cs = [F.col(c) if isinstance(c, str) else c for c in cols]
        if descending:
            cs = [c.desc() for c in cs]
        return self._evolve(self.df.orderBy(*cs))

    def limit(self, n: int) -> "Chain":
        return self._evolve(self.df.limit(n))

    def offset(self, n: int, *order_by: str | Column) -> "Chain":
        """Skip the first `n` rows of an EXPLICIT total order (reference
        datachain.py:2975-2995). Requires order keys: offset without a
        defined order is meaningless, and the tempting implementation — a
        row_number window over monotonically_increasing_id with no
        partitionBy — pulls the whole table through one task. Spark's
        native offset operator handles the skip after the sort."""
        if not order_by:
            raise ValueError(
                "offset(n) requires explicit order columns, e.g. "
                "chain.offset(100, 'id') — a global offset is undefined "
                "without a total order"
            )
        cs = [F.col(c) if isinstance(c, str) else c for c in order_by]
        return self._evolve(self.df.orderBy(*cs).offset(n))

    def distinct(self, *cols: str) -> "Chain":
        return self._evolve(self.df.dropDuplicates(list(cols) or None))

    def sample(self, n: int, seed: int = 42) -> "Chain":
        return self._evolve(self.df.orderBy(F.rand(seed)).limit(n))

    def shuffle(self, *key_cols: str) -> "Chain":
        """Deterministic shuffle: order by xxhash64 of the given (or all)
        columns — repeatable across cluster sizes, unlike the reference's
        regenerated sys__rand (warehouse.py:281-334)."""
        cols = list(key_cols) or self.df.columns
        return self._evolve(self.df.orderBy(F.xxhash64(*cols)))

    def chunk(self, index: int, total: int, *key_cols: str) -> "Chain":
        """Deterministic 1/total slice by key hash (reference
        datachain.py:3005-3025 uses sys__rand % total)."""
        cols = list(key_cols) or self.df.columns
        return self._evolve(
            self.df.filter(F.pmod(F.xxhash64(*cols), F.lit(total)) == index)
        )

    def train_test_split(self, weights: Sequence[float], seed: int = 42) -> list["Chain"]:
        return [self._evolve(d) for d in self.df.randomSplit(list(weights), seed=seed)]

    # ---------- set ops / joins (reference datachain.py:1734-2069) ----------
    def union(self, other: "Chain") -> "Chain":
        return self._evolve(self.df.unionByName(other.df))

    def merge(
        self,
        right: "Chain",
        on: str | Sequence[str] | Column,
        right_on: str | Sequence[str] | None = None,
        inner: bool = False,
        full: bool = False,
        rname: str = "right_",
    ) -> "Chain":
        """Reference merge semantics (datachain.py:1734-1841): left-outer
        by default; right-side name collisions prefixed with `rname`."""
        how = "inner" if inner else ("full_outer" if full else "left_outer")
        rdf = right.df
        if isinstance(on, Column):
            cond = on
        else:
            lkeys = [on] if isinstance(on, str) else list(on)
            rkeys = (
                lkeys
                if right_on is None
                else ([right_on] if isinstance(right_on, str) else list(right_on))
            )
            # prefix-colliding right columns (keep right keys addressable)
            renames = {
                c: f"{rname}{c}" for c in rdf.columns if c in set(self.df.columns)
            }
            for old, new in renames.items():
                rdf = rdf.withColumnRenamed(old, new)
            rkeys = [renames.get(k, k) for k in rkeys]
            cond = None
            for lk, rk in zip(lkeys, rkeys):
                e = self.df[lk].eqNullSafe(rdf[rk])
                cond = e if cond is None else (cond & e)
        return self._evolve(self.df.join(rdf, cond, how))

    def subtract(
        self, other: "Chain", on: str | Sequence[str] | None = None
    ) -> "Chain":
        """Null-safe anti-join (reference warehouse.py:1095-1136)."""
        keys = (
            [on] if isinstance(on, str) else list(on or [c for c in self.columns if c in set(other.columns)])
        )
        cond = None
        for k in keys:
            e = self.df[k].eqNullSafe(other.df[k])
            cond = e if cond is None else (cond & e)
        return self._evolve(self.df.join(other.df, cond, "left_anti"))

    def diff(
        self,
        other: "Chain",
        on: Sequence[str] | str,
        compare: Sequence[str] | None = None,
        added: bool = True,
        deleted: bool = True,
        modified: bool = True,
        same: bool = False,
        status_col: str = "diff_status",
    ) -> "Chain":
        from datachain_spark.diff import diff as _diff

        statuses = [
            s
            for s, keep in zip("ADMS", (added, deleted, modified, same))
            if keep
        ]
        on = [on] if isinstance(on, str) else list(on)
        return self._evolve(
            _diff(self.df, other.df, on=on, compare=compare, status_col=status_col,
                  statuses=statuses)
        )

    # ---------- aggregation (reference datachain.py:1302-1423) ----------
    def group_by(self, *partition_by: str | Column, **aggs: Column) -> "Chain":
        cols = [F.col(c) if isinstance(c, str) else c for c in partition_by]
        agg_cols = [v.alias(k) for k, v in aggs.items()]
        return self._evolve(self.df.groupBy(*cols).agg(*agg_cols))

    def count(self) -> int:
        return self.df.count()

    def sum(self, col: str):
        return self.df.agg(F.sum(col)).first()[0]

    def avg(self, col: str):
        return self.df.agg(F.avg(col)).first()[0]

    def min(self, col: str):
        return self.df.agg(F.min(col)).first()[0]

    def max(self, col: str):
        return self.df.agg(F.max(col)).first()[0]

    # ---------- UDFs, Arrow-vectorized (reference lib/udf.py:435-636) ----------
    def map(self, fn: Callable[..., Any], output: dict[str, Any], params: list[str] | None = None) -> "Chain":
        """1:1 mapper. `fn` is called per row with `params` values (like the
        reference Mapper) but executed over Arrow batches via mapInPandas —
        no per-row IPC. For fully-vectorized transforms use map_batches."""
        in_cols = self.df.columns
        use = params or in_cols
        out_schema = T.StructType(
            list(self.df.schema.fields) + list(_output_schema(output).fields)
        )
        out_names = list(output.keys())

        def run(batches):
            for pdf in batches:
                res = [fn(*row) for row in pdf[use].itertuples(index=False, name=None)]
                if len(out_names) == 1:
                    pdf[out_names[0]] = res
                else:
                    for i, name in enumerate(out_names):
                        pdf[name] = [r[i] for r in res]
                yield pdf

        return self._evolve(self.df.mapInPandas(run, out_schema))

    def map_batches(self, fn: Callable, output: dict[str, Any] | None = None) -> "Chain":
        """N:N pandas-DataFrame-in/out (reference BatchMapper,
        lib/udf.py:480-538), Arrow-batched."""
        out_schema = (
            self.df.schema
            if output is None
            else T.StructType(list(self.df.schema.fields) + list(_output_schema(output).fields))
        )

        def run(batches):
            for pdf in batches:
                yield fn(pdf)

        return self._evolve(self.df.mapInPandas(run, out_schema))

    def gen(self, fn: Callable[..., Iterable[tuple]], output: dict[str, Any], params: list[str] | None = None) -> "Chain":
        """1:N generator (reference Generator, lib/udf.py:541-597): `fn`
        yields output tuples per input row; runs over Arrow batches."""
        import pandas as pd

        use = params or self.df.columns
        out_schema = _output_schema(output)
        out_names = list(output.keys())

        def run(batches):
            for pdf in batches:
                rows = []
                for row in pdf[use].itertuples(index=False, name=None):
                    rows.extend(fn(*row))
                yield pd.DataFrame(rows, columns=out_names)

        return self._evolve(self.df.mapInPandas(run, out_schema))

    def agg(
        self,
        fn: Callable,
        partition_by: str | Sequence[str],
        output: dict[str, Any],
    ) -> "Chain":
        """N:M grouped aggregator (reference Aggregator, lib/udf.py:600-636):
        `fn(pdf) -> pdf` per group via applyInPandas — the shuffle replaces
        the reference's dense_rank partitions table (query/dataset.py:781-816)."""
        keys = [partition_by] if isinstance(partition_by, str) else list(partition_by)
        out_schema = _output_schema(output)
        return self._evolve(self.df.groupBy(*keys).applyInPandas(lambda pdf: fn(pdf), out_schema))

    # ---------- persistence (reference datachain.py:599-716) ----------
    def persist(self) -> "Chain":
        return self._evolve(self.df.persist())

    def _table(self, name: str) -> LakeTable:
        return LakeTable(os.path.join(self.catalog_root, name))

    def save(self, name: str, version: str | None = None) -> "Chain":
        """Materialize as a new version of dataset `name` (semver-tagged
        LakeTable snapshot; reference catalog.py:796-890 + dataset
        versioning dataset.py:240-360). Auto-bumps the patch version."""
        root = os.path.join(self.catalog_root, name)
        df = self.df
        if not LakeTable.exists(root):
            table = LakeTable.create(root, df.schema, key_cols=[], num_buckets=1)
        else:
            table = LakeTable(root)
        ver = version or _next_semver(table)
        out_dir = table.data_dir(f"save={table.current_version() + 1}")
        df.write.mode("overwrite").parquet(out_dir)
        files = [
            os.path.relpath(os.path.join(out_dir, f), table.root)
            for f in sorted(os.listdir(out_dir))
            if f.endswith(".parquet")
        ]
        table.commit(replace_bucket_files={0: files}, schema=df.schema, tag=ver)
        return read_dataset(df.sparkSession, name, catalog_root=self.catalog_root)

    # ---------- sinks (reference datachain.py:2352-2667) ----------
    def to_parquet(self, path: str, mode: str = "overwrite", partition_by: Sequence[str] | None = None) -> None:
        w = self.df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)

    def to_csv(self, path: str, mode: str = "overwrite", header: bool = True) -> None:
        self.df.write.mode(mode).option("header", header).csv(path)

    def to_json(self, path: str, mode: str = "overwrite") -> None:
        self.df.write.mode(mode).json(path)

    # ---------- driver-side collection (reference datachain.py:1607-3058) ----------
    def to_pandas(self):
        return self.df.toPandas()

    def to_records(self) -> list[dict[str, Any]]:
        return [r.asDict(recursive=True) for r in self.df.collect()]

    def to_list(self) -> list[tuple]:
        return [tuple(r) for r in self.df.collect()]

    def to_values(self, col: str) -> list[Any]:
        return [r[0] for r in self.df.select(col).collect()]

    def to_iter(self):
        for r in self.df.toLocalIterator():
            yield tuple(r)

    def collect(self) -> list[tuple]:
        return self.to_list()

    def show(self, n: int = 20, truncate: bool = True) -> "Chain":
        self.df.show(n, truncate=truncate)
        return self


def _next_semver(table: LakeTable) -> str:
    best = (0, 0, 0)
    for v in table.versions():
        tag = table.snapshot(v).tag
        if tag and re.fullmatch(r"v\d+\.\d+\.\d+", tag):
            best = max(best, tuple(int(x) for x in tag[1:].split(".")))
    if best == (0, 0, 0):
        return "v1.0.0"
    return f"v{best[0]}.{best[1]}.{best[2] + 1}"


# ---------- constructors (reference lib/dc/*.py) ----------
def read_parquet(spark: SparkSession, path: str, **opts: str) -> Chain:
    return Chain(spark.read.options(**opts).parquet(path))


def read_csv(spark: SparkSession, path: str, header: bool = True, schema=None, **opts: str) -> Chain:
    r = spark.read.options(**opts).option("header", header)
    if schema is not None:
        r = r.schema(schema)
    else:
        r = r.option("inferSchema", True)
    return Chain(r.csv(path))


def read_json(spark: SparkSession, path: str, schema=None, multiline: bool = False, **opts: str) -> Chain:
    r = spark.read.options(**opts).option("multiLine", multiline)
    if schema is not None:
        r = r.schema(schema)
    return Chain(r.json(path))


def read_values(spark: SparkSession, **cols: list) -> Chain:
    """In-memory columns -> chain (reference lib/dc/values.py)."""
    names = list(cols.keys())
    rows = list(zip(*cols.values()))
    return Chain(spark.createDataFrame(rows, names))


def read_records(spark: SparkSession, records: list[dict], schema=None) -> Chain:
    return Chain(spark.createDataFrame(records, schema=schema))


def read_pandas(spark: SparkSession, pdf) -> Chain:
    return Chain(spark.createDataFrame(pdf))


def read_dataset(
    spark: SparkSession,
    name: str,
    version: int | str | None = None,
    catalog_root: str = DEFAULT_CATALOG,
) -> Chain:
    """Open a saved dataset at a version (int snapshot id or semver tag;
    reference lib/dc/datasets.py:27-224)."""
    table = LakeTable(os.path.join(catalog_root, name))
    return Chain(table.read(spark, version=version), catalog_root=catalog_root)


def datasets(catalog_root: str = DEFAULT_CATALOG) -> list[str]:
    if not os.path.isdir(catalog_root):
        return []
    return sorted(
        d for d in os.listdir(catalog_root) if LakeTable.exists(os.path.join(catalog_root, d))
    )


def read_database(spark: SparkSession, query: str, url: str, **props: str) -> Chain:
    """JDBC read (reference lib/dc/database.py). Requires a JDBC driver on
    the classpath — import-gated by Spark itself at load time."""
    return Chain(
        spark.read.format("jdbc").option("url", url).option("query", query).options(**props).load()
    )
