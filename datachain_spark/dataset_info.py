"""Dataset catalog info (reference lib/dataset_info.py:23-76 DatasetInfo +
lib/dc/datasets.py datasets() returning it).

`datasets_info(spark, ...)` enumerates the catalog as a DataFrame with one
row per dataset: identity (name/namespace/project), latest version tag and
snapshot id, creation time, and REAL physical stats — row count and byte
size read from the live snapshot's parquet footers (driver-side metadata
only, no Spark job; the reference stores the same numbers in its datasets
registry at save time).
"""

from __future__ import annotations

import datetime
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

INFO_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType(), False),
        T.StructField("namespace", T.StringType(), False),
        T.StructField("project", T.StringType(), False),
        T.StructField("version", T.StringType(), True),  # latest semver tag
        T.StructField("snapshot_id", T.IntegerType(), False),
        T.StructField("num_versions", T.IntegerType(), False),
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("num_objects", T.LongType(), True),
        T.StructField("size", T.LongType(), True),
        T.StructField("attrs", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


def _live_stats(table) -> tuple[int | None, int | None]:
    """(rows, bytes) of the CURRENT snapshot from parquet footers."""
    import pyarrow.parquet as pq

    snap = table.snapshot()
    rows = 0
    size = 0
    for p in table._files(snap):
        if not os.path.exists(p):
            return None, None
        rows += pq.ParquetFile(p).metadata.num_rows
        size += os.path.getsize(p)
    return rows, size


def datasets_info(
    spark: SparkSession,
    catalog_root: str | None = None,
    namespace: str | None = None,
    project: str | None = None,
) -> DataFrame:
    """One info row per registered dataset (reference datasets();
    lib/dc/datasets.py:225-280 with its DatasetInfo payload)."""
    from datachain_spark.chain import DEFAULT_CATALOG, datasets
    from datachain_spark.lake.table import LakeTable
    from datachain_spark.namespaces import (
        DEFAULT_NAMESPACE,
        dataset_root,
        parse_dataset_name,
    )

    root = catalog_root or DEFAULT_CATALOG
    rows = []
    for full_name in datasets(root, namespace=namespace, project=project):
        ns, proj, bare = parse_dataset_name(full_name)
        table = LakeTable(dataset_root(root, full_name))
        versions = table.versions()
        head = table.snapshot()
        tags = [t for v in versions if (t := table.snapshot(v).tag)]
        tag = tags[-1] if tags else None
        created = table.snapshot(versions[0]).created_at or None
        n, size = _live_stats(table)
        rows.append(
            (
                bare,
                ns or DEFAULT_NAMESPACE,
                proj or "",
                tag,
                head.version,
                # user-facing version count = semver TAGS (each save tags
                # once; untagged intermediate snapshots are engine-internal)
                len(tags) or len(versions),
                datetime.datetime.fromtimestamp(created) if created else None,
                n,
                size,
                {k: str(v) for k, v in (head.props or {}).items()},
            )
        )
    return spark.createDataFrame(rows, INFO_SCHEMA)


__all__ = ["INFO_SCHEMA", "datasets_info"]
