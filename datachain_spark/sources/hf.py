"""read_hf — Hugging Face datasets as a Chain, Arrow-natively.

Reference surface: read_hf accepts a hub path (loaded via
`datasets.load_dataset`) or a Dataset/DatasetDict/IterableDataset object
and generates rows, adding a `split` column for dict-of-splits inputs
(/root/reference/src/datachain/lib/dc/hf.py:17-120, lib/hf.py:70-150).

Spark-first rebuild: an HF `Dataset` is Arrow-backed (`.data` is a
pyarrow Table), so conversion is a zero-copy-ish Arrow -> Spark handoff
instead of the reference's row-by-row Generator; splits above
SHARD_THRESHOLD_ROWS stream their Arrow record batches to temp parquet
shards and are read back DISTRIBUTED (driver peak memory = one record
batch, never the split); streaming/iterable datasets fall back to bounded
row iteration (use `limit` — an unbounded hub stream cannot become a
finite DataFrame). The `datasets` library is
import-gated at the hub-path entry only: object inputs need NO extra
dependency, and anything structurally Dataset-like (exposes `.data` /
`.to_pandas()` / iterates dicts) converts — which is how the test suite
exercises the full conversion logic without the hub.
"""

from __future__ import annotations

import itertools
import os
import tempfile
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# Dataset-like inputs above this row count take the SHARDED path: Arrow
# record batches stream to temp parquet shards which Spark then reads
# distributed — the whole split never materializes as one driver-side
# pandas frame (a multi-GB HF dataset OOMs the driver on .to_pandas()).
SHARD_THRESHOLD_ROWS = 250_000


def _shard_arrow_to_parquet(data: Any, shard_dir: str, rows_per_shard: int) -> int:
    """Stream an Arrow-backed table to parquet shards batch-by-batch
    (driver peak memory = one record batch, not the table). Returns the
    shard count."""
    import pyarrow.parquet as pq

    os.makedirs(shard_dir, exist_ok=True)
    writer = None
    shard_idx = 0
    rows_in_shard = 0
    try:
        # max_chunksize re-slices single-chunk tables (a freshly built
        # pa.Table is ONE batch however large); Dataset-like wrappers
        # without the kwarg fall back to their native batch sizes
        batches = data.to_batches(max_chunksize=rows_per_shard)
    except TypeError:
        batches = data.to_batches()
    try:
        for batch in batches:
            if writer is None or rows_in_shard >= rows_per_shard:
                if writer is not None:
                    writer.close()
                    shard_idx += 1
                writer = pq.ParquetWriter(
                    os.path.join(shard_dir, f"part-{shard_idx:05d}.parquet"), batch.schema
                )
                rows_in_shard = 0
            writer.write_batch(batch)
            rows_in_shard += batch.num_rows
    finally:
        if writer is not None:
            writer.close()
    return shard_idx + 1


def _one_split_df(
    spark: SparkSession,
    ds: Any,
    limit: int = 0,
    shard_rows: int | None = None,
    shard_dir: str | None = None,
) -> DataFrame:
    if shard_rows is None:
        shard_rows = SHARD_THRESHOLD_ROWS  # resolved at call time (patchable)
    if limit and hasattr(ds, "take"):
        try:
            ds = ds.take(limit)  # datasets>=2.14 Dataset.take / IterableDataset.take
        except TypeError:
            pass
    data = getattr(ds, "data", None)
    if data is not None and hasattr(data, "to_pandas"):
        n_rows = getattr(data, "num_rows", None)
        if (
            not limit
            and n_rows is not None
            and n_rows > shard_rows
            and hasattr(data, "to_batches")
        ):
            # sharded scale path: no full driver copy; the parquet shards
            # are a distributed-readable spill of the Arrow backing
            d = shard_dir or tempfile.mkdtemp(prefix="read_hf_shards_")
            _shard_arrow_to_parquet(data, d, shard_rows)
            return spark.read.parquet(d)
        pdf = data.to_pandas()  # pyarrow Table (or ConcatenationTable) backing
        if limit:
            pdf = pdf.head(limit)
        return spark.createDataFrame(pdf)
    if hasattr(ds, "to_pandas"):
        pdf = ds.to_pandas()
        if limit:
            pdf = pdf.head(limit)
        return spark.createDataFrame(pdf)
    # iterable-of-dicts (streaming datasets); must be bounded
    it = iter(ds)
    rows = list(itertools.islice(it, limit) if limit else it)
    if not rows:
        raise ValueError("read_hf: empty dataset/stream (pass limit>0 for streams)")
    return spark.createDataFrame(rows)


def read_hf(
    spark: SparkSession,
    dataset: Any,
    *args: Any,
    split: str | None = None,
    limit: int = 0,
    **kwargs: Any,
) -> DataFrame:
    """Load a Hugging Face dataset as a DataFrame.

    dataset: hub path string (requires the `datasets` package) or a
    Dataset / DatasetDict / IterableDataset-like object. A dict-of-splits
    input unions all splits with a `split` column (reference behavior);
    `limit` bounds rows per split.
    """
    if isinstance(dataset, str):
        try:
            from datasets import load_dataset
        except ImportError as e:  # pragma: no cover - hub lib absent here
            raise ImportError(
                "read_hf with a hub path requires the 'datasets' package "
                "(pip install datasets); pass a Dataset object otherwise"
            ) from e
        dataset = load_dataset(dataset, *args, split=split, **kwargs)
    # DatasetDict-like: mapping of split name -> dataset
    if hasattr(dataset, "items") and not hasattr(dataset, "features"):
        parts = []
        for name, ds in dataset.items():
            parts.append(
                _one_split_df(spark, ds, limit).withColumn("split", F.lit(str(name)))
            )
        if not parts:
            raise ValueError("read_hf: empty DatasetDict")
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p, allowMissingColumns=True)
        return out
    return _one_split_df(spark, dataset, limit)
