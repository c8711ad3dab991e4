"""read_hf — Hugging Face datasets as a Chain, Arrow-natively.

Reference surface: read_hf accepts a hub path (loaded via
`datasets.load_dataset`) or a Dataset/DatasetDict/IterableDataset object
and generates rows, adding a `split` column for dict-of-splits inputs
(/root/reference/src/datachain/lib/dc/hf.py:17-120, lib/hf.py:70-150).

Spark-first rebuild: an HF `Dataset` is Arrow-backed (`.data` is a
pyarrow Table), so conversion is a zero-copy-ish Arrow -> Spark handoff
instead of the reference's row-by-row Generator; streaming/iterable
datasets fall back to bounded row iteration (use `limit` — an unbounded
hub stream cannot become a finite DataFrame). The `datasets` library is
import-gated at the hub-path entry only: object inputs need NO extra
dependency, and anything structurally Dataset-like (exposes `.data` /
`.to_pandas()` / iterates dicts) converts — which is how the test suite
exercises the full conversion logic without the hub.
"""

from __future__ import annotations

import itertools
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _one_split_df(spark: SparkSession, ds: Any, limit: int = 0) -> DataFrame:
    if limit and hasattr(ds, "take"):
        try:
            ds = ds.take(limit)  # datasets>=2.14 Dataset.take / IterableDataset.take
        except TypeError:
            pass
    data = getattr(ds, "data", None)
    if data is not None and hasattr(data, "to_pandas"):
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
