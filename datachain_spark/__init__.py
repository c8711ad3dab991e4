"""datachain_spark — a from-scratch PySpark-native analytics + CDC engine.

Re-expresses the capabilities of the reference (tfantas/datachain — a lazy,
chainable DataFrame API over a versioned SQL warehouse; see SURVEY.md) as
idiomatic Spark: DataFrame/SQL logical plans optimized by Catalyst, Arrow
vectorized UDFs for the Python path, a versioned bucket-partitioned lake
table (Iceberg-style snapshot manifests on parquet) for dataset versioning,
and a Structured-Streaming-driven CDC merge-apply pipeline with exactly-once
commit manifests for incremental processing.

Reference parity map: SURVEY.md §2 (operator inventory) and §7 (build plan).
The top-level export set mirrors the reference's `datachain/__init__.py`
__all__ name-for-name so `import datachain_spark as dc` is a drop-in for
`import datachain as dc` (design substitutions — dataclass models for
Pydantic, SparkSession for Session's catalog — documented on each symbol).
"""

from pyspark.sql import Column

from datachain_spark import metrics
from datachain_spark.chain import (
    C,
    Chain,
    DatasetNotFoundError,
    DeltaDisabledError,
    datasets,
    delete_dataset,
    edit_dataset,
    move_dataset,
    read_csv,
    read_database,
    read_dataset,
    read_json,
    read_pandas,
    read_parquet,
    read_records,
    read_values,
)
from datachain_spark.data_model import (
    DataModel,
    DataType,
    ModelStore,
    Sys,
    is_chain_type,
)
from datachain_spark.error import DataChainError
from datachain_spark.lake.table import LakeTable
from datachain_spark.fileobj import (
    ArrowRow,
    Audio,
    AudioFile,
    AudioFragment,
    File,
    FileError,
    Image,
    ImageFile,
    TarVFile,
    TextFile,
    VFileError,
    Video,
    VideoFile,
    VideoFragment,
    VideoFrame,
    get_file_type,
)
from datachain_spark.params import param
from datachain_spark.session import Session, get_spark, is_local, is_studio
from datachain_spark.udf import (
    AbstractUDF,
    Aggregator,
    BatchMapper,
    Generator,
    Mapper,
)

# the reference calls the chain class DataChain; same object here
DataChain = Chain

__version__ = "0.4.0"


def read_storage(spark, uri, **kw) -> Chain:
    """List a storage URI into a chain of File rows (reference
    lib/dc/storage.py read_storage returns a DataChain; the
    DataFrame-level twin stays at sources.storage.read_storage)."""
    from datachain_spark.sources.storage import read_storage as _rs

    return Chain(_rs(spark, uri, **kw))


def read_hf(spark, *args, **kw) -> Chain:
    """HuggingFace dataset -> chain (reference lib/dc/hf.py)."""
    from datachain_spark.sources.hf import read_hf as _rh

    return Chain(_rh(spark, *args, **kw))


def listings(spark, cache_root, **kw) -> Chain:
    """Enumerate cached storage listings as a chain (reference
    lib/dc/listings.py)."""
    from datachain_spark.sources.storage import listings as _ls

    return Chain(_ls(spark, cache_root, **kw))


def create_project(namespace, name, descr=None, catalog_root=None, exist_ok=False):
    """Top-level project creation with the reference's arg order
    (reference lib/projects.py create / __init__ export)."""
    from datachain_spark.chain import DEFAULT_CATALOG
    from datachain_spark.namespaces import create_project as _create

    return _create(catalog_root or DEFAULT_CATALOG, namespace, name, descr, exist_ok)


def delete_namespace(name, catalog_root=None):
    """Top-level namespace delete (reference lib/namespaces.py delete)."""
    from datachain_spark.chain import DEFAULT_CATALOG
    from datachain_spark.namespaces import delete_namespace as _delete

    return _delete(catalog_root or DEFAULT_CATALOG, name)


__all__ = [
    "AbstractUDF",
    "Aggregator",
    "ArrowRow",
    "Audio",
    "AudioFile",
    "AudioFragment",
    "BatchMapper",
    "C",
    "Chain",
    "Column",
    "DataChain",
    "DataChainError",
    "DataModel",
    "DataType",
    "DatasetNotFoundError",
    "DeltaDisabledError",
    "File",
    "FileError",
    "Generator",
    "Image",
    "ImageFile",
    "LakeTable",
    "Mapper",
    "ModelStore",
    "Session",
    "Sys",
    "TarVFile",
    "TextFile",
    "VFileError",
    "Video",
    "VideoFile",
    "VideoFragment",
    "VideoFrame",
    "create_project",
    "datasets",
    "delete_dataset",
    "edit_dataset",
    "delete_namespace",
    "get_file_type",
    "get_spark",
    "is_chain_type",
    "is_local",
    "is_studio",
    "listings",
    "metrics",
    "move_dataset",
    "param",
    "read_csv",
    "read_database",
    "read_dataset",
    "read_hf",
    "read_json",
    "read_pandas",
    "read_parquet",
    "read_records",
    "read_storage",
    "read_values",
    "__version__",
]
