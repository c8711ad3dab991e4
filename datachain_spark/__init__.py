"""datachain_spark — a from-scratch PySpark-native analytics + CDC engine.

Re-expresses the capabilities of the reference (tfantas/datachain — a lazy,
chainable DataFrame API over a versioned SQL warehouse; see SURVEY.md) as
idiomatic Spark: DataFrame/SQL logical plans optimized by Catalyst, Arrow
vectorized UDFs for the Python path, a versioned bucket-partitioned lake
table (Iceberg-style snapshot manifests on parquet) for dataset versioning,
and a Structured-Streaming-driven CDC merge-apply pipeline with exactly-once
commit manifests for incremental processing.

Reference parity map: SURVEY.md §2 (operator inventory) and §7 (build plan).
"""

from datachain_spark.chain import (
    C,
    Chain,
    DeltaDisabledError,
    datasets,
    read_csv,
    read_database,
    read_dataset,
    read_json,
    read_pandas,
    read_parquet,
    read_records,
    read_values,
)
from datachain_spark.fileobj import (
    ArrowRow,
    Audio,
    AudioFile,
    AudioFragment,
    File,
    FileError,
    Image,
    ImageFile,
    TextFile,
    VFileError,
    Video,
    VideoFile,
    VideoFragment,
    VideoFrame,
    get_file_type,
)
from datachain_spark.session import get_spark

__version__ = "0.3.0"

__all__ = [
    "get_spark",
    "Chain",
    "C",
    "DeltaDisabledError",
    "read_parquet",
    "read_csv",
    "read_json",
    "read_values",
    "read_records",
    "read_pandas",
    "read_dataset",
    "read_database",
    "datasets",
    "File",
    "TextFile",
    "ImageFile",
    "VideoFile",
    "AudioFile",
    "Image",
    "Video",
    "Audio",
    "AudioFragment",
    "VideoFrame",
    "VideoFragment",
    "ArrowRow",
    "FileError",
    "VFileError",
    "get_file_type",
    "__version__",
]
