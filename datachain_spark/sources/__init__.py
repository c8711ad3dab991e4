from datachain_spark.sources.database import read_database, to_database
from datachain_spark.sources.storage import (
    file_diff,
    list_files,
    parse_tabular,
    read_storage,
    to_storage,
)

__all__ = [
    "read_storage",
    "list_files",
    "file_diff",
    "to_storage",
    "parse_tabular",
    "read_database",
    "to_database",
]
