"""Engine exception hierarchy (reference src/datachain/lib/utils.py:29-41 +
src/datachain/error.py). Most reference error classes guard warehouse/SaaS
machinery Spark replaces; the ones user code catches are kept by name."""

from __future__ import annotations


class DataChainError(Exception):
    """Base for engine errors (reference lib/utils.py:29-30)."""


class DataChainParamsError(DataChainError):
    """Bad user-supplied parameters (reference lib/utils.py:33-35)."""


class DataChainColumnError(DataChainParamsError):
    """Column-specific parameter error (reference lib/utils.py:38-41)."""

    def __init__(self, col_name: str, msg: str):
        super().__init__(f"Error for column {col_name}: {msg}")


# the lookup errors live where they are raised; re-exported here so
# `from datachain_spark.error import ...` matches the reference layout
from datachain_spark.namespaces import (  # noqa: E402
    NamespaceNotFoundError,
    ProjectNotFoundError,
)

__all__ = [
    "DataChainError",
    "DataChainParamsError",
    "DataChainColumnError",
    "DatasetNotFoundError",
    "NamespaceNotFoundError",
    "ProjectNotFoundError",
]


def __getattr__(name: str):
    # DatasetNotFoundError is defined in chain.py (raised by read_dataset);
    # lazy to avoid an import cycle (chain imports udf -> fine, but error
    # must stay import-light for namespaces)
    if name == "DatasetNotFoundError":
        from datachain_spark.chain import DatasetNotFoundError

        return DatasetNotFoundError
    raise AttributeError(name)
