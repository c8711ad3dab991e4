"""Aggregate + window functions (reference func/aggregate.py, func/window.py).

The reference compiles collect() to SQLite json_group_array and concat()
to a custom aggregate_strings (sql/sqlite/base.py:600-616); here they are
collect_list / concat_ws-equivalents, and window functions take a
pyspark Window spec built by `window()` (reference func/window.py:7-48).
"""

from __future__ import annotations

from pyspark.sql import Column, Window, WindowSpec
from pyspark.sql import functions as F


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def count(col=None) -> Column:
    return F.count(_c(col)) if col is not None else F.count(F.lit(1))


def sum(col) -> Column:  # noqa: A001
    return F.sum(_c(col))


def avg(col) -> Column:
    return F.avg(_c(col))


def min(col) -> Column:  # noqa: A001
    return F.min(_c(col))


def max(col) -> Column:  # noqa: A001
    return F.max(_c(col))


def any_value(col) -> Column:
    return F.any_value(_c(col))


def collect(col) -> Column:
    return F.collect_list(_c(col))


def concat(col, separator: str = "") -> Column:
    return F.array_join(F.collect_list(_c(col)), separator)


def window(partition_by, order_by, desc: bool = False) -> WindowSpec:
    """Window spec (reference func/window.py:7-48)."""
    pb = [partition_by] if isinstance(partition_by, (str, Column)) else list(partition_by)
    ob = [order_by] if isinstance(order_by, (str, Column)) else list(order_by)
    obc = [(_c(c).desc() if desc else _c(c)) for c in ob]
    return Window.partitionBy(*[_c(c) for c in pb]).orderBy(*obc)


def row_number() -> Column:
    return F.row_number()


def rank() -> Column:
    return F.rank()


def dense_rank() -> Column:
    return F.dense_rank()


def first(col) -> Column:
    return F.first(_c(col))
