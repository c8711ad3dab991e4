"""Array functions (reference func/array.py)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from datachain_spark.operators.similarity import cosine_distance as _cosine
from datachain_spark.operators.similarity import euclidean_distance as _euclid


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def cosine_distance(a, b) -> Column:
    """1 - cosine similarity (reference func/array.py:10-64, backed by a
    per-row Python function in SQLite sqlite/base.py:238-253 — here a
    Catalyst aggregate/zip_with expression)."""
    return _cosine(_c(a), _c(b))


def euclidean_distance(a, b) -> Column:
    return _euclid(_c(a), _c(b))


def length(col) -> Column:
    return F.size(_c(col))


def contains(col, value) -> Column:
    return F.array_contains(_c(col), value)


def slice(col, offset: int, length_: int | None = None) -> Column:
    return F.slice(_c(col), offset + 1, length_ if length_ is not None else (1 << 30))


def join(col, sep: str = ",") -> Column:
    return F.array_join(_c(col), sep)


def get_element(col, index: int) -> Column:
    return F.element_at(_c(col), index + 1)  # reference is 0-based


def sip_hash_64(col) -> Column:
    """The reference's sip_hash_64 is ClickHouse-only (unsupported on its
    SQLite backend, func/array.py:392); we provide xxhash64 as the 64-bit
    content hash with the same role."""
    return F.xxhash64(_c(col))
