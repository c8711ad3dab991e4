"""Numeric / bit functions (reference func/numeric.py)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def bit_and(a, b) -> Column:
    return _c(a).bitwiseAND(_c(b) if not isinstance(b, int) else F.lit(b))


def bit_or(a, b) -> Column:
    return _c(a).bitwiseOR(_c(b) if not isinstance(b, int) else F.lit(b))


def bit_xor(a, b) -> Column:
    return _c(a).bitwiseXOR(_c(b) if not isinstance(b, int) else F.lit(b))


def bit_hamming_distance(a, b) -> Column:
    """Differing-bit count (reference func/numeric.py:178,
    sqlite/base.py:215-218): bit_count(a XOR b), codegen'd."""
    return F.bit_count(bit_xor(a, b))


def int_hash_64(col) -> Column:
    """64-bit integer hash. The reference ports ClickHouse's IntHash64
    (sqlite/base.py:202-212); any stable 64-bit mix qualifies — we use
    xxhash64 (JVM, deterministic across cluster sizes)."""
    return F.xxhash64(_c(col))
