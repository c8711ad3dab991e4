"""String functions (reference func/string.py)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def length(col: str | Column) -> Column:
    return F.length(_c(col))


def split(col: str | Column, sep: str, limit: int | None = None) -> Column:
    """Returns a real array (the reference stores a JSON-encoded array in
    SQLite — func/string.py:47, sqlite/base.py:198)."""
    return F.split(_c(col), sep, limit if limit is not None else -1)


def replace(col: str | Column, pattern: str, replacement: str) -> Column:
    return F.replace(_c(col), F.lit(pattern), F.lit(replacement))


def regexp_replace(col: str | Column, regex: str, replacement: str) -> Column:
    return F.regexp_replace(_c(col), regex, replacement)


def byte_hamming_distance(a: str | Column, b: str | Column) -> Column:
    """Count of differing bytes between two equal-length strings (reference
    func/string.py:179, sqlite/base.py:221-230) — JVM-side via zip_with
    over the byte arrays plus length difference for unequal tails."""
    ca, cb = F.split(_c(a), ""), F.split(_c(b), "")
    common = F.least(F.size(ca), F.size(cb))
    diff = F.size(
        F.filter(
            F.zip_with(
                F.slice(ca, 1, common), F.slice(cb, 1, common), lambda x, y: x != y
            ),
            lambda v: v,
        )
    )
    return diff + F.abs(F.size(ca) - F.size(cb))
