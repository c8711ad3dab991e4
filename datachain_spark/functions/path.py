"""Path functions (reference func/path.py:6-122; pure-SQL rtrim/substr
implementations sqlite/base.py:341-406 — here substring_index/regexp)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def parent(col: str | Column) -> Column:
    """Everything before the last '/'; '' when there is no parent."""
    c = _c(col)
    return F.when(c.contains("/"), F.regexp_replace(c, r"/[^/]*$", "")).otherwise(F.lit(""))


def name(col: str | Column) -> Column:
    """Final path component (reference func/path.py `name`)."""
    return F.substring_index(_c(col), "/", -1)


def file_stem(col: str | Column) -> Column:
    """Name without its last extension."""
    n = name(col)
    return F.when(
        n.rlike(r"\.[^.]*$"), F.regexp_replace(n, r"\.[^.]*$", "")
    ).otherwise(n)


def file_ext(col: str | Column) -> Column:
    """Extension without the dot; '' if none."""
    n = name(col)
    return F.when(n.rlike(r"\.[^.]+$"), F.regexp_extract(n, r"\.([^.]+)$", 1)).otherwise(
        F.lit("")
    )
