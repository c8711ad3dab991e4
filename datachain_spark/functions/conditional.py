"""Conditional functions (reference func/conditional.py)."""

from __future__ import annotations

from collections.abc import Sequence
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _v(x) -> Column:
    return x if isinstance(x, Column) else F.lit(x)


def greatest(*cols) -> Column:
    return F.greatest(*[_v(c) if not isinstance(c, str) else F.col(c) for c in cols])


def least(*cols) -> Column:
    return F.least(*[_v(c) if not isinstance(c, str) else F.col(c) for c in cols])


def case(*branches: Sequence[Any], else_: Any = None) -> Column:
    """case((cond, val), (cond2, val2), else_=x) — reference
    func/conditional.py:94."""
    expr = None
    for cond, val in branches:
        expr = F.when(cond, _v(val)) if expr is None else expr.when(cond, _v(val))
    return expr.otherwise(_v(else_))


def ifelse(cond: Column, if_val: Any, else_val: Any) -> Column:
    return F.when(cond, _v(if_val)).otherwise(_v(else_val))


def isnone(col) -> Column:
    return _c(col).isNull()


def or_(*conds: Column) -> Column:
    out = conds[0]
    for c in conds[1:]:
        out = out | c
    return out


def and_(*conds: Column) -> Column:
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def not_(cond: Column) -> Column:
    return ~cond
