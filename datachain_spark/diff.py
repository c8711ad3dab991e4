"""Keyed diff / CDC classifier — Added / Deleted / Modified / Same.

Spark-first rebuild of the reference's diff operator
(/root/reference/src/datachain/diff/__init__.py:27-163): a null-safe
full-outer join on the key columns plus a CASE status column; deleted rows
take their values from the right side. `compare_and_split` returns the four
status-filtered frames (/root/reference/src/datachain/diff/__init__.py:166-252).

Catalyst handles the physical join (broadcast/SMJ by size + AQE); there is
nothing to hand-schedule. The null-safe key equality uses `<=>` exactly
like the reference's sqlite IS NOT DISTINCT FROM emulation
(/root/reference/src/datachain/query/dataset.py:299-320).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

A, D, M, S = "A", "D", "M", "S"
STATUSES = (A, D, M, S)


def diff(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    compare: Sequence[str] | None = None,
    status_col: str = "diff_status",
    statuses: Sequence[str] = STATUSES,
) -> DataFrame:
    """Classify rows of `left` (new) vs `right` (old) by key.

    A: key only in left; D: key only in right (row values taken from
    right); M: key in both and any `compare` column differs (all shared
    non-key columns when compare is None); S: key in both, compared
    columns equal. `statuses` filters the output set.
    """
    on = list(on)
    if compare is None:
        compare = [c for c in left.columns if c in set(right.columns) and c not in set(on)]
    out_cols = left.columns

    # explicit presence markers: the join is null-safe (NULL keys are valid
    # key values), so presence cannot be inferred from key-column nullness —
    # a left-only row whose first key column is NULL would otherwise be
    # misclassified as M/S instead of A
    l = left.withColumn("__l_present", F.lit(True))
    r = right
    for c in right.columns:
        r = r.withColumnRenamed(c, f"__r_{c}")
    r = r.withColumn("__r_present", F.lit(True))
    cond = None
    for k in on:
        e = F.col(k).eqNullSafe(F.col(f"__r_{k}"))
        cond = e if cond is None else (cond & e)
    j = l.join(r, cond, "full_outer")

    left_absent = F.col("__l_present").isNull()
    right_absent = F.col("__r_present").isNull()
    modified = None
    for c in compare:
        e = ~F.col(c).eqNullSafe(F.col(f"__r_{c}"))
        modified = e if modified is None else (modified | e)
    status = (
        F.when(right_absent, F.lit(A))
        .when(left_absent, F.lit(D))
        .when(modified if modified is not None else F.lit(False), F.lit(M))
        .otherwise(F.lit(S))
    )
    # deleted rows surface the right side's values (reference
    # diff/__init__.py:122-141)
    proj = [
        F.when(F.col(status_col) == D, F.col(f"__r_{c}")).otherwise(F.col(c)).alias(c)
        if c in right.columns
        else F.col(c)
        for c in out_cols
    ]
    out = j.withColumn(status_col, status).select(*proj, status_col)
    if set(statuses) != set(STATUSES):
        out = out.filter(F.col(status_col).isin(list(statuses)))
    return out


def compare_and_split(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    compare: Sequence[str] | None = None,
) -> dict[str, DataFrame]:
    # persist: callers consume several of the four splits, and without this
    # each split re-executes the full-outer join (the reference operates on
    # a materialized compared chain, diff/__init__.py:166-252)
    d = diff(left, right, on, compare).persist()
    return {s: d.filter(F.col("diff_status") == s).drop("diff_status") for s in STATUSES}
