"""Skew-handling helpers: two-phase salted aggregation.

The north rule's salting requirement, generalized: hot keys (conversations
with thousands of turns, power-law users) overload single reducers in a
plain groupBy. `salted_agg` splits the aggregation into a salted partial
pass (hot key's rows spread over `salt` reducers) and a tiny final merge
pass over (key, salt) partials — the standard two-phase rewrite, kept
fully declarative so Catalyst still does map-side partial aggregation
within each phase.

Only algebraic aggregates decompose this way; the API takes (partial,
final) expression pairs for count/sum/min/max and derives avg."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str] | str,
    aggs: dict[str, tuple[str, str]],
    salt: int = 16,
    salt_on: Sequence[str] | str | None = None,
) -> DataFrame:
    """aggs: out_name -> (kind, col) with kind in
    {count, sum, min, max, avg}. Example:
        salted_agg(events, "user_id", {"n": ("count", "*"),
                                       "total": ("sum", "value"),
                                       "mean": ("avg", "value")},
                   salt_on="event_id")

    `salt_on`: column(s) whose hash spreads a hot key across reducers —
    pass a per-row identity (event id, LSN) when rows under a hot key can
    be exact duplicates, since the full-row fallback hashes duplicates to
    ONE salt bucket and the mitigation degrades to no salting.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    # salt from a content hash, NOT monotonically_increasing_id: the latter
    # is partition-layout-dependent, so a recomputed/speculated task could
    # re-salt rows differently and double-count a retried partial. A
    # deterministic hash is retry-stable; prefer `salt_on` identity cols so
    # duplicate rows still spread (full-row hash sends copies to one bucket).
    if salt_on is not None:
        salt_cols = [salt_on] if isinstance(salt_on, str) else list(salt_on)
    else:
        salt_cols = list(df.columns)
    s = F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(salt))

    partial_exprs: list[Column] = []
    final_exprs: list[Column] = []
    for name, (kind, col) in aggs.items():
        if kind == "count":
            partial_exprs.append(F.count(F.lit(1)).alias(f"__p_{name}"))
            final_exprs.append(F.sum(f"__p_{name}").alias(name))
        elif kind == "sum":
            partial_exprs.append(F.sum(col).alias(f"__p_{name}"))
            final_exprs.append(F.sum(f"__p_{name}").alias(name))
        elif kind == "min":
            partial_exprs.append(F.min(col).alias(f"__p_{name}"))
            final_exprs.append(F.min(f"__p_{name}").alias(name))
        elif kind == "max":
            partial_exprs.append(F.max(col).alias(f"__p_{name}"))
            final_exprs.append(F.max(f"__p_{name}").alias(name))
        elif kind == "avg":
            partial_exprs.append(F.sum(col).alias(f"__ps_{name}"))
            partial_exprs.append(F.count(col).alias(f"__pc_{name}"))
            final_exprs.append(
                (F.sum(f"__ps_{name}") / F.sum(f"__pc_{name}")).alias(name)
            )
        else:
            raise ValueError(f"non-decomposable aggregate kind {kind!r}")

    partial = df.withColumn("__salt", s).groupBy(*keys, "__salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)
