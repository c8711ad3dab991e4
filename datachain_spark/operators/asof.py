"""As-of (temporal) join — a custom operator Spark lacks natively.

Semantics: for each left row, attach the latest right row with the same
key whose timestamp is <= the left timestamp (the classic point-in-time
lookup). The reference has no as-of join (SURVEY.md §2.4: "no range/as-of
joins"); this is one of the extensions a transcripts/CDC warehouse needs
(e.g. join each turn to the most recent model-config change).

Implementation is the union + carry-forward-window composition — NOT a
range join, so there is no candidate-pair explosion: tag both sides, sort
within key by (ts, side) and carry the last non-null right values forward
(F.last ignorenulls over rowsBetween(unboundedPreceding, 0)). Cost: one
shuffle on the key, one per-partition sort — identical shape to any window
aggregation, scales like one.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str] | str,
    left_ts: str,
    right_ts: str | None = None,
    right_prefix: str = "asof_",
    strict: bool = False,
) -> DataFrame:
    """Left as-of join. Right payload columns appear as `asof_<col>`
    (null when no right row precedes). `strict=True` requires right.ts <
    left.ts instead of <=."""
    on = [on] if isinstance(on, str) else list(on)
    right_ts = right_ts or left_ts

    r_payload = [c for c in right.columns if c not in set(on) and c != right_ts]
    l_cols = left.columns

    # tag: right rows sort BEFORE left rows at equal ts (so <= matches);
    # strict mode reverses the tie order
    r_tag, l_tag = (0, 1) if not strict else (1, 0)
    r = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(r_tag).alias("__side"),
        *[F.col(c).alias(f"{right_prefix}{c}") for c in r_payload],
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in l_cols if c not in set(on)],
    )
    l = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(l_tag).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{right_prefix}{c}") for c in r_payload],
        *[F.col(c).alias(f"__l_{c}") for c in l_cols if c not in set(on)],
    )
    u = r.unionByName(l)

    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.select(
        *on,
        "__ts",
        "__side",
        *[F.col(f"__l_{c}") for c in l_cols if c not in set(on)],
        *[
            F.last(F.col(f"{right_prefix}{c}"), ignorenulls=True).over(w).alias(f"{right_prefix}{c}")
            for c in r_payload
        ],
    )
    out = carried.filter(F.col("__side") == l_tag)
    proj = [
        (F.col(c) if c in set(on) else F.col(f"__l_{c}").alias(c))
        for c in l_cols
    ]
    return out.select(*proj, *[F.col(f"{right_prefix}{c}") for c in r_payload])
