"""Sequence-level (conversation-level) exact dedup: fingerprint a whole
ORDERED sequence per group and dedup groups whose sequences are
identical. The transcripts-pipeline motivation: the same conversation
re-ingested under a different conv_id (re-crawled session logs, retried
uploads, cross-source mirrors) survives row-level dedup — every (conv,
turn) key differs — but is pure duplication at training time. Same for
user interaction logs keyed by session.

The reference's dedup surface is row-scoped (distinct/diff); this is a
beyond-reference corpus operator alongside the document-level family in
operators/dedup.py.

Scale shape:
- sequence_fingerprint is ONE groupBy shuffle; per-group state is the
  group's OWN rows (a conversation/session, never the corpus —
  collect_list is bounded by the longest conversation, the same bound
  the CDC apply's bucket layout already assumes for hot conv_ids).
  Ordering is sort_array over (order_cols..., payload) structs, so the
  fingerprint is a pure function of the group's content — identical at
  any parallelism, partitioning, or delivery order.
- dedup_sequences adds one O(groups) hash-agg on the fingerprint (the
  winner per fingerprint is the MIN group key — deterministic) plus one
  left-semi join of the corpus against the O(groups) keep-list.
- The fingerprint is md5 over unit-separator-joined items (DuckDB
  reproduces it byte-for-byte, so driver oracles verify values); NULL
  payload cells map to a sentinel so (NULL) and ('') never collide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ITEM_SEP = "\x1e"  # between payload columns within one row
_SEQ_SEP = "\x1f"  # between rows within one sequence
_NULL = "\\N"  # NULL-cell sentinel (distinct from the empty string)


def sequence_fingerprint(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    payload_cols: list[str],
    out_col: str = "seq_fp",
) -> DataFrame:
    """One row per group: (group_cols..., n_items, out_col) where out_col
    is the md5 of the order-sorted payload sequence."""
    item = F.concat_ws(
        _ITEM_SEP,
        *[F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in payload_cols],
    )
    pair = F.struct(*[F.col(c) for c in order_cols], item.alias("__i"))
    agg = df.groupBy(*group_cols).agg(
        F.sort_array(F.collect_list(pair)).alias("__seq"),
        F.count(F.lit(1)).alias("n_items"),
    )
    joined = F.array_join(F.transform("__seq", lambda s: s["__i"]), _SEQ_SEP)
    return agg.select(*group_cols, "n_items", F.md5(joined).alias(out_col))


def dedup_sequences(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    payload_cols: list[str],
) -> DataFrame:
    """Drop whole groups whose ordered payload sequence duplicates another
    group's; of each duplicate set the MIN group key survives. Returns the
    surviving rows of `df` unchanged."""
    fps = sequence_fingerprint(df, group_cols, order_cols, payload_cols)
    winner = fps.groupBy("seq_fp").agg(
        F.min(F.struct(*group_cols)).alias("__w")
    )
    keep = winner.select(*[F.col(f"__w.{c}").alias(c) for c in group_cols])
    return df.join(keep, on=group_cols, how="left_semi")
