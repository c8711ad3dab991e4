"""Transcript → training-example rendering (SFT data prep).

Turns a row-per-turn conversation table — the engine's native payload,
(conv_id, turn_idx, role, text, ...) — into one row per conversation:
role-tagged rendered text plus the character spans of the turns a
supervised-fine-tuning loss should cover (the standard "mask everything
except the assistant turns" recipe; see e.g. the public HuggingFace TRL /
chat-template docs). The reference has no rendering surface (its
transcripts analog stops at row-wise ETL); this is the stage between the
CDC-maintained transcripts table and a tokenized training set.

Plan shape: ONE groupBy(conv_id) shuffle collects each conversation's own
turns (the same per-group state bound the CDC bucket layout and
sequence_fingerprint already assume — a conversation fits in memory), then
everything else is whole-stage-codegen array expressions: sort_array for
stable turn order, transform/aggregate for prefix-sum offsets, filter for
the masked-role spans. Zero Python, zero extra shuffles, and offsets are
BIGINT so a pathological mega-conversation cannot overflow.

Every intermediate array is materialized as a real column before any
lambda references it: a computed expression captured inside a
higher-order-function lambda re-evaluates PER ELEMENT (see
dedup.sliding_ngrams), so prefix sums over a captured expression would go
quadratic in recompute, not just in adds.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["render_conversations"]


def render_conversations(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    mask_roles: Sequence[str] = ("assistant",),
    sep: str = "\n",
) -> DataFrame:
    """One row per conversation: (conv_col, n_turns, text, loss_spans).

    Each turn renders as ``<|role|>text`` and turns join on `sep`, in
    `order_col` order. `loss_spans` is array<struct<s,e>> of 0-based
    half-open [s, e) character offsets into the rendered text covering the
    TEXT content (not the role tag) of every turn whose role is in
    `mask_roles` — empty array when a conversation has none. NULL turn
    text renders as '' (its span is empty but positionally correct)."""
    if not sep:
        raise ValueError("sep must be non-empty (offsets assume it)")
    turn = F.struct(
        F.col(order_col).alias("o"),
        F.col(role_col).alias("role"),
        F.coalesce(F.col(text_col), F.lit("")).alias("text"),
    )
    g = df.groupBy(conv_col).agg(
        # sort_array orders struct elements by field order: (o, role, text)
        # — o is the (conv, turn) key so order is total and deterministic
        F.sort_array(F.collect_list(turn)).alias("turns")
    )
    g = g.withColumn(
        "pieces",
        F.transform(
            F.col("turns"),
            lambda t: F.concat(F.lit("<|"), t["role"], F.lit("|>"), t["text"]),
        ),
    )
    g = g.withColumn(
        "taglens",
        F.transform(
            F.col("turns"), lambda t: (F.length(t["role"]) + F.lit(4)).cast("long")
        ),
    )
    g = g.withColumn(
        "lens", F.transform(F.col("pieces"), lambda p: F.length(p).cast("long"))
    )
    # starts[i] (1-based turn i): sum(lens[1..i-1]) + (i-1)*len(sep).
    # O(n^2) adds per conversation over the materialized lens column —
    # n = that conversation's turn count, bounded by the same assumption
    # as the collect above.
    sep_len = F.lit(len(sep)).cast("long")
    g = g.withColumn(
        "starts",
        F.transform(
            F.sequence(F.lit(1), F.size(F.col("turns"))),
            lambda i: F.aggregate(
                F.slice(F.col("lens"), F.lit(1), i - 1),
                F.lit(0).cast("long"),
                lambda a, x: a + x,
            )
            + (i - 1).cast("long") * sep_len,
        ),
    )
    role_of = lambda i: F.element_at(F.col("turns"), i)["role"]  # noqa: E731
    span_of = lambda i: F.struct(  # noqa: E731
        (F.element_at(F.col("starts"), i) + F.element_at(F.col("taglens"), i)).alias("s"),
        (F.element_at(F.col("starts"), i) + F.element_at(F.col("lens"), i)).alias("e"),
    )
    masked = F.filter(
        F.transform(
            F.sequence(F.lit(1), F.size(F.col("turns"))),
            lambda i: F.when(role_of(i).isin(*mask_roles), span_of(i))
            if mask_roles
            else F.lit(None).cast("struct<s:bigint,e:bigint>"),
        ),
        lambda x: x.isNotNull(),
    )
    return g.select(
        F.col(conv_col),
        F.size(F.col("turns")).alias("n_turns"),
        F.array_join(F.col("pieces"), sep).alias("text"),
        masked.alias("loss_spans"),
    )
