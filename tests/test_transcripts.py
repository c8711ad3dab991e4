"""render_conversations (operators/transcripts.py): transcript rows ->
role-tagged rendered text + loss-mask character spans."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from datachain_spark.operators.transcripts import render_conversations

SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")


def _conv(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id: string, turn_idx: int, role: string, text: string"
    )


def test_render_closed_form(spark):
    df = _conv(
        spark,
        [
            ("c1", 0, "user", "hi"),
            ("c1", 1, "assistant", "hello!"),
            ("c1", 2, "user", "bye"),
            ("c1", 3, "assistant", "ok"),
        ],
    )
    r = render_conversations(df).collect()[0]
    expect = "<|user|>hi\n<|assistant|>hello!\n<|user|>bye\n<|assistant|>ok"
    assert r["text"] == expect
    assert r["n_turns"] == 4
    spans = [(s["s"], s["e"]) for s in r["loss_spans"]]
    # check against python: spans cover exactly the assistant texts
    for (s, e), want in zip(spans, ["hello!", "ok"]):
        assert expect[s:e] == want
    assert len(spans) == 2


def test_render_null_text_and_order(spark):
    # out-of-order input rows; NULL text renders '' with an empty span
    df = _conv(
        spark,
        [
            ("c1", 1, "assistant", None),
            ("c1", 0, "user", "q"),
        ],
    )
    r = render_conversations(df).collect()[0]
    assert r["text"] == "<|user|>q\n<|assistant|>"
    (s, e) = (r["loss_spans"][0]["s"], r["loss_spans"][0]["e"])
    assert s == e == len(r["text"])


def test_render_mask_roles_variants(spark):
    df = _conv(
        spark,
        [("c1", 0, "user", "a"), ("c1", 1, "tool", "b"), ("c1", 2, "assistant", "c")],
    )
    both = render_conversations(df, mask_roles=("assistant", "tool")).collect()[0]
    assert len(both["loss_spans"]) == 2
    none = render_conversations(df, mask_roles=()).collect()[0]
    assert none["loss_spans"] == []
    with pytest.raises(ValueError):
        render_conversations(df, sep="")


def test_render_spans_cover_masked_turns_property(spark):
    """On real data: every span substring equals the turn's text."""
    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet")).filter(
        F.col("user_id") < 20
    )
    df = ev.select(
        F.col("user_id").cast("string").alias("conv_id"),
        F.col("event_id").cast("int").alias("turn_idx"),
        F.col("event_type").alias("role"),
        F.col("props").alias("text"),
    )
    out = render_conversations(df, mask_roles=("click",)).collect()
    src = {
        (r["conv_id"], r["turn_idx"]): r["text"] or ""
        for r in df.collect()
    }
    per_conv = {}
    for (c, t), txt in sorted(src.items()):
        per_conv.setdefault(c, []).append((t, txt))
    roles = {(x["conv_id"], x["turn_idx"]): x["role"] for x in df.collect()}
    assert out
    # spans must map back to exactly the 'click' turns' texts, in order
    for r in out:
        texts = [
            src[(r["conv_id"], t)]
            for (t, _) in per_conv[r["conv_id"]]
            if roles[(r["conv_id"], t)] == "click"
        ]
        got = [r["text"][s["s"] : s["e"]] for s in r["loss_spans"]]
        assert got == texts, r["conv_id"]


def test_render_partition_invariance(spark):
    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet")).filter(
        F.col("user_id") < 10
    )
    df = ev.select(
        F.col("user_id").cast("string").alias("conv_id"),
        F.col("event_id").cast("int").alias("turn_idx"),
        F.col("event_type").alias("role"),
        F.col("props").alias("text"),
    )
    a = {
        r["conv_id"]: (r["text"], [(s["s"], s["e"]) for s in r["loss_spans"]])
        for r in render_conversations(df.repartition(1), mask_roles=("view",)).collect()
    }
    b = {
        r["conv_id"]: (r["text"], [(s["s"], s["e"]) for s in r["loss_spans"]])
        for r in render_conversations(df.repartition(16), mask_roles=("view",)).collect()
    }
    assert a == b


def test_conversation_stats_closed_form(spark):
    from datachain_spark.operators.transcripts import conversation_stats

    df = _conv(
        spark,
        [
            # c1: alternating, one empty turn
            ("c1", 0, "user", "hi"),
            ("c1", 1, "assistant", "   "),
            ("c1", 2, "user", "bye!"),
            # c2: consecutive same-role turns
            ("c2", 0, "user", "a"),
            ("c2", 1, "user", "b"),
            # c3: single turn (vacuously alternating)
            ("c3", 0, "system", None),
        ],
    )
    out = {r["conv_id"]: r for r in conversation_stats(df).collect()}
    c1 = out["c1"]
    assert (c1["n_turns"], c1["distinct_roles"], c1["starts_role"]) == (3, 2, "user")
    assert c1["role_alternates"] is True
    assert c1["empty_turn_frac"] == round(1 / 3, 6)
    assert c1["mean_turn_chars"] == round((2 + 3 + 4) / 3, 6)
    assert out["c2"]["role_alternates"] is False
    c3 = out["c3"]
    assert c3["role_alternates"] is True and c3["empty_turn_frac"] == 1.0
    assert c3["mean_turn_chars"] == 0.0


def test_conversation_stats_partition_invariance(spark):
    from datachain_spark.operators.transcripts import conversation_stats

    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet")).filter(
        F.col("user_id") < 15
    )
    df = ev.select(
        F.col("user_id").cast("string").alias("conv_id"),
        F.col("event_id").cast("int").alias("turn_idx"),
        F.col("event_type").alias("role"),
        F.col("props").alias("text"),
    )
    key = lambda r: tuple(r)  # noqa: E731
    a = sorted(map(key, conversation_stats(df.repartition(1)).collect()))
    b = sorted(map(key, conversation_stats(df.repartition(16)).collect()))
    assert a == b and a


def test_expand_examples_closed_form(spark):
    from datachain_spark.operators.transcripts import expand_sft_examples

    df = _conv(
        spark,
        [
            ("c1", 0, "user", "hi"),
            ("c1", 1, "assistant", "hello!"),
            ("c1", 2, "user", "bye"),
            ("c1", 3, "assistant", "ok"),
            ("c2", 0, "assistant", "first"),
        ],
    )
    out = expand_sft_examples(df).orderBy("conv_id", "example_idx").collect()
    assert [(r["conv_id"], r["example_idx"], r["turn_idx"], r["target"]) for r in out] == [
        ("c1", 1, 1, "hello!"),
        ("c1", 2, 3, "ok"),
        ("c2", 1, 0, "first"),
    ]
    assert out[0]["context"] == "<|user|>hi\n<|assistant|>"
    assert out[1]["context"] == "<|user|>hi\n<|assistant|>hello!\n<|user|>bye\n<|assistant|>"
    assert out[2]["context"] == "<|assistant|>"  # target turn opens the conv
    with pytest.raises(ValueError):
        expand_sft_examples(df, target_roles=())


def test_expand_examples_consistent_with_render(spark):
    """Cross-operator property on real data: example k's context equals
    the rendered conversation text up to loss span k's start, and its
    target is exactly text[s:e]."""
    from datachain_spark.operators.transcripts import (
        expand_sft_examples,
        render_conversations,
    )

    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet")).filter(
        F.col("user_id") < 15
    )
    df = ev.select(
        F.col("user_id").cast("string").alias("conv_id"),
        F.col("event_id").cast("int").alias("turn_idx"),
        F.col("event_type").alias("role"),
        F.col("props").alias("text"),
    )
    rend = {
        r["conv_id"]: (r["text"], [(s["s"], s["e"]) for s in r["loss_spans"]])
        for r in render_conversations(df, mask_roles=("view",)).collect()
    }
    ex = expand_sft_examples(df, target_roles=("view",)).collect()
    assert ex
    for r in ex:
        text, spans = rend[r["conv_id"]]
        s, e = spans[r["example_idx"] - 1]
        assert r["context"] == text[:s], (r["conv_id"], r["example_idx"])
        assert r["target"] == text[s:e]


def test_truncate_to_budget_closed_form(spark):
    from datachain_spark.operators.transcripts import truncate_to_budget

    df = _conv(
        spark,
        [
            # token counts: 2, 3, 1, 2 (whitespace words)
            ("c1", 0, "user", "a b"),
            ("c1", 1, "assistant", "c d e"),
            ("c1", 2, "user", "f"),
            ("c1", 3, "assistant", "g h"),
            # c2: single huge turn survives regardless
            ("c2", 0, "user", "x " * 50),
        ],
    )
    # budget 6: suffix sums from the end are 2, 3, 6, 9 -> keep last 3 turns
    kept = truncate_to_budget(df, 6).select("conv_id", "turn_idx").collect()
    got = sorted((r["conv_id"], r["turn_idx"]) for r in kept)
    assert got == [("c1", 1), ("c1", 2), ("c1", 3), ("c2", 0)]
    # budget 1: only the last turn of each conv (c1 turn 3 = 2 tokens > 1,
    # but the last turn always survives)
    kept1 = truncate_to_budget(df, 1).select("conv_id", "turn_idx").collect()
    assert sorted((r["conv_id"], r["turn_idx"]) for r in kept1) == [
        ("c1", 3),
        ("c2", 0),
    ]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        truncate_to_budget(df, 0)


def test_truncate_to_budget_tokens_col_and_compose(spark):
    from datachain_spark.operators.transcripts import (
        render_conversations,
        truncate_to_budget,
    )

    df = _conv(
        spark,
        [("c1", 0, "user", "drop me"), ("c1", 1, "assistant", "keep")],
    ).withColumn("n_tok", F.lit(3))
    kept = truncate_to_budget(df, 3, tokens_col="n_tok")
    r = render_conversations(kept).collect()[0]
    assert r["text"] == "<|assistant|>keep"


def test_echo_overlap_closed_form(spark):
    from datachain_spark.operators.transcripts import echo_overlap

    df = spark.createDataFrame(
        [
            # full echo: every target 3-gram is in the context
            ("the quick brown fox jumps", "the quick brown fox", 1.0),
            # no overlap
            ("alpha beta gamma delta", "one two three four", 0.0),
            # partial: target 3-grams = {a b c, b c d, c d x}; context has
            # the first two -> 2/3
            ("z a b c d y", "a b c d x", round(2 / 3, 6)),
            # short target (< n words) scores 0
            ("whatever context", "hi", 0.0),
        ],
        "context: string, target: string, want: double",
    )
    rows = echo_overlap(df, n=3).collect()
    for r in rows:
        assert r["echo_frac"] == r["want"], (r["target"], r["echo_frac"], r["want"])


def test_echo_overlap_normalization_and_validation(spark):
    from datachain_spark.operators.transcripts import echo_overlap

    # case/whitespace-insensitive (shingles normalize like dedup)
    df = spark.createDataFrame(
        [("THE  Quick   Brown fox", "the quick brown")], "context: string, target: string"
    )
    assert echo_overlap(df, n=3).collect()[0]["echo_frac"] == 1.0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        echo_overlap(df, n=0)
