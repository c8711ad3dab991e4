"""operators/sampling: deterministic hash-threshold stratified sampling
and token-budget mixtures (see the module docstring for the 100 TB
argument — zero shuffle, parallelism-invariant row selection)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from datachain_spark.operators.sampling import (
    RESOLUTION,
    hash_bucket,
    mix_by_token_budget,
    mixture_thresholds,
    sample_per_group,
)
from datachain_spark.operators.text import token_count

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def _docs(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))


def test_sample_per_group_partition_invariant(spark):
    """THE scale property: the surviving row set is a pure function of the
    row id — identical under any partitioning/parallelism."""
    docs = _docs(spark)
    fr = {"en": 0.25, "es": 1.0, "de": 0.5}
    base = sorted(
        r.doc_id
        for r in sample_per_group(docs, "lang", fr, default_fraction=0.0).collect()
    )
    for parts in (1, 7, 32):
        got = sorted(
            r.doc_id
            for r in sample_per_group(
                docs.repartition(parts), "lang", fr, default_fraction=0.0
            ).collect()
        )
        assert got == base
    assert base  # non-degenerate


def test_sample_per_group_fractions_and_default(spark):
    docs = _docs(spark)
    out = sample_per_group(docs, "lang", {"en": 1.0}, default_fraction=0.0)
    langs = {r.lang for r in out.select("lang").distinct().collect()}
    assert langs == {"en"}
    n_en = docs.filter(F.col("lang") == "en").count()
    assert out.count() == n_en  # frac 1.0 keeps every row
    # scalar fraction applies to every group; keep-rate near the target
    half = sample_per_group(docs, "lang", 0.5)
    total = docs.count()
    assert abs(half.count() / total - 0.5) < 0.15


def test_sample_per_group_zero_shuffle_plan(spark):
    """The sampler must stay a map-side codegen filter: no Exchange, no
    Python eval in the plan."""
    docs = _docs(spark)
    plan = (
        sample_per_group(docs, "lang", {"en": 0.25}, default_fraction=0.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_hash_bucket_range_and_determinism(spark):
    docs = _docs(spark).select("doc_id", hash_bucket(F.col("doc_id")).alias("b"))
    stats = docs.agg(
        F.min("b").alias("lo"), F.max("b").alias("hi"), F.count("*").alias("n")
    ).collect()[0]
    assert 0 <= stats.lo and stats.hi < RESOLUTION
    again = _docs(spark).select(hash_bucket(F.col("doc_id")).alias("b"))
    assert docs.select("b").exceptAll(again).count() == 0


def test_mixture_thresholds_budget_and_caps():
    gt = {"a": 1000, "b": 1000, "c": 1000}
    th = mixture_thresholds(gt, {"a": 1.0, "b": 1.0}, token_budget=500)
    # each weighted group targets 250 of its 1000 tokens -> thresh 250000
    assert th == {"a": 250_000, "b": 250_000, "c": 0}
    # budget larger than the group: capped at keep-everything
    th = mixture_thresholds({"a": 10}, {"a": 1.0}, token_budget=10_000)
    assert th == {"a": RESOLUTION}
    # zero/absent weight and empty group -> 0
    assert mixture_thresholds({"a": 0}, {"a": 1.0}, 100) == {"a": 0}


def test_mix_by_token_budget_token_mass(spark):
    """The sampled corpus's per-group token mass lands near budget*w/Sum_w
    (Bernoulli expectation), and unweighted groups vanish."""
    docs = _docs(spark)
    out = mix_by_token_budget(
        docs, weights={"src0": 1.0, "src1": 1.0}, token_budget=600
    )
    got = {
        r.source: r.toks
        for r in out.groupBy("source")
        .agg(F.sum(token_count(F.col("text"))).alias("toks"))
        .collect()
    }
    assert set(got) <= {"src0", "src1"}
    for src, toks in got.items():
        assert toks <= 650  # near the 300-per-group target, never wildly over
    total = sum(got.values())
    assert 100 <= total <= 700  # expectation 600, small-sample noise allowed


# ---------------------------------------------------------------------------
# DSIR importance resampling
# ---------------------------------------------------------------------------


def test_dsir_enriches_target_distribution(spark):
    """Selecting with an 'es' target must raise the es share well above
    its corpus base rate (the whole point of DSIR)."""
    from datachain_spark.operators.sampling import dsir_select

    docs = _docs(spark)
    target = docs.filter(F.col("lang") == "es")
    n = docs.count()
    base = docs.filter(F.col("lang") == "es").count() / n
    sel = dsir_select(docs, target, 20, n_buckets=64)
    got = sel.filter(F.col("lang") == "es").count() / 20
    assert got > 2 * base, (got, base)


def test_dsir_deterministic_under_repartition(spark):
    """Scoring is a pure function of the text — same selection at any
    parallelism."""
    from datachain_spark.operators.sampling import dsir_select

    docs = _docs(spark)
    target = docs.filter(F.col("lang") == "es")
    a = [(r["doc_id"], r["dsir_score"]) for r in dsir_select(docs, target, 15, n_buckets=64).collect()]
    b = [
        (r["doc_id"], r["dsir_score"])
        for r in dsir_select(docs.repartition(13), target, 15, n_buckets=64).collect()
    ]
    assert a == b


def test_dsir_scoring_plan_shape(spark):
    """The scoring job is codegen explode + ONE doc-keyed hash aggregate
    (map-side partial combine: only one row per doc per partition crosses
    the exchange, never the grams), TakeOrderedAndProject for the top-n
    (id, score) pairs, and a BROADCAST join attaching the n_keep winners
    back to the raw table — the raw rows are never shuffled. No Python
    boundary and no interpreted higher-order fold (the pre-r6 F.aggregate
    scoring was CodegenFallback) anywhere in the plan."""
    from datachain_spark.operators.sampling import dsir_select

    docs = _docs(spark)
    target = docs.filter(F.col("lang") == "es")
    out = dsir_select(docs, target, 10, n_buckets=32)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    assert "aggregate(" not in plan, plan  # no interpreted HOF fold
    # exactly one shuffle: the bounded per-doc partial-aggregate exchange
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_dsir_empty_docs_excluded_and_score_hand_checked(spark):
    """A doc with no tokens is excluded; a one-gram doc's score equals its
    single bucket's log ratio computed by hand."""
    import math as m

    from datachain_spark.operators.sampling import (
        dsir_bucket_counts,
        dsir_select,
    )

    # 'alpha' and 'delta' land in distinct md5 buckets at B=8 (3 vs 1)
    rows = [(1, "alpha"), (2, ""), (3, "alpha"), (4, "delta")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    target = df.filter(F.col("doc_id") == 1)  # target = {alpha}
    out = {r["doc_id"]: r["dsir_score"] for r in dsir_select(df, target, 10, n_buckets=8).collect()}
    assert 2 not in out  # empty doc carries no evidence
    t_counts, t_total = dsir_bucket_counts(target, "text", 8)
    r_counts, r_total = dsir_bucket_counts(df, "text", 8)
    (alpha_bucket,) = t_counts  # target has exactly one occupied bucket
    lam = m.log((t_counts[alpha_bucket] + 1.0) / (t_total + 8.0)) - m.log(
        (r_counts[alpha_bucket] + 1.0) / (r_total + 8.0)
    )
    assert abs(out[1] - round(lam, 6)) < 1e-9
    assert out[1] == out[3] > out[4]
