"""operators/lm: stupid-backoff bigram LM fit + CCNet-style perplexity
scoring (see the module docstring for the 100 TB shape: two hash-agg fit
passes, broadcast-join scoring, one doc-keyed agg)."""

from __future__ import annotations

import math
import os

from pyspark.sql import functions as F

from datachain_spark.operators.lm import (
    BigramLM,
    fit_bigram_lm,
    lm_logprob,
    perplexity_filter,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def _ref(spark):
    return spark.createDataFrame(
        [("r1", "a b a b"), ("r2", "a c")], ["doc_id", "text"]
    )


def test_lm_fit_counts(spark):
    lm = fit_bigram_lm(_ref(spark))
    assert sorted((r.w, r.c) for r in lm.uni.collect()) == [
        ("a", 3), ("b", 2), ("c", 1),
    ]
    assert sorted((r.bg, r.c) for r in lm.bi.collect()) == [
        ("a b", 2), ("a c", 1), ("b a", 1),
    ]
    assert (lm.total, lm.vocab) == (6.0, 3.0)
    lm.unpersist()


def test_lm_logprob_hand_checked(spark):
    """All three scoring branches against closed-form arithmetic:
    first-token smoothed unigram, seen bigram, alpha-backoff."""
    lm = fit_bigram_lm(_ref(spark))
    docs = spark.createDataFrame(
        [("d1", "a b"), ("d2", "z"), ("d3", "a c b")], ["doc_id", "text"]
    )
    out = {r.doc_id: r.lm_logprob for r in lm_logprob(docs, lm).collect()}
    T, V, alpha = 6.0, 3.0, 0.4
    assert out == {
        # "a b": ln((c(a)+1)/(T+V)) + ln(c('a b')/c(a)), over 2 tokens
        "d1": round((math.log(4 / 9) + math.log(2 / 3)) / 2, 6),
        # OOV single token: ln((0+1)/(T+V))
        "d2": round(math.log(1 / 9), 6),
        # 'c b' unseen -> backoff ln(alpha*(c(b)+1)/(T+V))
        "d3": round(
            (math.log(4 / 9) + math.log(1 / 3) + math.log(alpha * 3 / 9)) / 3, 6
        ),
    }
    lm.unpersist()


def test_lm_empty_doc_excluded_in_domain_ranks_higher(spark):
    lm = fit_bigram_lm(_ref(spark))
    docs = spark.createDataFrame(
        [("in", "a b a b"), ("out", "x y z w"), ("empty", "")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.lm_logprob for r in lm_logprob(docs, lm).collect()}
    assert set(out) == {"in", "out"}  # zero-token docs carry no evidence
    assert out["in"] > out["out"]
    lm.unpersist()


def test_lm_min_count_prunes_to_backoff(spark):
    """A pruned bigram must score exactly like an unseen one, and unigram
    denominators must not shift under pruning."""
    lm_full = fit_bigram_lm(_ref(spark))
    lm_pruned = fit_bigram_lm(_ref(spark), min_count=2)
    assert sorted(r.bg for r in lm_pruned.bi.collect()) == ["a b"]
    assert (lm_pruned.total, lm_pruned.vocab) == (lm_full.total, lm_full.vocab)
    docs = spark.createDataFrame([("d", "a c")], ["doc_id", "text"])
    got = lm_logprob(docs, lm_pruned).collect()[0].lm_logprob
    # 'a c' pruned away -> backoff ln(0.4*(c(c)+1)/9); first token unchanged
    want = round((math.log(4 / 9) + math.log(0.4 * 2 / 9)) / 2, 6)
    assert got == want
    lm_full.unpersist()
    lm_pruned.unpersist()


def test_lm_partition_invariant(spark):
    """Scores are a pure function of the text — identical at any
    parallelism/partitioning (the scale property)."""
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    lm = fit_bigram_lm(docs.filter(F.col("lang") == "en"))
    a = {r.doc_id: r.lm_logprob for r in lm_logprob(docs, lm).collect()}
    b = {
        r.doc_id: r.lm_logprob
        for r in lm_logprob(docs.repartition(13), lm).collect()
    }
    assert a == b and len(a) > 0
    lm.unpersist()


def test_perplexity_filter_threshold(spark):
    lm = fit_bigram_lm(_ref(spark))
    docs = spark.createDataFrame(
        [("good", "a b a b"), ("bad", "q r s t u v")], ["doc_id", "text"]
    )
    scores = {r.doc_id: r.lm_logprob for r in lm_logprob(docs, lm).collect()}
    cut = (scores["good"] + scores["bad"]) / 2
    kept = sorted(r.doc_id for r in perplexity_filter(docs, lm, cut).collect())
    assert kept == ["good"]
    assert set(perplexity_filter(docs, lm, cut).columns) == set(docs.columns)
    lm.unpersist()


def test_lm_scoring_plan_broadcasts_and_single_agg_shuffle(spark):
    """Plan audit: the three LM joins are broadcasts (never shuffle the
    exploded corpus on gram keys) and the only exchange feeding the final
    agg is the doc-keyed one."""
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    lm = fit_bigram_lm(docs.filter(F.col("lang") == "en"))
    plan = lm_logprob(docs, lm)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in plan
    lm.unpersist()


def test_ccnet_buckets_thirds_and_ordering(spark):
    """Buckets partition the corpus into (near-)thirds and are monotone:
    every head score >= every middle score >= every tail score."""
    from datachain_spark.operators.lm import ccnet_buckets

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    lm = fit_bigram_lm(docs.filter(F.col("lang") == "en"))
    b = ccnet_buckets(docs, lm)
    rows = [(r.lm_bucket, r.lm_logprob) for r in b.collect()]
    n = len(rows)
    by = {}
    for k, v in rows:
        by.setdefault(k, []).append(v)
    assert set(by) == {"head", "middle", "tail"}
    # exact percentile cuts put ~n/3 in each bucket (ties can shift a few)
    for k in by:
        assert abs(len(by[k]) - n / 3) <= max(2, 0.02 * n), (k, len(by[k]), n)
    assert min(by["head"]) >= max(by["middle"]) >= min(by["middle"])
    assert min(by["middle"]) >= max(by["tail"])
    lm.unpersist()


def test_ccnet_buckets_validates_fractions(spark):
    from datachain_spark.operators.lm import ccnet_buckets

    lm = fit_bigram_lm(_ref(spark))
    docs = spark.createDataFrame([("d", "a b")], ["doc_id", "text"])
    try:
        ccnet_buckets(docs, lm, head=0.9, tail=0.5)
        assert False, "expected ValueError"
    except ValueError:
        pass
    lm.unpersist()
