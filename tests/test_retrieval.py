"""operators/retrieval: inverted-index build + BM25 top-k search.

The reference has no lexical retrieval (its similarity surface is vector
distance only); these tests pin the BM25 semantics — tf saturation, idf
ordering, length normalization — plus the scale contract: search touches
only the query terms' postings and the term filter reaches the parquet
scan of a saved index."""

from __future__ import annotations

import math
import os

from pyspark.sql import functions as F

from datachain_spark.operators.retrieval import (
    bm25_search,
    bm25_topk,
    build_text_index,
    corpus_norms,
    load_text_index,
    save_text_index,
    tokenize_query,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def _corpus(spark):
    rows = [
        (1, "spark shuffle spark spark join"),
        (2, "spark join filter scan"),
        (3, "window window window aggregate sort"),
        (4, "scan filter sort merge table"),
        (5, "join join join join join join join join join join join join"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_tokenize_query_matches_doc_side():
    assert tokenize_query("Spark, WINDOW merge merge") == ["spark", ",", "window", "merge"]


def test_bm25_tf_and_idf_ordering(spark):
    """'spark' appears in 2/5 docs; doc 1 has tf=3 vs doc 2 tf=1 and is
    shorter than doc 5 — doc 1 must rank first for 'spark'."""
    out = bm25_topk(_corpus(spark), "spark", k=5).collect()
    assert [r["doc_id"] for r in out] == [1, 2]
    assert out[0]["score"] > out[1]["score"] > 0


def test_bm25_rare_term_outweighs_common(spark):
    """For a two-term query, the doc matching only the rarer term beats a
    doc matching only the more common one at equal tf (idf ordering)."""
    rows = [
        (1, "alpha beta beta beta"),
        (2, "gamma beta beta beta"),
        (3, "alpha other other other"),
        (4, "alpha words here too"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    # 'gamma' df=1 (rare), 'alpha' df=3 (common); docs 2 and 4 have tf=1
    # of exactly one query term each and equal length
    out = {r["doc_id"]: r["score"] for r in bm25_topk(df, "gamma alpha", k=4).collect()}
    assert out[2] > out[4]


def test_bm25_length_normalization(spark):
    """Same tf of the query term, longer doc scores lower (b > 0)."""
    rows = [
        (1, "needle one two"),
        (2, "needle one two three four five six seven eight nine ten"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r["score"] for r in bm25_topk(df, "needle", k=2).collect()}
    assert out[1] > out[2]


def test_bm25_score_matches_closed_form(spark):
    """Recompute doc 1's score for 'spark join' by hand from the BM25
    formula — the operator's arithmetic is the textbook one."""
    df = _corpus(spark)
    n_docs, avgdl = corpus_norms(df)
    out = {r["doc_id"]: r["score"] for r in bm25_topk(df, "spark join", k=5).collect()}

    def idf(dfreq):
        return math.log(1.0 + (n_docs - dfreq + 0.5) / (dfreq + 0.5))

    def tfn(tf, dl):
        return (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))

    expect = idf(2) * tfn(3, 5) + idf(3) * tfn(1, 5)  # spark df=2, join df=3
    assert abs(out[1] - round(expect, 6)) < 1e-9


def test_bm25_no_matching_terms_empty(spark):
    assert bm25_topk(_corpus(spark), "zzz qqq", k=3).count() == 0


def test_saved_index_search_equals_oneshot_and_prunes(spark, tmp_path):
    """bm25_search over a saved index returns the one-shot result, and the
    term predicate is pushed into the parquet scan (the 100 TB contract:
    query cost is the query terms' postings, not the corpus)."""
    df = _corpus(spark)
    path = str(tmp_path / "idx")
    save_text_index(build_text_index(df), path, num_partitions=2)
    postings = load_text_index(spark, path)
    n_docs, avgdl = corpus_norms(df)
    got = bm25_search(postings, n_docs, avgdl, "spark join", k=5)
    want = bm25_topk(df, "spark join", k=5)
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in want.collect()]
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [In(term" in plan, plan


def test_index_postings_shape(spark):
    """(term, doc_id) unique; tf counts occurrences; dl is the doc's total
    token count."""
    posts = build_text_index(_corpus(spark)).collect()
    key = [(r["term"], r["doc_id"]) for r in posts]
    assert len(key) == len(set(key))
    byk = {(r["term"], r["doc_id"]): (r["tf"], r["dl"]) for r in posts}
    assert byk[("spark", 1)] == (3, 5)
    assert byk[("join", 5)] == (12, 12)


def test_rrf_fuse_closed_form(spark):
    """Hand-checked RRF arithmetic, including a doc present in only one
    list and the (score desc, id asc) tie-break."""
    from datachain_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame([(10, 1), (20, 2), (30, 3)], ["doc_id", "rk"])
    b = spark.createDataFrame([(20, 1), (40, 2)], ["doc_id", "rk"])
    out = {r.doc_id: (r.rrf_score, r.n_lists) for r in rrf_fuse([a, b], k=10).collect()}
    assert out == {
        10: (round(1 / 61, 6), 1),
        20: (round(1 / 62 + 1 / 61, 6), 2),
        30: (round(1 / 63, 6), 1),
        40: (round(1 / 62, 6), 1),
    }
    # doc 20 (both lists) must outrank every single-list doc here
    ranked = [r.doc_id for r in rrf_fuse([a, b], k=10).collect()]
    assert ranked[0] == 20


def test_rrf_fuse_validates_empty(spark):
    from datachain_spark.operators.retrieval import rrf_fuse

    try:
        rrf_fuse([])
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_hybrid_search_fuses_both_signals(spark):
    """A doc ranked mid-list by BOTH signals beats docs that only one
    signal surfaces; component ranks are carried (NULL when absent)."""
    from datachain_spark.operators.retrieval import hybrid_search

    docs = spark.createDataFrame(
        [
            (1, "spark spark spark"),       # lexical-only hit
            (2, "spark window"),            # both: lexical + close vector
            (3, "nothing relevant here"),   # vector-only hit
            (4, "unrelated filler text"),
        ],
        ["doc_id", "text"],
    )
    emb = spark.createDataFrame(
        [
            (1, [0.0, 1.0]),
            (2, [0.9, 0.1]),
            (3, [1.0, 0.0]),
            (4, [-1.0, 0.0]),
        ],
        ["vec_id", "embedding"],
    )
    out = hybrid_search(docs, emb, "spark window", [1.0, 0.0], k=4, n_candidates=3)
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[2].n_lists == 2 and rows[2].bm25_rk is not None and rows[2].cos_rk is not None
    top = out.collect()[0]
    assert top.doc_id == 2
    # lexical-only doc 1: present in bm25 list, absent from cos top-3?
    # (cos top-3 of 4 docs excludes the worst: doc 4 at sim -1)
    assert rows[1].bm25_rk is not None
    assert rows[4].cos_rk is None if 4 in rows else True
