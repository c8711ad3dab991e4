"""Distributed lexical retrieval: inverted index + BM25 top-k search.

The reference has no retrieval operator (its similarity surface is vector
cosine/euclidean, /root/reference/src/datachain/func/array.py:15-90); this
is training-data-pipeline surface the build brief requires — corpus-scale
keyword search complements the ANN operators in operators/similarity.py
(find documents BY TERM at curation time: audit near-dup clusters, pull
contamination candidates, build eval slices).

Shape (all JVM codegen, zero per-row Python):
- build_text_index: ONE explode + hash-aggregate shuffle with map-side
  combine -> postings (term, doc_id, tf, dl). At 100 TB this is the one
  heavy job, run once and saved (save_text_index range-partitions by term
  and sorts within partitions, so parquet min/max stats prune query-time
  scans to the query's terms).
- bm25_topk / bm25_search: query-time cost is O(postings of the query's
  terms), never O(corpus): the term filter is pushed into the scan,
  per-term document frequencies are an aggregate over those postings
  only, the O(|query|) idf table is broadcast back onto them, and the
  final per-doc sum + TakeOrderedAndProject never full-sorts.

Scoring is textbook BM25 (Robertson/Sparck Jones idf in Lucene's
non-negative ln(1 + (N-df+0.5)/(df+0.5)) form). Repeated query terms
count once (standard bag-of-distinct-terms query model). All arithmetic
is plain double ops that DuckDB reproduces bit-for-bit, so the driver
oracle verifies scores value-for-value (rounded to 6 before the top-k
tie-break on doc id, making the result set order-deterministic in both
engines).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datachain_spark.operators.text import word_tokens

# must stay in lockstep with word_tokens (operators/text.py) — applied to
# LOWERED text, so the letter class needs only a-z
_TOKEN_RE = re.compile(r"[a-z]+|[0-9]+|[^a-z0-9\s]")


def tokenize_query(query: str) -> list[str]:
    """Query-side tokenization, identical to the document side (lowered
    word_tokens regex), distinct terms in first-seen order."""
    return list(dict.fromkeys(_TOKEN_RE.findall(query.lower())))


def build_text_index(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Inverted index postings: (term, doc_id, tf, dl). dl is the
    document's total token count (the BM25 length normalizer), constant
    per doc so it rides the aggregation key for free. ONE shuffle with
    map-side combine; term cardinality is vocabulary-sized, so the reduce
    side never skews on corpus size."""
    toks = word_tokens(F.lower(F.col(text_col)))
    return (
        df.select(F.col(id_col).alias("doc_id"), toks.alias("_toks"))
        .withColumn("dl", F.size("_toks"))
        .select("doc_id", "dl", F.explode("_toks").alias("term"))
        .groupBy("term", "doc_id", "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def save_text_index(postings: DataFrame, path: str, num_partitions: int | None = None) -> None:
    """Persist the index laid out for query-time pruning: range-partitioned
    and sorted by term, so every parquet row group's min/max term stats are
    tight and a `term IN (...)` search scan skips all but the query's row
    groups. (partitionBy(term) would mint one directory per vocabulary
    entry — millions of dirs — so range partitioning + footer stats is the
    scalable layout.)"""
    out = postings
    if num_partitions:
        out = out.repartitionByRange(num_partitions, "term")
    else:
        out = out.repartitionByRange("term")
    out.sortWithinPartitions("term").write.mode("overwrite").parquet(path)


def load_text_index(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def corpus_norms(df: DataFrame, text_col: str = "text") -> tuple[int, float]:
    """(N, avgdl) — two scalars from one partially-aggregated pass
    (bounded driver metadata, like the k-means centroids)."""
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.size(word_tokens(F.lower(F.col(text_col))))).alias("avgdl"),
    ).collect()[0]
    return int(row["n"]), float(row["avgdl"])


def bm25_search(
    postings: DataFrame,
    n_docs: int,
    avgdl: float,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Score the query against a postings index -> top-k (doc_id, score,
    n_terms) by (score desc, doc_id asc). Touches only the query terms'
    postings: filter (pushed into the scan on a saved index) -> per-term
    df aggregate (O(|q|) rows) broadcast back -> per-doc sum ->
    TakeOrderedAndProject."""
    terms = tokenize_query(query)
    if not terms:
        raise ValueError("query has no tokens")
    hits = postings.filter(F.col("term").isin(terms))
    dfreq = hits.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf = F.col("tf").cast("double")
    tfn = (tf * F.lit(k1 + 1.0)) / (
        tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl))
    )
    scored = (
        hits.join(F.broadcast(dfreq.withColumn("_idf", idf).select("term", "_idf")), "term")
        .groupBy("doc_id")
        .agg(
            F.round(F.sum(F.col("_idf") * tfn), 6).alias("score"),
            F.count(F.lit(1)).alias("n_terms"),
        )
    )
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def bm25_topk(
    df: DataFrame,
    query: str,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Convenience one-shot: index + norms + search over a DataFrame.
    Scans the text twice (norms pass + index pass) — fine ad hoc; for
    repeated queries build the index once with build_text_index /
    save_text_index and call bm25_search."""
    n_docs, avgdl = corpus_norms(df, text_col)
    postings = build_text_index(df, text_col, id_col)
    return bm25_search(postings, n_docs, avgdl, query, k=k, k1=k1, b=b)
