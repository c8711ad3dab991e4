"""Text analysis for large-scale training-data pipelines.

All hot-path expressions are built-in pyspark.sql.functions (JVM-side,
whole-stage-codegen'd) — no Python in the per-row path. These extend the
reference's scalar string functions (/root/reference/src/datachain/func/
string.py) with the document-pipeline operations a 100 TB corpus needs:
token counting, quality scoring, language ID, fingerprinting.

Each operator keeps its expressions DuckDB-expressible where possible so
the driver's SQL oracle can verify it value-for-value.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny built-in stopword lists for the n-gram/stopword language heuristic.
EN_STOPWORDS = ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"]
ES_STOPWORDS = ["el", "la", "de", "que", "y", "en", "un", "es", "se", "no"]


def token_count(text: Column) -> Column:
    """Whitespace tokenization — size(split(trim(x), '\\s+'))."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def word_tokens(text: Column) -> Column:
    """BPE-ish regex tokenization: words, numbers, or single punctuation."""
    return F.regexp_extract_all(text, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality signals per document
    (the classic pre-training quality filters), all JVM-side."""
    t = F.col(text_col)
    n_tok = token_count(t)
    toks = F.split(F.trim(F.lower(t)), r"\s+")
    stop_hits = F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in EN_STOPWORDS])))
    punct = F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    return df.withColumns(
        {
            "n_chars_m": F.length(t),
            "n_tokens": n_tok,
            "avg_token_len": (F.length(F.regexp_replace(t, r"\s+", "")) / F.greatest(n_tok, F.lit(1))),
            "punct_ratio": punct / F.greatest(F.length(t), F.lit(1)),
            "distinct_stopwords": stop_hits,
        }
    )


def lang_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Stopword-vote language heuristic: count distinct EN vs ES stopwords
    among the document's tokens; ties/empty → 'und'."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    en = F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in EN_STOPWORDS])))
    es = F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in ES_STOPWORDS])))
    return df.withColumn(
        out_col,
        F.when(en > es, F.lit("en")).when(es > en, F.lit("es")).otherwise(F.lit("und")),
    )


def fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "fp") -> DataFrame:
    """Document fingerprint: md5 of the whitespace-normalized, lowercased
    text — the exact-dedup key. md5 (not xxhash64) so DuckDB can replicate
    it for the oracle; both are JVM builtins."""
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    return df.withColumn(out_col, F.md5(norm))


# PII patterns chosen to behave identically under Java regex (Spark) and
# RE2 (DuckDB): simple character classes + \b boundaries, no backtracking
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("phone", r"\+\d{7,15}\b", "[PHONE]"),
]


def scrub_pii(df: DataFrame, text_col: str = "text", out_col: str | None = None) -> DataFrame:
    """Training-data PII scrubbing: replace emails, IPv4 addresses, and
    international phone numbers with redaction tokens — pure codegen
    regexp_replace chain, no Python. The pattern set is deliberately
    conservative (high precision); extend PII_PATTERNS for domain rules.
    The reference has no PII operator; this is training-data-pipeline
    surface the build brief requires."""
    out = F.col(text_col)
    for _, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return df.withColumn(out_col or text_col, out)


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    min_shared: int = 1,
    mark_only: bool = False,
) -> DataFrame:
    """Test-set decontamination: drop (or mark) corpus documents sharing
    >= `min_shared` distinct word n-gram shingles with ANY benchmark
    document — the standard 13-gram overlap rule of large-LM data
    curation. Shape: inverted-index equi-join on the shingle; the
    benchmark side (a test set — small by nature) is broadcast, so the
    corpus is never shuffled and the scan streams map-side at any corpus
    size. mark_only=True returns the corpus + (contaminated, n_shared)
    instead of filtering."""
    from datachain_spark.operators.dedup import shingles

    c = corpus.select(
        F.col(id_col).alias("__cid"), F.explode(shingles(F.col(text_col), n)).alias("g")
    )
    b = benchmark.select(F.explode(shingles(F.col(text_col), n)).alias("g")).distinct()
    hits = (
        c.join(F.broadcast(b), "g")
        .groupBy("__cid")
        .agg(F.count_distinct("g").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    if mark_only:
        out = corpus.join(
            hits.withColumnRenamed("__cid", id_col), id_col, "left"
        )
        return out.withColumn("contaminated", F.col("n_shared").isNotNull()).withColumn(
            "n_shared", F.coalesce(F.col("n_shared"), F.lit(0))
        )
    return corpus.join(hits.withColumnRenamed("__cid", id_col), id_col, "left_anti")
