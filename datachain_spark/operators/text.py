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
