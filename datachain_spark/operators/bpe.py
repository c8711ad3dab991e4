"""Distributed BPE tokenizer training — byte-pair-encoding merges learned
from a corpus (Sennrich, Haddow & Birch 2016, "Neural Machine Translation
of Rare Words with Subword Units", ACL — public algorithm; the counting
recipe follows the paper's reference `get_stats`/`merge_vocab`).

The reference has no tokenizer-training surface (its nearest is scalar
string funcs, /root/reference/src/datachain/func/string.py); training a
subword vocabulary over the corpus is a standard stage of a large-scale
training-data pipeline, so it is implemented here Spark-first:

- The corpus is touched ONCE: one explode -> hash-agg shuffle builds the
  (word, freq) vocabulary. Every subsequent merge step runs on the VOCAB
  table — at 100 TB corpus scale the distinct-word vocabulary is orders of
  magnitude smaller than the corpus, and it SHRINKS as merges apply.
- Each merge step is one vocab-sized aggregation (adjacent-pair counts,
  partial-combined map-side) plus an O(1) driver collect of the argmax
  pair — the classic iterative-algorithm shape (compare the k-means loop,
  operators/similarity.py): per-step driver state is one (left, right)
  pair, never data.
- The merge application is a whole-stage-codegen fold (F.aggregate) —
  greedy left-to-right, exactly Sennrich's merge semantics — zero Python
  in the vocab path. Plan-depth is truncated by persisting each step's
  vocab and unpersisting the previous one.
- Pair counting counts EVERY adjacent occurrence including overlaps
  ('aaaa' contributes 3 occurrences of (a,a)), matching the paper's
  get_stats; the merge then applies greedily left-to-right ('aaaa' ->
  ['aa','aa']). Ties break deterministically by (count desc, left asc,
  right asc) so the merge sequence is identical at any parallelism and
  re-derivable by the DuckDB oracle.
- bpe_encode applies a learned merge table to text as an Arrow-batched
  pandas UDF (the merge table is a broadcast-sized plain dict; encoding is
  inherently per-word sequential, so the vectorized-batch Python path is
  the honest one — same contract as the reference's Mapper UDFs).
"""

from __future__ import annotations

from typing import Any

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["fit_bpe", "bpe_encode", "merge_pair_expr", "merge_pair_py"]


def _adjacent_pairs(syms: Column) -> Column:
    """struct(l, r) array of ALL adjacent symbol pairs (with duplicates —
    get_stats counts every occurrence, overlaps included). `syms` must be
    a materialized column attribute, not a computed expression: a captured
    outer expression inside a higher-order-function lambda re-evaluates
    per element (see dedup.sliding_ngrams)."""
    k = F.size(syms) - 1
    pairs = F.zip_with(
        F.slice(syms, 1, k),
        F.slice(syms, 2, k),
        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
    )
    empty = F.array().cast("array<struct<l:string,r:string>>")
    # sequence/slice guard: size-1 words have no pairs (slice(_, _, 0) is
    # fine but keep the shape explicit and null-safe)
    return F.when(k >= 1, pairs).otherwise(empty)


def merge_pair_expr(syms: Column, left: str, right: str) -> Column:
    """Greedy left-to-right merge of adjacent (left, right) symbols into
    one `left+right` symbol — Sennrich's merge_vocab as a whole-stage-
    codegen F.aggregate fold over positions. 'aaaa' with ('a','a') ->
    ['aa','aa'] (a consumed position cannot start a second merge). O(n^2)
    array-append per word is fine: n is a word's symbol count (tiny) and
    this runs on the vocab table, not the corpus."""
    n = F.size(syms)
    init = F.struct(
        F.array().cast("array<string>").alias("out"), F.lit(False).alias("skip")
    )

    def step(acc: Column, i: Column) -> Column:
        cur = F.element_at(syms, i)
        # try_: plain element_at THROWS out-of-bounds under ANSI mode
        nxt = F.try_element_at(syms, i + 1)  # NULL at the last position
        do_merge = (cur == F.lit(left)) & (nxt == F.lit(right))  # NULL-safe: NULL falls through
        return (
            F.when(
                acc["skip"],
                F.struct(acc["out"].alias("out"), F.lit(False).alias("skip")),
            )
            .when(
                do_merge,
                F.struct(
                    F.concat(acc["out"], F.array(F.lit(left + right))).alias("out"),
                    F.lit(True).alias("skip"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(acc["out"], F.array(cur)).alias("out"),
                    F.lit(False).alias("skip"),
                )
            )
        )

    return F.aggregate(F.sequence(F.lit(1), n), init, step, lambda acc: acc["out"])


def merge_pair_py(syms: list[str], left: str, right: str) -> list[str]:
    """Pure-Python twin of merge_pair_expr (test reference + encode path)."""
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def word_vocab(
    docs: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """(w, freq, syms) vocabulary — the single corpus-scale pass: one
    explode -> hash-agg shuffle (partial-combined), then a char split on
    the already-aggregated distinct words."""
    t = F.col(text_col)
    if lowercase:
        t = F.lower(t)
    words = docs.select(F.explode(F.split(F.trim(t), r"\s+")).alias("w")).filter(
        F.length("w") > 0
    )
    vocab = words.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    return vocab.withColumn("syms", F.split(F.col("w"), "")).drop("w")


def fit_bpe(
    docs: DataFrame,
    num_merges: int,
    text_col: str = "text",
    lowercase: bool = True,
) -> list[dict[str, Any]]:
    """Learn `num_merges` BPE merges from the corpus. Returns the ordered
    merge table [{step, left_sym, right_sym, pair_count}, ...] — O(K)
    driver metadata. Stops early when no adjacent pair remains."""
    if num_merges < 1:
        raise ValueError("num_merges must be >= 1")
    cur = word_vocab(docs, text_col=text_col, lowercase=lowercase).persist()
    merges: list[dict[str, Any]] = []
    try:
        for step_i in range(1, num_merges + 1):
            top = (
                cur.select(F.explode(_adjacent_pairs(F.col("syms"))).alias("p"), "freq")
                .groupBy("p.l", "p.r")
                .agg(F.sum("freq").alias("c"))
                .orderBy(F.col("c").desc(), "l", "r")
                .limit(1)
                .collect()
            )
            if not top:
                break  # every word fully merged
            left, right, c = top[0]["l"], top[0]["r"], int(top[0]["c"])
            merges.append(
                {
                    "step": step_i,
                    "left_sym": left,
                    "right_sym": right,
                    "pair_count": c,
                }
            )
            nxt = cur.withColumn(
                "syms", merge_pair_expr(F.col("syms"), left, right)
            ).persist()
            nxt.count()  # materialize before dropping the parent (lineage cut)
            cur.unpersist()
            cur = nxt
    finally:
        cur.unpersist()
    return merges


def bpe_encode(
    df: DataFrame,
    merges: list[dict[str, Any]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    lowercase: bool = True,
) -> DataFrame:
    """Tokenize text with a learned merge table: whitespace-split words,
    then apply merges lowest-rank-first per word (the standard BPE apply).
    Arrow-batched pandas UDF; the rank dict is closure-captured (O(K),
    broadcast-sized)."""
    ranks = {(m["left_sym"], m["right_sym"]): i for i, m in enumerate(merges)}

    def encode_word(w: str) -> list[str]:
        syms = list(w)
        while len(syms) >= 2:
            best_rank, best_pair = None, None
            for a, b in zip(syms, syms[1:]):
                r = ranks.get((a, b))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_pair = r, (a, b)
            if best_pair is None:
                break
            syms = merge_pair_py(syms, *best_pair)
        return syms

    @F.pandas_udf("array<string>")
    def enc(s: pd.Series) -> pd.Series:
        def doc(text: str | None) -> list[str]:
            if text is None:
                return []
            t = text.strip().lower() if lowercase else text.strip()
            out: list[str] = []
            for w in t.split():
                out.extend(encode_word(w))
            return out

        return s.map(doc)

    return df.withColumn(out_col, enc(F.col(text_col)))
