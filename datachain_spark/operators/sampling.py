"""Deterministic corpus sampling and data mixing.

Training-data pipelines need to *sample* and *re-weight* corpora — keep
25% of CommonCrawl, 100% of Wikipedia, cap the mixture at a token budget
(the classic Pile / LLaMA-style mixture table). At 100 TB the only
admissible sampler is one with ZERO shuffle: a per-group window
(row_number over partitionBy(source)) would funnel an entire multi-TB
source through a single task's sort. Instead every operator here is a
deterministic hash-threshold Bernoulli filter:

    keep row  ⇔  md5_60bit(id) mod RESOLUTION  <  threshold(group)

which is a pure map-side codegen predicate — no shuffle, no state, and
the SAME rows are selected on 1 executor or 1000, at sf0.001 or 100 TB
(the hash ignores partitioning entirely). The md5-derived 60-bit integer
is bit-identical in Spark and DuckDB, so the driver oracle verifies the
exact surviving row set, not just counts. Thresholds are INTEGERS in
[0, RESOLUTION] so no float threshold ever crosses an engine boundary.

Extends the reference's uniform `sample(n)` (reference
src/datachain/lib/dc/datachain.py sample(): ORDER BY random() LIMIT n)
with the per-group / budgeted forms a mixture pipeline needs; the
reference has no stratified or budgeted sampler.
"""

from __future__ import annotations

import math
from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datachain_spark.operators.text import token_count

#: Threshold resolution: fractions are quantized to 1/RESOLUTION steps —
#: quantization error (<1e-6) is far below sampling noise at any corpus
#: size, and an integer threshold compares exactly in every engine.
RESOLUTION = 1_000_000


def hash_bucket(id_col: Column, resolution: int = RESOLUTION) -> Column:
    """Deterministic uniform bucket in [0, resolution): md5-derived 60-bit
    integer mod resolution. Engine-portable (md5 is identical everywhere);
    DuckDB form: ``CAST(('0x'||substr(md5(CAST(id AS VARCHAR)),1,15)) AS
    BIGINT) % resolution``."""
    h60 = F.conv(F.substring(F.md5(id_col.cast("string")), 1, 15), 16, 10).cast("long")
    return F.pmod(h60, F.lit(int(resolution)))


def _threshold(frac: float) -> int:
    """Integer keep-threshold for a fraction. floor() (not round) so the
    quantization is direction-stable; exact for binary-representable
    fractions like 0.25/0.5/1.0."""
    return min(RESOLUTION, max(0, math.floor(float(frac) * RESOLUTION)))


def _thresh_expr(group_col: str, thresholds: Mapping[str, int], default: int) -> Column:
    entries: list[Column] = []
    for k, v in thresholds.items():
        entries += [F.lit(k), F.lit(int(v))]
    if not entries:
        return F.lit(int(default))
    return F.coalesce(
        F.element_at(F.create_map(*entries), F.col(group_col)), F.lit(int(default))
    )


def sample_per_group(
    df: DataFrame,
    group_col: str,
    fractions: Mapping[str, float] | float,
    id_col: str = "doc_id",
    default_fraction: float = 1.0,
) -> DataFrame:
    """Stratified deterministic sample: keep ~``fractions[group]`` of each
    group's rows (groups absent from the mapping keep ``default_fraction``).

    Zero shuffle: the per-group threshold rides a tiny literal map (O(G)
    driver constants, like the audited k-means-centroid pattern) and the
    keep/drop decision is a codegen predicate on a hash of the row id —
    WholeStageCodegen end to end, identical row set at any parallelism.
    """
    if isinstance(fractions, Mapping):
        thresholds = {k: _threshold(v) for k, v in fractions.items()}
    else:
        thresholds = {}
        default_fraction = float(fractions)
    thresh = _thresh_expr(group_col, thresholds, _threshold(default_fraction))
    return df.filter(hash_bucket(F.col(id_col)) < thresh)


def mixture_thresholds(
    group_tokens: Mapping[str, int],
    weights: Mapping[str, float],
    token_budget: int,
) -> dict[str, int]:
    """Integer keep-thresholds realizing a mixture: group g should
    contribute ``weights[g]/Σw`` of ``token_budget`` tokens, capped at its
    full size (can't upsample without repetition); unweighted groups get 0.
    Pure driver arithmetic over O(G) numbers. The float-op sequence
    (budget · (w/Σw) · RESOLUTION / tokens, then floor) is kept trivially
    reproducible in SQL so the oracle derives the identical integers."""
    total_w = float(sum(weights.values()))
    out: dict[str, int] = {}
    for g, toks in group_tokens.items():
        w = float(weights.get(g, 0.0))
        if w <= 0.0 or toks <= 0:
            out[g] = 0
            continue
        out[g] = min(
            RESOLUTION, int(math.floor(token_budget * (w / total_w) * RESOLUTION / toks))
        )
    return out


def mix_by_token_budget(
    df: DataFrame,
    weights: Mapping[str, float],
    token_budget: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Down-sample a corpus to a token budget with per-group mixture
    weights (the LLaMA/Pile mixture table as an operator).

    Two phases, both 100 TB-safe:
      1. per-group token totals — ONE partially-combined aggregation whose
         result is O(groups) rows collected as bounded metadata;
      2. the zero-shuffle hash-threshold filter of sample_per_group.

    The expected token contribution of group g is budget·w_g/Σw (capped
    at the group's full size); selection is deterministic in the row id.
    """
    toks = (
        df.groupBy(group_col)
        .agg(F.sum(token_count(F.col(text_col))).alias("_toks"))
        .collect()
    )
    group_tokens = {r[group_col]: int(r["_toks"]) for r in toks}
    thresholds = mixture_thresholds(group_tokens, weights, token_budget)
    thresh = _thresh_expr(group_col, thresholds, 0)
    return df.filter(hash_bucket(F.col(id_col)) < thresh)
