"""Subprocess worker for bench.py: time the headline queries through a
noop sink and print one JSON line {"queries": {...}}."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADLINE = [
    "q1_pricing_summary",
    "q3_top_revenue",
    "merge_left_outer",
    "window_lww",
    "sessionize",
    "diff_status",
    "dedup_exact",
    "text_quality",
    "ann_cosine_topk",
    "minhash_near_dup_pairs",
    "document_pipeline",
    "asof_last_error",
    # r2 additions (additive keys — r1 keys unchanged for cross-round diff)
    "nested_struct_project",
    "running_window_frame",
    # r3 additions
    "ngram_jaccard_near_dups",
    "lsh_topk_ann",
    "ivf_topk_kmeans",
    # r5 additions
    "dedup_spans_corpus",
    "stratified_sample_docs",
    "token_budget_mixture",
    "bm25_search_topk",
    "dsir_importance_select",
    "lm_perplexity_outliers",
    "hybrid_rrf_search",
    "dedup_event_sequences",
    # r5 closing additions (transcripts SFT family + tokenizer fit)
    "sft_render_spans",
    "bpe_train_merges",
]


def main() -> None:
    sf_dir = sys.argv[1]
    cpus = int(sys.argv[2])
    import __spark_entry__ as entrymod
    from datachain_spark.session import get_spark

    spark = get_spark(cpus=cpus, shuffle_partitions=2 * cpus)
    qs = entrymod.queries()
    out: dict[str, float] = {}
    for name in HEADLINE:
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # warm
        times = []
        for _ in range(3):  # best-of-3: the host swings +-50% run-to-run
            t0 = time.monotonic()
            df.write.format("noop").mode("overwrite").save()
            times.append(time.monotonic() - t0)
        out[name] = round(min(times), 3)
    print(json.dumps({"queries": out}))


if __name__ == "__main__":
    main()
