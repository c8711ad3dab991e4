"""Physical-plan regression suite: the scale properties PLANS.md audits
by hand, asserted automatically so they can't silently regress.

Checks (all on the public query surface at sf0.001 — plans, not data,
are under test, and a query's plan shape is scale-invariant):
  - predicate pushdown + column pruning reach the parquet scan;
  - small dimensions broadcast (no shuffled join for region/nation);
  - per-group top-k uses WindowGroupLimit (map-side rank pruning);
  - NO query plan contains a cartesian/broadcast-nested-loop join or a
    row-at-a-time Python UDF (BatchEvalPython) — Arrow-vectorized
    (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas) is the only
    admissible Python;
  - exact dedup aggregates partially (map-side combine before the
    exchange);
  - the CDC apply is ONE shuffle end-to-end: its widest Spark job has at
    most two stages (map + reduce/write) — counted from the status
    tracker on a real apply, so a reintroduced second exchange fails.
"""

from __future__ import annotations

import contextlib
import io
import os
import re

import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def test_q1_pushdown_and_pruning(spark):
    df = entrymod.queries()["q1_pricing_summary"](spark, SF_DIR)
    p = plan_of(df)
    m = re.search(r"PushedFilters: \[(.*?)\]", p)
    assert m and "l_shipdate" in m.group(1), "shipdate filter must reach the scan"
    rs = re.search(r"ReadSchema: (.*)", p)
    assert rs is not None
    # projection pruning: the 16-column lineitem scan reads only what q1 needs
    assert "l_comment" not in rs.group(1) and "l_orderkey" not in rs.group(1)
    assert rs.group(1).count(":") <= 7


def test_dim_joins_broadcast(spark):
    for name in ("q5_region_revenue", "q3_top_revenue", "merge_left_outer"):
        p = plan_of(entrymod.queries()[name](spark, SF_DIR))
        assert "BroadcastHashJoin" in p, f"{name}: dims must broadcast"


def test_window_topk_uses_group_limit(spark):
    p = plan_of(entrymod.queries()["window_topk_per_group"](spark, SF_DIR))
    assert "WindowGroupLimit" in p, "rank<=k must prune map-side"


def test_dedup_exact_prunes_map_side(spark):
    # keep-first-per-fingerprint is a rank-1 window: WindowGroupLimit
    # drops losers BEFORE the exchange (the map-side-combine analog)
    p = plan_of(entrymod.queries()["dedup_exact"](spark, SF_DIR))
    assert "WindowGroupLimit" in p


# Queries whose DataFrame construction has eager side effects heavier than
# a plan check warrants (they write/read real files or fit k-means); their
# plan properties are covered by their own operator tests.
_SWEEP_SKIP = {
    "webdataset_roundtrip",
    "incremental_dedup_batches",
    "ivf_topk_kmeans",
    "read_storage_listing",
    "pattern_uri_listing",
    "listings_enumeration",
    "prefetch_file_bytes",
    "file_object_read",
    "read_meta_jsonl",
    "audio_fragment_pipeline",
    "cdc_transcripts_final",
    "cdc_read_changes",  # full feed replay; changelog plan = pure unions of
    "cdc_stream_changes",  # pruned scans (tests/test_changes.py covers both)
    "zorder_pruned_scan",  # writes the z-ordered copy eagerly; plan props in
    # tests/test_zorder.py (pushed filters + footer pruning)
    "merge_into_dataset",  # saves + merges a real dataset eagerly; the apply
    # plan is the audited one-shuffle CDC apply (test_cdc_apply_is_one_shuffle)
}


def test_no_scale_killers_in_any_query_plan(spark):
    """Sweep the whole public surface: no cartesian product, no broadcast
    nested-loop join, no row-at-a-time Python UDF anywhere."""
    bad: list[str] = []
    for name, fn in entrymod.queries().items():
        if name in _SWEEP_SKIP:
            continue
        p = plan_of(fn(spark, SF_DIR))
        for killer in ("CartesianProduct", "BroadcastNestedLoopJoin", "BatchEvalPython"):
            if killer in p:
                # ann_cosine_topk is the documented brute-force BASELINE:
                # a tiny query set broadcast against every vector is the
                # intended all-pairs scan (the scale paths are lsh/ivf)
                if name == "ann_cosine_topk" and killer == "BroadcastNestedLoopJoin":
                    continue
                bad.append(f"{name}: {killer}")
    assert not bad, bad


def test_cdc_apply_is_one_shuffle(spark, tmp_path):
    """The engine claim behind the r4 throughput win: apply_batch's widest
    job runs in at most TWO stages (one exchange). Counted on a real
    apply via the status tracker, so a second shuffle fails loudly."""
    from datachain_spark.cdc import FeedSpec, write_feed
    from datachain_spark.cdc.apply import KEY_COLS, apply_batch, transcripts_schema_v1
    from datachain_spark.cdc.feed import feed_batch_dirs
    from datachain_spark.lake.table import LakeTable

    feed = str(tmp_path / "feed")
    spec = FeedSpec(n_convs=20, batch_size=200)
    write_feed(spark, spec, feed)
    table = LakeTable.create(
        str(tmp_path / "table"), transcripts_schema_v1(), list(KEY_COLS), num_buckets=4
    )
    _, d0 = next(iter(feed_batch_dirs(feed)))
    events = spark.read.parquet(d0)

    sc = spark.sparkContext
    sc.setJobGroup("plan-audit-apply", "one-shuffle assertion")
    try:
        apply_batch(spark, table, events, "plan-audit", 0, compaction="off")
    finally:
        sc.setJobGroup(None, None)  # type: ignore[arg-type]

    tracker = sc.statusTracker()
    job_ids = tracker.getJobIdsForGroup("plan-audit-apply")
    assert job_ids, "apply must run under the job group"
    widest = 0
    for jid in job_ids:
        info = tracker.getJobInfo(jid)
        if info is not None:
            widest = max(widest, len(info.stageIds))
    assert widest <= 2, f"apply's widest job ran {widest} stages (>1 shuffle)"
