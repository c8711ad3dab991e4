"""Property-based CDC correctness: random I/U/D event sequences (hypothesis)
replayed through apply_batch must equal a naive dict replay — arbitrary
batch boundaries, duplicate deliveries, delete/reinsert interleavings.
Plus drift and compaction edge-case tests."""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from datachain_spark.cdc.apply import KEY_COLS, SchemaDriftError, apply_batch, transcripts_schema_v1
from datachain_spark.lake.table import LakeTable

T0 = datetime(2025, 1, 1, tzinfo=timezone.utc)

# one event: (op, conv 0-3, turn 0-2) — tiny key space maximizes collisions
event_st = st.tuples(
    st.sampled_from(["I", "U", "D"]),
    st.integers(0, 3),
    st.integers(0, 2),
)
events_st = st.lists(event_st, min_size=1, max_size=25)
# batch split points as a list of fractions
splits_st = st.lists(st.integers(1, 24), max_size=3, unique=True)


def naive_replay(events):
    state = {}
    for lsn, (op, c, t) in enumerate(events):
        key = (f"conv-{c}", t)
        if op == "D":
            state.pop(key, None)
        else:
            state[key] = f"text-{lsn}"
    return dict(sorted(state.items()))


def spark_replay(spark, tmpdir, events, splits):
    table = LakeTable.create(str(tmpdir), transcripts_schema_v1(), key_cols=KEY_COLS, num_buckets=4)
    rows = []
    for lsn, (op, c, t) in enumerate(events):
        rows.append(
            (
                lsn,
                op,
                f"conv-{c}",
                t,
                None if op == "D" else "user",
                None if op == "D" else f"text-{lsn}",
                T0 + timedelta(milliseconds=lsn),
            )
        )
    bounds = sorted({s for s in splits if s < len(rows)}) + [len(rows)]
    start = 0
    for bid, end in enumerate(bounds):
        if end <= start:
            continue
        df = spark.createDataFrame(
            rows[start:end],
            "lsn long, op string, conv_id string, turn_idx int, role string, text string, ts timestamp",
        )
        apply_batch(spark, table, df, "prop", bid, max_segments=2)
        start = end
    out = {}
    for r in table.read(spark).collect():
        out[(r["conv_id"], r["turn_idx"])] = r["text"]
    return dict(sorted(out.items()))


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(events=events_st, splits=splits_st)
def test_random_event_sequences_match_naive_replay(spark, tmp_path_factory, events, splits):
    tmpdir = tmp_path_factory.mktemp("prop")
    assert spark_replay(spark, tmpdir, events, splits) == naive_replay(events)


def test_schema_drift_type_change_raises(spark, tmp_path):
    table = LakeTable.create(
        str(tmp_path / "t"), transcripts_schema_v1(), key_cols=KEY_COLS, num_buckets=4
    )
    bad = spark.createDataFrame(
        [(0, "I", "c", 0, "user", 123, T0)],
        "lsn long, op string, conv_id string, turn_idx int, role string, text long, ts timestamp",
    )
    with pytest.raises(SchemaDriftError, match="text"):
        apply_batch(spark, table, bad, "drift", 0)


def test_forced_compaction_preserves_state(spark, tmp_path):
    """max_segments=1 forces compaction nearly every batch; state must stay
    oracle-equal and dirty buckets must be cleaned."""
    events = [("I", c, t) for c in range(4) for t in range(3)]
    events += [("U", c, 0) for c in range(4)]
    events += [("D", 0, t) for t in range(3)]
    events += [("I", 0, 0)]
    table_dir = tmp_path / "t"
    got = spark_replay_forced(spark, table_dir, events)
    assert got == naive_replay(events)
    table = LakeTable(str(table_dir))
    snap = table.snapshot()
    assert any(p.get("compaction") for p in [table.snapshot(v).props for v in table.versions()])
    # every bucket ends compacted-or-single-segment
    assert all(len(fl) <= 2 for fl in snap.buckets.values())


def spark_replay_forced(spark, tmpdir, events):
    table = LakeTable.create(str(tmpdir), transcripts_schema_v1(), key_cols=KEY_COLS, num_buckets=4)
    rows = [
        (
            lsn,
            op,
            f"conv-{c}",
            t,
            None if op == "D" else "user",
            None if op == "D" else f"text-{lsn}",
            T0 + timedelta(milliseconds=lsn),
        )
        for lsn, (op, c, t) in enumerate(events)
    ]
    per = 5
    for bid in range(0, len(rows), per):
        df = spark.createDataFrame(
            rows[bid : bid + per],
            "lsn long, op string, conv_id string, turn_idx int, role string, text string, ts timestamp",
        )
        apply_batch(spark, table, df, "forced", bid // per, max_segments=1, normalize=False)
    return {
        (r["conv_id"], r["turn_idx"]): r["text"] for r in table.read(spark).collect()
    }


# ---------- incremental corpus dedup property (r5) ----------

texts_st = st.lists(
    st.sampled_from(["aa", "bb", "cc", "dd", "AA ", " bb  b"]), min_size=1, max_size=12
)
dedup_splits_st = st.lists(st.integers(1, 11), max_size=2, unique=True)


def _norm(t: str) -> str:
    import re

    return re.sub(r"\s+", " ", t.strip().lower())


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=texts_st, splits=dedup_splits_st)
def test_incremental_dedup_matches_naive_set(spark, tmp_path_factory, texts, splits):
    """For ANY batch boundaries, the union of survivors equals one
    representative per distinct normalized text — specifically the
    lowest-id occurrence — and replaying every batch yields the same
    survivors (ledger + time travel)."""
    from datachain_spark.operators.dedup import incremental_dedup

    root = str(tmp_path_factory.mktemp("fpreg"))
    docs = [(i, t) for i, t in enumerate(texts)]
    cuts = sorted({s for s in splits if s < len(docs)})
    batches, prev = [], 0
    for c in [*cuts, len(docs)]:
        if c > prev:
            batches.append(docs[prev:c])
            prev = c

    survivors = []
    for bid, batch in enumerate(batches):
        df = spark.createDataFrame(batch, "doc_id long, text string")
        s = incremental_dedup(df, f"{root}/reg", batch_id=bid, num_buckets=4)
        survivors.extend((r["doc_id"], r["text"]) for r in s.collect())
        s.unpersist()

    expected = {}
    for i, t in docs:
        expected.setdefault(_norm(t), (i, t))
    assert sorted(survivors) == sorted(expected.values())

    # full replay returns identical survivors, batch by batch
    replayed = []
    for bid, batch in enumerate(batches):
        df = spark.createDataFrame(batch, "doc_id long, text string")
        s = incremental_dedup(df, f"{root}/reg", batch_id=bid, num_buckets=4)
        replayed.extend((r["doc_id"], r["text"]) for r in s.collect())
        s.unpersist()
    assert sorted(replayed) == sorted(survivors)
