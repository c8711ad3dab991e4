"""Round-5 regression tests: the five ADVICE findings (tag_version commit
race, compaction tombstone resurrection, lock-takeover CAS, persist leak,
swallowed drain errors) plus the orphan-file vacuum and the
crash-mid-async-compaction recovery path."""

from __future__ import annotations

import os
import threading
import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datachain_spark.lake.table import LakeTable, Snapshot


def _events_df(spark, rows, with_tool=False):
    """rows: (lsn, op, conv_id, turn_idx, role, text)."""
    fields = [
        T.StructField("lsn", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
    rows = [(*r, None) for r in rows]
    return spark.createDataFrame(rows, T.StructType(fields))


# ---------- ADVICE: compaction must not erase delete ordering ----------
def test_compaction_retains_tombstones_against_redelivered_stale_upsert(
    spark, tmp_path
):
    """The resurrection scenario (unordered delivery): upsert K, delete K,
    COMPACT (erases the tombstone pre-fix), then a redelivered stale upsert
    of K (lsn below the delete). LWW must still see the delete win."""
    from datachain_spark.cdc.apply import apply_batch, transcripts_schema_v1

    root = str(tmp_path / "t")
    table = LakeTable.create(
        root, transcripts_schema_v1(), key_cols=["conv_id", "turn_idx"], num_buckets=4
    )
    up = _events_df(
        spark,
        [(i + 1, "U", "c1", i, "user", f"turn {i}") for i in range(4)]
        + [(10, "D", "c1", 2, None, None)],
    )
    apply_batch(spark, table, up, "j", 0, lsn_ordered=False, compaction="off")
    assert table.read(spark).count() == 3  # (c1,2) deleted

    # compact every bucket (default retain_tombstones=True)
    assert table.compact(spark, max_segments=0) is not None
    snap = table.snapshot()
    assert not any(snap.dirty.get(b) for b in snap.buckets)  # all clean
    assert table.read(spark).count() == 3  # tombstone filtered on read

    # redelivered STALE upsert of the deleted key: lsn 3 < delete lsn 10
    redelivered = _events_df(spark, [(3, "U", "c1", 2, "user", "turn 2")])
    apply_batch(spark, table, redelivered, "j", 1, lsn_ordered=False, compaction="off")
    rows = {
        (r["conv_id"], r["turn_idx"]) for r in table.read(spark).collect()
    }
    assert ("c1", 2) not in rows, "compacted-away tombstone resurrected the key"
    assert len(rows) == 3

    # and a genuinely NEWER upsert (lsn above the tombstone) still revives it
    newer = _events_df(spark, [(11, "U", "c1", 2, "user", "turn 2 again")])
    apply_batch(spark, table, newer, "j", 2, lsn_ordered=False, compaction="off")
    got = {
        (r["conv_id"], r["turn_idx"]): r["text"] for r in table.read(spark).collect()
    }
    assert got[("c1", 2)] == "turn 2 again"


def test_compaction_drop_tombstones_when_ordered(spark, tmp_path):
    """retain_tombstones=False (the lsn_ordered path) physically drops
    tombstone rows from the compacted segment — no unbounded tombstone
    accumulation on the ordered replay hot path."""
    from datachain_spark.cdc.apply import apply_batch, transcripts_schema_v1
    from datachain_spark.lake.table import DELETED_COL

    root = str(tmp_path / "t")
    table = LakeTable.create(
        root, transcripts_schema_v1(), key_cols=["conv_id", "turn_idx"], num_buckets=4
    )
    up = _events_df(
        spark,
        [(i + 1, "U", "c1", i, "user", f"turn {i}") for i in range(4)]
        + [(10, "D", "c1", 2, None, None)],
    )
    apply_batch(spark, table, up, "j", 0, lsn_ordered=True, compaction="off")
    table.compact(spark, max_segments=0, retain_tombstones=False)
    snap = table.snapshot()
    raw = table._read_raw(spark, snap, sorted(snap.buckets))
    assert raw.filter(F.coalesce(F.col(DELETED_COL), F.lit(False))).count() == 0
    assert table.read(spark).count() == 3
    # ordered mode: the per-bucket watermark filter drops the redelivery
    # pre-write, so erasing tombstones is safe
    redelivered = _events_df(spark, [(3, "U", "c1", 2, "user", "turn 2")])
    m = apply_batch(spark, table, redelivered, "j", 1, lsn_ordered=True, compaction="off")
    assert m.get("skipped") == "stale"
    assert table.read(spark).count() == 3


# ---------- ADVICE: tag_version vs concurrent commits ----------
def test_tag_version_races_commits_no_lost_manifest(tmp_path):
    schema = T.StructType([T.StructField("k", T.StringType(), False)])
    t = LakeTable.create(str(tmp_path / "t"), schema, key_cols=["k"], num_buckets=4)
    n_each = 12
    errs: list[Exception] = []
    barrier = threading.Barrier(2)

    def tagger():
        barrier.wait()
        for i in range(n_each):
            try:
                t.tag_version(f"tag{i}")
            except Exception as e:  # pragma: no cover - the regression
                errs.append(e)

    def committer():
        barrier.wait()
        for i in range(n_each):
            try:
                t.commit(append_bucket_files={0: [f"data/s{i}"]})
            except Exception as e:  # pragma: no cover - the regression
                errs.append(e)

    th = [threading.Thread(target=tagger), threading.Thread(target=committer)]
    for x in th:
        x.start()
    for x in th:
        x.join()
    assert errs == []
    vs = t.versions()
    # every commit and every tag got its own version: nothing clobbered
    assert vs == list(range(2 * n_each + 1))
    assert sum(1 for v in vs if t.snapshot(v).tag) == n_each
    # the data commits all survived too
    assert len(t.snapshot(vs[-1]).buckets.get(0, [])) == n_each or any(
        len(t.snapshot(v).buckets.get(0, [])) == n_each for v in vs
    )


def test_write_manifest_duplicate_version_fails_loudly(tmp_path):
    schema = T.StructType([T.StructField("k", T.StringType(), False)])
    t = LakeTable.create(str(tmp_path / "t"), schema, key_cols=["k"], num_buckets=2)
    orig = open(t._manifest_path(0)).read()
    dup = Snapshot(
        version=0,
        parent=None,
        schema_json=t.snapshot(0).schema_json,
        num_buckets=2,
        key_cols=["k"],
        buckets={0: ["data/evil"]},
        watermarks={},
    )
    with pytest.raises(FileExistsError):
        t._write_manifest(dup)
    assert open(t._manifest_path(0)).read() == orig  # not clobbered
    assert not [
        f for f in os.listdir(t._versions_dir()) if ".tmp." in f
    ]  # tmp cleaned up


# ---------- ADVICE: no cached-DataFrame leak on a refused resume ----------
def test_checkpoint_locked_error_does_not_leak_cache(spark, tmp_path):
    import subprocess
    import sys

    from datachain_spark import chain as dc
    from datachain_spark.checkpoint import CheckpointLockedError

    store = str(tmp_path / "ckpt")
    ch = dc.read_values(spark, id=[1, 2, 3])

    def f(id):
        return id + 1

    # discover the namespace dir by a dry run on a sibling store
    ch.map(f, output={"out": int}, params=["id"], checkpoint=store)
    ns = os.path.join(store, os.listdir(store)[0])

    holder = subprocess.Popen([sys.executable, "-c", "import time; time.sleep(120)"])
    try:
        with open(os.path.join(ns, ".resume_lock"), "w") as fh:
            fh.write(str(holder.pid))
        spark.catalog.clearCache()
        ch2 = dc.read_values(spark, id=[10, 11])
        with pytest.raises(CheckpointLockedError):
            ch2.map(f, output={"out": int}, params=["id"], checkpoint=store).count()
        # the persist() taken for the chunk loop must have been released
        assert spark._jsparkSession.sharedState().cacheManager().isEmpty()
    finally:
        holder.kill()
        holder.wait()
        os.remove(os.path.join(ns, ".resume_lock"))


# ---------- ADVICE: stale-lock takeover is single-winner ----------
def test_stale_lock_takeover_single_winner(tmp_path):
    import subprocess
    import sys

    from datachain_spark.checkpoint import CheckpointLockedError, _NamespaceLock

    ns = str(tmp_path)
    # plant a stale lock owned by a dead pid
    dead = subprocess.Popen([sys.executable, "-c", "pass"])
    dead.wait()
    with open(os.path.join(ns, ".resume_lock"), "w") as fh:
        fh.write(str(dead.pid))

    results: list[str] = []
    barrier = threading.Barrier(2)

    def contender():
        lock = _NamespaceLock(ns)
        barrier.wait()
        try:
            lock.acquire()
            results.append("held")
        except CheckpointLockedError:
            results.append("refused")

    th = [threading.Thread(target=contender) for _ in range(2)]
    for x in th:
        x.start()
    for x in th:
        x.join()
    # exactly one winner — never two holders (the pre-fix unlink race)
    assert sorted(results) == ["held", "refused"]
    assert os.path.exists(os.path.join(ns, ".resume_lock"))


# ---------- ADVICE: run_stream drain errors surface on a live session ----
def test_session_stopped_probe(spark):
    from datachain_spark.cdc.stream import _session_stopped

    assert _session_stopped(spark) is False


def test_drain_compaction_error_propagates_from_run_stream(spark, tmp_path):
    """A genuine async-compaction failure at end-of-stream must raise, not
    vanish into the injected-crash suppression path."""
    from datachain_spark.cdc.feed import FeedSpec, write_feed
    from datachain_spark.cdc.stream import run_stream

    feed = str(tmp_path / "feed")
    write_feed(spark, FeedSpec(n_convs=6, batch_size=50), feed)

    orig = LakeTable.drain_compaction

    def boom(self):
        raise RuntimeError("injected genuine compaction failure")

    LakeTable.drain_compaction = boom
    try:
        with pytest.raises(RuntimeError, match="genuine compaction failure"):
            run_stream(
                spark,
                str(tmp_path / "t"),
                feed,
                str(tmp_path / "ck"),
                num_buckets=4,
            )
    finally:
        LakeTable.drain_compaction = orig


# ---------- crash mid-async-compaction → restart → converge ----------
def test_crash_mid_async_compaction_restart_converges(spark, tmp_path):
    """Kill the apply loop while an async compaction pass is in flight
    (its commit raises after its output dir is written); a fresh process
    over the same root must replay to the exact oracle state, with the
    half-compacted output left as an orphan, never read."""
    from datachain_spark.cdc.apply import replay_feed_dir
    from datachain_spark.cdc.feed import FeedSpec, write_feed
    from datachain_spark.cdc.normalize import normalize_text
    from datachain_spark.cdc.oracle import oracle_replay

    spec = FeedSpec(n_convs=24, hot_every=1000, hot_base=40, batch_size=100)
    feed = str(tmp_path / "feed")
    write_feed(spark, spec, feed)
    root = str(tmp_path / "t")

    orig_commit = LakeTable.commit

    def crash_on_compaction_commit(self, *a, **k):
        if (k.get("props") or {}).get("compaction"):
            raise RuntimeError("injected crash mid-async-compaction")
        return orig_commit(self, *a, **k)

    LakeTable.commit = crash_on_compaction_commit
    try:
        with pytest.raises(RuntimeError, match="mid-async-compaction"):
            # max_segments=1 forces compaction nearly every batch; the
            # worker's failure surfaces at the next submit or the drain
            replay_feed_dir(
                spark, root, feed, num_buckets=4, max_segments=1, compaction="async"
            )
    finally:
        LakeTable.commit = orig_commit

    # "restart": fresh table handle, same root — resume and converge
    table2, _ = replay_feed_dir(
        spark, root, feed, num_buckets=4, max_segments=1, compaction="async"
    )
    got = [
        (r["conv_id"], r["turn_idx"], r["role"], r["text"], r["tool"])
        for r in table2.read(spark).orderBy("conv_id", "turn_idx").collect()
    ]
    exp = [
        (c, ti, r, normalize_text(x), tool)
        for (c, ti, r, x, tool) in oracle_replay(spec)
    ]
    assert got == exp


# ---------- orphan-file vacuum ----------
def test_remove_orphans_after_crash_keeps_live_data(spark, tmp_path):
    from datachain_spark.cdc.apply import replay_feed_dir
    from datachain_spark.cdc.feed import FeedSpec, write_feed
    from datachain_spark.cdc.normalize import normalize_text
    from datachain_spark.cdc.oracle import oracle_replay

    spec = FeedSpec(n_convs=16, batch_size=80)
    feed = str(tmp_path / "feed")
    write_feed(spark, spec, feed)
    root = str(tmp_path / "t")

    # crash AFTER the batch-2 segment write, BEFORE its commit -> orphan dir
    table, _ = replay_feed_dir(spark, root, feed, num_buckets=4, upto_batch=0,
                               compaction="off")
    orig_commit = LakeTable.commit

    def boom(self, *a, **k):
        raise RuntimeError("injected crash before commit")

    LakeTable.commit = boom
    try:
        with pytest.raises(RuntimeError):
            replay_feed_dir(spark, root, feed, num_buckets=4, upto_batch=1,
                            compaction="off")
    finally:
        LakeTable.commit = orig_commit
    # plus a fake crashed compaction dir
    fake = os.path.join(root, "data", "compact=999", "bucket=0")
    os.makedirs(fake)
    with open(os.path.join(fake, "part-0.parquet"), "w") as fh:
        fh.write("garbage")

    table = LakeTable(root)
    orphan_seg = table.data_dir("job=replay", f"batch={1:09d}")
    assert os.path.isdir(orphan_seg)
    live_before = {
        p for fl in table.snapshot().buckets.values() for p in fl
    }
    assert live_before  # there IS committed data

    # safety window: young files are not vacuumed
    assert table.remove_orphans(older_than=3600) == 0
    assert os.path.isdir(orphan_seg)

    removed = table.remove_orphans(older_than=0)
    assert removed > 0
    assert not os.path.isdir(orphan_seg)
    assert not os.path.isdir(os.path.join(root, "data", "compact=999"))
    for p in live_before:  # every committed file survived
        assert os.path.exists(os.path.join(root, p)), p

    # and the table still replays to the oracle (the vacuumed orphan is
    # recomputed by the resume)
    table2, _ = replay_feed_dir(spark, root, feed, num_buckets=4, compaction="off")
    got = [
        (r["conv_id"], r["turn_idx"], r["role"], r["text"], r["tool"])
        for r in table2.read(spark).orderBy("conv_id", "turn_idx").collect()
    ]
    exp = [
        (c, ti, r, normalize_text(x), tool)
        for (c, ti, r, x, tool) in oracle_replay(spec)
    ]
    assert got == exp
