"""Round-4 fixes (ADVICE.md): checkpoint duplicate-key inflation, output
column overwrite under checkpoint, concurrent-resume lock, unicode
whitespace in the codegen normalizer, lower-case JDBC staging names."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from datachain_spark import chain as dc
from datachain_spark.checkpoint import CheckpointLockedError, _NamespaceLock


# ---------- checkpointed map: duplicates under the key ----------
def test_checkpoint_map_duplicate_rows_stay_1_to_1(spark, tmp_path):
    # the ADVICE repro: ids [1,1,2] through plain map -> 3 rows; the
    # pre-fix checkpoint path produced 5 (quadratic join inflation)
    ch = dc.read_values(spark, id=[1, 1, 2])
    store = str(tmp_path / "ckpt")

    def f(id):
        return id + 1

    plain = ch.map(f, output={"out": int}, params=["id"])
    ck = ch.map(f, output={"out": int}, params=["id"], checkpoint=store)
    assert sorted(plain.to_values("out")) == [2, 2, 3]
    assert sorted(ck.to_values("out")) == [2, 2, 3]
    # and resume over the same store stays stable (no further inflation)
    ck2 = ch.map(f, output={"out": int}, params=["id"], checkpoint=store)
    assert sorted(ck2.to_values("out")) == [2, 2, 3]


def test_checkpoint_gen_duplicate_keys_processed_once(spark, tmp_path):
    # key semantics: duplicate-keyed rows are ONE unit of work for gen
    ch = dc.read_values(spark, id=[1, 1, 2])
    store = str(tmp_path / "ckpt")

    def g(id):
        yield (id * 10,)
        yield (id * 10 + 1,)

    out = ch.gen(g, output={"g": int}, params=["id"], checkpoint=store)
    assert sorted(out.to_values("g")) == [10, 11, 20, 21]


# ---------- checkpointed map: output column overwrites input ----------
def test_checkpoint_map_output_overwrites_input_column(spark, tmp_path):
    ch = dc.read_values(spark, id=[1, 2, 3], v=[1.0, 2.0, 3.0])
    store = str(tmp_path / "ckpt")

    def bump(v):
        return float(v) * 10

    plain = ch.map(bump, output={"v": float}, params=["v"])
    ck = ch.map(bump, output={"v": float}, params=["v"], checkpoint=store)
    assert sorted(plain.to_values("v")) == [10.0, 20.0, 30.0]
    assert ck.df.columns.count("v") == 1  # no ambiguous duplicate column
    assert sorted(ck.to_values("v")) == [10.0, 20.0, 30.0]


# ---------- concurrent-resume lock ----------
def test_checkpoint_concurrent_resume_refused_and_stale_takeover(spark, tmp_path):
    ch = dc.read_values(spark, id=[1, 2, 3])
    store = str(tmp_path / "ckpt")

    def f(id):
        return id + 1

    # pre-compute the namespace by running once (also commits everything)
    ch.map(f, output={"out": int}, params=["id"], checkpoint=store)
    ns = os.path.join(store, os.listdir(store)[0])

    # a LIVE process holds the lock -> a fresh (uncommitted) resume refuses
    holder = subprocess.Popen([sys.executable, "-c", "import time; time.sleep(120)"])
    try:
        with open(os.path.join(ns, ".resume_lock"), "w") as fh:
            fh.write(str(holder.pid))
        # same store+schema but remaining work: new input rows
        ch2 = dc.read_values(spark, id=[7, 8])
        with pytest.raises(CheckpointLockedError):
            ch2.map(f, output={"out": int}, params=["id"], checkpoint=store).count()
        # fully-committed inputs never need the lock (read-only resume)
        again = ch.map(f, output={"out": int}, params=["id"], checkpoint=store)
        assert sorted(again.to_values("out")) == [2, 3, 4]
    finally:
        holder.kill()
        holder.wait()

    # the owner is DEAD now -> stale lock is taken over and work proceeds
    out = dc.read_values(spark, id=[7, 8]).map(
        f, output={"out": int}, params=["id"], checkpoint=store
    )
    assert sorted(out.to_values("out")) == [8, 9]
    assert not os.path.exists(os.path.join(ns, ".resume_lock"))  # released


def test_namespace_lock_unit(tmp_path):
    ns = str(tmp_path)
    a = _NamespaceLock(ns)
    a.acquire()
    b = _NamespaceLock(ns)
    with pytest.raises(CheckpointLockedError):
        b.acquire()
    a.release()
    b.acquire()  # free after release
    b.release()


# ---------- codegen normalizer: unicode whitespace parity ----------
def test_normalize_expr_unicode_whitespace_matches_python(spark):
    from datachain_spark.cdc.normalize import normalize_text, normalize_text_expr

    # NBSP, line/para separators, ideographic space, tabs — all already
    # NFC-composed, so the expr (no NFC) must match normalize_text exactly
    samples = [
        "a b",
        " x  y ",
        "　lead and trail　",
        " mixed\t  runs \n here ",
        "plain ascii  only",
        None,
    ]
    df = spark.createDataFrame([(s,) for s in samples], "t string")
    got = [r["o"] for r in df.select(normalize_text_expr(F.col("t")).alias("o")).collect()]
    assert got == [normalize_text(s) for s in samples]


# ---------- JDBC: lower-case table names through quoted staging ----------
def test_jdbc_upsert_lowercase_table(spark, tmp_path):
    from datachain_spark.sources.database import DERBY_DRIVER, read_database, to_database

    url = f"jdbc:derby:{tmp_path}/db;create=true"
    base = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    to_database(base, "events_lc", url, mode="overwrite", driver=DERBY_DRIVER)
    delta = spark.createDataFrame([(2, "B!"), (3, "c")], "id long, name string")
    # pre-fix: the staging table's lower-case prefix was case-folded by the
    # unquoted JDBC write and the quoted MERGE/DROP failed to resolve
    to_database(delta, "events_lc", url, on_conflict=["id"], driver=DERBY_DRIVER)
    got = {
        r["id"]: r["name"]
        for r in read_database(
            spark, 'SELECT * FROM "events_lc"', url, driver=DERBY_DRIVER
        ).collect()
    }
    assert got == {1: "a", 2: "B!", 3: "c"}


# ---------- async compaction ----------
def test_commit_compacted_from_preserves_concurrent_appends(tmp_path):
    """The concurrent-append window: a segment committed to a bucket AFTER
    the compaction read must survive the compaction commit as a residual,
    and the bucket must stay dirty."""
    from pyspark.sql import types as T

    from datachain_spark.lake.table import LakeTable

    schema = T.StructType([T.StructField("k", T.StringType(), False)])
    t = LakeTable.create(str(tmp_path / "t"), schema, key_cols=["k"], num_buckets=4)
    t.commit(append_bucket_files={0: ["data/s1", "data/s2"]})
    # compaction reads snapshot here (inputs s1, s2) ... meanwhile:
    t.commit(append_bucket_files={0: ["data/s3"]})
    # ... compaction commits its resolved output of s1+s2
    t.commit(
        replace_bucket_files={0: ["data/c1"]},
        compacted_from={0: ["data/s1", "data/s2"]},
        props={"compaction": True},
    )
    snap = t.snapshot()
    assert snap.buckets[0] == ["data/c1", "data/s3"]  # s3 survived
    assert snap.dirty[0] is True  # residual still needs LWW resolve
    # whole-list replace (no residual) turns the bucket clean
    t.commit(
        replace_bucket_files={0: ["data/c2"]},
        compacted_from={0: ["data/c1", "data/s3"]},
    )
    snap = t.snapshot()
    assert snap.buckets[0] == ["data/c2"] and snap.dirty[0] is False


def test_async_compaction_replay_matches_oracle(spark, tmp_path):
    """Forced near-every-batch ASYNC compaction (overlapped with the next
    apply) must still converge to the exact oracle state, and the drained
    table must actually have compacted."""
    from datachain_spark.cdc.apply import replay_feed_dir
    from datachain_spark.cdc.feed import FeedSpec, write_feed
    from datachain_spark.cdc.normalize import normalize_text
    from datachain_spark.cdc.oracle import oracle_replay

    spec = FeedSpec(n_convs=30, hot_every=1000, hot_base=50, batch_size=120)
    feed = str(tmp_path / "feed")
    write_feed(spark, spec, feed)
    table, metrics = replay_feed_dir(
        spark, str(tmp_path / "t"), feed, num_buckets=8, max_segments=1,
        compaction="async",
    )
    assert any(m.get("compaction_submitted") for m in metrics if "version" in m)
    got = [
        (r["conv_id"], r["turn_idx"], r["role"], r["text"], r["tool"])
        for r in table.read(spark).orderBy("conv_id", "turn_idx").collect()
    ]
    exp = [
        (c, ti, r, normalize_text(x), tool)
        for (c, ti, r, x, tool) in oracle_replay(spec)
    ]
    assert got == exp
    # drain happened inside replay_feed_dir; compaction really ran
    assert any(
        s.props.get("compaction")
        for s in (table.snapshot(v) for v in table.versions())
    )
