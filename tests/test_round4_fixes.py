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


def test_normalize_expr_space_run_branches_match_python(spark):
    """Branch boundaries of the graded ASCII collapse paths: runs of
    exactly 2 spaces (literal replace branch), runs of 3+ (the '  +'
    regex branch), control whitespace mixed in (the \\s+ branch), and the
    trim-only path — every one must equal normalize_text byte-for-byte."""
    from datachain_spark.cdc.normalize import normalize_text, normalize_text_expr

    samples = [
        "",
        " ",
        "  ",
        "   ",
        "    ",
        "a  b",                 # single 2-run -> replace branch
        "a  b  c",              # multiple 2-runs, non-overlap replace
        "a   b",                # 3-run -> '  +' branch
        "a    b  c",            # 4-run + 2-run in one row
        "  lead and trail   ",  # runs at the edges interact with trim
        "tok tok  (rev 3)",     # the feed's update-row shape
        "a  b\tc",              # double space AND control ws -> \s+ branch
        "café  x",         # non-ASCII with 2-run -> unicode branch
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


# ---------- read_storage with the persistent listing cache ----------
def test_read_storage_cache_no_rewalk_within_ttl(spark, tmp_path):
    from datachain_spark.sources import storage as st

    src = tmp_path / "bucket"
    src.mkdir()
    (src / "a.txt").write_text("alpha")
    (src / "b.txt").write_text("beta")
    cache = str(tmp_path / "cache")

    w0 = st.LISTING_WALKS
    first = st.read_storage(spark, str(src), type="meta", cache_root=cache)
    assert first.count() == 2
    assert st.LISTING_WALKS == w0 + 1  # one real crawl
    # second call within TTL: NO directory walk — and content reads (the
    # binary/text types) drive off the cached paths, also walk-free
    again = st.read_storage(spark, str(src), type="meta", cache_root=cache)
    assert again.count() == 2
    texts = st.read_storage(spark, str(src), type="text", cache_root=cache)
    got = {r["file"]["path"]: r["text"] for r in texts.collect()}
    assert got == {"a.txt": "alpha", "b.txt": "beta"}
    assert st.LISTING_WALKS == w0 + 1  # still just the one crawl

    # a file created after the crawl is INVISIBLE until update/TTL expiry
    (src / "c.txt").write_text("gamma")
    assert st.read_storage(spark, str(src), type="meta", cache_root=cache).count() == 2
    # update=True forces a re-crawl
    assert (
        st.read_storage(spark, str(src), type="meta", cache_root=cache, update=True).count()
        == 3
    )
    assert st.LISTING_WALKS == w0 + 2


def test_read_storage_cache_ttl_expiry_recrawls(spark, tmp_path):
    import json as _json

    from datachain_spark.sources import storage as st

    src = tmp_path / "bucket"
    src.mkdir()
    (src / "a.txt").write_text("x")
    cache = str(tmp_path / "cache")
    st.read_storage(spark, str(src), type="meta", cache_root=cache).count()
    (src / "b.txt").write_text("y")

    # age the cache entry past the TTL (backdate created_at on disk)
    (cdir,) = [d for d in os.listdir(cache) if d.startswith("lst__")]
    meta_path = os.path.join(cache, cdir, "_listing_meta.json")
    with open(meta_path) as fh:
        meta = _json.load(fh)
    meta["created_at"] -= 5 * 3600
    with open(meta_path, "w") as fh:
        _json.dump(meta, fh)

    w0 = st.LISTING_WALKS
    fresh = st.read_storage(spark, str(src), type="meta", cache_root=cache)
    assert fresh.count() == 2  # expired -> re-crawled, sees b.txt
    assert st.LISTING_WALKS == w0 + 1


# ---------- sharded read_hf ----------
def test_read_hf_large_split_shards_without_driver_copy(spark):
    import pyarrow as pa

    from datachain_spark.sources.hf import read_hf

    n = 5000
    table = pa.table({"id": list(range(n)), "txt": [f"t{i}" for i in range(n)]})

    class NoPandasTable:
        """Arrow backing that REFUSES a full driver materialization."""

        num_rows = n
        schema = table.schema

        def to_batches(self):
            return table.to_batches(max_chunksize=500)

        def to_pandas(self):
            raise AssertionError("full-split to_pandas() on a large dataset")

    class FakeDataset:
        features = {"id": None, "txt": None}
        data = NoPandasTable()

    import datachain_spark.sources.hf as hf_mod

    old = hf_mod.SHARD_THRESHOLD_ROWS
    hf_mod.SHARD_THRESHOLD_ROWS = 1000
    try:
        df = read_hf(spark, FakeDataset())
        assert df.count() == n
        assert df.rdd.getNumPartitions() > 1  # really distributed shards
        got = {r["id"]: r["txt"] for r in df.filter("id < 5 or id >= 4995").collect()}
        assert got[0] == "t0" and got[4999] == "t4999"
    finally:
        hf_mod.SHARD_THRESHOLD_ROWS = old


def test_shard_arrow_to_parquet_rotates_files(tmp_path):
    import pyarrow as pa

    from datachain_spark.sources.hf import _shard_arrow_to_parquet

    t = pa.table({"x": list(range(3000))})
    n_shards = _shard_arrow_to_parquet(t, str(tmp_path / "sh"), rows_per_shard=1000)
    assert n_shards == 3
    assert len(list((tmp_path / "sh").glob("*.parquet"))) == 3


# ---------- real AVI codec ----------
def test_avi_codec_roundtrip_pure():
    from datachain_spark.operators.multimodal import (
        demux_avi_frames,
        encode_avi,
        parse_avi,
    )

    payload = encode_avi(16, 12, n_frames=5, fps=10, seed=7)
    d = parse_avi(payload)
    assert (d["width"], d["height"], d["n_frames"], d["fps"]) == (16, 12, 5, 10)
    assert d["duration_ms"] == 500
    frames = demux_avi_frames(payload)
    stride = 16 * 3  # 48 bytes, already word-aligned
    assert len(frames) == 5 and all(len(f) == stride * 12 for f in frames)
    assert frames[0] != frames[1]  # per-frame content differs
    assert 0.0 < d["mean_pixel"] < 255.0 and d["phash"] > 0
    # determinism + seed sensitivity
    assert encode_avi(16, 12, n_frames=5, fps=10, seed=7) == payload
    assert encode_avi(16, 12, n_frames=5, fps=10, seed=8) != payload


def test_decode_media_video_real_avi(spark):
    from datachain_spark.operators.multimodal import decode_media, gen_fake_media

    media = gen_fake_media(spark, n=30)
    out = decode_media(media)
    vids = out.filter("kind = 'video'").collect()
    assert vids
    for r in vids:
        assert r["dec_width"] == r["width"] and r["dec_height"] == r["height"]
        assert r["dec_duration_ms"] == r["duration_ms"]  # header-exact
        assert r["phash"] is not None and r["mean_pixel"] is not None


def test_frame_sample_real_avi_demux(spark):
    from datachain_spark.operators.multimodal import (
        encode_avi,
        frame_sample,
        gen_fake_media,
    )

    media = gen_fake_media(spark, n=30).filter("kind = 'video'")
    frames = frame_sample(media, every_ms=100)
    got = frames.filter("media_id = 2").orderBy("frame_ts_ms").collect()
    # media_id=2: duration=(2%20+1)*100=300ms, width=7, height=6 -> 3 frames
    assert len(got) == 3
    # the sampled payloads are the REAL demuxed DIB frames
    from datachain_spark.operators.multimodal import demux_avi_frames

    src = encode_avi(7, 6, n_frames=3, fps=10, seed=2)
    expect = demux_avi_frames(src)
    assert [bytes(r["frame_payload"]) for r in got] == expect


# ---------- prefetch_files (reference UDF prefetcher analog) ----------
def test_prefetch_files_concurrent_fetch_and_missing_null(spark, tmp_path):
    from datachain_spark.sources.storage import prefetch_files, read_storage

    src = tmp_path / "bucket"
    src.mkdir()
    for i in range(6):
        (src / f"f{i}.bin").write_bytes(bytes([i]) * (i + 1))
    listing = read_storage(spark, str(src), type="meta")
    fetched = prefetch_files(listing, workers=4)
    got = {r["file"]["path"]: bytes(r["data"]) for r in fetched.collect()}
    assert got == {f"f{i}.bin": bytes([i]) * (i + 1) for i in range(6)}

    # stale listing: a file deleted after the crawl -> NULL data, no crash
    snap = listing.localCheckpoint()
    (src / "f3.bin").unlink()
    rows = {r["file"]["path"]: r["data"] for r in prefetch_files(snap).collect()}
    assert rows["f3.bin"] is None
    assert bytes(rows["f5.bin"]) == bytes([5]) * 6
