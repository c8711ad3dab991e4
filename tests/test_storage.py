"""read_storage / file_diff: local-dir listings as File struct rows
(reference lib/dc/storage.py:21-262, datachain.py:1998-2069; listing cases
mirror /root/reference/tests/func/test_datachain.py)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from datachain_spark.sources.storage import (
    file_diff,
    parse_tabular,
    read_storage,
    to_storage,
)


def _mk_tree(root):
    os.makedirs(os.path.join(root, "sub"), exist_ok=True)
    with open(os.path.join(root, "a.txt"), "w") as f:
        f.write("alpha")
    with open(os.path.join(root, "b.bin"), "wb") as f:
        f.write(b"\x00\x01\x02")
    with open(os.path.join(root, "sub", "c.txt"), "w") as f:
        f.write("gamma content")
    return root


def test_read_storage_meta_recursive_and_glob(spark, tmp_path):
    root = _mk_tree(str(tmp_path / "tree"))
    files = read_storage(spark, root, type="meta")
    rows = {r["file"]["path"]: r["file"] for r in files.collect()}
    assert set(rows) == {"a.txt", "b.bin", "sub/c.txt"}
    f = rows["a.txt"]
    assert f["source"] == root and f["size"] == 5 and f["is_latest"]
    assert f["last_modified"] is not None and len(f["etag"]) == 32

    # glob filters file names; recursive=False sees only the top level
    only_txt = read_storage(spark, root, type="meta", glob="*.txt")
    assert {r["file"]["path"] for r in only_txt.collect()} == {"a.txt", "sub/c.txt"}
    flat = read_storage(spark, root, type="meta", recursive=False)
    assert {r["file"]["path"] for r in flat.collect()} == {"a.txt", "b.bin"}


def test_read_storage_binary_and_text(spark, tmp_path):
    root = _mk_tree(str(tmp_path / "tree"))
    data = {
        r["file"]["path"]: bytes(r["data"])
        for r in read_storage(spark, root, type="binary").collect()
    }
    assert data["b.bin"] == b"\x00\x01\x02" and data["a.txt"] == b"alpha"
    text = {
        r["file"]["path"]: r["text"]
        for r in read_storage(spark, root, type="text", glob="*.txt").collect()
    }
    assert text == {"a.txt": "alpha", "sub/c.txt": "gamma content"}


def test_read_storage_meta_prunes_content(spark, tmp_path):
    """A metadata-only listing must not read file bytes: the physical plan
    prunes `content` out of the binaryFile scan."""
    root = _mk_tree(str(tmp_path / "tree"))
    df = read_storage(spark, root, type="meta")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "content" not in plan


def test_file_diff_statuses(spark, tmp_path):
    import time

    root = _mk_tree(str(tmp_path / "tree"))
    # localCheckpoint MATERIALIZES the old listing: persist() is not enough
    # because update=True's refreshByPath invalidates cached plans over the
    # same path (the reference's analog is saving the listing as a lst__
    # dataset, lib/listing.py:46-61)
    before = read_storage(spark, root, type="meta").localCheckpoint()
    # mutate: modify a.txt (M), delete b.bin (D), add d.txt (A)
    time.sleep(0.01)
    with open(os.path.join(root, "a.txt"), "w") as f:
        f.write("alpha-CHANGED")
    os.remove(os.path.join(root, "b.bin"))
    with open(os.path.join(root, "d.txt"), "w") as f:
        f.write("new")
    # update=True: invalidate the session file-status cache, or the second
    # listing returns the pre-mutation statuses (reference `update` flag)
    after = read_storage(spark, root, type="meta", update=True)
    d = {
        r["file"]["path"]: r["diff_status"]
        for r in file_diff(after, before).collect()
    }
    assert d["a.txt"] == "M" and d["b.bin"] == "D" and d["d.txt"] == "A"
    assert d["sub/c.txt"] == "S"


def test_to_storage_placements(spark, tmp_path):
    root = _mk_tree(str(tmp_path / "tree"))
    listing = read_storage(spark, root, type="binary")
    out1 = str(tmp_path / "out_fn")
    written = {r["path"]: r["n_bytes"] for r in to_storage(listing, out1).collect()}
    assert written == {"a.txt": 5, "b.bin": 3, "c.txt": 13}
    assert open(os.path.join(out1, "a.txt")).read() == "alpha"
    # fullpath mirrors the tree
    out2 = str(tmp_path / "out_fp")
    paths = {r["path"] for r in to_storage(listing, out2, placement="fullpath").collect()}
    assert "sub/c.txt" in paths
    assert os.path.exists(os.path.join(out2, "sub", "c.txt"))
    # etag placement: content-addressed names
    out3 = str(tmp_path / "out_et")
    paths3 = sorted(r["path"] for r in to_storage(listing, out3, placement="etag").collect())
    assert all(len(p.split(".")[0]) == 32 for p in paths3)


def test_parse_tabular_reads_listed_files(spark, tmp_path):
    root = str(tmp_path / "csvs")
    os.makedirs(os.path.join(root, "sub"), exist_ok=True)
    with open(os.path.join(root, "x.csv"), "w") as f:
        f.write("id,v\n1,10\n2,20\n")
    with open(os.path.join(root, "sub", "y.csv"), "w") as f:
        f.write("id,v\n3,30\n")
    listing = read_storage(spark, root, type="meta", glob="*.csv")
    df = parse_tabular(spark, listing, format="csv", header="true", inferSchema="true")
    rows = sorted((r["id"], r["v"]) for r in df.collect())
    assert rows == [(1, 10), (2, 20), (3, 30)]
    assert all(r["source_file"] for r in df.collect())


def test_file_struct_nested_select(spark, tmp_path):
    """Nested struct columns select with dotted paths — the reference
    flattens to file__path (signal_schema.py:44); Spark is nested-native."""
    root = _mk_tree(str(tmp_path / "tree"))
    out = (
        read_storage(spark, root, type="meta")
        .select(F.col("file.path").alias("p"), F.col("file.size").alias("s"))
        .orderBy("p")
        .collect()
    )
    assert [r["p"] for r in out] == ["a.txt", "b.bin", "sub/c.txt"]


def test_cached_listing_ttl_and_update(spark, tmp_path):
    """Reference lib/listing.py:26-61: listings persist as lst__ datasets
    with a TTL shared across sessions; update= forces a re-list."""
    from datachain_spark.sources.storage import cached_listing

    src = tmp_path / "bucket"
    src.mkdir()
    (src / "a.txt").write_text("aaa")
    (src / "b.txt").write_text("bb")
    cache = str(tmp_path / "cache")

    first = cached_listing(spark, str(src), cache)
    assert first.count() == 2

    (src / "c.txt").write_text("c")
    # within TTL: the cached listing is served — the new file is INVISIBLE
    assert cached_listing(spark, str(src), cache).count() == 2
    # update=True re-lists
    assert cached_listing(spark, str(src), cache, update=True).count() == 3
    # expired TTL re-lists too
    (src / "d.txt").write_text("d")
    assert cached_listing(spark, str(src), cache, ttl_seconds=0).count() == 4
