"""Tar virtual files + WebDataset shards (reference lib/tar.py:1-35,
lib/webdataset.py:1-225): member listing with offsets, codegen vfile byte
slicing, shard write/read round-trip, sample grouping by stem."""

from __future__ import annotations

import tarfile

import pytest
from pyspark.sql import functions as F

from datachain_spark.sources.storage import read_storage
from datachain_spark.sources.tar import (
    _selftest_build_tar,
    parse_json_member,
    process_tar,
    read_vfile_bytes,
    read_webdataset,
    to_webdataset,
)


@pytest.fixture()
def tar_dir(tmp_path):
    d = tmp_path / "tars"
    d.mkdir()
    _selftest_build_tar(
        str(d / "a.tar"),
        {"s1.txt": b"hello", "s1.cls": b"0", "s2.txt": b"world!", "s2.cls": b"1"},
    )
    _selftest_build_tar(
        str(d / "b.tar"),
        {"s3.txt": b"third", "s3.jpg": b"\xff\xd8fakejpeg", "notes/readme.md": b"skip me"},
    )
    return str(d)


def test_process_tar_members_and_offsets(spark, tar_dir):
    """Every regular member appears with parent-prefixed path and a size +
    offset that really locate its bytes inside the archive."""
    archives = read_storage(spark, tar_dir, type="binary", glob="*.tar")
    members = process_tar(archives).orderBy("path")
    rows = members.collect()
    names = sorted(r["path"].rsplit("/", 1)[-1] for r in rows)
    assert names == sorted(
        ["s1.txt", "s1.cls", "s2.txt", "s2.cls", "s3.txt", "s3.jpg", "readme.md"]
    )
    by_name = {r["path"].rsplit("/", 1)[-1]: r for r in rows}
    assert by_name["s1.txt"]["size"] == 5
    # offsets verified against python's own tarfile
    with tarfile.open(f"{tar_dir}/a.tar") as tf:
        info = {i.name: i for i in tf.getmembers()}
    assert by_name["s1.txt"]["offset"] == info["s1.txt"].offset_data
    assert len({r["etag"] for r in rows}) == len(rows)  # etags distinct


def test_read_vfile_bytes_codegen_slice(spark, tar_dir):
    """Member bytes come back exact via the binary-substring slice — no
    re-parse of the tar."""
    archives = read_storage(spark, tar_dir, type="binary", glob="*.tar")
    members = process_tar(archives)
    got = {
        r["path"].rsplit("/", 1)[-1]: bytes(r["data"])
        for r in read_vfile_bytes(members, archives).collect()
    }
    assert got["s1.txt"] == b"hello"
    assert got["s2.txt"] == b"world!"
    assert got["s3.jpg"] == b"\xff\xd8fakejpeg"
    assert got["readme.md"] == b"skip me"


def test_webdataset_roundtrip_and_grouping(spark, tmp_path):
    """to_webdataset -> read_webdataset round-trips samples exactly:
    members group by stem into one row per sample, missing extensions are
    NULL, unlisted extensions ignored, samples never cross shards."""
    out = str(tmp_path / "wds")
    df = spark.createDataFrame(
        [
            (0, "k0", "text zero", '{"lang":"en"}', bytearray(b"\x00img0")),
            (0, "k1", "text one", '{"lang":"es"}', None),
            (1, "k2", "text two", None, bytearray(b"\x00img2")),
        ],
        "shard long, key string, txt string, json string, jpg binary",
    )
    shards = to_webdataset(
        df, out, key_col="key", shard_col="shard", text_cols=["txt", "json"], bin_cols=["jpg"]
    ).collect()
    assert sorted((r["shard_path"].rsplit("/", 1)[-1], r["n_samples"]) for r in shards) == [
        ("shard-000000.tar", 2),
        ("shard-000001.tar", 1),
    ]

    back = read_webdataset(spark, out, text_cols=["txt", "json"], bin_cols=["jpg"])
    rows = {r["key"]: r for r in back.collect()}
    assert set(rows) == {"k0", "k1", "k2"}
    assert rows["k0"]["txt"] == "text zero" and bytes(rows["k0"]["jpg"]) == b"\x00img0"
    assert rows["k1"]["jpg"] is None and rows["k1"]["json"] == '{"lang":"es"}'
    assert rows["k2"]["json"] is None and rows["k2"]["txt"] == "text two"
    assert rows["k0"]["shard"] != rows["k2"]["shard"]

    typed = parse_json_member(back, "json", "lang string")
    langs = {r["key"]: r["json"]["lang"] if r["json"] else None for r in typed.collect()}
    assert langs == {"k0": "en", "k1": "es", "k2": None}


def test_webdataset_shards_deterministic(spark, tmp_path):
    """Identical input produces byte-identical shards (mtime=0, sorted
    keys) — the property the driver oracle relies on."""
    df = spark.createDataFrame(
        [(0, "a", "x"), (0, "b", "y")], "shard long, key string, txt string"
    )
    p1, p2 = str(tmp_path / "w1"), str(tmp_path / "w2")
    to_webdataset(df, p1, "key", "shard", text_cols=["txt"]).collect()
    to_webdataset(df, p2, "key", "shard", text_cols=["txt"]).collect()
    b1 = open(f"{p1}/shard-000000.tar", "rb").read()
    b2 = open(f"{p2}/shard-000000.tar", "rb").read()
    assert b1 == b2
