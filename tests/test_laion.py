"""LAION WebDataset flavor tests (reference webdataset_laion.py behaviors
over real tar shards and real npz sidecars)."""

import io
import json

import numpy as np

from datachain_spark.sources.laion import (
    laion_to_embeddings,
    process_laion_meta,
    read_wds_laion,
)
from datachain_spark.sources.tar import _selftest_build_tar


def _npz_bytes(n=4, dim=3, seed=1):
    rng = {v: None for v in ("b32_img", "b32_txt", "l14_img", "l14_txt", "dedup")}
    arrays = {
        v: np.arange(n * dim, dtype=np.float32).reshape(n, dim) * (i + 1) + seed
        for i, v in enumerate(rng)
    }
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    return buf.getvalue(), arrays


def test_process_laion_meta_unpacks_all_vectors(spark):
    blob1, arr1 = _npz_bytes(n=4, seed=1)
    blob2, arr2 = _npz_bytes(n=2, seed=9)
    df = spark.createDataFrame(
        [("s3://m/a.npz", bytearray(blob1)), ("s3://m/b.npz", bytearray(blob2))],
        "path string, data binary",
    )
    rows = process_laion_meta(df).collect()
    assert len(rows) == 6
    by_key = {(r["path"], r["index"]): r for r in rows}
    r = by_key[("s3://m/a.npz", 2)]
    assert np.allclose(r["b32_img"], arr1["b32_img"][2])
    assert np.allclose(r["dedup"], arr1["dedup"][2])
    r2 = by_key[("s3://m/b.npz", 1)]
    assert np.allclose(r2["l14_txt"], arr2["l14_txt"][1])

    emb = laion_to_embeddings(process_laion_meta(df)).collect()
    assert {e["id"] for e in emb} == {
        f"s3://m/{s}.npz#{i}" for s, n in (("a", 4), ("b", 2)) for i in range(n)
    }
    assert all(len(e["embedding"]) == 3 for e in emb)


def test_read_wds_laion_typed_json(spark, tmp_path):
    meta = {
        "uid": "u1",
        "caption": "a cat",
        "url": "http://x/1.jpg",
        "width": 64,
        "height": 48,
        "face_bboxes": [[0.1, 0.2, 0.3, 0.4]],
        "sha256": "deadbeef",
    }
    members = {
        "k1.json": json.dumps(meta).encode(),
        "k1.txt": b"a cat",
        "k1.jpg": b"\xff\xd8fakejpeg",
        "k2.json": json.dumps({"uid": "u2", "caption": "a dog"}).encode(),
        "k2.txt": b"a dog",
        "k2.jpg": b"\xff\xd8fakejpeg2",
    }
    _selftest_build_tar(str(tmp_path / "shard-000.tar"), members)
    df = read_wds_laion(spark, str(tmp_path))
    rows = {r["key"]: r for r in df.collect()}
    assert set(rows) == {"k1", "k2"}
    r1 = rows["k1"]
    assert r1["txt"] == "a cat"
    assert r1["json"]["uid"] == "u1" and r1["json"]["width"] == 64
    assert r1["json"]["face_bboxes"] == [[0.1, 0.2, 0.3, 0.4]]
    assert bytes(r1["jpg"]) == b"\xff\xd8fakejpeg"
    r2 = rows["k2"]
    assert r2["json"]["caption"] == "a dog" and r2["json"]["width"] is None
