"""Scalar File object family (datachain_spark/fileobj.py) — behavior
parity with reference lib/file.py (File/TextFile/ImageFile/VideoFile/
AudioFile + fragment models, vfiles, cache, export placements), plus the
UDF coercion path: a `file: File`-hinted map/gen parameter receives a
real File object rebuilt from the Spark struct.

NOTE: deliberately NO `from __future__ import annotations` — UDF type
hints must evaluate eagerly so locally-defined model classes resolve
(see udf._hints)."""

import io
import os
import tarfile
from dataclasses import dataclass
from datetime import datetime
from typing import Iterator, Optional

import numpy as np
import pytest

from datachain_spark.chain import Chain
from datachain_spark.fileobj import (
    TIME_ZERO,
    Audio,
    AudioFile,
    File,
    FileError,
    ImageFile,
    TextFile,
    VFileError,
    VideoFile,
    get_file_type,
    rebase_path,
    tar_member_file,
)
from datachain_spark.operators.media import np_to_bmp
from datachain_spark.operators.multimodal import encode_avi, encode_wav
from datachain_spark.sources.storage import read_storage


@pytest.fixture()
def filedir(tmp_path, monkeypatch):
    monkeypatch.setenv("DATACHAIN_SPARK_CACHE", str(tmp_path / "cache"))
    d = tmp_path / "data"
    d.mkdir()
    (d / "hello.txt").write_bytes(b"hello world")
    return d


# ---------------------------------------------------------------------------
# naming / path helpers (reference file.py:436-458, 668-742)
# ---------------------------------------------------------------------------


def test_name_parent_stem_ext():
    f = File(source="s3://bucket", path="data/subdir/image.jpg")
    assert f.name == "image.jpg"
    assert f.parent == "data/subdir"
    assert f.get_file_suffix() == ".jpg"
    assert f.get_file_ext() == "jpg"
    assert f.get_file_stem() == "image"
    assert f.get_full_name() == "data/subdir/image.jpg"
    assert f.get_uri() == "s3://bucket/data/subdir/image.jpg"


def test_path_normalized_rejects_dirs_and_escapes():
    with pytest.raises(FileError):
        File(source="s", path="").get_path_normalized()
    # the constructor strips trailing slashes (PurePath normalization, as
    # in the reference's validate_path); the directory check is defensive
    # against post-init assignment
    trailing = File(source="s", path="x")
    trailing.path = "a/b/"
    with pytest.raises(FileError):
        trailing.get_path_normalized()
    with pytest.raises(FileError):
        File(source="s", path="a/../../b").get_path_normalized()
    assert File(source="s", path="a/./b.txt").get_path_normalized() == "a/b.txt"


def test_destination_path_placements():
    f = File(source="s3://bucket", path="dir/a.txt", etag="E1")
    assert f.get_destination_path("/out", "filename") == "/out/a.txt"
    assert f.get_destination_path("/out", "etag") == "/out/E1.txt"
    assert f.get_destination_path("/out", "fullpath") == "/out/bucket/dir/a.txt"
    assert f.get_destination_path("/out", "filepath") == "/out/dir/a.txt"
    with pytest.raises(NotImplementedError):
        f.get_destination_path("/out", "checksum")
    with pytest.raises(ValueError):
        f.get_destination_path("/out", "bogus")
    # local source: fullpath has no netloc prefix (reference file.py:731-735)
    loc = File(source="/root/data", path="dir/a.txt")
    assert loc.get_destination_path("/out", "fullpath") == "/out/dir/a.txt"


def test_rebase_path_reference_examples():
    assert (
        rebase_path(
            "s3://bucket/data/2025-05-27/file.wav",
            "s3://bucket/data",
            "s3://output-bucket/processed",
            extension="mp3",
        )
        == "s3://output-bucket/processed/2025-05-27/file.mp3"
    )
    assert (
        rebase_path("data/audio/file.wav", "data/audio", "/local/output",
                    suffix="_ch1", extension="npy")
        == "/local/output/file_ch1.npy"
    )
    with pytest.raises(ValueError):
        rebase_path("a/b/c.txt", "nope", "/x")


# ---------------------------------------------------------------------------
# I/O: at / open / read / write-refresh / save / upload / resolve
# ---------------------------------------------------------------------------


def test_at_read_and_resolve(filedir):
    f = File.at(filedir / "hello.txt")
    assert (f.source, f.path) == (str(filedir), "hello.txt")
    assert f.read_bytes() == b"hello world"
    assert f.read_bytes(5) == b"hello"
    assert f.read() == b"hello world"
    r = f.resolve()
    assert r.size == 11 and r.etag and r.is_latest
    assert r.last_modified != TIME_ZERO


def test_at_scheme_uri_and_trailing_slash():
    f = File.at("s3://bucket/a/b.txt")
    assert (f.source, f.path) == ("s3://bucket", "a/b.txt")
    with pytest.raises(ValueError):
        File.at("s3://bucket/dir/")


def test_resolve_missing_file_returns_defaults(filedir):
    miss = File.at(filedir / "nope.bin").resolve()
    assert (miss.size, miss.etag, miss.last_modified) == (0, "", TIME_ZERO)


def test_resolve_etag_matches_read_storage_listing(spark, filedir):
    """resolve() must reproduce the JVM-side etag recipe of
    sources/storage.py:172-176 (md5 of path NUL size NUL mtime)."""
    listed = (
        read_storage(spark, str(filedir), type="meta", glob="*.txt")
        .select("file.path", "file.etag")
        .collect()
    )
    assert listed, "listing is empty"
    for row in listed:
        f = File(source=str(filedir), path=row.path).resolve()
        assert f.etag == row.etag


def test_open_write_refreshes_metadata(filedir):
    f = File.at(filedir / "fresh.bin")
    with f.open("wb") as h:
        h.write(b"abc123")
    assert f.size == 6 and f.etag != ""
    assert isinstance(f.last_modified, datetime) and f.last_modified != TIME_ZERO


def test_save_upload_export(filedir, tmp_path):
    f = File.at(filedir / "hello.txt").resolve()
    dst = tmp_path / "saved" / "h.txt"
    f.save(dst)
    assert dst.read_bytes() == b"hello world"

    u = File.upload(b"payload!", tmp_path / "up" / "u.bin")
    assert (u.name, u.size) == ("u.bin", 8)
    assert u.read_bytes() == b"payload!"

    f.export(tmp_path / "exp", placement="filename")
    assert (tmp_path / "exp" / "hello.txt").read_bytes() == b"hello world"
    f.export(tmp_path / "exp2", placement="etag")
    assert (tmp_path / "exp2" / f"{f.etag}.txt").exists()
    f.export(tmp_path / "exp3", placement="fullpath", link_type="symlink")
    out = tmp_path / "exp3" / "hello.txt"
    assert out.is_symlink() and out.read_bytes() == b"hello world"


def test_cache_roundtrip(filedir):
    f = File.at(filedir / "hello.txt").resolve()
    assert f.get_local_path() is None
    f.ensure_cached()
    local = f.get_local_path()
    assert local and open(local, "rb").read() == b"hello world"
    # cached open path: delete the source, reads still work through cache
    f._caching_enabled = True
    os.remove(f.get_fs_path())
    assert f.read_bytes() == b"hello world"


def test_get_hash_covers_identity_and_location():
    a = File(source="s", path="p", etag="e1")
    b = File(source="s", path="p", etag="e2")
    assert a.get_hash() != b.get_hash()
    c = File(source="s", path="p", etag="e1", location=[{"vtype": "tar"}])
    assert c.get_hash() != a.get_hash()


def test_typed_views_share_fields(filedir):
    f = File.at(filedir / "hello.txt").resolve()
    t = f.as_text_file()
    assert isinstance(t, TextFile) and t.etag == f.etag
    assert t.read_text() == "hello world"
    assert t.as_text_file() is t  # no-op on same type (file.py:311-315)
    assert isinstance(f.as_image_file(), ImageFile)
    assert isinstance(f.as_video_file(), VideoFile)
    assert isinstance(f.as_audio_file(), AudioFile)
    assert get_file_type("text") is TextFile
    assert get_file_type("binary") is File


# ---------------------------------------------------------------------------
# virtual files (reference file.py:110-197)
# ---------------------------------------------------------------------------


@pytest.fixture()
def tar_vfile(filedir):
    tar_path = filedir / "arch.tar"
    with tarfile.open(tar_path, "w") as tf:
        data = b"member-bytes-here"
        info = tarfile.TarInfo("m.txt")
        info.size = len(data)
        tf.addfile(info, io.BytesIO(data))
    parent = File.at(tar_path).resolve()
    with tarfile.open(tar_path) as tf:
        m = tf.getmembers()[0]
    return tar_member_file(parent, "m.txt", m.size, m.offset_data)


def test_tar_vfile_reads_member_slice(tar_vfile):
    assert tar_vfile.read_bytes() == b"member-bytes-here"
    assert tar_vfile.read_bytes(6) == b"member"
    assert tar_vfile.path.endswith("arch.tar/m.txt")


def test_tar_vfile_caches_member_bytes(tar_vfile):
    tar_vfile.ensure_cached()
    assert open(tar_vfile.get_local_path(), "rb").read() == b"member-bytes-here"


def test_tar_vfile_refuses_text_and_write(tar_vfile):
    with pytest.raises(VFileError):
        tar_vfile.read_text()
    with pytest.raises(VFileError):
        with tar_vfile.open("wb"):
            pass


def test_vfile_bad_location_errors(filedir):
    f = File(source=str(filedir), path="x", location=[{"parent": {"path": "p"}}])
    with pytest.raises(VFileError):  # vtype missing
        f.read_bytes()
    f2 = File(source=str(filedir), path="x", location=[{"vtype": "zip"}])
    with pytest.raises(VFileError):  # reader not registered
        f2.read_bytes()


# ---------------------------------------------------------------------------
# typed media files over the real in-container codecs
# ---------------------------------------------------------------------------


def test_image_file_info_read_save(filedir):
    img = (np.arange(4 * 6 * 3) % 255).astype(np.uint8).reshape(4, 6, 3)
    p = filedir / "img.bmp"
    p.write_bytes(np_to_bmp(img))
    imf = ImageFile.at(p).resolve()
    assert imf.get_info() == __import__("datachain_spark.fileobj", fromlist=["Image"]).Image(
        width=6, height=4, format="bmp"
    )
    assert (imf.read() == img).all()
    imf.save(filedir / "img2.bmp")
    assert (ImageFile.at(filedir / "img2.bmp").read() == img).all()
    with pytest.raises(NotImplementedError):
        imf.save(filedir / "img.png")


def test_audio_file_fragments(filedir):
    p = filedir / "a.wav"
    p.write_bytes(encode_wav(1000, 16000, seed=3))
    af = AudioFile.at(p).resolve()
    info = af.get_info()
    assert (info.sample_rate, info.channels, info.samples) == (16000, 1, 16000)
    frag = af.get_fragment(0.1, 0.35)
    arr, rate = frag.get_np()
    assert rate == 16000 and arr.shape[0] == int(0.25 * 16000) - 1
    assert frag.read_bytes()[:4] == b"RIFF"
    saved = frag.save(str(filedir / "frags"))
    assert saved.name == "a_000100_000350.wav" and saved.size > 0
    spans = [(round(x.start, 2), round(x.end, 2)) for x in af.get_fragments(0.4)]
    assert spans == [(0, 0.4), (0.4, 0.8), (0.8, 1.0)]
    with pytest.raises(ValueError):
        af.get_fragment(0.5, 0.2)
    assert Audio.get_channel_name(2, 1) == "Right"
    assert Audio.get_channel_name(3, 0) == "Ch1"


def test_video_file_frames_and_fragments(filedir):
    p = filedir / "v.avi"
    p.write_bytes(encode_avi(12, 16, 8, fps=4))
    vf = VideoFile.at(p).resolve()
    info = vf.get_info()
    assert (info.width, info.height, info.fps, info.frames) == (12, 16, 4.0, 8)
    fr = vf.get_frame(3)
    assert fr.get_np().shape == (16, 12, 3)
    assert fr.read_bytes()[:2] == b"BM"
    im = fr.save(str(filedir / "frames"))
    assert im.name == "v_0003.bmp" and isinstance(im, ImageFile)
    assert [x.frame for x in vf.get_frames(0, None, 5)] == [0, 5]
    out = vf.get_fragment(0.0, 1.0).save(str(filedir / "vfrags"))
    assert out.name == "v_000000_001000.avi"
    assert VideoFile.at(out.get_fs_path()).resolve().get_info().frames == 4
    with pytest.raises(ValueError):
        vf.get_frame(-1)


# ---------------------------------------------------------------------------
# UDF coercion: file-struct -> File object inside map/gen
# ---------------------------------------------------------------------------


def test_map_with_file_hint_reads_real_bytes(spark, filedir):
    for i in range(4):
        (filedir / f"doc{i}.txt").write_text(f"content-{i} " * (i + 1))
    ch = Chain(read_storage(spark, str(filedir), type="meta", glob="doc*.txt"), spark)

    def head(file: File) -> str:
        return file.read_text()[:9]

    got = sorted(ch.map(head, output={"head": str}).to_pandas()["head"])
    assert got == [f"content-{i}" for i in range(4)]


def test_map_file_output_model_expands(spark, filedir):
    ch = Chain(read_storage(spark, str(filedir), type="meta", glob="hello.txt"), spark)

    def stat(file: File) -> File:
        return file.resolve()

    row = ch.map(stat).df.select("path", "size").first()
    assert (row.path, row.size) == ("hello.txt", 11)


def test_gen_with_file_hint(spark, filedir):
    for i in range(3):
        (filedir / f"g{i}.txt").write_text("x" * (25 * (i + 1)))
    ch = Chain(read_storage(spark, str(filedir), type="meta", glob="g*.txt"), spark)

    # model classes defined inside the test so cloudpickle ships them by
    # value (a tests/ module isn't importable on executor workers)
    @dataclass
    class Chunk:
        name: str
        piece: str

    def chunks(file: File) -> Iterator[Chunk]:
        text = file.as_text_file().read_text()
        for i in range(0, len(text), 20):
            yield Chunk(file.name, text[i : i + 20])

    pdf = ch.gen(chunks).to_pandas()
    assert len(pdf) == 2 + 3 + 4 and pdf["name"].nunique() == 3


def test_checkpointed_map_with_file_hint(spark, filedir, tmp_path):
    (filedir / "c1.txt").write_text("alpha")
    (filedir / "c2.txt").write_text("beta")
    ch = Chain(read_storage(spark, str(filedir), type="meta", glob="c*.txt"), spark)

    def body(file: File) -> str:
        return file.read_text()

    out = ch.map(body, output={"body": str}, checkpoint=str(tmp_path / "ckpt"))
    assert sorted(out.to_pandas()["body"]) == ["alpha", "beta"]


def test_optional_file_hint_passes_none_through(spark, filedir):
    ch = Chain(read_storage(spark, str(filedir), type="meta", glob="hello.txt"), spark)

    def touch(file: Optional[File]) -> str:
        assert isinstance(file, File)
        return file.name

    assert ch.map(touch, output={"n": str}).to_pandas()["n"].tolist() == ["hello.txt"]


def test_unhinted_params_keep_raw_cells(spark, filedir):
    """No model hint -> the struct stays a plain dict (zero-coercion path)."""
    ch = Chain(read_storage(spark, str(filedir), type="meta", glob="hello.txt"), spark)

    def raw(file) -> str:
        assert isinstance(file, dict)
        return file["path"]

    assert ch.map(raw, output={"p": str}).to_pandas()["p"].tolist() == ["hello.txt"]
