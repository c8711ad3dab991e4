"""Tar virtual files + WebDataset shards, Spark-first.

The reference opens tar archives as virtual files (process_tar /
TarVFile — /root/reference/src/datachain/lib/tar.py:1-35,
lib/file.py TarVFile) and reads WebDataset shards (tar archives whose
members group into samples by stem — lib/webdataset.py:1-225,
lib/dc/storage.py's process_tar examples). WebDataset is the standard
sharded training-data format, so this surface matters at 100 TB.

Spark-first shape: the SHARD is the unit of parallelism. Every operator
here is a mapInPandas/applyInPandas over whole-archive rows — tar parsing
happens executor-local with ZERO shuffle (members of a sample are adjacent
inside their shard by construction; no groupBy across shards is ever
needed). Member byte access (`read_vfile_bytes`) is pure whole-stage
codegen: a binary `substring` over the parent archive's content at the
recorded (offset, size) — no Python, no re-parse of the tar.

Scale notes: a 100 TB corpus is ~10^5-10^6 shards of 100 MB-1 GB; one
task per shard saturates any executor count while keeping memory at one
archive per task. `to_webdataset` writes shards from an applyInPandas
group (shard id = hash or explicit), so the writer also streams — no
driver collection at any size.
"""

from __future__ import annotations

import hashlib
import io
import os
import tarfile
from typing import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEMBER_SCHEMA = T.StructType(
    [
        T.StructField("parent", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("size", T.LongType()),
        T.StructField("offset", T.LongType()),
        T.StructField("etag", T.StringType()),
    ]
)


def process_tar(files_df: DataFrame, column: str = "file", data_col: str = "data") -> DataFrame:
    """List every regular member of every tar archive as a virtual-file
    row (reference process_tar, lib/tar.py:28-35): parent archive path,
    member path (parent/member like the reference's File), size, byte
    offset of the member's data inside the archive, and a deterministic
    etag (md5 of parent-etag + name + mtime — the reference's exact
    recipe, lib/tar.py:9-10).

    mapInPandas over whole archives: each task parses its shard's central
    listing in memory and emits member metadata only — member BYTES are
    read later by `read_vfile_bytes` as a codegen substring, or by any
    downstream join the caller picks."""
    parent_path = f"{column}.path"
    parent_etag = f"{column}.etag"
    src = files_df.select(
        F.col(parent_path).alias("__ppath"),
        F.col(parent_etag).alias("__petag"),
        F.col(data_col).alias("__bytes"),
    )

    def _members(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for ppath, petag, blob in zip(pdf["__ppath"], pdf["__petag"], pdf["__bytes"]):
                with tarfile.open(fileobj=io.BytesIO(bytes(blob))) as tf:
                    for info in tf.getmembers():
                        if not info.isfile():
                            continue
                        etag = hashlib.md5(
                            "-".join([petag or "", info.name, str(info.mtime)]).encode(),
                            usedforsecurity=False,
                        ).hexdigest()
                        out.append(
                            (ppath, f"{ppath}/{info.name}", info.size, info.offset_data, etag)
                        )
            yield pd.DataFrame(out, columns=[f.name for f in MEMBER_SCHEMA.fields])

    return src.mapInPandas(_members, MEMBER_SCHEMA)


def read_vfile_bytes(
    members: DataFrame, archives: DataFrame, column: str = "file", data_col: str = "data"
) -> DataFrame:
    """Materialize member bytes: join members back to their parent
    archives and slice with a BINARY substring at (offset, size) — pure
    whole-stage codegen, the tar is never re-parsed (the reference's
    TarVFile.open seek+read, lib/file.py). The archive side carries whole
    shards, so the join is one shuffle of archive-sized rows; at corpus
    scale prefer bucketing both sides by the archive path."""
    arch = archives.select(
        F.col(f"{column}.path").alias("parent"), F.col(data_col).alias("__blob")
    )
    return (
        members.join(arch, "parent")
        .withColumn(
            "data",
            F.expr("substring(__blob, cast(offset + 1 as int), cast(size as int))"),
        )
        .drop("__blob")
    )


def to_webdataset(
    df: DataFrame,
    out_dir: str,
    key_col: str,
    shard_col: str,
    text_cols: Sequence[str] = (),
    bin_cols: Sequence[str] = (),
) -> DataFrame:
    """Write WebDataset shards: one tar per distinct `shard_col` value,
    one sample per row, one member per column (`<key>.<col>`). Text
    columns encode UTF-8; binary columns write raw. Members are emitted
    in sorted key order with mtime=0/uid=0, so identical input produces
    byte-identical shards (the determinism the oracle needs). Returns one
    row per shard (shard_path, n_samples).

    applyInPandas per shard — the writer streams on executors; `out_dir`
    must be shared storage on a real cluster (as any Spark sink's is)."""
    cols = [key_col, *text_cols, *bin_cols]
    os.makedirs(out_dir, exist_ok=True)

    out_schema = T.StructType(
        [
            T.StructField("shard_path", T.StringType()),
            T.StructField("n_samples", T.LongType()),
        ]
    )

    def _write(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = pdf[shard_col].iloc[0]
        path = os.path.join(out_dir, f"shard-{int(shard):06d}.tar")
        tmp = path + ".tmp"
        pdf = pdf.sort_values(key_col)
        with tarfile.open(tmp, "w") as tf:
            for _, row in pdf.iterrows():
                for c in cols[1:]:
                    val = row[c]
                    if val is None:
                        continue
                    payload = val.encode() if isinstance(val, str) else bytes(val)
                    info = tarfile.TarInfo(name=f"{row[key_col]}.{c}")
                    info.size = len(payload)
                    info.mtime = 0
                    tf.addfile(info, io.BytesIO(payload))
        os.replace(tmp, path)
        return pd.DataFrame([(path, len(pdf))], columns=["shard_path", "n_samples"])

    return (
        df.select(shard_col, *cols)
        .groupBy(shard_col)
        .applyInPandas(_write, out_schema)
    )


def read_webdataset(
    spark: SparkSession,
    uri: str,
    text_cols: Sequence[str] = (),
    bin_cols: Sequence[str] = (),
    glob: str = "*.tar",
) -> DataFrame:
    """Read WebDataset shards into one row per SAMPLE: members sharing a
    stem (`key.ext`) collapse into columns named by extension (reference
    lib/webdataset.py Builder/group-by-stem semantics; json stays a raw
    string — apply F.from_json downstream for typed access). Unlisted
    extensions are ignored, missing ones are NULL.

    One mapInPandas over whole shards: samples never cross shard
    boundaries in WebDataset, so there is NO shuffle — shard-parallel
    scan straight to sample rows."""
    from datachain_spark.sources.storage import read_storage

    shards = read_storage(spark, uri, type="binary", glob=glob)
    text_cols = list(text_cols)
    bin_cols = list(bin_cols)
    schema = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("shard", T.StringType()),
            *[T.StructField(c, T.StringType()) for c in text_cols],
            *[T.StructField(c, T.BinaryType()) for c in bin_cols],
        ]
    )
    wanted = set(text_cols) | set(bin_cols)

    def _samples(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for shard_path, blob in zip(pdf["__spath"], pdf["__bytes"]):
                samples: dict[str, dict[str, object]] = {}
                with tarfile.open(fileobj=io.BytesIO(bytes(blob))) as tf:
                    for info in tf.getmembers():
                        if not info.isfile():
                            continue
                        stem, dot, ext = info.name.rpartition(".")
                        if not dot or ext not in wanted:
                            continue
                        raw = tf.extractfile(info).read()
                        samples.setdefault(stem, {})[ext] = raw
                for key in sorted(samples):
                    d = samples[key]
                    rows.append(
                        (
                            key,
                            shard_path,
                            *[
                                (d[c].decode() if c in d else None)
                                for c in text_cols
                            ],
                            *[(bytes(d[c]) if c in d else None) for c in bin_cols],
                        )
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    src = shards.select(
        F.col("file.path").alias("__spath"), F.col("data").alias("__bytes")
    )
    return src.mapInPandas(_samples, schema)


def parse_json_member(df: DataFrame, col: str, schema: str) -> DataFrame:
    """Typed access to a json member column (the reference's laion-style
    parsed model, lib/webdataset_laion.py): one codegen from_json."""
    return df.withColumn(col, F.from_json(F.col(col), schema))


__all__ = [
    "process_tar",
    "read_vfile_bytes",
    "to_webdataset",
    "read_webdataset",
    "parse_json_member",
    "MEMBER_SCHEMA",
]


def _selftest_build_tar(path: str, members: dict[str, bytes]) -> None:
    """Deterministic tar builder for tests (mtime=0, sorted members)."""
    with tarfile.open(path, "w") as tf:
        for name in sorted(members):
            info = tarfile.TarInfo(name=name)
            info.size = len(members[name])
            info.mtime = 0
            tf.addfile(info, io.BytesIO(members[name]))
