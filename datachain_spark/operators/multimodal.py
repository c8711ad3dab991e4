"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark side — schema, partitioning, Arrow batch shape, UDF signatures —
is real and tested; the actual media decoding is STUBBED (the image/audio
libraries are not in this container) behind `decoder=` hooks: pass a real
decoder (e.g. PIL-based) in production, or use the deterministic fake for
tests. This mirrors how the reference treats files as typed pointers plus
lazy readers (/root/reference/src/datachain/lib/file.py:200-255) — except
payloads here live IN the table as binary columns, the layout a 100 TB
training-data lake actually uses (bytes sharded with their metadata,
no per-row object-store round trips).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)


def fake_image_decoder(payload: bytes) -> dict:
    """Deterministic stand-in for a real image decode: derives fake pixel
    stats purely from the bytes. Swap for a PIL/libvips decoder outside
    this container."""
    if payload is None:
        raise NotImplementedError("real decoder not available in this environment")
    import hashlib

    n = len(payload)
    return {
        "n_bytes": n,
        "mean_byte": (sum(payload[:256]) / min(n, 256)) if n else 0.0,
        # seed-independent digest: Python's built-in hash(bytes) is salted
        # per process (PYTHONHASHSEED), which would make phash differ across
        # executors/runs and break phash-based dedup determinism
        "phash": int.from_bytes(hashlib.md5(bytes(payload[:64])).digest()[:4], "big")
        & 0x7FFFFFFF,
    }


def decode_features(
    df: DataFrame,
    decoder: Callable[[bytes], dict] = fake_image_decoder,
    payload_col: str = "payload",
) -> DataFrame:
    """Decode/feature-extract over Arrow batches (mapInPandas): the decoder
    runs once per row INSIDE a batch loop — batch transfer, not per-row
    IPC. Output schema: input + (n_bytes, mean_byte, phash)."""
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("n_bytes", T.LongType(), True),
            T.StructField("mean_byte", T.DoubleType(), True),
            T.StructField("phash", T.LongType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decoder(p) for p in pdf[payload_col]]
            pdf = pdf.assign(
                n_bytes=[f["n_bytes"] for f in feats],
                mean_byte=[f["mean_byte"] for f in feats],
                phash=[f["phash"] for f in feats],
            )
            yield pdf

    return df.mapInPandas(run, out_schema)


def frame_sample(
    df: DataFrame,
    every_ms: int = 1000,
    payload_col: str = "payload",
    duration_col: str = "duration_ms",
) -> DataFrame:
    """Video frame sampling plumbing (1:N): emits one row per sampled
    timestamp with a stub frame payload (slice of the source bytes — a
    real implementation would demux). Partitioning: exploding is
    executor-local, no shuffle."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_ts_ms", T.IntegerType(), False),
            T.StructField("frame_payload", T.BinaryType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, dur, payload in zip(
                pdf["media_id"], pdf[duration_col], pdf[payload_col]
            ):
                dur = int(dur or 0)
                for ts in range(0, dur, every_ms):
                    lo = ts % max(len(payload), 1) if payload else 0
                    rows.append((mid, ts, bytes(payload[lo : lo + 16]) if payload else None))
            yield pd.DataFrame(rows, columns=["media_id", "frame_ts_ms", "frame_payload"])

    return df.mapInPandas(run, out_schema)


def gen_fake_media(spark, n: int = 100) -> DataFrame:
    """Deterministic fake media table (payload bytes derived from id)."""
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.encode(F.format_string("payload-%06d-", F.col("id")), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        (F.col("id") % 640 + 1).cast("int").alias("width"),
        (F.col("id") % 480 + 1).cast("int").alias("height"),
        (F.col("id") % 5000 + 1000).cast("int").alias("duration_ms"),
    )
    return df
