"""Multimodal columns: image/audio/video as binary columns with REAL codecs.

Images are decoded as real BMP (24-bit BI_RGB header + padded pixel rows,
parsed with stdlib struct) and audio as real WAV (stdlib `wave`), so
`decode_media` extracts true width/height/duration/amplitude stats and a
real 64-bit average-hash (8x8 luminance grid) from actual encoded bytes —
no NotImplementedError on the image/audio paths. The `decoder=` hooks stay
for production formats (JPEG/PNG via PIL, MP3 via ffmpeg — not in this
container); video demux is the one remaining hook-shaped stub (no stdlib
video container exists).

This mirrors how the reference treats files as typed pointers plus lazy
readers (/root/reference/src/datachain/lib/file.py:200-255) — except
payloads here live IN the table as binary columns, the layout a 100 TB
training-data lake actually uses (bytes sharded with their metadata,
no per-row object-store round trips). All decoding runs over Arrow
batches via mapInPandas: batch transfer, executor-local, no shuffle.
"""

from __future__ import annotations

import struct
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


# ---------- real BMP codec (stdlib struct; 24-bit BI_RGB) ----------


def encode_bmp(width: int, height: int, seed: int = 0) -> bytes:
    """A real, spec-compliant 24-bit uncompressed BMP with deterministic
    pixel content derived from `seed` — any BMP reader opens it."""
    row_raw = width * 3
    pad = (-row_raw) % 4
    img_size = (row_raw + pad) * height
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40
    ) + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up row order
        for x in range(width):
            for c in range(3):  # B, G, R
                rows.append((seed * 31 + x * 7 + y * 13 + c * 101) % 256)
        rows.extend(b"\x00" * pad)
    return header + bytes(rows)


def parse_bmp(payload: bytes) -> dict:
    """Parse a 24-bit BI_RGB BMP: header fields + true pixel statistics and
    a real 64-bit average-hash (8x8 luminance grid thresholded at its own
    mean — the standard aHash; near-identical images collide)."""
    if payload is None or len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pixel_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, width, height, _planes, bpp, compression = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, compression={compression})")
    bottom_up = height > 0
    height = abs(height)
    row_raw = width * 3
    stride = row_raw + ((-row_raw) % 4)

    def lum(x: int, y: int) -> float:
        # y is top-down image coordinate; map to stored row order
        row = (height - 1 - y) if bottom_up else y
        o = pixel_off + row * stride + x * 3
        b, g, r = payload[o], payload[o + 1], payload[o + 2]
        return (r + g + b) / 3.0

    total = 0
    for y in range(height):
        row = (height - 1 - y) if bottom_up else y
        o = pixel_off + row * stride
        total += sum(payload[o : o + row_raw])
    mean_pixel = total / (width * height * 3) if width and height else 0.0

    # average-hash: 8x8 sampled luminance grid, bit = lum > grid mean
    grid = [
        lum(min(gx * width // 8, width - 1), min(gy * height // 8, height - 1))
        for gy in range(8)
        for gx in range(8)
    ]
    gmean = sum(grid) / 64.0
    phash = 0
    for i, v in enumerate(grid):
        if v > gmean:
            phash |= 1 << i
    return {
        "width": int(width),
        "height": int(height),
        "mean_pixel": float(mean_pixel),
        "phash": phash & 0x7FFFFFFFFFFFFFFF,
    }


# ---------- real WAV codec (stdlib wave) ----------


def encode_wav(duration_ms: int, sample_rate: int = 8000, seed: int = 0) -> bytes:
    """A real RIFF/WAVE file (16-bit mono PCM via stdlib `wave`) with a
    deterministic sawtooth-ish waveform derived from `seed`."""
    import io
    import wave

    n_frames = max(1, sample_rate * int(duration_ms) // 1000)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        frames = bytearray()
        for i in range(n_frames):
            frames += struct.pack("<h", (((seed * 31 + i * 7) % 2048) - 1024) * 16)
        w.writeframes(bytes(frames))
    return buf.getvalue()


def parse_wav(payload: bytes) -> dict:
    """Parse a WAV container with stdlib `wave`: real channel count, sample
    rate, duration, and mean absolute amplitude over the PCM frames."""
    import io
    import wave

    if payload is None:
        raise ValueError("not a WAV payload")
    with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
        channels, sampwidth, rate, n_frames = (
            w.getnchannels(),
            w.getsampwidth(),
            w.getframerate(),
            w.getnframes(),
        )
        raw = w.readframes(n_frames)
    if sampwidth == 2:
        n = len(raw) // 2
        mean_amp = (
            sum(abs(s[0]) for s in struct.iter_unpack("<h", raw)) / n if n else 0.0
        )
    else:  # 8-bit unsigned
        mean_amp = sum(abs(b - 128) for b in raw) / len(raw) if raw else 0.0
    return {
        "channels": int(channels),
        "sample_rate": int(rate),
        "duration_ms": int(round(n_frames * 1000 / rate)) if rate else 0,
        "mean_amp": float(mean_amp),
    }


def decode_image(payload: bytes) -> dict:
    """Real image decode. BMP is parsed natively (stdlib); other container
    formats need an external library — swap this hook for a PIL-backed
    decoder in production."""
    return parse_bmp(payload)


def decode_audio(payload: bytes) -> dict:
    """Real audio decode: WAV natively (stdlib wave); swap the hook for an
    ffmpeg/soundfile decoder for compressed formats in production."""
    return parse_wav(payload)


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


def decode_media(
    df: DataFrame,
    image_decoder: Callable[[bytes], dict] = decode_image,
    audio_decoder: Callable[[bytes], dict] = decode_audio,
    video_decoder: Callable[[bytes], dict] | None = None,
    payload_col: str = "payload",
    kind_col: str = "kind",
) -> DataFrame:
    """Kind-dispatched media decode over Arrow batches: images through the
    real BMP parser, audio through the real WAV parser, video through the
    optional hook (None -> only n_bytes, the honest no-demuxer answer).
    Output adds real decoded features:
      n_bytes, dec_width, dec_height, dec_duration_ms, channels,
      sample_rate, mean_pixel, mean_amp, phash
    Executor-local (mapInPandas), no shuffle; decoding cost scales with
    payload bytes, so partition sizing is governed by
    spark.sql.files.maxPartitionBytes exactly like any scan-heavy stage."""
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("n_bytes", T.LongType(), True),
            T.StructField("dec_width", T.IntegerType(), True),
            T.StructField("dec_height", T.IntegerType(), True),
            T.StructField("dec_duration_ms", T.IntegerType(), True),
            T.StructField("channels", T.IntegerType(), True),
            T.StructField("sample_rate", T.IntegerType(), True),
            T.StructField("mean_pixel", T.DoubleType(), True),
            T.StructField("mean_amp", T.DoubleType(), True),
            T.StructField("phash", T.LongType(), True),
        ]
    )
    feat_names = [f.name for f in out_schema.fields[len(df.schema.fields) :]]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for kind, payload in zip(pdf[kind_col], pdf[payload_col]):
                row: dict = {n: None for n in feat_names}
                row["n_bytes"] = len(payload) if payload is not None else None
                if payload is None:
                    feats.append(row)
                    continue
                if kind == "image":
                    d = image_decoder(bytes(payload))
                    row.update(
                        dec_width=d["width"],
                        dec_height=d["height"],
                        mean_pixel=d["mean_pixel"],
                        phash=d["phash"],
                    )
                elif kind == "audio":
                    d = audio_decoder(bytes(payload))
                    row.update(
                        dec_duration_ms=d["duration_ms"],
                        channels=d["channels"],
                        sample_rate=d["sample_rate"],
                        mean_amp=d["mean_amp"],
                    )
                elif video_decoder is not None:
                    row.update(video_decoder(bytes(payload)))
                feats.append(row)
            out = pdf.copy()
            for n in feat_names:
                out[n] = [f[n] for f in feats]
            yield out

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
    """Deterministic media table with REAL encoded payloads: images are
    genuine BMP files (encode_bmp), audio genuine WAV files (encode_wav) —
    so decode_media exercises real byte parsing end-to-end. Video payloads
    stay opaque (no stdlib container format). Payload synthesis runs
    distributed over Arrow batches; metadata columns match the encoded
    content exactly (width/height == BMP header, duration_ms == WAV
    frames/rate)."""
    base = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("kind"),
        (F.col("id") % 24 + 5).cast("int").alias("width"),
        (F.col("id") % 16 + 4).cast("int").alias("height"),
        ((F.col("id") % 20 + 1) * 100).cast("int").alias("duration_ms"),
    )

    def make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, mimes = [], []
            for mid, kind, w, h, dur in zip(
                pdf["media_id"], pdf["kind"], pdf["width"], pdf["height"], pdf["duration_ms"]
            ):
                if kind == "image":
                    payloads.append(encode_bmp(int(w), int(h), seed=int(mid)))
                    mimes.append("image/bmp")
                elif kind == "audio":
                    payloads.append(encode_wav(int(dur), seed=int(mid)))
                    mimes.append("audio/wav")
                else:
                    payloads.append(f"video-{mid:06d}-".encode() * 4)
                    mimes.append("application/octet-stream")
            yield pdf.assign(payload=payloads, mime=mimes)[
                ["media_id", "kind", "payload", "mime", "width", "height", "duration_ms"]
            ]

    return base.mapInPandas(make, MEDIA_SCHEMA)
