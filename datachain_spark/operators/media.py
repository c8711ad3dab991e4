"""Scalar media API — the reference's lib/audio.py, lib/image.py,
lib/video.py, lib/clip.py and lib/text.py surface, re-expressed over this
repo's REAL stdlib codecs (WAV via `wave`, BMP/AVI via `struct` —
operators/multimodal.py) instead of soundfile/PIL/ffmpeg, which are not in
this container.

Everything here is genuinely computed — PCM decode, nearest-neighbor
resize, DIB frame demux/remux, CLIP-style logits — not stubbed. The only
gated parts are *external model* hooks (preprocess/tokenizer/encoder
callables), which are duck-typed exactly like the reference's (it calls
``model.encode_image`` / ``model.encode_text`` / ``result.summary()``
without caring where they come from), so deterministic fakes test them.

Scalar functions take `bytes` payloads (this engine models media as opaque
binary columns with typed metadata; SURVEY.md §1). The distributed scale
path is the mapInPandas fragment extractors at the bottom: Arrow-batched
binary-in/binary-out, no driver involvement, safe at 100 TB.

Reference parity map:
  audio_info/audio_to_np/audio_to_bytes/save_audio  <- lib/audio.py:22-245
  image_info/convert_image/convert_images            <- lib/image.py:9-104
  video_info/video_frame_np/video_frame_bytes/
  save_video_frame/save_video_fragment/
  validate_frame_range                               <- lib/video.py:20-220
  clip_similarity_scores/convert_text                <- lib/clip.py:35-181,
                                                        lib/text.py:8-44
"""

from __future__ import annotations

import io
import os
import posixpath
import struct
import wave
from collections.abc import Callable, Iterator
from typing import Any

import numpy as np

from datachain_spark.operators.multimodal import (
    demux_avi_frames,
    mux_avi,
    parse_avi,
    parse_bmp,
)


class MediaError(ValueError):
    """Analog of the reference's FileError (lib/file.py): unrecoverable
    decode/convert failure on one media payload."""


# ---------------------------------------------------------------------------
# audio (real WAV PCM; reference lib/audio.py)
# ---------------------------------------------------------------------------


def audio_info(payload: bytes) -> dict:
    """WAV metadata: sample rate, channels, duration, samples, format,
    codec, bit rate (reference audio_info, lib/audio.py:22-66)."""
    try:
        with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
            channels = w.getnchannels()
            rate = w.getframerate()
            frames = w.getnframes()
            bits = w.getsampwidth() * 8
    except Exception as exc:
        raise MediaError("unable to extract metadata from audio file") from exc
    return {
        "sample_rate": int(rate),
        "channels": int(channels),
        "duration": float(frames / rate) if rate else 0.0,
        "samples": int(frames),
        "format": "wav",
        # soundfile-style subtype naming (PCM_U8 is the 8-bit WAV subtype)
        "codec": "PCM_U8" if bits == 8 else f"PCM_{bits}",
        "bit_rate": int(bits * rate * channels) if bits > 0 else -1,
    }


def _wav_read(payload: bytes) -> tuple[np.ndarray, int, int]:
    """Decode WAV PCM -> (int array shaped (frames, channels), rate, bits)."""
    with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
        channels, sampwidth, rate, n = (
            w.getnchannels(),
            w.getsampwidth(),
            w.getframerate(),
            w.getnframes(),
        )
        raw = w.readframes(n)
    if sampwidth == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.int32)
    elif sampwidth == 1:
        data = np.frombuffer(raw, dtype=np.uint8).astype(np.int32) - 128
    else:
        raise MediaError(f"unsupported WAV sample width: {sampwidth}")
    return data.reshape(-1, channels), rate, sampwidth * 8


def audio_to_np(
    payload: bytes, start: float = 0, duration: float | None = None
) -> tuple[np.ndarray, int]:
    """Load an audio fragment as float32 samples in [-1, 1) — soundfile's
    convention. Mono -> shape (frames,), multi-channel -> (frames,
    channels). Same validation as the reference (lib/audio.py:104-144)."""
    if start < 0:
        raise ValueError("start must be a non-negative float")
    if duration is not None and duration <= 0:
        raise ValueError("duration must be a positive float")
    try:
        data, rate, bits = _wav_read(payload)
    except MediaError:
        raise
    except Exception as exc:
        raise MediaError("unable to read audio fragment") from exc
    offset = int(start * rate)
    end = offset + int(duration * rate) if duration is not None else len(data)
    frag = data[offset:end]
    scale = float(1 << (bits - 1))
    out = (frag / scale).astype(np.float32)
    return (out[:, 0] if out.shape[1] == 1 else out), int(rate)


def audio_to_bytes(
    payload: bytes,
    format: str = "wav",
    start: float = 0,
    duration: float | None = None,
) -> bytes:
    """Re-encode an audio fragment (16-bit PCM WAV — the one real encoder
    in this container; reference audio_to_bytes, lib/audio.py:148-164).
    int16 survives the float32 round-trip exactly, so a full-file
    re-encode is sample-identical to the source PCM."""
    if format != "wav":
        raise NotImplementedError(
            f"audio format {format!r} needs an external codec; only 'wav' "
            "is available in-container"
        )
    y, sr = audio_to_np(payload, start, duration)
    pcm = np.clip(np.round(y * 32768.0), -32768, 32767).astype("<i2")
    channels = 1 if pcm.ndim == 1 else pcm.shape[1]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def save_audio(
    payload: bytes,
    stem: str,
    output: str,
    format: str | None = None,
    start: float = 0,
    end: float | None = None,
) -> dict:
    """Save a full file or fragment with the reference's naming scheme
    (`{stem}_{start_ms:06d}_{end_ms:06d}.{fmt}`; lib/audio.py:167-245).
    Returns a File-style dict (path, size)."""
    fmt = format or "wav"
    if start < 0:
        raise ValueError(
            f"Can't save audio for '{stem}', start time must be "
            f"non-negative: {start:.3f}"
        )
    if end is None and start == 0:
        name = f"{stem}.{fmt}"
        data = audio_to_bytes(payload, fmt)
    elif end is None:
        name = f"{stem}_{int(start * 1000):06d}_end.{fmt}"
        data = audio_to_bytes(payload, fmt, start=start)
    else:
        if end < 0 or start >= end:
            raise ValueError(
                f"Can't save audio for '{stem}', invalid time range: "
                f"({start:.3f}, {end:.3f})"
            )
        name = f"{stem}_{int(start * 1000):06d}_{int(end * 1000):06d}.{fmt}"
        data = audio_to_bytes(payload, fmt, start, end - start)
    path = posixpath.join(output, name)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(data)
    return {"path": path, "size": len(data)}


# ---------------------------------------------------------------------------
# image (real 24-bit BMP; reference lib/image.py)
# ---------------------------------------------------------------------------


def image_info(payload: bytes) -> dict:
    """Image metadata (reference image_info, lib/image.py:9-28)."""
    try:
        meta = parse_bmp(payload)
    except Exception as exc:
        raise MediaError("unable to open image file") from exc
    return {"width": meta["width"], "height": meta["height"], "format": "bmp"}


def bmp_to_np(payload: bytes) -> np.ndarray:
    """Decode a 24-bit BI_RGB BMP -> uint8 RGB array shaped (h, w, 3),
    top-down row order."""
    if payload is None or len(payload) < 54 or bytes(payload[:2]) != b"BM":
        raise MediaError("not a BMP payload")
    pixel_off = struct.unpack_from("<I", payload, 10)[0]
    _, width, height, _planes, bpp, compression = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if bpp != 24 or compression != 0:
        raise MediaError(f"unsupported BMP variant (bpp={bpp})")
    bottom_up = height > 0
    height = abs(height)
    stride = width * 3 + ((-width * 3) % 4)
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * height, offset=pixel_off)
    img = rows.reshape(height, stride)[:, : width * 3].reshape(height, width, 3)
    if bottom_up:
        img = img[::-1]
    return img[:, :, ::-1].copy()  # BGR -> RGB


def np_to_bmp(arr: np.ndarray) -> bytes:
    """Encode a uint8 RGB (h, w, 3) array as a bottom-up 24-bit BMP."""
    h, w = arr.shape[:2]
    if arr.ndim == 2:  # grayscale -> replicate channels
        arr = np.stack([arr] * 3, axis=-1)
    bgr = arr[:, :, ::-1]
    stride = w * 3 + ((-w * 3) % 4)
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    body = rows[::-1].tobytes()  # bottom-up
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 14 + 40
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + body


def _resize_nn(img: np.ndarray, size: tuple[int, int]) -> np.ndarray:
    """Nearest-neighbor resize to (width, height) — PIL argument order."""
    new_w, new_h = size
    h, w = img.shape[:2]
    ys = (np.arange(new_h) * h // new_h).clip(0, h - 1)
    xs = (np.arange(new_w) * w // new_w).clip(0, w - 1)
    return img[ys][:, xs]


def convert_image(
    payload: bytes | np.ndarray,
    mode: str = "RGB",
    size: tuple[int, int] | None = None,
    transform: Callable | None = None,
    encoder: Callable | None = None,
) -> Any:
    """Decode + mode-convert + resize + transform + encode one image
    (reference convert_image, lib/image.py:31-70). `mode` supports 'RGB'
    and 'L' (ITU-R 601 luminance, PIL's formula); transform/encoder are
    duck-typed callables as in the reference."""
    img = payload if isinstance(payload, np.ndarray) else bmp_to_np(payload)
    if mode == "L":
        # PIL convert('L'): L = R*299/1000 + G*587/1000 + B*114/1000
        f = img.astype(np.uint32)
        img = (
            (f[:, :, 0] * 299 + f[:, :, 1] * 587 + f[:, :, 2] * 114) // 1000
        ).astype(np.uint8)
    elif mode not in ("RGB", ""):
        raise MediaError(f"unsupported image mode: {mode}")
    if size:
        img = _resize_nn(img, size)
    out: Any = img
    if transform:
        out = transform(out)
        if encoder:
            out = np.asarray(out)[None, ...]  # reference's unsqueeze(0)
    if encoder:
        out = encoder(out)
    return out


def convert_images(
    images: Any,
    mode: str = "RGB",
    size: tuple[int, int] | None = None,
    transform: Callable | None = None,
    encoder: Callable | None = None,
) -> Any:
    """Batch convert_image; stacks transformed arrays before the encoder
    (reference convert_images, lib/image.py:73-104)."""
    if isinstance(images, (bytes, bytearray, np.ndarray)):
        images = [images]
    converted = [convert_image(i, mode, size, transform) for i in images]
    if isinstance(converted[0], np.ndarray):
        converted = np.stack(converted)
    if encoder:
        converted = encoder(converted)
    return converted


# ---------------------------------------------------------------------------
# video (real RIFF AVI; reference lib/video.py)
# ---------------------------------------------------------------------------


def video_info(payload: bytes) -> dict:
    """Video metadata (reference video_info, lib/video.py:20-86)."""
    try:
        meta = parse_avi(payload)
    except Exception as exc:
        raise MediaError("unable to extract metadata from video file") from exc
    return {
        "width": meta["width"],
        "height": meta["height"],
        "fps": float(meta["fps"]),
        "duration": meta["duration_ms"] / 1000.0,
        "frames": meta["n_frames"],
        "format": "avi",
        "codec": "rawvideo",
    }


def video_frame_np(payload: bytes, frame: int) -> np.ndarray:
    """One decoded frame as a uint8 RGB (h, w, 3) array (reference
    video_frame_np, lib/video.py:89-104)."""
    if frame < 0:
        raise ValueError("frame must be a non-negative integer")
    meta = parse_avi(payload)
    frames = demux_avi_frames(payload)
    if frame >= len(frames):
        raise IndexError(f"frame {frame} out of range ({len(frames)} frames)")
    w, h = meta["width"], meta["height"]
    stride = w * 3 + ((-w * 3) % 4)
    dib = np.frombuffer(frames[frame], dtype=np.uint8, count=stride * h)
    img = dib.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)[::-1]  # bottom-up
    return img[:, :, ::-1].copy()  # BGR -> RGB


def validate_frame_range(
    payload: bytes, start: int = 0, end: int | None = None, step: int = 1
) -> tuple[int, int, int]:
    """Same checks as the reference (lib/video.py:107-138)."""
    if start < 0:
        raise ValueError("start_frame must be a non-negative integer.")
    if step < 1:
        raise ValueError("step must be a positive integer.")
    if end is None:
        end = video_info(payload)["frames"]
    if end < 0:
        raise ValueError("end_frame must be a non-negative integer.")
    if start > end:
        raise ValueError("start_frame must be less than or equal to end_frame.")
    return start, end, step


def video_frame_bytes(payload: bytes, frame: int, format: str = "bmp") -> bytes:
    """One frame re-encoded as an image (reference video_frame_bytes,
    lib/video.py:141-154; jpg needs an external codec, bmp is real)."""
    if format != "bmp":
        raise NotImplementedError(
            f"image format {format!r} needs an external codec; only 'bmp' "
            "is available in-container"
        )
    return np_to_bmp(video_frame_np(payload, frame))


def save_video_frame(
    payload: bytes, stem: str, frame: int, output: str, format: str = "bmp"
) -> dict:
    """Save one frame as `{stem}_{frame:04d}.{fmt}` (reference
    save_video_frame, lib/video.py:157-180)."""
    data = video_frame_bytes(payload, frame, format)
    path = posixpath.join(output, f"{stem}_{frame:04d}.{format}")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(data)
    return {"path": path, "size": len(data)}


def save_video_fragment(
    payload: bytes,
    stem: str,
    start: float,
    end: float,
    output: str,
    format: str | None = None,
) -> dict:
    """Save a time interval as a new AVI: demux the covered frames and
    remux them at the source fps (`{stem}_{start_ms:06d}_{end_ms:06d}.avi`;
    reference save_video_fragment, lib/video.py:183-220)."""
    if start < 0 or end < 0 or start >= end:
        raise ValueError(
            f"Can't save video fragment for '{stem}', invalid time range: "
            f"({start:.3f}, {end:.3f})"
        )
    fmt = format or "avi"
    if fmt != "avi":
        raise NotImplementedError(
            f"video format {fmt!r} needs an external codec; only 'avi' is "
            "available in-container"
        )
    meta = parse_avi(payload)
    fps = meta["fps"] or 1
    frames = demux_avi_frames(payload)
    lo = min(int(start * fps), len(frames))
    hi = min(int(end * fps), len(frames))
    data = mux_avi(frames[lo:hi], meta["width"], meta["height"], fps)
    name = f"{stem}_{int(start * 1000):06d}_{int(end * 1000):06d}.{fmt}"
    path = posixpath.join(output, name)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(data)
    return {"path": path, "size": len(data), "frames": hi - lo}


# ---------------------------------------------------------------------------
# CLIP-style similarity (reference lib/clip.py, lib/text.py) — numpy math,
# duck-typed encoders exactly like the reference's model probing
# ---------------------------------------------------------------------------


def convert_text(
    text: str | list[str],
    tokenizer: Callable | None = None,
    tokenizer_kwargs: dict | None = None,
    encoder: Callable | None = None,
) -> Any:
    """Tokenize and optionally encode text (reference convert_text,
    lib/text.py:8-44; tensors are numpy here)."""
    if not tokenizer:
        return text
    if isinstance(text, str):
        text = [text]
    res = tokenizer(text, **tokenizer_kwargs) if tokenizer_kwargs else tokenizer(text)
    # transformers-style tokenizers return an object with .input_ids
    tokens = np.asarray(getattr(res, "input_ids", res))
    if not encoder:
        return tokens
    return encoder(tokens)


def _get_encoder(model: Any, type_: str) -> Callable:
    """Duck-typed model probing (reference _get_encoder, lib/clip.py:15-32):
    transformers CLIPModel exposes get_{type}_features, clip/open_clip
    expose encode_{type}."""
    for name in (f"get_{type_}_features", f"encode_{type_}"):
        fn = getattr(model, name, None)
        if callable(fn):
            return fn
    raise ValueError(
        f"Error encoding {type_}: 'model' must be a CLIP model from clip, "
        "open_clip, or transformers library."
    )


def _softmax(x: np.ndarray) -> np.ndarray:
    e = np.exp(x - x.max(axis=1, keepdims=True))
    return e / e.sum(axis=1, keepdims=True)


def clip_similarity_scores(
    images: Any | None,
    text: str | list[str] | None,
    model: Any,
    preprocess: Callable,
    tokenizer: Callable,
    prob: bool = False,
    image_to_text: bool = True,
) -> list[list[float]]:
    """CLIP similarity logits between images and/or text (reference
    clip_similarity_scores, lib/clip.py:35-181): encode both sides,
    L2-normalize, logits = 100 * A @ B.T, optional row softmax. All the
    image/text/both/neither branch semantics match the reference."""
    image_features = text_features = None
    if images is not None:
        enc = _get_encoder(model, "image")
        image_features = np.asarray(
            convert_images(images, transform=preprocess, encoder=enc)
        ).astype(np.float64)
        image_features /= np.linalg.norm(image_features, axis=-1, keepdims=True)
    if text is not None:
        enc = _get_encoder(model, "text")
        text_features = np.asarray(convert_text(text, tokenizer, encoder=enc)).astype(
            np.float64
        )
        text_features /= np.linalg.norm(text_features, axis=-1, keepdims=True)

    if image_features is not None and text_features is not None:
        logits = (
            100.0 * image_features @ text_features.T
            if image_to_text
            else 100.0 * text_features @ image_features.T
        )
    elif image_features is not None:
        logits = 100.0 * image_features @ image_features.T
    elif text_features is not None:
        logits = 100.0 * text_features @ text_features.T
    else:
        raise ValueError(
            "Error calculating CLIP similarity - provide at least one of "
            "images or text"
        )
    return (_softmax(logits) if prob else logits).tolist()


similarity_scores = clip_similarity_scores


# ---------------------------------------------------------------------------
# distributed fragment extraction — the scale path (mapInPandas,
# Arrow-batched binary-in/binary-out; nothing touches the driver)
# ---------------------------------------------------------------------------


def extract_audio_fragments(df, payload="payload", start="start", end="end"):
    """DataFrame op: for each row, cut [start, end) seconds out of a WAV
    payload column -> (fragment wav bytes + real decoded metadata). The
    per-partition work is pure CPU over Arrow batches; at cluster scale
    every executor cuts its own rows with zero shuffle."""
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            *df.schema.fields,
            T.StructField("fragment", T.BinaryType(), True),
            T.StructField("frag_samples", T.LongType(), True),
            T.StructField("frag_sr", T.LongType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frags, counts, srs = [], [], []
            for blob, s, e in zip(pdf[payload], pdf[start], pdf[end]):
                if blob is None:
                    frags.append(None), counts.append(None), srs.append(None)
                    continue
                frag = audio_to_bytes(bytes(blob), "wav", float(s), float(e) - float(s))
                info = audio_info(frag)
                frags.append(frag)
                counts.append(info["samples"])
                srs.append(info["sample_rate"])
            pdf = pdf.copy()
            pdf["fragment"], pdf["frag_samples"], pdf["frag_sr"] = frags, counts, srs
            yield pdf

    return df.mapInPandas(run, schema=schema)


def extract_video_fragments(df, payload="payload", start="start", end="end"):
    """DataFrame op: cut [start, end) seconds out of an AVI payload column
    -> (fragment avi bytes + real frame count), Arrow-batched."""
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            *df.schema.fields,
            T.StructField("fragment", T.BinaryType(), True),
            T.StructField("frag_frames", T.LongType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frags, counts = [], []
            for blob, s, e in zip(pdf[payload], pdf[start], pdf[end]):
                if blob is None:
                    frags.append(None), counts.append(None)
                    continue
                blob = bytes(blob)
                meta = parse_avi(blob)
                fps = meta["fps"] or 1
                frames = demux_avi_frames(blob)
                lo = min(int(float(s) * fps), len(frames))
                hi = min(int(float(e) * fps), len(frames))
                frags.append(mux_avi(frames[lo:hi], meta["width"], meta["height"], fps))
                counts.append(hi - lo)
            pdf = pdf.copy()
            pdf["fragment"], pdf["frag_frames"] = frags, counts
            yield pdf

    return df.mapInPandas(run, schema=schema)
