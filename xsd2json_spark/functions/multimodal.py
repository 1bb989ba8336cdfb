"""Multimodal columns: image/audio/video as opaque binary + typed
metadata.

The Spark-side plumbing is real and tested: schemas, Arrow-batched
mapInPandas pipelines, partitioning by media type, and batch-shape
contracts. The actual codec work (image decode, resampling, frame
sampling) is STUBBED — the decode libraries (PIL/ffmpeg/librosa) are not
in this container — behind ``DeterministicFakeCodec`` (seeded,
shape-correct fake outputs) or ``NotImplementedError`` in strict mode.
Swap ``_decode_image_bytes`` et al. for real codecs in production.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)

IMAGE_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)

FEATURE_DIM = 32


def pil_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def _decode_image_bytes(payload: bytes, strict: bool = False) -> np.ndarray:
    """STUB codec: payload bytes seed a fixed-dim pseudo-feature
    (deterministic, shape-correct). strict=True raises instead (it must
    be passed as a closure value — a module global would not survive
    pickling to the Python workers). The real decoder is
    _decode_image_pil; select it with image_features(codec='pil')."""
    if strict:
        raise NotImplementedError("strict mode: no codec selected")
    seed = int.from_bytes(payload[:8].ljust(8, b"\0"), "little") & 0x7FFFFFFF
    rng = np.random.RandomState(seed)
    return rng.standard_normal(FEATURE_DIM).astype(np.float32)


def _decode_image_pil(payload: bytes) -> np.ndarray:
    """Real codec (used when PIL is importable on the workers): decode,
    grayscale, resize to 8x4, normalize to [0,1] — a FEATURE_DIM-float
    thumbnail feature. Import happens inside the worker call so the
    driver never needs PIL."""
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(payload)).convert("L").resize((8, FEATURE_DIM // 8))
    arr = np.asarray(img, dtype=np.float32).reshape(-1) / 255.0
    return arr[:FEATURE_DIM]


def image_features(
    media: DataFrame, batch_hint: int = 1024, strict: bool = False, codec: str = "fake"
) -> DataFrame:
    """Arrow-batched feature extraction over image rows. The Spark side
    (filter pushdown on kind, column pruning to (media_id,payload,w,h),
    Arrow batch iteration) is identical for every codec — only the
    per-payload decode differs: codec='fake' (deterministic stub,
    default — container has no image libs) or codec='pil' (real decode
    when PIL is importable on the workers)."""
    if codec not in ("fake", "pil"):
        raise ValueError(f"unknown codec {codec!r}")

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = _decode_image_pil if codec == "pil" else (
            lambda p: _decode_image_bytes(p, strict)
        )
        for pdf in batches:
            feats = [
                decode(p if isinstance(p, (bytes, bytearray)) else bytes(p)).tolist()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "feature": feats,
                }
            )

    pruned = media.filter(F.col("kind") == "image").select("media_id", "payload", "width", "height")
    return pruned.mapInPandas(_extract, schema=IMAGE_FEATURE_SCHEMA)


def synth_media(spark, n_rows: int = 200, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (binary payloads from sha2 hex)."""
    df = spark.range(n_rows)
    kind = F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.col("id") % 3 + 1).cast("int"))
    payload = F.to_binary(F.sha2(F.concat(F.col("id").cast("string"), F.lit(f"#{seed}")), 256), F.lit("hex"))
    return df.select(
        F.col("id").alias("media_id"),
        kind.alias("kind"),
        F.concat(F.lit("application/x-"), kind).alias("mime"),
        payload.alias("payload"),
        (F.col("id") % 640 + 16).cast("int").alias("width"),
        (F.col("id") % 480 + 16).cast("int").alias("height"),
        (F.col("id") * 33).cast("long").alias("duration_ms"),
    )


AUDIO_FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("start_ms", LongType()),
        StructField("rms", FloatType()),
        StructField("zcr", FloatType()),
    ]
)

#: stub sample rate for the fake PCM decode (real: from the container)
AUDIO_SR = 8000


def _decode_audio_bytes(payload: bytes, duration_ms: int, strict: bool = False) -> np.ndarray:
    """STUB codec: payload bytes seed a deterministic fake PCM waveform
    of the declared duration (float32, AUDIO_SR Hz). The real decoder
    (ffmpeg/librosa — not in this container) drops in here."""
    if strict:
        raise NotImplementedError("strict mode: no audio codec selected")
    seed = int.from_bytes(payload[:8].ljust(8, b"\0"), "little") & 0x7FFFFFFF
    n = max(1, int(duration_ms) * AUDIO_SR // 1000)
    rng = np.random.RandomState(seed)
    return rng.standard_normal(min(n, AUDIO_SR * 30)).astype(np.float32)  # cap 30 s


def audio_frame_features(media: DataFrame, frame_ms: int = 250, strict: bool = False) -> DataFrame:
    """Arrow-batched audio framing: decode (stubbed) -> non-overlapping
    frame_ms windows -> per-frame RMS energy + zero-crossing rate.
    One input row fans out to O(duration/frame_ms) feature rows INSIDE
    the Arrow batch (no explode shuffle); the scan is pruned to audio
    rows and (media_id, payload, duration_ms) before any Python."""
    frame_n = max(1, AUDIO_SR * frame_ms // 1000)

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "start_ms": [], "rms": [], "zcr": []}
            for mid, p, dur in zip(pdf["media_id"], pdf["payload"], pdf["duration_ms"]):
                wave = _decode_audio_bytes(
                    p if isinstance(p, (bytes, bytearray)) else bytes(p), int(dur), strict
                )
                n_frames = max(1, len(wave) // frame_n)
                for i in range(n_frames):
                    w = wave[i * frame_n : (i + 1) * frame_n]
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["start_ms"].append(i * frame_ms)
                    out["rms"].append(float(np.sqrt((w.astype(np.float64) ** 2).mean())))
                    out["zcr"].append(float((np.diff(np.signbit(w)) != 0).mean()) if len(w) > 1 else 0.0)
            yield pd.DataFrame(out)

    pruned = media.filter(F.col("kind") == "audio").select("media_id", "payload", "duration_ms")
    return pruned.mapInPandas(_extract, schema=AUDIO_FRAME_SCHEMA)


VIDEO_FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("ts_ms", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def _decode_video_frame(payload: bytes, ts_ms: int, strict: bool = False) -> np.ndarray:
    """STUB codec: (payload, timestamp) seed a deterministic fake frame
    thumbnail feature — the real ffmpeg seek+decode drops in here."""
    if strict:
        raise NotImplementedError("strict mode: no video codec selected")
    seed = (int.from_bytes(payload[:8].ljust(8, b"\0"), "little") ^ (ts_ms * 2654435761)) & 0x7FFFFFFF
    rng = np.random.RandomState(seed)
    return rng.standard_normal(FEATURE_DIM).astype(np.float32)


def video_frame_features(media: DataFrame, n_frames: int = 4, strict: bool = False) -> DataFrame:
    """Uniform frame sampling: each video row emits n_frames feature
    rows at evenly spaced timestamps across its duration. Fan-out
    happens inside the Arrow batch (no explode shuffle); scan pruned to
    video rows and (media_id, payload, duration_ms)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "ts_ms": [], "feature": []}
            for mid, p, dur in zip(pdf["media_id"], pdf["payload"], pdf["duration_ms"]):
                payload = p if isinstance(p, (bytes, bytearray)) else bytes(p)
                for i in range(n_frames):
                    ts = int(dur) * (2 * i + 1) // (2 * n_frames)  # frame-center sampling
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["ts_ms"].append(ts)
                    out["feature"].append(_decode_video_frame(payload, ts, strict).tolist())
            yield pd.DataFrame(out)

    pruned = media.filter(F.col("kind") == "video").select("media_id", "payload", "duration_ms")
    return pruned.mapInPandas(_extract, schema=VIDEO_FRAME_SCHEMA)
