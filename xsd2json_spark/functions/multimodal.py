"""Multimodal columns: image/audio/video as opaque binary + typed
metadata.

The Spark-side plumbing is real and tested: schemas, Arrow-batched
mapInPandas pipelines, partitioning by media type, and batch-shape
contracts. Codec status per format:

- REAL, dependency-free (numpy/stdlib only, run green in tests):
  PPM/PGM binary images (``codec='ppm'``), 24-bit uncompressed BMP
  (``codec='bmp'``), baseline 8-bit PNG (``codec='png'`` — stdlib
  ``zlib`` inflate + numpy scanline unfilter, gray/RGB/RGBA,
  all five PNG filter types), baseline JPEG (``codec='jpeg'`` —
  numpy-only entropy decode + IDCT, see functions/jpeg.py: Huffman
  tables from DHT, 4:4:4/4:2:0/4:2:2 MCU walk, restart markers),
  RIFF/WAVE PCM audio (``codec='wav'`` — stdlib ``wave`` + numpy,
  8/16/32-bit, multi-channel downmixed), and Motion-JPEG VIDEO in a
  RIFF/AVI container (``video_frame_features(codec='mjpg')`` —
  functions/avi.py chunk walk + constant-frame-rate seek + per-frame
  baseline JPEG decode). PNG and JPEG are COMPRESSED formats, so the
  lossless-compressed and lossy-compressed image paths AND the video
  pixel path are all executable and oracle-checked in this sandbox.
- REAL but gated on the library being importable on the workers:
  ``codec='pil'`` (PIL is not in this container; the branch is written
  and plan-asserted identical).
- STUBBED (deterministic seeded fakes or NotImplementedError in strict
  mode): the remaining compressed formats — MP3/AAC audio, inter-frame
  video codecs (MP4/H.264 — ffmpeg is not in this container). For
  those the frame SAMPLING contract (which timestamps, what fan-out)
  is still real and oracle-checked (media_video_frame_index); only
  the per-frame pixel decode is fake.
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


def _thumb_feature(gray: np.ndarray) -> np.ndarray:
    """Grayscale h x w -> the FEATURE_DIM thumbnail feature shared by
    every real image codec: block-mean downsample to (FEATURE_DIM//8) x 8
    (nearest-neighbor upsample when the image is smaller than the
    grid), normalized to [0, 1]."""
    rows, cols = FEATURE_DIM // 8, 8
    h, w = gray.shape
    if h < rows or w < cols:
        rr = np.linspace(0, h - 1, rows).round().astype(int)
        cc = np.linspace(0, w - 1, cols).round().astype(int)
        thumb = gray[np.ix_(rr, cc)].astype(np.float64)
    else:
        ri = (np.arange(rows + 1) * h) // rows
        ci = (np.arange(cols + 1) * w) // cols
        thumb = np.empty((rows, cols), dtype=np.float64)
        for i in range(rows):
            for j in range(cols):
                thumb[i, j] = gray[ri[i]:ri[i + 1], ci[j]:ci[j + 1]].mean()
    return (thumb.reshape(-1) / 255.0).astype(np.float32)


def _decode_image_ppm(payload: bytes) -> np.ndarray:
    """REAL codec, numpy-only: binary PPM (P6, RGB) / PGM (P5,
    grayscale) — magic, whitespace-separated width/height/maxval header
    (with # comments), then raw samples. RGB converts to luma with the
    ITU-R 601 weights; output is the shared thumbnail feature."""
    tokens, pos = [], 0
    while len(tokens) < 4:
        # next header token; skip whitespace and # comments
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        tokens.append(payload[start:pos])
    magic, w, h, maxval = tokens[0], int(tokens[1]), int(tokens[2]), int(tokens[3])
    pos += 1  # single whitespace byte after maxval, then raw samples
    if magic not in (b"P5", b"P6"):
        raise ValueError(f"not a binary PGM/PPM payload (magic {magic!r})")
    if not (0 < maxval < 256):
        raise ValueError(f"unsupported maxval {maxval} (1-byte samples only)")
    ch = 3 if magic == b"P6" else 1
    arr = np.frombuffer(payload, dtype=np.uint8, count=w * h * ch, offset=pos)
    if ch == 3:
        rgb = arr.reshape(h, w, 3).astype(np.float64)
        gray = rgb @ np.array([0.299, 0.587, 0.114])
    else:
        gray = arr.reshape(h, w).astype(np.float64)
    return _thumb_feature(gray * (255.0 / maxval))


def _png_unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Invert the PNG scanline filters (spec §9: None/Sub/Up/Average/
    Paeth). ``raw`` is the zlib-decompressed stream: h rows of
    (1 filter byte + stride sample bytes). Sub/Average/Paeth have a
    within-row data dependence, so the inner walk is per-pixel — fine:
    this runs per-image inside an Arrow batch on a worker, images are
    the unit of parallelism."""
    out = np.zeros((h, stride), dtype=np.uint8)
    row_len = stride + 1
    for r in range(h):
        ftype = int(raw[r * row_len])
        line = raw[r * row_len + 1 : (r + 1) * row_len].astype(np.int32)
        prev = out[r - 1].astype(np.int32) if r > 0 else np.zeros(stride, dtype=np.int32)
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth: sequential in x
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0  # left
                b = prev[x]  # up
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) // 2
                else:
                    c = prev[x - bpp] if x >= bpp else 0  # up-left
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[r] = cur.astype(np.uint8)
    return out


#: PNG color type -> samples per pixel (alpha included; dropped for luma)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _decode_image_png(payload: bytes) -> np.ndarray:
    """REAL codec, stdlib+numpy only (``zlib`` inflate + numpy
    unfilter): baseline 8-bit PNG — grayscale (color type 0), RGB (2),
    gray+alpha (4), RGBA (6), non-interlaced. Chunk walk skips
    ancillary chunks; multiple IDATs concatenate into one zlib stream
    (the spec's required behavior). Alpha is dropped, RGB converts to
    luma with the ITU-R 601 weights (same as the PPM/BMP codecs);
    output is the shared thumbnail feature."""
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload (bad signature)")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(payload):
        clen = int.from_bytes(payload[pos : pos + 4], "big")
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + clen]
        pos += 12 + clen  # len + type + data + crc
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    bit_depth, color_type, _comp, _filt, interlace = ihdr[8:13]
    if bit_depth != 8 or interlace != 0 or color_type not in _PNG_CHANNELS:
        raise ValueError(
            f"unsupported PNG (bit_depth={bit_depth}, color_type={color_type}, "
            f"interlace={interlace}; baseline 8-bit non-interlaced only)"
        )
    ch = _PNG_CHANNELS[color_type]
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if len(raw) != h * (w * ch + 1):
        raise ValueError("PNG pixel data length mismatch")
    px = _png_unfilter(raw, h, w * ch, ch).reshape(h, w, ch)
    if color_type == 0:
        gray = px[:, :, 0].astype(np.float64)
    elif color_type == 4:
        gray = px[:, :, 0].astype(np.float64)  # gray + alpha: drop alpha
    else:
        gray = px[:, :, :3].astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    return _thumb_feature(gray)


def _png_filter_row(line: np.ndarray, prev: np.ndarray, ftype: int, bpp: int) -> np.ndarray:
    """Forward PNG filter (encoder side of _png_unfilter) — lets the
    synthesizer exercise every filter type so the decoder's inverse is
    genuinely tested, not just the filter-0 path."""
    li = line.astype(np.int32)
    pi = prev.astype(np.int32)
    n = len(li)
    left = np.concatenate([np.zeros(bpp, dtype=np.int32), li[:-bpp]]) if n > bpp else np.zeros(n, dtype=np.int32)
    upleft = np.concatenate([np.zeros(bpp, dtype=np.int32), pi[:-bpp]]) if n > bpp else np.zeros(n, dtype=np.int32)
    if ftype == 0:
        out = li
    elif ftype == 1:
        out = li - left
    elif ftype == 2:
        out = li - pi
    elif ftype == 3:
        out = li - (left + pi) // 2
    elif ftype == 4:
        p = left + pi - upleft
        pa, pb, pc = np.abs(p - left), np.abs(p - pi), np.abs(p - upleft)
        pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, pi, upleft))
        out = li - pred
    else:
        raise ValueError(f"unknown PNG filter type {ftype}")
    return (out & 0xFF).astype(np.uint8)


def encode_png(px: np.ndarray, filters=None) -> bytes:
    """Minimal real PNG writer (stdlib zlib + crc32): 8-bit gray
    (h, w) or RGB (h, w, 3), non-interlaced, one IDAT. ``filters``
    picks the per-row filter type (callable row -> 0..4; default
    cycles through all five so decode round-trips cover every
    inverse). Synthesis/test helper — at scale you read real files."""
    import zlib

    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    color_type = {1: 0, 3: 2}[ch]
    pick = filters if filters is not None else (lambda r: r % 5)
    flat = px.reshape(h, w * ch).astype(np.uint8)
    lines = []
    for r in range(h):
        ftype = int(pick(r))
        prev = flat[r - 1] if r > 0 else np.zeros(w * ch, dtype=np.uint8)
        lines.append(bytes([ftype]) + _png_filter_row(flat[r], prev, ftype, ch).tobytes())
    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes([8, color_type, 0, 0, 0])
    )

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return len(data).to_bytes(4, "big") + ctype + data + crc.to_bytes(4, "big")

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + chunk(b"IEND", b"")
    )


def synth_png_media(spark, n_rows: int = 64, w: int = 16, h: int = 8) -> DataFrame:
    """Deterministic media table whose payloads are REAL PNG files:
    ids < n_rows/2 are grayscale with pixel (r, c) = (id*7 + r*3 +
    c*5) % 256 (varying pixels so Sub/Up/Average/Paeth have real
    deltas), the rest are constant-color RGB (id*7, id*13, id*29)
    % 256; every image cycles the row filter by (r + id) % 5 so all
    five filters appear at every row position across the table. Both
    pixel formulas are SQL-replayable after the real decode (the
    cv_media_image_features_png oracle). Payloads are built
    driver-side (a demo table, like synth_wav_media); the decode runs
    distributed."""
    rows = []
    half = n_rows // 2
    for i in range(n_rows):
        if i < half:
            rr, cc = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
            px = ((i * 7 + rr * 3 + cc * 5) % 256).astype(np.uint8)
        else:
            px = np.full((h, w, 3), 0, dtype=np.uint8)
            px[:, :, 0] = (i * 7) % 256
            px[:, :, 1] = (i * 13) % 256
            px[:, :, 2] = (i * 29) % 256
        payload = encode_png(px, filters=lambda r, i=i: (r + i) % 5)
        rows.append(
            (i, "image", "image/png", bytearray(payload), w, h, 0)
        )
    return spark.createDataFrame(
        rows,
        "media_id long, kind string, mime string, payload binary, "
        "width int, height int, duration_ms long",
    )


def _decode_image_jpeg(payload: bytes) -> np.ndarray:
    """REAL codec, numpy-only (functions/jpeg.py): baseline JPEG —
    DHT-driven Huffman entropy decode, dequantize, IDCT, generic MCU
    sampling walk, restart markers. JPEG stores the luma plane
    directly (it IS the ITU-R 601 luma the other codecs derive from
    RGB), so the thumbnail feature reads Y without a chroma round-off
    chain."""
    from xsd2json_spark.functions.jpeg import decode_jpeg

    return _thumb_feature(decode_jpeg(payload))


def synth_jpeg_media(spark, n_rows: int = 64, w: int = 32, h: int = 16) -> DataFrame:
    """Deterministic media table whose payloads are REAL baseline JPEG
    files: grayscale images whose pixels are CONSTANT within each 8x8
    block — pixel (r, c) of image i = (i*17 + ((r//8)*(w//8) + c//8)
    * 37) % 256 — encoded with unit quant tables. Constant blocks
    round-trip BIT-EXACTLY through baseline JPEG (only the DC
    coefficient survives, an exact multiple of 8; see jpeg.py module
    docstring), so the decoded features are SQL-replayable from the
    formula even though JPEG is a lossy format. restart_interval
    cycles 0/1/2 MCUs by id so the RSTn resync + DC-predictor-reset
    path runs inside the oracle-checked set too. Payloads are built
    driver-side (a demo table, like synth_png_media); the decode runs
    distributed."""
    from xsd2json_spark.functions.jpeg import encode_jpeg

    rows = []
    bw = w // 8
    for i in range(n_rows):
        rr, cc = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        px = ((i * 17 + ((rr // 8) * bw + cc // 8) * 37) % 256).astype(np.uint8)
        payload = encode_jpeg(px, quant=1, restart_interval=i % 3)
        rows.append((i, "image", "image/jpeg", bytearray(payload), w, h, 0))
    return spark.createDataFrame(
        rows,
        "media_id long, kind string, mime string, payload binary, "
        "width int, height int, duration_ms long",
    )


def _decode_image_bmp(payload: bytes) -> np.ndarray:
    """REAL codec, numpy-only: 24-bit uncompressed (BI_RGB) BMP —
    little-endian header, 4-byte-aligned rows, bottom-up unless height
    is negative. BGR converts to luma; output is the shared thumbnail
    feature."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    bottom_up = h > 0
    h = abs(h)
    stride = ((w * 3 + 3) // 4) * 4
    rows = np.frombuffer(payload, dtype=np.uint8, count=h * stride, offset=data_off)
    bgr = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3).astype(np.float64)
    if bottom_up:
        bgr = bgr[::-1]
    gray = bgr @ np.array([0.114, 0.587, 0.299])  # B, G, R weights
    return _thumb_feature(gray)


def image_features(
    media: DataFrame, batch_hint: int = 1024, strict: bool = False, codec: str = "fake"
) -> DataFrame:
    """Arrow-batched feature extraction over image rows. The Spark side
    (filter pushdown on kind, column pruning to (media_id,payload,w,h),
    Arrow batch iteration) is identical for every codec — only the
    per-payload decode differs: codec='fake' (deterministic stub for
    formats with no decoder in this container, e.g. MP3),
    codec='ppm' / codec='bmp' / codec='png' / codec='jpeg' (REAL
    stdlib+numpy decoders, run green in tests — png covers the
    lossless-compressed path via zlib inflate + scanline unfilter,
    jpeg the lossy-compressed path via Huffman entropy decode + IDCT),
    or codec='pil' (real decode when PIL is importable on the
    workers)."""
    if codec not in ("fake", "pil", "ppm", "bmp", "png", "jpeg"):
        raise ValueError(f"unknown codec {codec!r}")

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = {
            "pil": _decode_image_pil,
            "ppm": _decode_image_ppm,
            "bmp": _decode_image_bmp,
            "png": _decode_image_png,
            "jpeg": _decode_image_jpeg,
            "fake": lambda p: _decode_image_bytes(p, strict),
        }[codec]
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


def synth_wav_media(
    spark, n_rows: int = 40, sr: int = 8000, duration_ms: int = 500, period: int = 8
) -> DataFrame:
    """Deterministic media table whose payloads are REAL RIFF/WAVE PCM
    files (stdlib ``wave``): media i carries a square wave of amplitude
    (i % 15 + 1) * 2048 flipping sign every ``period`` samples — chosen
    so rms = (i % 15 + 1) / 16 and the zero-crossing rate are exactly
    representable and hence SQL-replayable after the real decode.
    Payloads are built driver-side (n_rows * ~sr bytes — a demo table;
    at scale you read real files), the decode runs distributed."""
    import io
    import wave as wavmod

    rows = []
    n = sr * duration_ms // 1000
    sign = np.where(np.arange(n) // period % 2 == 0, 1, -1).astype(np.int64)
    for i in range(n_rows):
        amp = (i % 15 + 1) * 2048
        buf = io.BytesIO()
        with wavmod.open(buf, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(sr)
            wf.writeframes((amp * sign).astype("<i2").tobytes())
        rows.append((i, "audio", "audio/wav", bytearray(buf.getvalue()),
                     0, 0, duration_ms))
    return spark.createDataFrame(
        rows,
        "media_id long, kind string, mime string, payload binary, "
        "width int, height int, duration_ms long",
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


def _decode_audio_wav(payload: bytes) -> "tuple[np.ndarray, int]":
    """REAL codec, stdlib+numpy only: RIFF/WAVE PCM via the ``wave``
    module — 8-bit unsigned, 16/32-bit signed little-endian;
    multi-channel downmixed by mean. Returns (float32 waveform in
    [-1, 1], sample_rate)."""
    import io
    import wave as wavmod

    with wavmod.open(io.BytesIO(payload)) as wf:
        sr = wf.getframerate()
        ch = wf.getnchannels()
        sw = wf.getsampwidth()
        raw = wf.readframes(wf.getnframes())
    if sw == 2:
        a = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif sw == 1:
        a = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif sw == 4:
        a = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"unsupported WAV sample width {sw}")
    if ch > 1:
        a = a.reshape(-1, ch).mean(axis=1).astype(np.float32)
    return a, sr


def audio_frame_features(
    media: DataFrame, frame_ms: int = 250, strict: bool = False, codec: str = "fake"
) -> DataFrame:
    """Arrow-batched audio framing: decode -> non-overlapping frame_ms
    windows -> per-frame RMS energy + zero-crossing rate. One input row
    fans out to O(duration/frame_ms) feature rows INSIDE the Arrow
    batch (no explode shuffle); the scan is pruned to audio rows and
    (media_id, payload, duration_ms) before any Python. codec='wav'
    REALLY decodes RIFF/WAVE PCM payloads (stdlib wave + numpy, frame
    size from each file's own sample rate); codec='fake' is the
    deterministic stub for compressed formats."""
    if codec not in ("fake", "wav"):
        raise ValueError(f"unknown codec {codec!r}")

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "start_ms": [], "rms": [], "zcr": []}
            for mid, p, dur in zip(pdf["media_id"], pdf["payload"], pdf["duration_ms"]):
                payload = p if isinstance(p, (bytes, bytearray)) else bytes(p)
                if codec == "wav":
                    wave, sr = _decode_audio_wav(payload)
                else:
                    wave, sr = _decode_audio_bytes(payload, int(dur), strict), AUDIO_SR
                frame_n = max(1, sr * frame_ms // 1000)
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
    thumbnail feature — a real ffmpeg seek+decode would drop in here
    for formats beyond MJPEG-in-AVI (which IS real: codec='mjpg')."""
    if strict:
        raise NotImplementedError("strict mode: no video codec selected")
    seed = (int.from_bytes(payload[:8].ljust(8, b"\0"), "little") ^ (ts_ms * 2654435761)) & 0x7FFFFFFF
    rng = np.random.RandomState(seed)
    return rng.standard_normal(FEATURE_DIM).astype(np.float32)


def video_frame_features(
    media: DataFrame, n_frames: int = 4, strict: bool = False, codec: str = "fake"
) -> DataFrame:
    """Uniform frame sampling: each video row emits n_frames feature
    rows at evenly spaced timestamps across its duration. Fan-out
    happens inside the Arrow batch (no explode shuffle); scan pruned to
    video rows and (media_id, payload, duration_ms).

    codec='mjpg' REALLY decodes: the payload is parsed as a RIFF/AVI
    Motion-JPEG container (functions/avi.py), the container is parsed
    ONCE per video row, the constant-frame-rate frame covering each
    sampled timestamp is selected, and its JPEG payload decodes through
    the dependency-free baseline JPEG codec (functions/jpeg.py) into
    the shared thumbnail feature. codec='fake' keeps the deterministic
    stub for containers with no decoder in this sandbox (MP4/H.264
    etc. — ffmpeg is not installed)."""
    if codec not in ("fake", "mjpg"):
        raise ValueError(f"unknown codec {codec!r}")

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from xsd2json_spark.functions.avi import frame_index_at, parse_avi_mjpg
        from xsd2json_spark.functions.jpeg import decode_jpeg

        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "ts_ms": [], "feature": []}
            for mid, p, dur in zip(pdf["media_id"], pdf["payload"], pdf["duration_ms"]):
                payload = p if isinstance(p, (bytes, bytearray)) else bytes(p)
                if codec == "mjpg":
                    frames, usec = parse_avi_mjpg(payload)
                    decoded: dict = {}  # container-frame idx -> feature (a sampled ts pair may share a frame)
                for i in range(n_frames):
                    ts = int(dur) * (2 * i + 1) // (2 * n_frames)  # frame-center sampling
                    if codec == "mjpg":
                        fi = frame_index_at(ts, len(frames), usec)
                        if fi not in decoded:
                            decoded[fi] = _thumb_feature(decode_jpeg(frames[fi])).tolist()
                        feat = decoded[fi]
                    else:
                        feat = _decode_video_frame(payload, ts, strict).tolist()
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["ts_ms"].append(ts)
                    out["feature"].append(feat)
            yield pd.DataFrame(out)

    pruned = media.filter(F.col("kind") == "video").select("media_id", "payload", "duration_ms")
    return pruned.mapInPandas(_extract, schema=VIDEO_FRAME_SCHEMA)


def synth_mjpeg_media(
    spark, n_rows: int = 40, w: int = 16, h: int = 8, n_frames: int = 5,
    usec_per_frame: int = 100_000,
) -> DataFrame:
    """Deterministic media table whose payloads are REAL Motion-JPEG
    AVI files: video i carries n_frames grayscale JPEG frames
    (functions/avi.encode_avi_mjpg around functions/jpeg.encode_jpeg);
    pixel (r, c) of frame f is constant within each 8x8 block —
    gray = (i*17 + f*53 + block_index*37) % 256 — with unit quant
    tables, so every decoded thumbnail value is SQL-replayable from
    the formula (constant blocks round-trip bit-exactly through
    baseline JPEG, same argument as synth_jpeg_media). duration_ms =
    n_frames * usec_per_frame / 1000 — the frame-center sampling
    timestamps land on distinct container frames, exercising the
    constant-frame-rate seek. Payloads are built driver-side (a demo
    table); parse + decode run distributed."""
    from xsd2json_spark.functions.avi import encode_avi_mjpg
    from xsd2json_spark.functions.jpeg import encode_jpeg

    bw = w // 8
    rows = []
    for i in range(n_rows):
        frames = []
        for f in range(n_frames):
            rr, cc = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
            px = ((i * 17 + f * 53 + ((rr // 8) * bw + cc // 8) * 37) % 256).astype(np.uint8)
            frames.append(encode_jpeg(px, quant=1, restart_interval=i % 3))
        payload = encode_avi_mjpg(frames, usec_per_frame, w, h)
        dur = n_frames * usec_per_frame // 1000
        rows.append((i, "video", "video/x-msvideo", bytearray(payload), w, h, dur))
    return spark.createDataFrame(
        rows,
        "media_id long, kind string, mime string, payload binary, "
        "width int, height int, duration_ms long",
    )
