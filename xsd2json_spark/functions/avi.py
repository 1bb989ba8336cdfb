"""Minimal RIFF/AVI container codec for Motion-JPEG video, numpy/stdlib
only — makes the VIDEO pixel-decode path real in this sandbox: an AVI
whose '00dc' chunks are baseline JPEG frames is parsed by
``parse_avi_mjpg`` and each sampled frame decodes through the
dependency-free JPEG codec (functions/jpeg.py).

Scope (documented, like the other baseline codecs):
- container: RIFF('AVI ') with LIST('hdrl') -> 'avih' + one
  LIST('strl') video stream ('strh' fccType='vids'), LIST('movi')
  holding '00dc'/'00db' frame chunks (word-aligned), optional 'idx1'.
- frame payloads: anything functions/jpeg.decode_jpeg accepts
  (baseline DCT, gray or 4:4:4/4:2:0/4:2:2 color, restart markers).
- timing: constant frame rate from avih.dwMicroSecPerFrame (falling
  back to strh rate/scale); frame for timestamp t = the frame whose
  display interval contains t (floor(t / frame_duration), clamped).

Reference parity note: the reference repo (fnogatz/xsd2json) has no
media surface at all — this module belongs to the training-data
pipeline extensions mandated by the build brief (SURVEY.md §2.10).
"""

from __future__ import annotations

import struct


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    """One RIFF chunk: fourcc + little-endian size + body + pad byte to
    word alignment (the pad byte is not counted in size)."""
    out = fourcc + struct.pack("<I", len(body)) + body
    if len(body) % 2:
        out += b"\0"
    return out


def _list(listtype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", listtype + body)


def encode_avi_mjpg(
    frames: "list[bytes]", usec_per_frame: int, width: int, height: int
) -> bytes:
    """Write a standard single-video-stream MJPG AVI: hdrl (avih +
    strl with strh/strf), movi with one '00dc' chunk per JPEG frame,
    and an idx1 index (AVIIF_KEYFRAME on every frame — MJPEG is
    all-intra). Sizes and alignment follow the RIFF rules so any AVI
    reader, not just parse_avi_mjpg, can open the output."""
    if not frames:
        raise ValueError("encode_avi_mjpg needs at least one frame")
    if usec_per_frame <= 0:
        raise ValueError("usec_per_frame must be positive")
    max_bytes = max(len(f) for f in frames)
    # avih: MainAVIHeader (56 bytes = 14 dwords)
    avih = struct.pack(
        "<14I",
        usec_per_frame,          # dwMicroSecPerFrame
        max_bytes * 1_000_000 // usec_per_frame,  # dwMaxBytesPerSec
        0,                       # dwPaddingGranularity
        0x10,                    # dwFlags: AVIF_HASINDEX
        len(frames),             # dwTotalFrames
        0,                       # dwInitialFrames
        1,                       # dwStreams
        max_bytes,               # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,              # dwReserved[4]
    )
    # strh: AVIStreamHeader (56 bytes incl. the two fourccs);
    # fps = dwRate / dwScale
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHH8I4H",
            0,                   # dwFlags
            0, 0,                # wPriority, wLanguage
            0,                   # dwInitialFrames
            usec_per_frame,      # dwScale
            1_000_000,           # dwRate
            0,                   # dwStart
            len(frames),         # dwLength (in frames)
            max_bytes,           # dwSuggestedBufferSize
            0xFFFFFFFF,          # dwQuality (driver default)
            0,                   # dwSampleSize (0 = varying)
            0, 0, width, height  # rcFrame left, top, right, bottom
        )
    )
    assert len(strh) == 56, len(strh)
    # strf: BITMAPINFOHEADER (40 bytes), biCompression = 'MJPG'
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    strl = _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf))
    hdrl = _list(b"hdrl", _chunk(b"avih", avih) + strl)

    movi_body = b"movi"
    offsets = []  # offset of each chunk relative to the 'movi' fourcc
    for f in frames:
        offsets.append(len(movi_body))
        movi_body += _chunk(b"00dc", f)
    movi = _chunk(b"LIST", movi_body)

    idx_body = b"".join(
        b"00dc" + struct.pack("<III", 0x10, off, len(f))  # AVIIF_KEYFRAME
        for off, f in zip(offsets, frames)
    )
    idx1 = _chunk(b"idx1", idx_body)

    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def parse_avi_mjpg(payload: bytes) -> "tuple[list[bytes], int]":
    """Parse an MJPG AVI -> (frame payload list in stream order,
    usec_per_frame). Walks the RIFF tree chunk-by-chunk; collects
    '00dc'/'00db' chunks of stream 0 from LIST('movi') (including
    LIST('rec ') groupings); frame timing from avih, falling back to
    the video strh rate/scale."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    frames: list[bytes] = []
    usec = 0
    strh_usec = 0

    def walk(buf: bytes, pos: int, end: int, in_movi: bool) -> None:
        nonlocal usec, strh_usec
        while pos + 8 <= end:
            fourcc = buf[pos : pos + 4]
            size = struct.unpack("<I", buf[pos + 4 : pos + 8])[0]
            body_start = pos + 8
            body_end = body_start + size
            if body_end > end:
                raise ValueError(f"truncated chunk {fourcc!r} at {pos}")
            if fourcc == b"LIST":
                listtype = buf[body_start : body_start + 4]
                walk(
                    buf,
                    body_start + 4,
                    body_end,
                    in_movi or listtype in (b"movi", b"rec "),
                )
            elif fourcc == b"avih":
                usec = struct.unpack("<I", buf[body_start : body_start + 4])[0]
            elif fourcc == b"strh" and buf[body_start : body_start + 4] == b"vids":
                scale, rate = struct.unpack(
                    "<II", buf[body_start + 20 : body_start + 28]
                )
                if rate:
                    strh_usec = scale * 1_000_000 // rate if scale else 0
            elif in_movi and fourcc in (b"00dc", b"00db"):
                frames.append(buf[body_start:body_end])
            pos = body_end + (size % 2)  # skip the alignment pad byte

    walk(payload, 12, len(payload), False)
    usec = usec or strh_usec
    if not frames:
        raise ValueError("no stream-0 video frames in AVI")
    if usec <= 0:
        raise ValueError("AVI carries no frame timing (avih/strh both zero)")
    return frames, usec


def frame_index_at(ts_ms: int, n_frames: int, usec_per_frame: int) -> int:
    """Constant-frame-rate seek: the frame whose display interval
    contains ts_ms, clamped to the stream."""
    idx = ts_ms * 1000 // usec_per_frame
    return max(0, min(n_frames - 1, int(idx)))
