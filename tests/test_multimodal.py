from xsd2json_spark.functions import multimodal as M


def test_media_pipeline_plumbing(spark):
    media = M.synth_media(spark, n_rows=120)
    feats = M.image_features(media)
    rows = feats.collect()
    # only image rows survive the kind filter (ids 2,5,8.. -> kind cycles)
    kinds = media.filter("kind = 'image'").count()
    assert len(rows) == kinds
    assert all(len(r["feature"]) == M.FEATURE_DIM for r in rows)
    # deterministic: same payload -> same fake feature
    again = {r["media_id"]: r["feature"] for r in M.image_features(media).collect()}
    first = {r["media_id"]: r["feature"] for r in rows}
    assert first == again


def test_strict_mode_raises(spark):
    media = M.synth_media(spark, n_rows=9)
    import pytest

    with pytest.raises(Exception):  # NotImplementedError surfaces as PythonException
        M.image_features(media, strict=True).collect()


def test_codec_selection_same_plan(spark):
    """The Spark plan (pruned scan -> mapInPandas) is identical for the
    fake and PIL codecs — only the worker-side decode differs."""
    import pytest as _pytest

    from xsd2json_spark.functions.multimodal import image_features, pil_available, synth_media

    media = synth_media(spark, n_rows=60)
    fake_plan = image_features(media, codec="fake")._jdf.queryExecution().executedPlan().toString()
    pil_plan = image_features(media, codec="pil")._jdf.queryExecution().executedPlan().toString()

    def shape(p):
        return [ln.split("(")[0].strip("+- *") for ln in p.splitlines() if ln.strip()]

    assert shape(fake_plan) == shape(pil_plan)
    assert "MapInPandas" in fake_plan

    with _pytest.raises(ValueError):
        image_features(media, codec="jpeg2000")


def test_pil_codec_real_decode(spark):
    """Runs only when PIL is importable (not in this container); the
    fake-codec path above runs always."""
    import pytest as _pytest

    from xsd2json_spark.functions.multimodal import image_features, pil_available

    if not pil_available():
        _pytest.skip("PIL not installed in this container")
    import io as _io

    from PIL import Image
    from pyspark.sql import functions as F

    buf = _io.BytesIO()
    Image.new("L", (16, 16), 128).save(buf, format="PNG")
    media = spark.createDataFrame(
        [(1, "image", "image/png", bytearray(buf.getvalue()), 16, 16, 0)],
        "media_id long, kind string, mime string, payload binary, width int, height int, duration_ms long",
    )
    rows = image_features(media, codec="pil").collect()
    assert len(rows) == 1 and len(rows[0]["feature"]) == 32
    assert all(abs(x - 128 / 255) < 1e-6 for x in rows[0]["feature"])


def test_audio_frame_features_shapes_and_determinism(spark):
    media = M.synth_media(spark, n_rows=60)
    rows = M.audio_frame_features(media, frame_ms=250).collect()
    n_audio = media.filter("kind = 'audio'").count()
    assert n_audio > 0
    assert {r["media_id"] for r in rows} == {
        r["media_id"] for r in media.filter("kind = 'audio'").collect()
    }
    # frame count follows the declared duration (capped fake wave)
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    for mid, frames in by_media.items():
        idxs = sorted(f["frame_idx"] for f in frames)
        assert idxs == list(range(len(frames)))  # dense 0..n-1
        assert all(f["start_ms"] == f["frame_idx"] * 250 for f in frames)
        assert all(0.0 <= f["zcr"] <= 1.0 and f["rms"] > 0 for f in frames)
    again = M.audio_frame_features(media, frame_ms=250).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))  # deterministic


def test_video_frame_sampling_centers_and_fanout(spark):
    media = M.synth_media(spark, n_rows=60)
    rows = M.video_frame_features(media, n_frames=4).collect()
    vids = {r["media_id"]: r["duration_ms"] for r in media.filter("kind = 'video'").collect()}
    assert len(rows) == 4 * len(vids)
    for r in rows:
        dur = vids[r["media_id"]]
        assert r["ts_ms"] == dur * (2 * r["frame_idx"] + 1) // 8  # frame centers
        assert len(r["feature"]) == M.FEATURE_DIM
    # distinct frames of one video differ (timestamp enters the seed)
    one = sorted((r for r in rows if r["media_id"] == min(vids)), key=lambda r: r["frame_idx"])
    if len(one) >= 2 and one[0]["ts_ms"] != one[1]["ts_ms"]:
        assert one[0]["feature"] != one[1]["feature"]


def test_audio_video_strict_mode_raises(spark):
    import pytest as _pytest

    media = M.synth_media(spark, n_rows=9)
    with _pytest.raises(Exception):
        M.audio_frame_features(media, strict=True).collect()
    with _pytest.raises(Exception):
        M.video_frame_features(media, strict=True).collect()


def _make_ppm(w, h, seed=3, gray=False, comment=False):
    """Synthesize a valid binary PPM (P6) / PGM (P5) payload."""
    import numpy as np

    rng = np.random.RandomState(seed)
    ch = 1 if gray else 3
    pixels = rng.randint(0, 256, size=(h, w, ch), dtype=np.uint8)
    magic = b"P5" if gray else b"P6"
    header = magic + b"\n"
    if comment:
        header += b"# synthesized by tests\n"
    header += b"%d %d\n255\n" % (w, h)
    return header + pixels.tobytes(), pixels


def _make_bmp(w, h, seed=4):
    """Synthesize a valid 24-bit uncompressed bottom-up BMP payload."""
    import numpy as np

    rng = np.random.RandomState(seed)
    bgr = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    stride = ((w * 3 + 3) // 4) * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    pix = rows[::-1].tobytes()  # bottom-up row order
    data_off = 14 + 40
    header = (
        b"BM" + (data_off + len(pix)).to_bytes(4, "little") + b"\0\0\0\0"
        + data_off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True) + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + len(pix).to_bytes(4, "little")
        + b"\0" * 16
    )
    return header + pix, bgr


def _make_wav(sr, samples, sampwidth=2, channels=1):
    """Synthesize a valid RIFF/WAVE PCM payload via stdlib wave."""
    import io
    import wave

    import numpy as np

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(sampwidth)
        wf.setframerate(sr)
        if sampwidth == 2:
            wf.writeframes(np.asarray(samples, dtype="<i2").tobytes())
        else:
            wf.writeframes(np.asarray(samples, dtype=np.uint8).tobytes())
    return buf.getvalue()


def _media_row(spark, payload, kind="image", dur=0):
    return spark.createDataFrame(
        [(1, kind, "application/x-test", bytearray(payload), 0, 0, dur)],
        "media_id long, kind string, mime string, payload binary, "
        "width int, height int, duration_ms long",
    )


def test_ppm_codec_real_decode(spark):
    """The numpy-only PPM decoder REALLY decodes: a constant-color P6
    image yields the constant normalized feature; a random image's
    feature equals the hand-computed 4x8 block means of the ITU-601
    luma. Header comments are honored. No skip — this real-codec branch
    executes in this container."""
    import numpy as np

    # constant-color check (bit-exact expectation)
    w, h = 32, 16
    const = np.full((h, w, 3), 100, dtype=np.uint8)
    payload = b"P6\n%d %d\n255\n" % (w, h) + const.tobytes()
    [row] = M.image_features(_media_row(spark, payload), codec="ppm").collect()
    expect = (100 * 0.299 + 100 * 0.587 + 100 * 0.114) / 255.0
    assert len(row["feature"]) == M.FEATURE_DIM
    assert all(abs(x - expect) < 1e-6 for x in row["feature"])

    # random image + comment header: matches the hand-computed block means
    payload, pixels = _make_ppm(24, 12, comment=True)
    [row] = M.image_features(_media_row(spark, payload), codec="ppm").collect()
    gray = pixels.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    got = np.array(row["feature"]).reshape(4, 8)
    for i in range(4):
        for j in range(8):
            block = gray[i * 3:(i + 1) * 3, j * 3:(j + 1) * 3].mean() / 255.0
            assert abs(got[i, j] - block) < 1e-6


def test_pgm_and_tiny_image_decode(spark):
    """P5 grayscale decodes; an image smaller than the 4x8 feature grid
    takes the nearest-neighbor upsample branch and still yields
    FEATURE_DIM values."""
    payload, _ = _make_ppm(3, 2, gray=True)
    [row] = M.image_features(_media_row(spark, payload), codec="ppm").collect()
    assert len(row["feature"]) == M.FEATURE_DIM
    assert all(0.0 <= x <= 1.0 for x in row["feature"])


def test_bmp_codec_real_decode(spark):
    """The numpy-only BMP decoder handles the 4-byte row padding and
    bottom-up row order: feature equals the hand-computed block means
    over the TOP-DOWN luma image."""
    import numpy as np

    payload, bgr = _make_bmp(22, 11)  # stride 68 != 66 -> padding exercised
    [row] = M.image_features(_media_row(spark, payload), codec="bmp").collect()
    gray = bgr.astype(np.float64) @ np.array([0.114, 0.587, 0.299])
    got = np.array(row["feature"]).reshape(4, 8)
    ri = (np.arange(5) * 11) // 4
    ci = (np.arange(9) * 22) // 8
    for i in range(4):
        for j in range(8):
            block = gray[ri[i]:ri[i + 1], ci[j]:ci[j + 1]].mean() / 255.0
            assert abs(got[i, j] - block) < 1e-6


def test_wav_codec_real_decode(spark):
    """The stdlib-wave codec REALLY decodes PCM: a 16-bit square wave at
    a known amplitude gives frames with rms = amplitude and the exact
    zero-crossing rate; the frame size follows the file's OWN sample
    rate (16 kHz here, not the stub's 8 kHz)."""
    import numpy as np

    sr = 16000
    amp = 8192  # -> 0.25 after /32768 normalization
    n = sr  # 1 s
    square = amp * np.where(np.arange(n) // 8 % 2 == 0, 1, -1)
    payload = _make_wav(sr, square)
    media = _media_row(spark, payload, kind="audio", dur=1000)
    rows = M.audio_frame_features(media, frame_ms=250, codec="wav").collect()
    assert len(rows) == 4  # 1 s at the FILE's sr -> four 250 ms frames
    for r in rows:
        assert abs(r["rms"] - 0.25) < 1e-6
        # sign flips every 8 samples -> zcr = (frame_n/8) / (frame_n-1)
        frame_n = sr * 250 // 1000
        assert abs(r["zcr"] - (frame_n / 8) / (frame_n - 1)) < 1e-3

    # stereo downmix: L = +amp, R = -amp -> silence
    stereo = np.empty(2 * n, dtype=np.int64)
    stereo[0::2], stereo[1::2] = amp, -amp
    rows = M.audio_frame_features(
        _media_row(spark, _make_wav(sr, stereo, channels=2), kind="audio", dur=1000),
        frame_ms=250, codec="wav",
    ).collect()
    assert all(abs(r["rms"]) < 1e-6 for r in rows)


def test_png_roundtrip_every_filter_type():
    """encode_png -> _decode_image_png round-trips to the same
    thumbnail feature for each of the five PNG scanline filters,
    grayscale and RGB — the filters are lossless, so every filter
    choice must decode identically."""
    import numpy as np

    rng = np.random.RandomState(7)
    gray = rng.randint(0, 256, size=(8, 16)).astype(np.uint8)
    rgb = rng.randint(0, 256, size=(8, 16, 3)).astype(np.uint8)
    want_g = M._thumb_feature(gray.astype(np.float64))
    want_c = M._thumb_feature(rgb.astype(np.float64) @ np.array([0.299, 0.587, 0.114]))
    for ft in range(5):
        assert np.array_equal(
            M._decode_image_png(M.encode_png(gray, filters=lambda r, f=ft: f)), want_g
        ), f"gray filter {ft}"
        assert np.array_equal(
            M._decode_image_png(M.encode_png(rgb, filters=lambda r, f=ft: f)), want_c
        ), f"rgb filter {ft}"


def test_png_rgba_and_gray_alpha_drop_alpha():
    """Color types 6 (RGBA) and 4 (gray+alpha) decode with the alpha
    plane ignored — hand-built chunk stream, filter 0."""
    import zlib

    import numpy as np

    def chunk(t, d):
        crc = zlib.crc32(t + d) & 0xFFFFFFFF
        return len(d).to_bytes(4, "big") + t + d + crc.to_bytes(4, "big")

    def build(px, color_type):
        h, w = px.shape[:2]
        lines = b"".join(b"\x00" + px[r].astype(np.uint8).tobytes() for r in range(h))
        ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, color_type, 0, 0, 0])
        return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(lines)) + chunk(b"IEND", b""))

    rng = np.random.RandomState(3)
    gray = rng.randint(0, 256, size=(8, 16)).astype(np.uint8)
    rgba = np.dstack([gray, gray // 2, gray // 3, np.full_like(gray, 99)])
    ga = np.dstack([gray, np.full_like(gray, 42)])
    want_rgba = M._thumb_feature(
        rgba[:, :, :3].astype(np.float64) @ np.array([0.299, 0.587, 0.114]))
    want_ga = M._thumb_feature(gray.astype(np.float64))
    assert np.array_equal(M._decode_image_png(build(rgba, 6)), want_rgba)
    assert np.array_equal(M._decode_image_png(build(ga, 4)), want_ga)


def test_png_rejects_malformed():
    import numpy as np
    import pytest as _pytest

    with _pytest.raises(ValueError, match="signature"):
        M._decode_image_png(b"NOTAPNG" + b"\0" * 64)
    # 16-bit depth unsupported: flip the bit-depth byte in a real file
    good = bytearray(M.encode_png(np.zeros((4, 4), dtype=np.uint8)))
    # IHDR data starts at offset 8 (sig) + 8 (len+type); bit depth is
    # byte 8 of the 13-byte IHDR payload
    good[8 + 8 + 8] = 16
    with _pytest.raises(ValueError, match="unsupported PNG"):
        M._decode_image_png(bytes(good))


def test_png_codec_distributed(spark):
    """The full distributed path: synth_png_media -> image_features
    (codec='png') over mapInPandas equals the driver-side decode of
    the same payloads."""
    import numpy as np

    media = M.synth_png_media(spark, n_rows=12, w=16, h=8)
    got = {r["media_id"]: np.array(r["feature"], dtype=np.float32)
           for r in M.image_features(media, codec="png").collect()}
    assert len(got) == 12
    for r in media.collect():
        want = M._decode_image_png(bytes(r["payload"]))
        assert np.array_equal(got[r["media_id"]], want), r["media_id"]


def test_jpeg_constant_block_bit_exact():
    """The oracle's exactness contract: grayscale constant-per-8x8-block
    images round-trip BIT-EXACTLY through baseline JPEG at unit quant
    (only the DC coefficient survives; it is an exact multiple of 8)."""
    import numpy as np

    from xsd2json_spark.functions.jpeg import decode_jpeg, encode_jpeg

    for i in (0, 3, 11):
        rr, cc = np.meshgrid(np.arange(16), np.arange(32), indexing="ij")
        px = ((i * 17 + ((rr // 8) * 4 + cc // 8) * 37) % 256).astype(np.uint8)
        for rst in (0, 1, 2):
            out = decode_jpeg(encode_jpeg(px, quant=1, restart_interval=rst))
            assert np.array_equal(out, px.astype(np.float64)), (i, rst)


def test_jpeg_roundtrip_tolerance_paths():
    """The lossy paths the oracle can't replay: arbitrary gray (AC
    runs + EXTEND), sparse blocks (ZRL + long runs), RGB 4:4:4 and
    4:2:0 with odd dimensions (color convert, chroma downsample, MCU
    padding), restart markers mid-stream. Unit quant bounds the error
    to DCT/round noise (<= 2 luma levels)."""
    import numpy as np

    from xsd2json_spark.functions.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.RandomState(0)
    gray = rng.randint(0, 256, (24, 40), dtype=np.uint8)
    assert np.abs(decode_jpeg(encode_jpeg(gray)) - gray).max() <= 2

    sparse = np.zeros((16, 16), dtype=np.uint8)
    sparse[3, 11], sparse[12, 2] = 255, 128
    assert np.abs(decode_jpeg(encode_jpeg(sparse)) - sparse).max() <= 2

    rgb = rng.randint(0, 256, (17, 23, 3), dtype=np.uint8)
    luma = rgb.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    for sub in (False, True):
        out = decode_jpeg(encode_jpeg(rgb, subsample=sub))
        assert out.shape == luma.shape
        assert np.abs(out - luma).max() <= 2, f"subsample={sub}"

    rst = decode_jpeg(encode_jpeg(gray, restart_interval=3))
    assert np.abs(rst - gray).max() <= 2

    # coarse quant still decodes (structure intact, larger error)
    q16 = decode_jpeg(encode_jpeg(gray, quant=16))
    assert q16.shape == gray.shape
    assert np.abs(q16 - gray).max() <= 8 * 16


def test_jpeg_rejects_malformed():
    import numpy as np
    import pytest as _pytest

    from xsd2json_spark.functions.jpeg import decode_jpeg, encode_jpeg

    with _pytest.raises(ValueError, match="no SOI"):
        decode_jpeg(b"\x00\x01\x02\x03")
    good = bytearray(encode_jpeg(np.zeros((8, 8), dtype=np.uint8)))
    # flip SOF0 (FFC0) to SOF2 (FFC2, progressive) -> rejected
    idx = bytes(good).index(b"\xff\xc0")
    good[idx + 1] = 0xC2
    with _pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg(bytes(good))


def test_jpeg_codec_distributed(spark):
    """The full distributed path: synth_jpeg_media -> image_features
    (codec='jpeg') over mapInPandas equals the driver-side decode of
    the same payloads AND the synthesis pixel formula (the oracle's
    equality, asserted in-process)."""
    import numpy as np

    media = M.synth_jpeg_media(spark, n_rows=12, w=32, h=16)
    got = {r["media_id"]: np.array(r["feature"], dtype=np.float32)
           for r in M.image_features(media, codec="jpeg").collect()}
    assert len(got) == 12
    for r in media.collect():
        want = M._decode_image_jpeg(bytes(r["payload"]))
        assert np.array_equal(got[r["media_id"]], want), r["media_id"]
        i = r["media_id"]
        formula = np.array(
            [((i * 17 + ((k // 8) // 2 * 4 + (k % 8) // 2) * 37) % 256) / 255.0
             for k in range(32)], dtype=np.float32)
        assert np.array_equal(got[i], formula), i


def test_avi_mjpg_roundtrip_and_timing():
    """RIFF/AVI MJPEG container: encode -> parse returns the exact
    frame payloads in order plus the frame timing; odd-sized frames
    exercise the word-alignment pad byte; constant-frame-rate seek
    clamps at both ends."""
    import numpy as np
    import pytest as _pytest

    from xsd2json_spark.functions.avi import (
        encode_avi_mjpg,
        frame_index_at,
        parse_avi_mjpg,
    )
    from xsd2json_spark.functions.jpeg import encode_jpeg

    frames = [
        encode_jpeg((np.full((8, 16), 10 * f) % 256).astype(np.uint8))
        for f in range(3)
    ]
    avi = encode_avi_mjpg(frames, 40_000, 16, 8)
    got, usec = parse_avi_mjpg(avi)
    assert usec == 40_000
    assert got == frames

    # word-alignment: an odd-length chunk gets a pad byte the parser
    # must skip without shifting the following frames (the container
    # does not inspect payloads, so raw odd/even bytes stand in)
    mixed = [b"\x01", b"\x02\x03", b"\x04\x05\x06"]
    got2, _ = parse_avi_mjpg(encode_avi_mjpg(mixed, 40_000, 16, 8))
    assert got2 == mixed

    # seek: 25 fps -> frame 0 covers [0,40) ms, clamp below 0 and past end
    assert frame_index_at(0, 3, 40_000) == 0
    assert frame_index_at(39, 3, 40_000) == 0
    assert frame_index_at(40, 3, 40_000) == 1
    assert frame_index_at(1_000_000, 3, 40_000) == 2

    with _pytest.raises(ValueError, match="not an AVI"):
        parse_avi_mjpg(b"RIFX" + avi[4:])
    with _pytest.raises(ValueError, match="truncated"):
        parse_avi_mjpg(avi[:-7])
    with _pytest.raises(ValueError, match="at least one frame"):
        encode_avi_mjpg([], 40_000, 16, 8)


def test_mjpg_video_codec_distributed(spark):
    """The full distributed REAL-video path: synth_mjpeg_media ->
    video_frame_features(codec='mjpg') over mapInPandas equals both
    the driver-side parse+decode of the same payloads AND the
    synthesis pixel formula with the constant-frame-rate seek (the
    oracle's equality, asserted in-process)."""
    import numpy as np

    from xsd2json_spark.functions.avi import frame_index_at, parse_avi_mjpg
    from xsd2json_spark.functions.jpeg import decode_jpeg

    media = M.synth_mjpeg_media(spark, n_rows=8)
    out = M.video_frame_features(media, n_frames=4, codec="mjpg").collect()
    assert len(out) == 8 * 4
    payloads = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    for r in out:
        i, k, ts = r["media_id"], r["frame_idx"], r["ts_ms"]
        frames, usec = parse_avi_mjpg(payloads[i])
        cf = frame_index_at(ts, len(frames), usec)
        assert ts == 500 * (2 * k + 1) // 8
        want = M._thumb_feature(decode_jpeg(frames[cf])).astype(np.float32)
        got = np.array(r["feature"], dtype=np.float32)
        assert np.array_equal(got, want), (i, k)
        formula = np.array(
            [((i * 17 + cf * 53 + ((p % 8) // 4) * 37) % 256) / 255.0
             for p in range(32)], dtype=np.float32)
        assert np.array_equal(got, formula), (i, k)


def test_video_codec_rejects_unknown():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown codec"):
        M.video_frame_features(None, codec="h264")
