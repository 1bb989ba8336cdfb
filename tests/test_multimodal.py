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
