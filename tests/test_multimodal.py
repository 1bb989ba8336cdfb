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
