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
