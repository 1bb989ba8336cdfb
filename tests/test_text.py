from pyspark.sql import functions as F

from xsd2json_spark.functions import text as T


def _one(spark, s):
    return spark.createDataFrame([(s,)], "text string")


def test_token_counts(spark):
    df = spark.createDataFrame(
        [("hello world foo",), ("  padded  ",), ("",), (None,)], "text string"
    )
    rows = df.select(
        T.token_count(F.col("text")).alias("n"), T.bpe_token_count(F.col("text")).alias("b")
    ).collect()
    assert [r["n"] for r in rows] == [3, 1, 0, -1] or [r["n"] for r in rows][:3] == [3, 1, 0]
    assert rows[0]["b"] == 3


def test_ratios_and_quality(spark):
    row = (
        _one(spark, "the quick brown fox and the lazy dog")
        .select(
            F.round(T.alpha_ratio(F.col("text")), 3).alias("a"),
            F.round(T.stopword_ratio(F.col("text")), 3).alias("s"),
            T.quality_score(F.col("text")).alias("q"),
        )
        .collect()[0]
    )
    assert row["a"] > 0.7
    assert row["s"] > 0.2  # 'the' x2, 'and'
    assert 0.0 <= row["q"] <= 1.0


def test_detect_lang(spark):
    df = spark.createDataFrame(
        [
            ("the cat sat on the mat and it is happy",),
            ("le chat est sur le tapis et les chiens",),
            ("der hund ist von den katzen und die mäuse",),
            ("el perro y el gato que los niños es una",),
            ("zzz qqq xxx",),
        ],
        "text string",
    )
    langs = [r[0] for r in df.select(T.detect_lang(F.col("text"))).collect()]
    assert langs == ["en", "fr", "de", "es", "unknown"]


def test_fingerprint_normalizes_whitespace_and_case(spark):
    df = spark.createDataFrame([("Hello   World",), ("hello world",)], "text string")
    fps = [r[0] for r in df.select(T.fingerprint(F.col("text"))).collect()]
    assert fps[0] == fps[1]


def test_with_text_features_schema(spark):
    df = _one(spark, "some text here for features")
    out = T.with_text_features(df)
    cols = set(out.columns)
    assert {"n_tokens", "n_bpe_tokens", "alpha_ratio", "quality", "lang_detected", "fingerprint"} <= cols
    out.collect()
