import pytest
from pyspark.sql import functions as F

from xsd2json_spark.functions import sampling as SP


def test_sample_deterministic_and_partition_stable(spark):
    """Membership is a pure key function: identical row sets across
    reruns AND across repartitioning (where RNG-based df.sample can
    diverge), for both hash families."""
    df = spark.range(10_000).select(F.col("id").alias("doc_id"))
    for fam in ("xxhash64", "md5"):
        a = sorted(r["doc_id"] for r in SP.deterministic_sample(df, ["doc_id"], 0.3, family=fam).collect())
        b = sorted(
            r["doc_id"]
            for r in SP.deterministic_sample(df.repartition(7), ["doc_id"], 0.3, family=fam).collect()
        )
        assert a == b and len(a) > 0
        # fraction is approximately honored (hash uniformity)
        assert abs(len(a) / 10_000 - 0.3) < 0.02


def test_split_covers_all_rows_and_is_growth_stable(spark):
    """Every row gets exactly one label; adding new rows never changes
    an existing row's label (eval-set contamination guard)."""
    small = spark.range(5_000).select(F.col("id").alias("doc_id"))
    big = spark.range(20_000).select(F.col("id").alias("doc_id"))
    col = SP.split_column(["doc_id"], (0.8, 0.1, 0.1))
    s_small = {r["doc_id"]: r["s"] for r in small.select("doc_id", col.alias("s")).collect()}
    s_big = {r["doc_id"]: r["s"] for r in big.select("doc_id", col.alias("s")).collect()}
    assert all(s_big[k] == v for k, v in s_small.items())
    from collections import Counter

    c = Counter(s_big.values())
    assert set(c) == {"train", "val", "test"}
    assert abs(c["train"] / 20_000 - 0.8) < 0.02
    assert abs(c["val"] / 20_000 - 0.1) < 0.01


def test_stratified_fractions_per_group(spark):
    df = spark.range(30_000).select(
        F.col("id").alias("doc_id"),
        F.element_at(F.array(F.lit("en"), F.lit("fr"), F.lit("de")), (F.col("id") % 3 + 1).cast("int")).alias("lang"),
    )
    out = SP.deterministic_sample(
        df, ["doc_id"], 0.0, by={"en": 0.5, "fr": 0.1}, by_col="lang"
    )
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert abs(counts["en"] / 10_000 - 0.5) < 0.03
    assert abs(counts["fr"] / 10_000 - 0.1) < 0.02
    assert "de" not in counts  # stratum absent from the dict -> fraction 0


def test_sampling_validation_errors(spark):
    df = spark.range(10).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError):
        SP.deterministic_sample(df, ["doc_id"], 1.5)
    with pytest.raises(ValueError):
        SP.deterministic_sample(df, ["doc_id"], 0.5, by={"x": 0.1})  # by without by_col
    with pytest.raises(ValueError):
        SP.split_column(["doc_id"], (0.8, 0.1))  # weights/names mismatch
    with pytest.raises(ValueError):
        SP.split_column(["doc_id"], (0.8, 0.1, 0.2))  # sums to 1.1
    with pytest.raises(ValueError):
        SP.hash_bucket(["doc_id"], family="sha1")


def test_multi_column_key_collision_classes(spark):
    """The two collision families concat_ws-style keying would merge —
    boundary ambiguity ('a|b','c') vs ('a','b|c') and null skipping
    (NULL,'x') vs ('x',NULL) — must land in distinct buckets for BOTH
    hash families (md5 escapes the join; xxhash64 interleaves is-null
    flags into the native fold)."""
    rows = [("a|b", "c"), ("a", "b|c"), (None, "x"), ("x", None), ("\\N", "x")]
    df = spark.createDataFrame(rows, ["k1", "k2"])
    for fam in ("xxhash64", "md5"):
        got = [r["b"] for r in df.select(SP.hash_bucket(["k1", "k2"], family=fam).alias("b")).collect()]
        assert len(set(got)) == len(got), (fam, got)


def test_md5_escape_preserves_simple_key_preimage(spark):
    """Shipped oracle fragments build md5('<seed>|' || key) for single
    pipe-free non-null keys — the escape layer must leave that exact
    pre-image (hence the bucket) unchanged."""
    import hashlib

    df = spark.createDataFrame([(str(i),) for i in range(50)], ["k"])
    got = {r["k"]: r["b"] for r in df.select("k", SP.hash_bucket(["k"], seed=42, family="md5").alias("b")).collect()}
    for k, b in got.items():
        expect = int(hashlib.md5(f"42|{k}".encode()).hexdigest()[:15], 16) % SP.BUCKETS
        assert b == expect


def test_sample_predicate_reaches_the_scan(spark):
    """The membership filter is a pure expression over scan columns, so
    it must appear as a data filter (not post-shuffle) in the plan —
    Filter directly over the parquet scan, no exchange in between."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = SP.deterministic_sample(docs, ["doc_id"], 0.25)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # narrow: filter fused onto the scan
