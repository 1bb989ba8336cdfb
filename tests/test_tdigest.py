"""t-digest: quantile accuracy vs exact, MERGE-EQUALITY (the property
that makes it usable across snapshots), serialization, and the Spark
partial/final path."""

import json

import numpy as np
import pytest
from pyspark.sql import functions as F

from xsd2json_spark.engine.tdigest import TDigest, tdigest_partials, tdigest_sketch

PROBS = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


def _max_q_err(digest, values, probs=PROBS):
    exact = np.quantile(values, probs)
    got = digest.quantiles(probs)
    scale = max(1e-9, float(np.max(values) - np.min(values)))
    return max(abs(g - e) / scale for g, e in zip(got, exact))


def test_quantile_accuracy_uniform_and_skewed():
    rng = np.random.RandomState(0)
    uni = rng.uniform(0, 1000, 50_000)
    assert _max_q_err(TDigest.from_values(uni), uni) < 0.01
    skew = rng.lognormal(0, 2, 50_000)
    assert _max_q_err(TDigest.from_values(skew), skew) < 0.01


def test_merge_equality():
    """sketch(A ∪ B) ≈ merge(sketch(A), sketch(B)) — quantiles agree
    within the digest's own accuracy."""
    rng = np.random.RandomState(1)
    a = rng.normal(0, 1, 30_000)
    b = rng.normal(5, 2, 20_000)  # deliberately different distribution
    both = np.concatenate([a, b])
    merged = TDigest.from_values(a).merge(TDigest.from_values(b))
    single = TDigest.from_values(both)
    assert merged.n == pytest.approx(len(both))
    scale = both.max() - both.min()
    for p in PROBS:
        assert abs(merged.quantile(p) - single.quantile(p)) / scale < 0.02
    assert _max_q_err(merged, both) < 0.02


def test_compression_bounds_size():
    rng = np.random.RandomState(2)
    d = TDigest.from_values(rng.uniform(0, 1, 100_000), compression=100)
    assert len(d.centroids) < 200  # O(compression) centroids for 100k values


def test_serialization_roundtrip():
    d = TDigest.from_values([1.0, 2.0, 3.0, 10.0])
    d2 = TDigest.from_dict(json.loads(json.dumps(d.to_dict())))
    assert d2.quantiles(PROBS) == d.quantiles(PROBS)


def test_spark_sketch_matches_local(spark):
    df = spark.range(40_000).select(
        ((F.col("id") * 2654435761) % 10_000).cast("double").alias("v")
    ).cache()
    vals = np.array([r["v"] for r in df.collect()])
    d = tdigest_sketch(df, "v")
    assert d.n == pytest.approx(len(vals))
    assert _max_q_err(d, vals) < 0.01
    df.unpersist()


def test_spark_partials_are_per_partition(spark):
    df = spark.range(0, 10_000, 1, 8).select(F.col("id").cast("double").alias("v"))
    parts = tdigest_partials(df, "v").collect()
    assert 1 <= len(parts) <= 8  # one partial row per non-empty partition
    assert sum(r["n"] for r in parts) == 10_000


def test_spark_cross_snapshot_merge(spark):
    """The cross-snapshot use: sketch each half separately (two 'runs'),
    merge the artifacts, compare against one sketch of everything."""
    df = spark.range(30_000).select(
        ((F.col("id") * 48271) % 7_919).cast("double").alias("v")
    ).cache()
    df.count()
    a = df.filter(F.col("v") < 4000)
    b = df.filter(F.col("v") >= 4000)
    merged = tdigest_sketch(a, "v").merge(tdigest_sketch(b, "v"))
    single = tdigest_sketch(df, "v")
    for p in PROBS:
        assert abs(merged.quantile(p) - single.quantile(p)) / 7919 < 0.02
    df.unpersist()
