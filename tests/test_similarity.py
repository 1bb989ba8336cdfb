import numpy as np
import pytest
from pyspark.sql import functions as F

from xsd2json_spark.functions import similarity as S


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def query(emb):
    return list(emb.filter("vec_id = 0").collect()[0]["embedding"])


def _numpy_topk(emb, query, k=10):
    rows = emb.collect()
    q = np.asarray(query, dtype=np.float64)
    scored = []
    for r in rows:
        v = np.asarray(r["embedding"], dtype=np.float64)
        scored.append((r["vec_id"], float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q)))))
    scored.sort(key=lambda t: (-round(t[1], 6), t[0]))
    return scored[:k]


def test_brute_force_matches_numpy(spark, emb, query):
    got = S.cosine_topk(emb, query, k=10).collect()
    want = _numpy_topk(emb, query, k=10)
    assert [r["vec_id"] for r in got] == [w[0] for w in want]
    for r, w in zip(got, want):
        assert abs(r["score"] - w[1]) < 1e-5
    assert got[0]["vec_id"] == 0 and abs(got[0]["score"] - 1.0) < 1e-9


def test_lsh_topk_recall(spark, emb, query):
    """The sf embeddings are near-random (best cosine ~0.3), where
    hyperplane LSH rightly finds nothing — so plant real near-dups
    (perturbed copies of the query) and require LSH to retrieve them."""
    rng = np.random.RandomState(7)
    q = np.asarray(query, dtype=np.float32)
    planted = [
        (10_000 + i, (q + rng.standard_normal(len(q)).astype(np.float32) * 0.05).tolist())
        for i in range(5)
    ]
    extra = spark.createDataFrame(
        [(i, v, 0) for i, v in planted], "vec_id long, embedding array<float>, label int"
    )
    aug = emb.unionByName(extra)
    got = S.lsh_topk(aug, query, k=10, n_planes=8).collect()
    ids = [r["vec_id"] for r in got]
    assert ids[0] == 0  # the query vector itself shares its own bucket
    hits = sum(1 for i in ids if i >= 10_000)
    assert hits == 5  # every planted near-dup retrieved
    # and they outrank the random vectors
    assert set(ids[:6]) == {0, *[i for i, _ in planted]}


def test_ivf_topk_recall(spark, emb, query):
    cents = S.kmeans_centroids(emb, n_centroids=8, iters=2)
    assert cents.shape == (8, 64)
    got = S.ivf_topk(emb, query, cents, k=10, nprobe=3).collect()
    assert got[0]["vec_id"] == 0
    brute = {w[0] for w in _numpy_topk(emb, query, k=10)}
    hits = sum(1 for r in got if r["vec_id"] in brute)
    assert hits >= 5


def test_topk_plan_is_take_ordered(spark, emb, query):
    plan = S.cosine_topk(emb, query, k=10)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # no global sort
