"""Similarity search over an embedding column (array<float>).

- Brute-force cosine top-k: the correctness baseline. The dot product is
  a built-in F.aggregate/zip_with fold (JVM-side); top-k is
  TakeOrderedAndProject (no full sort, no collect).
- LSH-bucketed ANN (random hyperplanes): the scale path. Hyperplanes are
  generated deterministically (numpy, fixed seed) on the driver — a few
  KB broadcast as literals — and each vector gets a sign-bit bucket;
  queries probe only their bucket (optionally multi-probe neighbors).
- IVF (inverted-file) ANN: coarse centroids learned with a few k-means
  iterations expressed as DataFrame aggs; vectors are assigned to the
  nearest centroid (the inverted list), queries scan only nprobe lists.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _lit_vec(vec: Sequence[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in vec])


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")), F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))


def cosine(a: Column, b: Column) -> Column:
    # try_divide: a zero-norm vector scores NULL->0, instead of throwing
    # under Spark 4's default ANSI mode
    return F.coalesce(F.try_divide(dot(a, b), norm(a) * norm(b)), F.lit(0.0))


def cosine_topk(
    df: DataFrame, query_vec: Sequence[float], k: int = 10, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Brute-force cosine top-k against a literal query vector.
    One scan; Catalyst turns orderBy+limit into TakeOrderedAndProject
    (per-partition heaps, no global sort)."""
    q = _lit_vec(query_vec)
    scored = df.select(F.col(id_col), F.round(cosine(F.col(vec_col), q), 6).alias("score"))
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)


# ---------------------------------------------------------------------------
# LSH (random hyperplane / sign bits)
# ---------------------------------------------------------------------------


def hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket(vec_col: Column, planes: np.ndarray) -> Column:
    """Sign-bit bucket id: bit j = 1 iff vec . plane_j > 0."""
    bucket = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        bucket = bucket + F.when(dot(vec_col, _lit_vec(plane)) > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
    return bucket


def lsh_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    seed: int = 42,
    multi_probe: int = 1,
) -> DataFrame:
    """ANN: score only the vectors in the query's hyperplane bucket,
    plus multi-probe neighbors (buckets at Hamming distance <=
    multi_probe from the query bucket — near-misses on one hyperplane
    are the common failure, so probing them buys most of the recall).
    At scale, write the table bucketed/partitioned by `bucket` so the
    probe is a partition-pruned scan."""
    planes = hyperplanes(len(query_vec), n_planes, seed)
    qbits = sum((1 << j) for j, p in enumerate(planes) if float(np.dot(query_vec, p)) > 0)
    probe = {qbits}
    if multi_probe >= 1:
        probe |= {qbits ^ (1 << j) for j in range(n_planes)}
    if multi_probe >= 2:
        probe |= {qbits ^ (1 << i) ^ (1 << j) for i in range(n_planes) for j in range(i + 1, n_planes)}
    bucketed = df.withColumn("__bucket", lsh_bucket(F.col(vec_col), planes))
    cand = bucketed.filter(F.col("__bucket").isin(*[int(b) for b in probe]))
    q = _lit_vec(query_vec)
    return (
        cand.select(F.col(id_col), F.round(cosine(F.col(vec_col), q), 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# IVF (inverted file with k-means coarse quantizer)
# ---------------------------------------------------------------------------


def kmeans_centroids(
    df: DataFrame, vec_col: str = "embedding", n_centroids: int = 16, iters: int = 3, seed: int = 42
) -> np.ndarray:
    """A few Lloyd iterations as DataFrame aggregations: assign = argmin
    distance to broadcast centroid literals; update = avg of vectors per
    cluster (posexplode + groupBy) — all JVM-side, centroids only on the
    driver (n_centroids x dim floats)."""
    dim = len(df.select(vec_col).first()[0])
    rng = np.random.RandomState(seed)
    seed_rows = df.select(vec_col).limit(n_centroids * 4).collect()
    idx = rng.choice(len(seed_rows), size=n_centroids, replace=False)
    cents = np.array([seed_rows[i][0] for i in idx], dtype=np.float64)
    for _ in range(iters):
        assigned = df.select(
            assign_centroid(F.col(vec_col), cents).alias("__c"), F.col(vec_col).alias("__v")
        )
        sums = (
            assigned.select("__c", F.posexplode("__v").alias("__p", "__x"))
            .groupBy("__c", "__p")
            .agg(F.sum(F.col("__x").cast("double")).alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        new = cents.copy()
        counts = np.zeros(len(cents))
        for r in sums:
            new[r["__c"]][r["__p"]] = r["s"] / r["n"]
            counts[r["__c"]] = r["n"]
        cents = new
    return cents


def assign_centroid(vec_col: Column, cents: np.ndarray) -> Column:
    """argmin_j ||v - c_j||^2 == argmax_j (2 v.c_j - ||c_j||^2)."""
    scores = []
    for j, c in enumerate(cents):
        s = 2.0 * dot(vec_col, _lit_vec(c)) - float(np.dot(c, c))
        scores.append(F.struct(s.alias("score"), F.lit(j).alias("j")))
    return F.array_max(F.array(*scores))["j"]


def ivf_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    cents: np.ndarray,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scan only the nprobe nearest inverted lists. At scale the
    assignment column is precomputed and the table is partitioned by it
    (partition pruning makes the probe cheap)."""
    qa = np.asarray(query_vec, dtype=np.float64)
    d2 = ((cents - qa) ** 2).sum(axis=1)
    probe = [int(j) for j in np.argsort(d2)[:nprobe]]
    assigned = df.withColumn("__c", assign_centroid(F.col(vec_col), cents))
    cand = assigned.filter(F.col("__c").isin(probe))
    q = _lit_vec(query_vec)
    return (
        cand.select(F.col(id_col), F.round(cosine(F.col(vec_col), q), 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )
