import pytest
from pyspark.sql import functions as F

from xsd2json_spark.functions import dedup as D


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again in the yard"
    rows = [
        (1, base),
        (2, base),  # exact dup of 1
        (3, base + " extra tail"),  # near dup of 1
        (4, "completely different content about spark aggregation pipelines"),
        (5, "COMPLETELY   different Content about spark aggregation pipelines"),  # normalized dup of 4
        (6, "unrelated short text"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_exact_duplicates(spark, docs):
    groups = D.exact_duplicates(docs, "doc_id", "text").collect()
    sets = sorted(tuple(g["doc_ids"]) for g in groups)
    assert sets == [(1, 2), (4, 5)]


def test_minhash_lsh_finds_near_dups(spark, docs):
    pairs = D.minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5).collect()
    got = {(p["id_a"], p["id_b"]) for p in pairs}
    assert (1, 2) in got  # exact dup certainly collides
    assert (1, 3) in got or (2, 3) in got  # near dup
    assert all(p["jaccard"] >= 0.5 for p in pairs)


def test_minhash_jaccard_close_to_exact(spark, docs):
    sh = docs.select("doc_id", D.shingles(F.col("text"), 5).alias("sh"))
    a = sh.filter("doc_id = 1").collect()[0]["sh"]
    b = sh.filter("doc_id = 3").collect()[0]["sh"]
    exact = len(set(a) & set(b)) / len(set(a) | set(b))
    pairs = {(p["id_a"], p["id_b"]): p["jaccard"] for p in D.minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.3).collect()}
    assert abs(pairs[(1, 3)] - exact) < 1e-6  # verify step computes EXACT jaccard


def test_simhash_near_duplicates(spark, docs):
    pairs = D.simhash_near_duplicates(docs, "doc_id", "text", max_hamming=10).collect()
    got = {(p["id_a"], p["id_b"]) for p in pairs}
    assert (1, 2) in got
    h = {(p["id_a"], p["id_b"]): p["hamming"] for p in pairs}
    assert h[(1, 2)] == 0  # identical text -> identical simhash


def test_ngram_jaccard_exact(spark, docs):
    pairs = D.ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.8, max_shingle_freq=1000).collect()
    got = {(p["id_a"], p["id_b"]): p["jaccard"] for p in pairs}
    assert got[(1, 2)] == 1.0
    assert got[(4, 5)] == 1.0  # whitespace/case-normalized
    assert (1, 4) not in got
