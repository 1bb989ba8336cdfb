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


def test_minhash_planted_near_dups_recall(spark):
    """Golden corpus with PLANTED near-dups: banding must retrieve every
    planted pair (recall 1.0 at J >= 0.6 with 64 hashes / 16 bands) and
    report the EXACT jaccard for each; unrelated docs must not pair."""
    base_a = ("the quick brown fox jumps over the lazy dog while the spotted cat "
              "sleeps soundly in the warm afternoon sun near the old barn door")
    base_b = ("distributed query engines shuffle partitioned data across executor "
              "nodes to evaluate joins aggregations and windowed analytics at scale")
    corpus = [
        (101, base_a),
        (102, base_a.replace("lazy", "sleepy")),          # near-dup of 101
        (103, base_b),
        (104, base_b.replace("windowed", "streaming")),   # near-dup of 103
        (201, "completely unrelated text about volcanic geology and mineral strata"),
        (202, "a short grocery list: eggs milk flour butter sugar vanilla beans"),
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    pairs = D.minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.6).collect()
    got = {(p["id_a"], p["id_b"]): p["jaccard"] for p in pairs}
    assert set(got) == {(101, 102), (103, 104)}  # full recall, zero false pairs

    # reported jaccard equals the exact shingle jaccard
    sh = {r["doc_id"]: set(r["sh"]) for r in
          docs.select("doc_id", D.shingles(F.col("text"), 5).alias("sh")).collect()}
    for (a, b), j in got.items():
        exact = len(sh[a] & sh[b]) / len(sh[a] | sh[b])
        assert abs(j - exact) < 1e-6


def test_simhash_md5_matches_pure_python(spark):
    """The oracle-replayable md5 simhash agrees with an independent
    pure-Python reference implementation."""
    import hashlib

    def ref_simhash_md5(text, num_bits=32):
        toks = text.strip().lower().split()
        votes = [0] * num_bits
        for t in toks:
            h = hashlib.md5(t.encode()).hexdigest()
            for j in range(num_bits):
                bit = (int(h[j // 4], 16) >> (j % 4)) & 1
                votes[j] += 1 if bit else -1
        return sum((1 << j) for j in range(num_bits) if votes[j] > 0)

    texts = [
        "the quick brown fox",
        "hello world hello again",
        "x",
        "mixed CASE Tokens repeat repeat",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {r["doc_id"]: r["s"] for r in
           df.select("doc_id", D.simhash_md5(F.col("text"), 32).alias("s")).collect()}
    for i, t in enumerate(texts):
        assert got[i] == ref_simhash_md5(t), t


def test_ngram_jaccard_exact(spark, docs):
    pairs = D.ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.8, max_shingle_freq=1000).collect()
    got = {(p["id_a"], p["id_b"]): p["jaccard"] for p in pairs}
    assert got[(1, 2)] == 1.0
    assert got[(4, 5)] == 1.0  # whitespace/case-normalized
    assert (1, 4) not in got


def test_minhash_sql_equals_column_api(spark, docs):
    """The F.expr fast-path kernel and the Column-API kernel are the
    same function, for both hash families."""
    sh = D.shingled(docs, "doc_id", "text", 5)
    for fam in ("xxhash64", "md5"):
        a = sh.select("__id", D.minhash_signature(F.col("__sh"), 16, fam).alias("s"))
        b = sh.select("__id", D.minhash_signature("__sh", 16, fam).alias("s"))
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    ba = sh.select(D.band_keys(D.minhash_signature(F.col("__sh"), 16), 4, 4).alias("k"))
    bb = sh.select(D.band_keys(D.minhash_signature("__sh", 16), 4, 4).alias("k"))
    assert ba.exceptAll(bb).count() == 0


def test_minhash_md5_family_finds_planted_dups(spark):
    """The oracle configuration (md5 family, string band keys) has the
    same recall on planted near-dups as the production kernel."""
    base = [
        " ".join(f"tok{i}w{j}" for j in range(40)) for i in range(20)
    ]
    rows = [(i, t) for i, t in enumerate(base)]
    # plant 5 near-dups: copy with one token changed
    for i in range(5):
        rows.append((100 + i, base[i].replace(f"tok{i}w5", "CHANGED")))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = D.minhash_lsh_pairs(
        docs, "doc_id", "text", threshold=0.6, family="md5", hashed_bands=False
    ).collect()
    found = {(p["id_a"], p["id_b"]) for p in pairs}
    assert {(i, 100 + i) for i in range(5)} <= found
