from pyspark.sql import functions as F

import pytest

from xsd2json_spark.functions import packing as PK


def test_pack_documents_hand_values(spark):
    """One shard, known token counts: budget 100 over [60, 50, 30, 80]
    (ordered by id) -> exclusive cumsums [0, 60, 110, 140] -> packs
    [0, 0, 1, 1]; pack_pos is the within-shard rank."""
    df = spark.createDataFrame(
        [(1, 60), (2, 50), (3, 30), (4, 80)], "doc_id long, n_tok long"
    )
    out = PK.pack_documents(df, "doc_id", "n_tok", budget=100, n_shards=1)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert [rows[i]["pack_id"] for i in (1, 2, 3, 4)] == [0, 0, 1, 1]
    assert [rows[i]["pack_pos"] for i in (1, 2, 3, 4)] == [0, 1, 2, 3]
    assert all(rows[i]["shard"] == 0 for i in rows)

    stats = {r["pack_id"]: r for r in PK.pack_stats(out, "n_tok", budget=100).collect()}
    assert stats[0]["n_docs"] == 2 and stats[0]["token_sum"] == 110  # overflow doc rides its pack
    assert stats[1]["n_docs"] == 2 and stats[1]["token_sum"] == 110
    # both packs crossed the budget via a normal crossing doc, neither
    # contains a single doc larger than the budget
    assert all(stats[p]["overflowed"] for p in (0, 1))
    assert not any(stats[p]["oversized_doc"] for p in (0, 1))


def test_pack_oversized_document_policy(spark):
    """A single document larger than the budget: it keeps exactly one
    pack_id, its pack is flagged oversized_doc, and the shard's later
    pack ids skip numbers (floor jumps) rather than silently splitting
    or truncating the document."""
    df = spark.createDataFrame(
        [(1, 50), (2, 350), (3, 40), (4, 30)], "doc_id long, n_tok long"
    )
    out = PK.pack_documents(df, "doc_id", "n_tok", budget=100, n_shards=1)
    rows = {r["doc_id"]: r for r in out.collect()}
    # excl cumsums [0, 50, 400, 440] -> packs [0, 0, 4, 4]: ids 1-3 skipped
    assert [rows[i]["pack_id"] for i in (1, 2, 3, 4)] == [0, 0, 4, 4]
    stats = {r["pack_id"]: r for r in PK.pack_stats(out, "n_tok", budget=100).collect()}
    assert set(stats) == {0, 4}
    assert stats[0]["oversized_doc"] and stats[0]["overflowed"]
    assert not stats[4]["oversized_doc"] and not stats[4]["overflowed"]
    # without a budget the audit columns are absent (back-compat shape)
    assert set(PK.pack_stats(out, "n_tok").columns) == {"shard", "pack_id", "n_docs", "token_sum"}


def test_pack_documents_deterministic_and_partition_stable(spark):
    df = spark.range(2_000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 97 + 3).alias("n_tok")
    )
    a = sorted(map(tuple, PK.pack_documents(df, "doc_id", "n_tok", 500, n_shards=16).collect()))
    b = sorted(
        map(tuple, PK.pack_documents(df.repartition(7), "doc_id", "n_tok", 500, n_shards=16).collect())
    )
    assert a == b
    # every shard is used and every pack except possibly a shard's last
    # is filled past (budget - max_tok)
    packed = PK.pack_documents(df, "doc_id", "n_tok", 500, n_shards=16)
    stats = PK.pack_stats(packed, "n_tok")
    last = stats.groupBy("shard").agg(F.max("pack_id").alias("last_pack"))
    not_last = stats.join(
        last, (stats["shard"] == last["shard"]) & (stats["pack_id"] == last["last_pack"]), "left_anti"
    )
    assert not_last.filter(F.col("token_sum") < 500 - 99).count() == 0
    assert stats.select("shard").distinct().count() == 16


def test_pack_documents_rejects_bad_budget(spark):
    df = spark.createDataFrame([(1, 10)], "doc_id long, n_tok long")
    with pytest.raises(ValueError):
        PK.pack_documents(df, "doc_id", "n_tok", budget=0)
