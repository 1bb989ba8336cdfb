"""Real BPE: the merge sequence matches the hand-computable textbook
example (Sennrich et al. 2016 corpus), encoding applies merges in rank
order, and the Spark Arrow path equals the pure-python reference."""

import pytest

from xsd2json_spark.functions import tokenize as BP


CORPUS = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_train_merges_textbook_sequence():
    merges = BP.train_bpe_merges(CORPUS, num_merges=5)
    assert merges == [
        ("e", "s"),        # es/st/t</w> tie at 9 -> lexicographically smallest
        ("es", "t"),
        ("est", "</w>"),
        ("l", "o"),        # lo/ow tie at 7
        ("lo", "w"),
    ]


def test_encode_word_applies_ranks_greedily():
    merges = BP.train_bpe_merges(CORPUS, num_merges=5)
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    assert BP.bpe_encode_word("lowest", ranks) == ["low", "est</w>"]
    assert BP.bpe_encode_word("low", ranks) == ["low", "</w>"]  # no (low,</w>) merge trained
    assert BP.bpe_encode_word("xyz", ranks) == ["x", "y", "z", "</w>"]  # untrained chars stay


def test_spark_bpe_matches_pure_python(spark):
    docs = spark.createDataFrame(
        [(1, "low lower newest"), (2, "widest low low"), (3, None), (4, "LOWEST")],
        "doc_id long, text string",
    )
    merges = BP.train_bpe(docs.filter("doc_id <= 2"), "text", num_merges=10)
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    got = {
        r["doc_id"]: r["toks"]
        for r in docs.select("doc_id", BP.bpe_tokens(docs["text"], merges).alias("toks")).collect()
    }

    def ref(text):
        out = []
        for w in text.lower().split():
            out.extend(BP.bpe_encode_word(w, ranks))
        return out

    assert got[1] == ref("low lower newest")
    assert got[2] == ref("widest low low")
    assert got[3] == []  # null text -> empty tokens
    assert got[4] == ref("lowest")  # lowercased before encoding


def test_distributed_word_frequencies(spark):
    docs = spark.createDataFrame([(1, "a b a"), (2, "  b  ")], "doc_id long, text string")
    wc = {r["word"]: r["n"] for r in BP.word_frequencies(docs, "text").collect()}
    assert wc == {"a": 2, "b": 2}
