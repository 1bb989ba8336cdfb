"""Real byte-pair encoding (BPE) tokenization — the upgrade from
text.bpe_token_count's regex segmentation stand-in.

Scale split (the part that matters at 100 TB):
- WORD FREQUENCIES are computed distributed (explode + two-stage count
  agg) — the only pass over the corpus.
- MERGE TRAINING runs driver-side over the collected word-frequency
  dict, which is VOCABULARY-sized, not corpus-sized (the classic BPE
  algorithm is inherently iterative over pair counts; a vocabulary of
  even 10M words is megabytes). Ties break deterministically
  (max count, then lexicographically smallest pair).
- ENCODING ships the rank table to executors inside an Arrow-batched
  pandas_udf closure (a few hundred KB) with an lru_cache per worker —
  one Python pass per record batch, never per row via py4j.

No external tokenizer library is available in this container, so the
algorithm is implemented directly (and golden-tested against a
hand-computed merge sequence); swapping in a pretrained vocab is just
passing different `merges`.
"""

from __future__ import annotations

from functools import lru_cache

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

END = "</w>"


def word_frequencies(df: DataFrame, text_col: str, lowercase: bool = True) -> DataFrame:
    """Distributed (word, n) counts — the single corpus pass that feeds
    BPE training. Two-stage agg: partial counts map-side, vocabulary-
    sized shuffle."""
    from xsd2json_spark.functions.text import tokens

    src = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    return (
        df.select(F.explode(tokens(src)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def train_bpe_merges(word_counts: dict, num_merges: int = 200) -> list:
    """Classic BPE: repeatedly merge the most frequent adjacent symbol
    pair over the (word -> count) dict. Deterministic: ties break to
    the lexicographically smallest pair. Returns merges in rank order."""
    vocab = {}
    for w, c in word_counts.items():
        sym = tuple(w) + (END,)
        vocab[sym] = vocab.get(sym, 0) + int(c)
    merges = []
    for _ in range(num_merges):
        pairs = {}
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        best = min(pairs, key=lambda p: (-pairs[p], p))
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab = {}
        for sym, c in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == best[0] and sym[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + c
        vocab = new_vocab
    return merges


def train_bpe(df: DataFrame, text_col: str, num_merges: int = 200, lowercase: bool = True) -> list:
    """End-to-end training: distributed word counts, driver-side merge
    loop over the vocabulary-sized dict."""
    wc = {r["word"]: r["n"] for r in word_frequencies(df, text_col, lowercase).collect()}
    return train_bpe_merges(wc, num_merges)


def bpe_encode_word(word: str, ranks: dict) -> list:
    """Greedy lowest-rank-first merging of one word (GPT-2-style
    application order): repeatedly merge the pair with the smallest
    training rank until no trained pair remains."""
    sym = list(word) + [END]
    while len(sym) > 1:
        best_i, best_r = -1, None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_i < 0:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_tokens(text_col: Column, merges: list, lowercase: bool = True) -> Column:
    """array<string> of BPE tokens per document, via an Arrow-batched
    pandas_udf. The rank table rides in the closure; per-worker
    lru_cache makes repeated words (the Zipfian bulk) dictionary hits."""
    from pyspark.sql.functions import pandas_udf

    ranks = {tuple(m): i for i, m in enumerate(merges)}

    @pandas_udf("array<string>")
    def _encode(s: pd.Series) -> pd.Series:
        @lru_cache(maxsize=65536)
        def enc(word: str) -> tuple:
            return tuple(bpe_encode_word(word, ranks))

        out = []
        for text in s:
            if text is None:
                out.append([])
                continue
            t = text.lower() if lowercase else text
            toks = []
            for w in t.split():
                toks.extend(enc(w))
            out.append(toks)
        return pd.Series(out)

    return _encode(text_col)


def bpe_token_count(text_col: Column, merges: list, lowercase: bool = True) -> Column:
    return F.size(bpe_tokens(text_col, merges, lowercase))
