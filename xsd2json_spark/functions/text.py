"""Text-analysis kernels for large-scale training-data pipelines:
tokenization, quality scoring, language ID, fingerprinting.

All pure Column expressions (JVM-side, codegen'd) — token counting over
10^12 documents must not cross into Python. The BPE-ish token estimate
uses a regex segmentation; the language ID is an n-gram/stopword-hit
heuristic computed with array intersections.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WS = r"\s+"
# BPE-ish segmentation: words, numbers, or single non-space symbols
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "du", "est"],
    "de": ["der", "die", "das", "und", "ist", "von", "den", "mit", "für", "auf"],
    "es": ["el", "la", "de", "que", "y", "los", "las", "un", "una", "es"],
}


def tokens(col: Column) -> Column:
    """Whitespace tokens; empty/blank text -> empty array. (F.trim only
    strips spaces, so blank detection and edge-stripping use regex —
    a tab/newline-only string must yield zero tokens.)"""
    stripped = F.regexp_replace(F.regexp_replace(col, r"^\s+", ""), r"\s+$", "")
    return F.when(F.length(stripped) == 0, F.array().cast("array<string>")).otherwise(
        F.split(stripped, WS)
    )


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def bpe_token_count(col: Column) -> Column:
    """Sub-word-ish token count via regex segmentation (regexp_count of
    the BPE_RE classes) — a cheap, deterministic stand-in for a real BPE
    vocabulary."""
    return F.coalesce(F.regexp_count(col, F.lit(BPE_RE)), F.lit(0))


def char_count(col: Column) -> Column:
    return F.coalesce(F.length(col), F.lit(0))


def alpha_ratio(col: Column) -> Column:
    """Share of alphabetic characters — a quality signal."""
    n = F.length(col)
    alpha = F.length(F.regexp_replace(col, r"[^A-Za-z]", ""))
    return F.when(n > 0, alpha / n).otherwise(F.lit(0.0))


def punct_ratio(col: Column) -> Column:
    n = F.length(col)
    punct = F.length(F.regexp_replace(col, r"[^!-/:-@\[-`{-~]", ""))
    return F.when(n > 0, punct / n).otherwise(F.lit(0.0))


def mean_token_length(col: Column) -> Column:
    toks = tokens(col)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(F.size(toks) > 0, total.cast("double") / F.size(toks)).otherwise(F.lit(0.0))


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    toks = F.transform(tokens(col), lambda t: F.lower(t))
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(toks) > 0, hits.cast("double") / F.size(toks)).otherwise(F.lit(0.0))


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality: favors alphabetic text of sane length
    with moderate punctuation. Deterministic, explainable, cheap."""
    length_ok = F.when((char_count(col) >= 20) & (char_count(col) <= 100_000), F.lit(1.0)).otherwise(F.lit(0.3))
    return F.round(
        (0.4 * alpha_ratio(col) + 0.2 * (1.0 - F.least(punct_ratio(col) * 4, F.lit(1.0)))
         + 0.2 * F.least(stopword_ratio(col) * 5, F.lit(1.0)) + 0.2 * length_ok),
        6,
    )


def lang_scores(col: Column) -> Column:
    """Map of language -> stopword-hit count (the n-gram heuristic)."""
    toks = F.transform(tokens(col), lambda t: F.lower(t))
    pairs = []
    for lg, words in STOPWORDS.items():
        sw = F.array(*[F.lit(w) for w in words])
        pairs.append(F.struct(F.lit(lg).alias("lang"), F.size(F.filter(toks, lambda t: F.array_contains(sw, t))).alias("hits")))
    return F.array(*pairs)


def detect_lang(col: Column, min_hits: int = 1) -> Column:
    """argmax over lang_scores; 'unknown' when no stopword hits."""
    scores = lang_scores(col)
    best = F.array_max(F.transform(scores, lambda s: F.struct(s["hits"].alias("hits"), s["lang"].alias("lang"))))
    return F.when(best["hits"] >= min_hits, best["lang"]).otherwise(F.lit("unknown"))


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text
    (rolling-hash analog, stable across reformatting)."""
    normalized = F.lower(F.regexp_replace(F.trim(col), WS, " "))
    return F.md5(normalized)


def with_text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    c = F.col(text_col)
    return df.select(
        "*",
        char_count(c).alias("n_chars_computed"),
        token_count(c).alias("n_tokens"),
        bpe_token_count(c).alias("n_bpe_tokens"),
        F.round(alpha_ratio(c), 6).alias("alpha_ratio"),
        F.round(punct_ratio(c), 6).alias("punct_ratio"),
        quality_score(c).alias("quality"),
        detect_lang(c).alias("lang_detected"),
        fingerprint(c).alias("fingerprint"),
    )
