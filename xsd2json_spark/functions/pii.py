"""PII detection and redaction over document tables.

A standard stage in any large-scale training-data pipeline (scrub
emails/phones/IPs before training). Built entirely from JVM-side
Column expressions — ``regexp_count`` / ``regexp_replace`` stay inside
whole-stage codegen, so the scan shuffles nothing and reads each text
exactly once; at 100 TB this is a map-only pass that fuses with
whatever filter follows it.

Pattern dialect: the regexes below restrict themselves to the
intersection of Java regex (Spark) and RE2 (DuckDB oracle) — character
classes, bounded repetition, non-capturing groups, ``\\b`` — no
backrefs, no lookaround, so both engines produce identical
leftmost-non-overlapping match sets and the DuckDB replay is exact.

Redaction order is fixed (email -> ssn -> phone -> ipv4): earlier
replacements cannot create later patterns (the tokens contain no
digits or '@'), and ssn runs before phone because a 3-2-4 digit group
is a substring-shape of the phone pattern.

Reference parity note: the reference (xsd2json) has no PII surface;
this module belongs to the training-data-pipeline extension set
(SURVEY.md §2.10).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: class name -> (regex, replacement token); ORDER IS THE REDACTION ORDER
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    # Country code is all-or-nothing ((?:\+\d{1,2}[-. ])?): a lone
    # optional separator would let the match swallow the space BEFORE
    # a bare number, and a leading \b can never fire before '+' (space
    # and '+' are both non-word chars), which silently dropped the
    # '+1 ' prefix from matches.
    ("phone", r"(?:\+\d{1,2}[-. ])?\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def pii_counts(text: Column) -> "dict[str, Column]":
    """Per-class non-overlapping match counts. Counts are taken on the
    RAW text (before any redaction), all classes independently."""
    return {name: F.regexp_count(text, F.lit(pat)) for name, pat, _ in PII_PATTERNS}


def pii_redact(text: Column) -> Column:
    """Replace every PII match with its class token, in PII_PATTERNS
    order (see module docstring for why the order is safe)."""
    out = text
    for _name, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def scan_documents(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Map-only PII audit: per-document class counts, a total, and the
    redacted text. Columns: the input's, plus n_<class> per pattern,
    n_pii, and <text_col>_redacted. No shuffle; at scale this fuses
    into the reading scan (filters/limits compose on top)."""
    text = F.col(text_col)
    counts = pii_counts(text)
    out = docs
    for name, col in counts.items():
        out = out.withColumn(f"n_{name}", col.cast("int"))
    total = None
    for name in counts:
        c = F.col(f"n_{name}")
        total = c if total is None else total + c
    return out.withColumn("n_pii", total.cast("int")).withColumn(
        f"{text_col}_redacted", pii_redact(text)
    )
