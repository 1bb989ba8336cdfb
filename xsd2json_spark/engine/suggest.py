"""Constraint suggestion: profile a table in one pass and propose a
ready-to-run validation spec (the Deequ-style "suggestion" surface,
re-expressed Spark-first).

Two jobs, both pure JVM aggregates:

1. ``profile_columns`` — ONE ``agg()`` over the table computes every
   per-column statistic at once (count, nulls, min/max, distinct,
   string length bounds, candidate-pattern match shares). Catalyst
   fuses all of it into a single scan with partial (map-side)
   aggregation, so at 100 TB this costs one read of the profiled
   columns and a tiny all-to-one reduce of ~a few hundred numbers.
2. ``suggest_spec`` — a second TINY job collects the distinct value
   sets, but ONLY for the columns the profile already proved
   low-cardinality (``n_distinct <= max_enum``), so its shuffle keys
   are bounded by ``max_enum * n_enum_columns`` rows.

Distinct counts use ``approx_count_distinct`` (HLL, one pass,
mergeable) by default; ``exact=True`` switches to exact
``count_distinct`` for oracle parity and for trustworthy ``unique``
suggestions (an HLL estimate within rsd of the row count cannot PROVE
uniqueness, so unique is only suggested in exact mode).

The emitted dict is ``spec_from_dict``-loadable; by construction every
suggested constraint PASSES on the profiled data (suggestions describe
observed reality — bounds are the observed min/max, enums the observed
value set), which the tests assert by running the ValidationEngine on
the suggesting table.

Reference parity note: the reference compiles constraints from an
authored XSD (spec/xsd_compiler.py); this module is the inverse
direction — infer the spec from data when no schema exists. Extension
surface (SURVEY.md §2.10), prior art: AWS Deequ's ConstraintSuggestion
(public), re-designed for one-pass Spark aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ByteType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
)

_NUMERIC = (ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType, DecimalType)

#: candidate shape patterns for string columns (name -> anchored regex,
#: Java-regex ∩ RE2 dialect so the DuckDB oracle replays shares exactly)
SHAPE_PATTERNS = {
    "hex40": r"^[0-9a-f]{40}$",
    "digits": r"^[0-9]+$",
    "lower_alpha": r"^[a-z]+$",
    "lower_token": r"^[a-z][a-z0-9_-]*$",
    "uuid": r"^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$",
}


def profile_columns(
    df: DataFrame, columns: "list[str] | None" = None, exact: bool = False, rsd: float = 0.02
) -> "dict[str, dict]":
    """One-pass per-column profile. Returns {column: stats dict} with
    n (table rows), n_null, n_distinct, and per-type extras (numeric:
    min/max; string: len_min/len_max + shape_<name> match counts)."""
    cols = columns if columns is not None else [f.name for f in df.schema.fields]
    types = {f.name: f.dataType for f in df.schema.fields}
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        t = types[c]
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__null"))
        dexpr = (
            F.count_distinct(F.col(c)) if exact
            else F.approx_count_distinct(F.col(c), rsd)
        )
        aggs.append(dexpr.alias(f"{c}__distinct"))
        if isinstance(t, _NUMERIC):
            aggs.append(F.min(c).alias(f"{c}__min"))
            aggs.append(F.max(c).alias(f"{c}__max"))
        elif isinstance(t, StringType):
            aggs.append(F.min(F.length(c)).alias(f"{c}__lmin"))
            aggs.append(F.max(F.length(c)).alias(f"{c}__lmax"))
            for pname, pat in SHAPE_PATTERNS.items():
                aggs.append(
                    F.sum(F.col(c).rlike(pat).cast("long")).alias(f"{c}__shape_{pname}")
                )
    row = df.agg(*aggs).collect()[0].asDict()
    out = {}
    for c in cols:
        t = types[c]
        stats = {
            "type": t.simpleString(),
            "n": row["__n"],
            "n_null": row[f"{c}__null"] or 0,
            "n_distinct": row[f"{c}__distinct"],
        }
        if isinstance(t, _NUMERIC):
            stats["min"] = row[f"{c}__min"]
            stats["max"] = row[f"{c}__max"]
        elif isinstance(t, StringType):
            stats["len_min"] = row[f"{c}__lmin"]
            stats["len_max"] = row[f"{c}__lmax"]
            stats["shapes"] = {
                p: (row[f"{c}__shape_{p}"] or 0) for p in SHAPE_PATTERNS
            }
        out[c] = stats
    return out


def suggest_constraints(
    df: DataFrame,
    columns: "list[str] | None" = None,
    max_enum: int = 24,
    exact: bool = False,
    tolerance_null_rate: float = 0.02,
    tolerance_headroom: float = 2.0,
) -> "list[dict]":
    """Profile + derive suggestions. Returns constraint dicts (each
    ``spec_from_dict``-loadable) ordered (column, kind). Rules:

    - ``n_null == 0``            -> not_null
    - ``0 < null rate <= tolerance_null_rate`` -> not_null with
      ``max_fail_ratio = headroom * observed rate`` (Deequ's
      "hasCompleteness >= x" analog: an ALMOST-complete column is
      worth monitoring at its observed rate plus headroom, rather
      than left unchecked; headroom keeps normal fluctuation from
      paging anyone). Disabled with ``tolerance_null_rate=0``.
    - 1 distinct non-null value  -> constant (value from the enum pass)
    - 2..max_enum distinct       -> enum (observed value set)
    - numeric                    -> range [observed min, observed max]
    - string                     -> length [observed min, max length]
    - a shape regex matching ALL non-null values -> pattern (most
      specific first: hex40/uuid > digits > lower_alpha > lower_token)
    - exact mode, n_distinct == n - n_null == n -> unique
    """
    prof = profile_columns(df, columns, exact=exact)
    enum_cols = [
        c for c, s in prof.items()
        if 0 < s["n_distinct"] <= max_enum and s["n"] > 0
    ]
    values: dict[str, list] = {}
    if enum_cols:
        row = df.agg(
            *[F.sort_array(F.collect_set(c)).alias(c) for c in enum_cols]
        ).collect()[0]
        values = {c: list(row[c]) for c in enum_cols}
        # HLL can under/over-estimate near the threshold: drop any
        # column whose ACTUAL set came back larger than max_enum
        for c in list(values):
            if len(values[c]) > max_enum:
                del values[c]

    shape_order = ["hex40", "uuid", "digits", "lower_alpha", "lower_token"]
    out: list[dict] = []
    for c, s in prof.items():
        n_val = s["n"] - s["n_null"]
        if s["n"] > 0 and s["n_null"] == 0:
            out.append({"kind": "not_null", "id": f"suggest_{c}_not_null", "column": c})
        elif (
            s["n"] > 0
            and tolerance_null_rate > 0
            and 0 < s["n_null"] / s["n"] <= tolerance_null_rate
        ):
            mfr = min(0.999, tolerance_headroom * s["n_null"] / s["n"])
            out.append({
                "kind": "not_null", "id": f"suggest_{c}_mostly_not_null",
                "column": c, "max_fail_ratio": round(mfr, 6),
            })
        if c in values and len(values[c]) == 1:
            out.append({"kind": "constant", "id": f"suggest_{c}_constant",
                        "column": c, "value": values[c][0]})
        elif c in values and len(values[c]) > 1:
            out.append({"kind": "enum", "id": f"suggest_{c}_enum",
                        "column": c, "values": values[c]})
        if "min" in s and s["min"] is not None:
            out.append({"kind": "range", "id": f"suggest_{c}_range",
                        "column": c, "min": s["min"], "max": s["max"]})
        if "len_min" in s and s["len_min"] is not None:
            out.append({"kind": "length", "id": f"suggest_{c}_length",
                        "column": c, "min": s["len_min"], "max": s["len_max"]})
            for pname in shape_order:
                if n_val > 0 and s["shapes"][pname] == n_val:
                    out.append({"kind": "pattern", "id": f"suggest_{c}_pattern",
                                "column": c, "pattern": SHAPE_PATTERNS[pname][1:-1]})
                    break  # most specific shape only
        if exact and s["n"] > 0 and s["n_null"] == 0 and s["n_distinct"] == s["n"]:
            out.append({"kind": "unique", "id": f"suggest_{c}_unique", "columns": [c]})
    return out


def suggest_functional_dependencies(
    df: DataFrame,
    candidates: "list[str] | None" = None,
    max_determinant_distinct: int = 10_000,
    exact: bool = False,
) -> "list[dict]":
    """Discover column-level functional dependencies a -> b that HOLD
    on the profiled data and emit them as ``functional_dependency``
    constraint dicts (the FD sibling of suggest_constraints; prior
    art: Deequ's profiler, metanome-style FD discovery bounded to
    single-column determinants).

    Plan shape: the profile bounds the determinant side first —
    columns whose distinct count exceeds ``max_determinant_distinct``
    are skipped (a near-key determinant makes the FD vacuous AND its
    groupBy state huge). Then ONE groupBy per surviving determinant
    evaluates every other column in the same pass:
    groupBy(a).agg(count_distinct(b1), count_distinct(b2), ...) -> a
    determinant-cardinality-sized frame, reduced with max() per b.
    a -> b holds iff max over groups of distinct non-NULL b values is
    <= 1 (NULL dependents pass, matching
    ``ValidationEngine.fd_violations``). Vacuous FDs are dropped:
    a determinant with one row per group proves nothing, so columns
    whose group count equals the non-null row count are skipped."""
    cols = candidates or [
        f.name for f in df.schema.fields
        if isinstance(f.dataType, (StringType, ByteType, ShortType,
                                   IntegerType, LongType))
    ]
    if len(cols) < 2:
        return []
    prof = profile_columns(df, cols, exact=exact)
    out: list[dict] = []
    for a in cols:
        s = prof[a]
        n_nonnull = s["n"] - s["n_null"]
        if not (0 < s["n_distinct"] <= max_determinant_distinct):
            continue
        if s["n_distinct"] >= n_nonnull:  # every group single-row: vacuous
            continue
        others = [b for b in cols if b != a]
        maxes = (
            df.filter(F.col(a).isNotNull())
            .groupBy(a)
            .agg(*[F.count_distinct(F.col(b)).alias(b) for b in others])
            .agg(*[F.max(F.col(b)).alias(b) for b in others])
            .collect()[0]
        )
        for b in others:
            if (maxes[b] or 0) <= 1:
                out.append({
                    "kind": "functional_dependency",
                    "id": f"suggest_fd_{a}_{b}",
                    "determinants": [a],
                    "dependent": b,
                })
    return out


def suggest_spec(
    df: DataFrame,
    name: str,
    key_columns: "list[str] | None" = None,
    columns: "list[str] | None" = None,
    max_enum: int = 24,
    exact: bool = False,
) -> dict:
    """Full spec dict: suggestions + key columns, loadable by
    ``spec_from_dict`` and guaranteed to pass on the profiled data."""
    cons = suggest_constraints(df, columns=columns, max_enum=max_enum, exact=exact)
    return {
        "name": name,
        "key_columns": key_columns or [],
        "watched_columns": [],
        "constraints": cons,
    }
