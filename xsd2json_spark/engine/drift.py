"""Distribution-drift checks against a persisted baseline snapshot
(north_star extension; the reference has no runtime analog — this
generalizes its accumulate-then-verdict shape to distributions).

Baseline snapshot format (JSON-serializable dict, see make_snapshot):

    {
      "<name>": {
        "kind": "categorical",
        "counts": {"en": 218, "fr": 64, ...}          # chi-square target
      },
      "<name>": {
        "kind": "numeric",
        "n": 500,
        "grid": [q1, q2, ...],                        # value grid
        "ecdf": [F(q1), F(q2), ...]                   # baseline ECDF at grid
      }
    }

Scale design: the current-side statistics are computed with ONE
aggregation each —

- chi2: groupBy(col).count() (bounded by category cardinality), then the
  Pearson statistic driver-side (O(#categories), no row collect).
- ks: the baseline stores a ~199-point value grid with its ECDF; the
  current ECDF at those grid points is one agg of
  sum(value <= q_i)/count — 200 counters in a single pass, no sort, no
  row collect; D = max_i |ecdf_cur(q_i) - ecdf_base(q_i)|. The grid
  bounds the error of D by the grid resolution (1/(grid+1) per cell),
  which is what you want at 10^12 rows — an exact KS needs a full sort.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xsd2json_spark.engine.stats_math import chi2_sf, chi2_stat, ks_pvalue
from xsd2json_spark.spec.constraints import Drift, SpecError

DEFAULT_GRID_POINTS = 199


def _value_col(c: Drift):
    return F.expr(c.expr) if c.expr else F.col(c.column)


def make_categorical_baseline(df: DataFrame, column: str) -> dict:
    rows = df.groupBy(column).agg(F.count(F.lit(1)).alias("n")).collect()
    return {"kind": "categorical", "counts": {str(r[column]): r["n"] for r in rows if r[column] is not None}}


def make_numeric_baseline(
    df: DataFrame, expr: str, grid_points: int = DEFAULT_GRID_POINTS
) -> dict:
    """Quantile grid + ECDF of the baseline itself at that grid."""
    col = F.expr(expr).cast("double")
    probs = [i / (grid_points + 1) for i in range(1, grid_points + 1)]
    agg = df.select(col.alias("v")).na.drop()
    row = agg.agg(
        F.percentile_approx("v", probs, 10000).alias("grid"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    grid = [float(g) for g in row["grid"]]
    # ECDF of the baseline at its own grid (exact, one more agg)
    ecdf_exprs = [F.avg((F.col("v") <= F.lit(q)).cast("double")).alias(f"e{i}") for i, q in enumerate(grid)]
    erow = agg.agg(*ecdf_exprs).collect()[0]
    return {
        "kind": "numeric",
        "n": int(row["n"]),
        "grid": grid,
        "ecdf": [float(erow[f"e{i}"]) for i in range(len(grid))],
    }


def chi2_drift(df: DataFrame, c: Drift, baseline: dict) -> "tuple[float, float]":
    counts = baseline["counts"]
    total = sum(counts.values())
    if total == 0:
        raise SpecError(f"drift {c.id}: empty baseline")
    probs = {k: v / total for k, v in counts.items()}
    rows = df.groupBy(_value_col(c).alias("__cat")).agg(F.count(F.lit(1)).alias("n")).collect()
    observed = {str(r["__cat"]): r["n"] for r in rows if r["__cat"] is not None}
    stat, dof = chi2_stat(observed, probs)
    return stat, chi2_sf(stat, dof)


def ks_drift(df: DataFrame, c: Drift, baseline: dict) -> "tuple[float, float]":
    grid, base_ecdf, n_base = baseline["grid"], baseline["ecdf"], baseline["n"]
    v = _value_col(c).cast("double")
    cur = df.select(v.alias("v")).na.drop()
    exprs = [F.avg((F.col("v") <= F.lit(q)).cast("double")).alias(f"e{i}") for i, q in enumerate(grid)]
    row = cur.agg(*exprs, F.count(F.lit(1)).alias("n")).collect()[0]
    n_cur = row["n"] or 0
    if n_cur == 0:
        raise SpecError(f"drift {c.id}: no current values")
    d = max(abs(float(row[f"e{i}"]) - base_ecdf[i]) for i in range(len(grid)))
    return d, ks_pvalue(d, n_base, n_cur)


def drift_verdict(spark: SparkSession, df: DataFrame, c: Drift, baselines: dict) -> tuple:
    """Returns a verdict row tuple (partition_key, constraint_id,
    violation_count, evaluated_count, passed)."""
    baseline: Optional[dict] = baselines.get(c.baseline)
    if baseline is None:
        raise KeyError(f"drift {c.id}: baseline snapshot {c.baseline!r} not provided")
    if c.test == "chi2":
        stat, p = chi2_drift(df, c, baseline)
    else:
        stat, p = ks_drift(df, c, baseline)
    passed = p >= c.alpha
    return ("ALL", c.id, 0 if passed else 1, None, passed)
