"""Constraint suggestion (engine/suggest): profiling stats, the
inference rule set, spec loadability, and the self-pass guarantee
(every suggested constraint passes on the data that suggested it)."""

import pyspark.sql.functions as F

from xsd2json_spark import spec_from_dict
from xsd2json_spark.engine import ValidationEngine
from xsd2json_spark.engine.suggest import (
    SHAPE_PATTERNS,
    profile_columns,
    suggest_constraints,
    suggest_spec,
)


def _df(spark):
    rows = [
        (i,
         f"{i:040x}"[-40:],                      # hex40 shape, unique
         ["red", "green", "blue"][i % 3],         # enum, lower_alpha
         "fixed",                                  # constant
         float(i) * 1.5,                           # numeric range
         None if i % 5 == 0 else f"tok_{i % 4}",  # nullable lower_token
         )
        for i in range(40)
    ]
    return spark.createDataFrame(
        rows, "id long, h string, color string, tag string, score double, tok string"
    )


def test_profile_columns_exact(spark):
    df = _df(spark)
    p = profile_columns(df, exact=True)
    assert p["id"] == {"type": "bigint", "n": 40, "n_null": 0,
                       "n_distinct": 40, "min": 0, "max": 39}
    assert p["score"]["min"] == 0.0 and p["score"]["max"] == 58.5
    assert p["color"]["n_distinct"] == 3
    assert p["tok"]["n_null"] == 8 and p["tok"]["n_distinct"] == 4
    assert p["h"]["len_min"] == 40 and p["h"]["len_max"] == 40
    # shape shares count full matches over non-null values
    assert p["h"]["shapes"]["hex40"] == 40
    assert p["color"]["shapes"]["lower_alpha"] == 40
    assert p["tok"]["shapes"]["lower_token"] == 32
    assert p["tok"]["shapes"]["lower_alpha"] == 0


def test_suggest_rules(spark):
    cons = suggest_constraints(_df(spark), exact=True, max_enum=8)
    by = {(c.get("column") or ",".join(c["columns"]), c["kind"]): c for c in cons}
    # not_null everywhere except the nullable tok
    for c in ("id", "h", "color", "tag", "score"):
        assert (c, "not_null") in by
    assert ("tok", "not_null") not in by
    # enum with the observed sorted value set; constant for 1-distinct
    assert by[("color", "enum")]["values"] == ["blue", "green", "red"]
    assert by[("tag", "constant")]["value"] == "fixed"
    # ranges/lengths are the observed bounds
    assert by[("id", "range")]["min"] == 0 and by[("id", "range")]["max"] == 39
    assert by[("score", "range")]["max"] == 58.5
    assert by[("h", "length")]["min"] == 40
    # most specific shape wins: h is hex40 (also lower_token-shaped)
    assert by[("h", "pattern")]["pattern"] == SHAPE_PATTERNS["hex40"][1:-1]
    assert by[("color", "pattern")]["pattern"] == SHAPE_PATTERNS["lower_alpha"][1:-1]
    # tok has nulls -> pattern still suggested (matches all NON-NULL)
    assert by[("tok", "pattern")]["pattern"] == SHAPE_PATTERNS["lower_token"][1:-1]
    # unique only in exact mode and only for truly distinct columns
    assert ("id", "unique") in by and ("h", "unique") in by
    assert ("color", "unique") not in by
    # no unique suggestions in approx mode (HLL cannot prove uniqueness)
    approx = suggest_constraints(_df(spark), exact=False, max_enum=8)
    assert not [c for c in approx if c["kind"] == "unique"]


def test_enum_threshold(spark):
    cons = suggest_constraints(_df(spark), exact=True, max_enum=2)
    kinds = {(c.get("column"), c["kind"]) for c in cons}
    assert ("color", "enum") not in kinds  # 3 distinct > max_enum=2
    assert ("tag", "constant") in kinds  # 1 distinct still fits


def test_suggested_spec_self_passes(spark):
    """The self-pass guarantee: run the engine with the suggested spec
    on the suggesting data -> zero violations, all verdicts pass."""
    df = _df(spark)
    spec = spec_from_dict(suggest_spec(df, "suggested", key_columns=["id"], exact=True))
    res = ValidationEngine(spark, spec).run(df)
    verdicts = res.verdicts.collect()
    assert len(verdicts) > 10
    assert all(r["passed"] for r in verdicts)
    assert res.violations.count() == 0
    res.unpersist()


def test_driver_query_rows(spark):
    import __spark_entry__ as E

    rows = E.queries()["cv_suggested_spec"](spark, "/root/testdata/sf0.001").collect()
    got = {(r["col_name"], r["kind"]): r["detail"] for r in rows}
    assert got[("lang", "enum")]  # the langs, sorted, comma-joined
    assert got[("lang", "pattern")] == "[a-z]+"
    assert got[("source", "pattern")] == "[a-z][a-z0-9_-]*"
    assert ("doc_id", "unique") in got and ("doc_id", "range") in got
    assert ("n_chars", "range") in got


def test_suggest_functional_dependencies(spark):
    """FD discovery: planted dependency found, violated pair skipped,
    vacuous (key-like) determinants skipped, NULL dependents pass,
    and every suggested FD passes its own table via the engine."""
    from xsd2json_spark import spec_from_dict
    from xsd2json_spark.engine import ValidationEngine
    from xsd2json_spark.engine.suggest import suggest_functional_dependencies

    rows = []
    for i in range(120):
        code = ["US", "DE", "FR"][i % 3]
        name = {"US": "United States", "DE": "Germany", "FR": None}[code]  # FR: NULLs pass
        rows.append((i, code, name, "x%d" % (i % 7)))
    df = spark.createDataFrame(rows, "id long, code string, name string, junk string")

    fds = suggest_functional_dependencies(df, exact=True)
    got = {(tuple(d["determinants"]), d["dependent"]) for d in fds}
    assert (("code",), "name") in got          # planted FD holds
    assert (("junk",), "code") not in got      # 7 junk values x 3 codes: violated
    assert not any(d == ("id",) for d, _ in got)  # key determinant: vacuous, skipped
    # name -> code also holds on non-null names (US/DE unique names)
    assert (("name",), "code") in got

    # acceptance: the suggested FDs run green through the engine
    spec = spec_from_dict({"name": "fds", "key_columns": ["id"], "constraints": fds})
    res = ValidationEngine(spark, spec).run(df)
    assert all(r["passed"] for r in res.verdicts.collect())
    res.unpersist()


def test_suggest_tolerant_not_null(spark):
    """An almost-complete column gets a max_fail_ratio'd not_null at
    headroom x observed rate (Deequ hasCompleteness analog); a fully
    complete column keeps the strict form; a very-null column gets
    neither; and the suggested spec still passes on its own table."""
    from xsd2json_spark import spec_from_dict
    from xsd2json_spark.engine import ValidationEngine
    from xsd2json_spark.engine.suggest import suggest_constraints

    rows = [(i,
             "full%d" % i,
             None if i == 0 else "mostly%d" % i,     # 1% null
             None if i % 3 == 0 else "often%d" % i)  # 34% null
            for i in range(100)]
    df = spark.createDataFrame(rows, "id long, full string, mostly string, often string")
    cons = {c["id"]: c for c in suggest_constraints(df, exact=True)}
    assert "suggest_full_not_null" in cons
    assert "max_fail_ratio" not in cons["suggest_full_not_null"]
    tol = cons["suggest_mostly_mostly_not_null"]
    assert tol["kind"] == "not_null" and tol["max_fail_ratio"] == 0.02  # 2 x 1%
    assert not any(c.get("column") == "often" and c["kind"] == "not_null" for c in cons.values())
    # disabling the rule drops the tolerant suggestion
    off = suggest_constraints(df, exact=True, tolerance_null_rate=0)
    assert not any(c["id"] == "suggest_mostly_mostly_not_null" for c in off)
    # acceptance
    spec = spec_from_dict({"name": "s", "key_columns": ["id"], "constraints": list(cons.values())})
    res = ValidationEngine(spark, spec).run(df)
    assert all(r["passed"] for r in res.verdicts.collect())
    res.unpersist()
