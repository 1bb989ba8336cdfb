"""PII detection/redaction: pattern unit behavior, redaction-order
safety, the map-only plan shape, and Spark<->driver determinism."""

import pyspark.sql.functions as F
import pytest

from xsd2json_spark.functions import pii as P


def _scan_one(spark, text: str):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return P.scan_documents(df).collect()[0]


CASES = [
    ("mail me at bob.smith+x@corp.example.org today",
     dict(n_email=1, n_ssn=0, n_phone=0, n_ipv4=0),
     "mail me at <EMAIL> today"),
    ("ssn 123-45-6789 on file",
     dict(n_email=0, n_ssn=1, n_phone=0, n_ipv4=0),
     "ssn <SSN> on file"),
    ("call 555-010-4567 or +1 555.010.9999 now",
     dict(n_email=0, n_ssn=0, n_phone=2, n_ipv4=0),
     "call <PHONE> or <PHONE> now"),
    ("host 192.168.10.1 and 10.0.0.5",
     dict(n_email=0, n_ssn=0, n_phone=0, n_ipv4=2),
     "host <IP> and <IP>"),
    # every class at once; ssn is NOT double-counted as a phone and the
    # phone is NOT counted as an ssn (shape disambiguation)
    ("a@b.co 111-22-3333 555-010-4567 1.2.3.4",
     dict(n_email=1, n_ssn=1, n_phone=1, n_ipv4=1),
     "<EMAIL> <SSN> <PHONE> <IP>"),
    ("plain text with no pii at all",
     dict(n_email=0, n_ssn=0, n_phone=0, n_ipv4=0),
     "plain text with no pii at all"),
]


@pytest.mark.parametrize("text,counts,redacted", CASES)
def test_pii_cases(spark, text, counts, redacted):
    row = _scan_one(spark, text)
    for k, v in counts.items():
        assert row[k] == v, (k, text)
    assert row["n_pii"] == sum(counts.values())
    assert row["text_redacted"] == redacted


def test_redaction_order_no_cascade(spark):
    """Tokens contain no digits/@, so one redaction can never create a
    later pattern; ssn runs before phone so 3-2-4 digit groups keep
    their class."""
    row = _scan_one(spark, "999-88-7777 next to 555-010-4567")
    assert row["n_ssn"] == 1 and row["n_phone"] == 1
    assert row["text_redacted"] == "<SSN> next to <PHONE>"


def test_scan_is_map_only(spark):
    """The whole audit is Column exprs over one scan: no shuffle
    (Exchange) in the plan, and no Python/Arrow eval nodes."""
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = P.scan_documents(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan and "InPandas" not in plan


def test_scan_documents_driver_query(spark):
    """The registered driver query runs and is deterministic (twice ->
    identical md5s), and the injected residues actually produce PII."""
    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    q = E.queries()["doc_pii_redaction"]
    a = {r["doc_id"]: r for r in q(spark, sf).collect()}
    b = {r["doc_id"]: r for r in q(spark, sf).collect()}
    assert a.keys() == b.keys() and len(a) > 0
    assert all(a[k] == b[k] for k in a)
    assert any(r["n_email"] > 0 for r in a.values())
    assert any(r["n_ssn"] > 0 for r in a.values())
    assert any(r["n_phone"] > 0 for r in a.values())
    assert any(r["n_ipv4"] > 0 for r in a.values())
    # clean docs are untouched: doc_id coprime to 7/11/13/17 has 0 PII
    clean = [r for k, r in a.items() if all(k % m for m in (7, 11, 13, 17))]
    assert clean and all(r["n_pii"] == 0 for r in clean)
