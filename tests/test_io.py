import pytest

from xsd2json_spark.sources.io import TableRef, iceberg_available, read_table, write_table


def test_tableref_exactly_one():
    with pytest.raises(ValueError):
        TableRef()
    with pytest.raises(ValueError):
        TableRef(name="a.b.c", path="/x")


def test_parquet_roundtrip(spark, tmp_path):
    ref = TableRef(path=str(tmp_path / "t.parquet"))
    df = spark.range(10).selectExpr("id", "id * 2 AS v")
    write_table(df, ref, mode="overwrite")
    back = read_table(spark, ref)
    assert back.count() == 10


def test_iceberg_gate_errors_clearly(spark):
    # this sandbox has no Iceberg jars: catalog refs must fail loudly
    if iceberg_available(spark):
        pytest.skip("iceberg runtime present")
    with pytest.raises(RuntimeError, match="Iceberg runtime"):
        read_table(spark, TableRef(name="cat.db.tbl"))
