"""Table IO with an Iceberg gate.

The north rule targets Iceberg tables; this sandbox has no Iceberg
runtime jars, so every reader/writer takes a ``TableRef`` that is
either a catalog table name (used with format('iceberg') /
spark.table) or a filesystem path (parquet). The audit layout in
plans/audit.py is identical either way.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    # py4j resolves missing classes to a lazy JavaPackage without error,
    # so probe the classloader explicitly
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.Table")
        return True
    except Exception:
        return False


@dataclass(frozen=True)
class TableRef:
    """name='catalog.db.tbl' (Iceberg) or path='/data/x.parquet'."""

    name: str = ""
    path: str = ""

    def __post_init__(self):
        if bool(self.name) == bool(self.path):
            raise ValueError("TableRef: exactly one of name/path")


def read_table(spark: SparkSession, ref: TableRef) -> DataFrame:
    if ref.name:
        if not iceberg_available(spark):
            raise RuntimeError(
                f"catalog table {ref.name!r} requested but no Iceberg runtime on the classpath; "
                "pass a parquet path TableRef or add iceberg-spark-runtime via --packages"
            )
        return spark.table(ref.name)
    return spark.read.parquet(ref.path)


def write_table(df: DataFrame, ref: TableRef, mode: str = "append") -> None:
    if ref.name:
        if not iceberg_available(df.sparkSession):
            raise RuntimeError(
                f"catalog table {ref.name!r} requested but no Iceberg runtime on the classpath"
            )
        w = df.writeTo(ref.name)
        (w.append() if mode == "append" else w.createOrReplace())
        return
    df.write.mode("overwrite" if mode == "overwrite" else "append").parquet(ref.path)
