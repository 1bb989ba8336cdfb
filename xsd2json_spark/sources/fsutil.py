"""Small-text sidecar IO through the Hadoop FileSystem API.

ANN index metadata (``_ann_meta.json``) and the staging stamp
(``_staging_meta.json``) are a few KB of JSON that must live NEXT TO
data Spark wrote — which on a real deployment is ``s3a://`` or
``hdfs://``, not a local path. Plain ``open()`` silently breaks there,
so these helpers route through the same Hadoop ``FileSystem`` the
DataFrame writers use (py4j; resolves ``file://``, ``hdfs://``,
``s3a://`` alike). No extra dependency: Hadoop is on every Spark
classpath.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(hconf), jpath


def exists(spark: SparkSession, path: str) -> bool:
    fs, p = _fs_and_path(spark, path)
    return bool(fs.exists(p))


def write_text(spark: SparkSession, path: str, text: str) -> None:
    """Atomic-enough small-file write: create-overwrite via the FS API
    (object stores make this a single PUT; HDFS an overwrite create)."""
    fs, p = _fs_and_path(spark, path)
    out = fs.create(p, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def read_text(spark: SparkSession, path: str) -> str:
    fs, p = _fs_and_path(spark, path)
    stream = fs.open(p)
    try:
        # commons-io ships with Hadoop; avoids a byte-at-a-time py4j loop
        return spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()
