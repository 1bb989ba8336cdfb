"""Fixture `resume_checkpoint`: kill after bucket k, resume; verdicts
identical to an uninterrupted run; completed buckets not re-processed."""

import pytest
from pyspark.sql import functions as F

from xsd2json_spark.engine.validate import ValidationEngine
from xsd2json_spark.plans.audit import ResumableRunner
from xsd2json_spark.sources.synth import files_table
from xsd2json_spark.spec.constraints import Enum, NotNull, Spec, Unique

SPEC = Spec(
    name="resume_t",
    key_columns=["repo", "path", "commit"],
    constraints=[
        NotNull(id="nn", column="content"),
        Enum(id="en", column="lang", values=["python", "java", "scala", "go", "js", "sql"]),
        Unique(id="uq", columns=["repo", "path", "commit"]),
    ],
)


def _verdict_map(df):
    return {
        (r["partition_key"], r["constraint_id"]): (r["violation_count"], r["passed"])
        for r in df.collect()
    }


def test_crash_and_resume(spark, tmp_path):
    files = files_table(spark, n_rows=4000).cache()
    files.count()

    # ground truth: uninterrupted run
    clean = ResumableRunner(ValidationEngine(spark, SPEC), str(tmp_path / "clean"), run_id="r1", n_buckets=8)
    clean.run(files)
    truth = _verdict_map(clean.global_verdicts())

    # crashing run: dies after bucket 3
    crash_dir = str(tmp_path / "crash")
    runner = ResumableRunner(ValidationEngine(spark, SPEC), crash_dir, run_id="r1", n_buckets=8)
    with pytest.raises(RuntimeError, match="simulated crash"):
        runner.run(files, fail_after_bucket=3)
    done_after_crash = runner.completed_buckets()
    assert 0 < len(done_after_crash) < 8

    # resume: a fresh runner over the same audit dir
    resumed = ResumableRunner(ValidationEngine(spark, SPEC), crash_dir, run_id="r1", n_buckets=8)
    processed = resumed.run(files)
    assert processed == set(range(8)) - done_after_crash  # completed buckets skipped
    assert resumed.completed_buckets() == set(range(8))

    assert _verdict_map(resumed.global_verdicts()) == truth
    # violations identical too (order-insensitive)
    a = clean.global_violations()
    b = resumed.global_violations()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    files.unpersist()
