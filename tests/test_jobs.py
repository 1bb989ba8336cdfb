"""spark-submit job entry points exercised in-process: the snapshot ->
validate drift loop (jobs/snapshot.py + jobs/validate.py --baselines)
and the CI-gate exit codes."""

import json

from pyspark.sql import functions as F

from xsd2json_spark.sources.synth import files_table


def _write_spec(tmp_path, constraints):
    spec = {
        "name": "jobs_t",
        "key_columns": ["repo", "path", "commit"],
        "constraints": constraints,
    }
    p = str(tmp_path / "spec.json")
    with open(p, "w") as fh:
        json.dump(spec, fh)
    return p


def test_snapshot_then_validate_drift_loop(spark, tmp_path):
    """Full spark-submit-shaped drift loop: snapshot a baseline from the
    reference input, validate the same input (passes, exit 0), then a
    shifted input (drift detected, exit 1)."""
    from jobs.snapshot import main as snap_main
    from jobs.validate import main as val_main

    files = files_table(spark, n_rows=3000)
    inp = str(tmp_path / "in.parquet")
    files.write.parquet(inp)
    spec_path = _write_spec(
        tmp_path,
        [
            {"kind": "drift", "id": "lang_drift", "column": "lang",
             "test": "chi2", "baseline": "lang_base", "alpha": 0.01},
            {"kind": "drift", "id": "len_drift", "column": "content",
             "expr": "length(content)", "test": "ks", "baseline": "len_base",
             "alpha": 0.01},
        ],
    )
    bl = str(tmp_path / "baselines.json")
    assert snap_main(["--input", inp, "--spec", spec_path, "--output", bl]) == 0
    with open(bl) as fh:
        snap = json.load(fh)
    assert set(snap) == {"lang_base", "len_base"}

    out1 = str(tmp_path / "audit1")
    assert val_main(["--input", inp, "--spec", spec_path, "--output", out1,
                     "--baselines", bl]) == 0  # self-drift passes

    shifted = files.withColumn(
        "lang", F.when(F.col("lang") == "python", F.lit("java")).otherwise(F.col("lang"))
    )
    inp2 = str(tmp_path / "in2.parquet")
    shifted.write.parquet(inp2)
    out2 = str(tmp_path / "audit2")
    assert val_main(["--input", inp2, "--spec", spec_path, "--output", out2,
                     "--baselines", bl]) == 1  # drift detected -> CI gate fails


def test_snapshot_without_drift_constraints_errors(spark, tmp_path):
    from jobs.snapshot import main as snap_main

    files = files_table(spark, n_rows=200)
    inp = str(tmp_path / "in.parquet")
    files.write.parquet(inp)
    spec_path = _write_spec(tmp_path, [{"kind": "not_null", "id": "nn", "column": "content"}])
    assert snap_main(["--input", inp, "--spec", spec_path,
                      "--output", str(tmp_path / "b.json")]) == 1
