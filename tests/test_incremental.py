"""Incremental (snapshot-delta) validation: the composed verdicts must
equal a from-scratch run on the current snapshot, for adds, updates,
deletes, per-partition specs, and the empty delta."""

import pytest
from pyspark.sql import functions as F

from xsd2json_spark import spec_from_dict
from xsd2json_spark.engine import ValidationEngine
from xsd2json_spark.engine.incremental import (
    incremental_verdicts,
    snapshot_delta,
)

SPEC = {
    "name": "inc",
    "key_columns": ["doc_id"],
    "constraints": [
        {"kind": "not_null", "id": "t_nn", "column": "text"},
        {"kind": "length", "id": "t_len", "column": "text", "min": 5, "max": 100},
        {"kind": "unique", "id": "pk", "columns": ["doc_id"]},
    ],
}


def vmap(verdicts):
    return {
        r["constraint_id"]: (r["violation_count"], r["passed"])
        for r in verdicts.collect()
    }


@pytest.fixture()
def snapshots(spark):
    a = spark.createDataFrame(
        [(i, None if i % 5 == 0 else f"text number {i}") for i in range(200)],
        "doc_id long, text string",
    )
    # B: delete >= 180, update % 7 (too-short text), add 500-509
    b = (
        a.filter("doc_id < 180")
        .withColumn("text", F.when(F.col("doc_id") % 7 == 0, F.lit("ab")).otherwise(F.col("text")))
        .unionByName(
            spark.createDataFrame(
                [(500 + i, "tiny" if i % 2 else "long enough text") for i in range(10)],
                "doc_id long, text string",
            )
        )
    )
    return a, b


def test_snapshot_delta_classifies_adds_updates_deletes(spark, snapshots):
    a, b = snapshots
    added, removed = snapshot_delta(a, b, ["doc_id"])
    add_ids = {r["doc_id"] for r in added.select("doc_id").collect()}
    rem_ids = {r["doc_id"] for r in removed.select("doc_id").collect()}
    # updated % 7 rows (with non-null original text) appear on BOTH sides
    updated = {i for i in range(180) if i % 7 == 0 and i % 5 != 0}
    assert updated <= add_ids and updated <= rem_ids
    assert {500 + i for i in range(10)} <= add_ids  # pure adds
    assert {i for i in range(180, 200)} <= rem_ids  # pure deletes
    # unchanged rows appear on neither side
    assert 1 not in add_ids and 1 not in rem_ids


def test_incremental_equals_full_recompute(spark, snapshots):
    a, b = snapshots
    spec = spec_from_dict(SPEC)
    prev = ValidationEngine(spark, spec).run(a).verdicts
    inc = vmap(incremental_verdicts(spark, spec, a, b, prev))
    full = vmap(ValidationEngine(spark, spec).run(b).verdicts)
    assert inc == full
    assert inc["t_nn"][0] > 0 and inc["t_len"][0] > 0  # non-vacuous fixture


def test_incremental_empty_delta_is_identity(spark, snapshots):
    a, _ = snapshots
    spec = spec_from_dict(SPEC)
    prev = ValidationEngine(spark, spec).run(a).verdicts
    inc = vmap(incremental_verdicts(spark, spec, a, a, prev))
    assert inc == vmap(prev)


def test_incremental_per_partition_spec(spark):
    """partition_by specs compose per (partition_key, constraint_id),
    including a partition that only exists in the new snapshot."""
    spec = spec_from_dict(
        {
            "name": "incp",
            "key_columns": ["doc_id"],
            "partition_by": ["grp"],
            "constraints": [{"kind": "not_null", "id": "t_nn", "column": "text"}],
        }
    )
    a = spark.createDataFrame(
        [(i, "g%d" % (i % 2), None if i % 4 == 0 else "x") for i in range(40)],
        "doc_id long, grp string, text string",
    )
    b = a.unionByName(
        spark.createDataFrame([(100, "g9", None), (101, "g9", "y")], "doc_id long, grp string, text string")
    )
    prev = ValidationEngine(spark, spec).run(a).verdicts
    inc = {
        (r["partition_key"], r["constraint_id"]): r["violation_count"]
        for r in incremental_verdicts(spark, spec, a, b, prev).collect()
    }
    full = {
        (r["partition_key"], r["constraint_id"]): r["violation_count"]
        for r in ValidationEngine(spark, spec).run(b).verdicts.collect()
    }
    assert inc == full
    # the brand-new partition composed from zero (keys are to_json structs)
    assert inc[('{"grp":"g9"}', "t_nn")] == 1


def test_incremental_drained_partition_emits_no_row(spark):
    """A partition whose rows are ALL deleted in the new snapshot must
    vanish from the composed verdicts, exactly as it does in a
    from-scratch run (which has no rows to group for it)."""
    spec = spec_from_dict(
        {
            "name": "incd",
            "key_columns": ["doc_id"],
            "partition_by": ["grp"],
            "constraints": [{"kind": "not_null", "id": "t_nn", "column": "text"}],
        }
    )
    a = spark.createDataFrame(
        [(1, "keep", "x"), (2, "keep", None), (3, "gone", "y"), (4, "gone", None)],
        "doc_id long, grp string, text string",
    )
    b = a.filter(F.col("grp") == "keep")
    prev = ValidationEngine(spark, spec).run(a).verdicts
    inc = {
        (r["partition_key"], r["constraint_id"]): r["violation_count"]
        for r in incremental_verdicts(spark, spec, a, b, prev).collect()
    }
    full = {
        (r["partition_key"], r["constraint_id"]): r["violation_count"]
        for r in ValidationEngine(spark, spec).run(b).verdicts.collect()
    }
    assert inc == full
    assert ('{"grp":"gone"}', "t_nn") not in inc


def test_snapshot_delta_sees_multiplicity_changes(spark):
    """Duplicate keys (nothing enforces uniqueness): a (key, payload)
    whose copy-count changes must surface the NET copies in
    added/removed, and the composed row counters must match a full
    recompute — existence anti-joins would miss the change entirely."""
    a = spark.createDataFrame(
        [(1, "dup"), (1, "dup"), (2, None), (2, None), (2, None), (3, "solo")],
        "doc_id long, text string",
    )
    # B: one more copy of (1,'dup'), one fewer of (2,NULL)
    b = spark.createDataFrame(
        [(1, "dup"), (1, "dup"), (1, "dup"), (2, None), (2, None), (3, "solo")],
        "doc_id long, text string",
    )
    added, removed = snapshot_delta(a, b, ["doc_id"])
    assert [tuple(r) for r in added.collect()] == [(1, "dup")]
    assert [tuple(r) for r in removed.collect()] == [(2, None)]
    spec = spec_from_dict(
        {
            "name": "incm",
            "key_columns": ["doc_id"],
            "constraints": [{"kind": "not_null", "id": "t_nn", "column": "text"}],
        }
    )
    prev = ValidationEngine(spark, spec).run(a).verdicts
    inc = vmap(incremental_verdicts(spark, spec, a, b, prev))
    full = vmap(ValidationEngine(spark, spec).run(b).verdicts)
    assert inc == full
    assert inc["t_nn"] == (2, False)  # the deleted NULL copy composed out
