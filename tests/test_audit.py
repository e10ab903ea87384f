"""Reconciliation + data-quality audit (operators/audit)."""

import pytest

from pyspark.sql import functions as F


def test_reconcile_statuses_and_details(spark):
    from knowledge_extraction_pipeline_spark.operators.audit import (
        reconcile_tables,
    )
    left = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", None), (4, "d", 4.0)],
        "k long, s string, v double")
    right = spark.createDataFrame(
        [(1, "a", 1.0),        # equal
         (2, "b", 99.0),       # differs
         (3, "c", None),       # equal (null-safe)
         (5, "e", 5.0)],       # only_right; 4 -> only_left
        "k long, s string, v double")
    got = {r["status"]: r["n_rows"]
           for r in reconcile_tables(left, right, ["k"]).collect()}
    assert got == {"equal": 2, "differs": 1, "only_left": 1, "only_right": 1}
    det = {(r["k"], r["status"]) for r in
           reconcile_tables(left, right, ["k"], details=True).collect()}
    assert det == {(2, "differs"), (4, "only_left"), (5, "only_right")}
    with pytest.raises(ValueError):
        reconcile_tables(left, right, [])


def test_dq_audit_null_condition_is_violation(spark):
    from knowledge_extraction_pipeline_spark.operators.audit import (
        dq_audit,
    )
    df = spark.createDataFrame(
        [(1.0,), (None,), (-2.0,), (3.0,)], "v double")
    got = {r["rule"]: r for r in dq_audit(
        df, [("nonneg", F.col("v") >= 0)]).collect()}
    r = got["nonneg"]
    # NULL >= 0 is unknown -> counted as a violation, alongside -2.0
    assert r["n_rows"] == 4 and r["n_violations"] == 2
    assert r["violation_rate_e6"] == 500_000
    # empty input: rate guard, no division error
    empty = spark.createDataFrame([], "v double")
    r0 = dq_audit(empty, [("nonneg", F.col("v") >= 0)]).collect()[0]
    assert r0["n_rows"] == 0 and r0["violation_rate_e6"] == 0
    with pytest.raises(ValueError):
        dq_audit(df, [])
