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


def test_snapshot_cdc_minimal_change_stream(spark):
    from knowledge_extraction_pipeline_spark.operators.audit import (
        snapshot_cdc,
    )
    prev = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string")
    curr = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "d")], "k long, v string")
    got = {(r["k"], r["op"], r["before_v"], r["after_v"])
           for r in snapshot_cdc(prev, curr, ["k"]).collect()}
    assert got == {(2, "update", "b", "B"), (3, "delete", "c", None),
                   (4, "insert", None, "d")}


def test_golden_records_rules(spark):
    import pytest

    from knowledge_extraction_pipeline_spark.operators.audit import (
        golden_records,
    )
    df = spark.createDataFrame(
        [("c1", "short", 5, 30, "en"), ("c1", "longest text", 3, 10, "fr"),
         ("c1", "mid txt", 9, 20, "en"), ("c2", "only", 7, 7, "de")],
        "cluster string, text string, doc_id long, n_chars long, lang string")
    got = {r["cluster"]: r for r in golden_records(df, "cluster", {
        "text": "longest", "n_chars": "max",
        "doc_id": "min", "lang": "majority"}).collect()}
    c1 = got["c1"]
    assert c1["text"] == "longest text" and c1["n_chars"] == 30
    assert c1["doc_id"] == 3 and c1["lang"] == "en"
    assert got["c2"]["lang"] == "de"
    with pytest.raises(ValueError):
        golden_records(df, "cluster", {"text": "newest"})
    with pytest.raises(ValueError):
        golden_records(df, "cluster", {})


def test_pair_eval_counts_and_fixed_point(spark):
    from knowledge_extraction_pipeline_spark.operators.audit import (
        pair_eval,
    )
    pred = spark.createDataFrame(
        [(1, 2), (1, 3), (4, 5), (4, 5)], "id_a long, id_b long")  # dup row
    truth = spark.createDataFrame(
        [(1, 2), (4, 5), (6, 7)], "id_a long, id_b long")
    r = pair_eval(pred, truth).collect()[0]
    assert (r["n_pred"], r["n_true"], r["n_hit"]) == (3, 3, 2)
    assert r["precision_e6"] == 666_666
    assert r["recall_e6"] == 666_666
    assert r["f1_e6"] == 666_666
    # empty prediction set: zero metrics, no division error
    empty = spark.createDataFrame([], "id_a long, id_b long")
    r0 = pair_eval(empty, truth).collect()[0]
    assert (r0["n_pred"], r0["n_hit"], r0["precision_e6"],
            r0["f1_e6"]) == (0, 0, 0, 0)
