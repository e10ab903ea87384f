"""Data-engineering QA operators: table reconciliation (row-level diff
between two datasets — migration/backfill validation) and rule-based data
quality audits. Both are single-pass/single-join plans meant to run over
full 100 TB tables.

Scale shape: reconcile is one full outer equi-join on the key columns
(AQE-skew-splittable; column comparison is a null-safe JVM expression, no
Python); dq_audit is one map-side scan computing every rule as a
conditional sum — adding rules adds expressions, not passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RECONCILE_STATUSES = ("equal", "differs", "only_left", "only_right")


def reconcile_tables(left: DataFrame, right: DataFrame, keys: list[str],
                     compare_cols: list[str] | None = None,
                     details: bool = False) -> DataFrame:
    """Diff two tables keyed by `keys`. Returns (status, n_rows) counts over
    {equal, differs, only_left, only_right} — or, with details=True, the
    per-key rows (key cols + status) for every non-equal key. Comparison is
    null-safe column equality over `compare_cols` (default: all shared
    non-key columns), evaluated as JVM expressions — no hashing, so the
    verdicts are engine-portable. Keys must be unique per side (it's a diff,
    not a join explosion guard)."""
    if not keys:
        raise ValueError("keys must be non-empty")
    if compare_cols is None:
        shared = [c for c in left.columns if c in set(right.columns)]
        compare_cols = [c for c in shared if c not in set(keys)]
    l = left.select(
        *[F.col(k).alias(k) for k in keys],
        *[F.col(c).alias(f"_l_{c}") for c in compare_cols],
        F.lit(1).alias("_in_l"))
    r = right.select(
        *[F.col(k).alias(k) for k in keys],
        *[F.col(c).alias(f"_r_{c}") for c in compare_cols],
        F.lit(1).alias("_in_r"))
    j = l.join(r, keys, "full_outer")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"_l_{c}").eqNullSafe(F.col(f"_r_{c}"))
    status = (F.when(F.col("_in_l").isNull(), F.lit("only_right"))
              .when(F.col("_in_r").isNull(), F.lit("only_left"))
              .when(same, F.lit("equal"))
              .otherwise(F.lit("differs")))
    tagged = j.select(*keys, status.alias("status"))
    if details:
        return tagged.filter(F.col("status") != "equal")
    return (tagged.groupBy("status")
            .agg(F.count(F.lit(1)).alias("n_rows")))


def dq_audit(df: DataFrame, rules: list[tuple[str, F.Column]],
             scale: int = 10**6) -> DataFrame:
    """Rule-based data-quality audit: `rules` is [(name, pass_condition)].
    One scan; returns per rule (rule, n_rows, n_violations,
    violation_rate_e6) with the rate in fixed-point e6 (exact integer
    division — engine-portable). A NULL pass_condition counts as a
    violation (unknown is not a pass)."""
    if not rules:
        raise ValueError("rules must be non-empty")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for name, cond in rules:
        aggs.append(
            F.coalesce(
                F.sum(F.when(cond.eqNullSafe(F.lit(True)), 0).otherwise(1)),
                F.lit(0)).alias(f"_v_{name}"))
    # one scan total: the 1-row aggregate is materialized once, then each
    # rule's output row is a select over it (never a rescan of df)
    row = df.agg(*aggs).localCheckpoint(eager=True)
    stacked = None
    for name, _ in rules:
        part = row.select(
            F.lit(name).alias("rule"), F.col("n_rows"),
            F.col(f"_v_{name}").cast("long").alias("n_violations"),
            F.expr(f"(_v_{name} * {scale}L) div greatest(n_rows, 1)")
            .alias("violation_rate_e6"))
        stacked = part if stacked is None else stacked.unionByName(part)
    return stacked
