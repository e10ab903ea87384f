"""As-of (point-in-time) join — for every left row, the latest right row
with right.ts <= left.ts for the same key.

Reference analog: page assignment — "last page_mapping position <=
char_start" (core/semantic_chunker.py:603-611), the one true as-of lookup in
the reference, done there as an ordered scan per document.

Spark-first shape: NOT a range join (an inequality join explodes to
|left|·|right| per key before pruning). Instead the classic union trick:
tag both sides, union on (key, ts), and carry the most recent right-side
payload forward with a running `last(..., ignorenulls)` window — one shuffle
on the key, linear in |left| + |right|. Caveat: a window partition cannot be
split (AQE skew handling applies to joins, not windows), so a pathologically
hot key is a single-task straggler — if one key can hold ~10⁸+ rows,
pre-bucket the key by time range and stitch the bucket boundaries."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    right_prefix: str = "asof_",
) -> DataFrame:
    """Left rows + `right_prefix`-prefixed columns of the latest right row at
    or before the left row's timestamp (null when no such row — a LEFT as-of
    join). Ties on the same (key, ts): right rows sort before left rows, so
    an exactly-simultaneous right row IS visible to the left row; among
    simultaneous right rows the last in (ts, remaining-cols) order wins,
    deterministically."""
    rpayload = [c for c in right.columns if c not in (on, ts_col)]
    # a right row with a null timestamp can never satisfy ts <= left.ts —
    # without this filter the nulls-first window order would hand its
    # payload to left rows that have NO preceding right row
    right = right.filter(F.col(ts_col).isNotNull())
    l2 = left.select(
        F.col(on).alias("_k"), F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_tag"),
        F.struct(*left.columns).alias("_lrow"),
        F.lit(None).cast(
            right.select(F.struct(ts_col, *rpayload).alias("s")).schema["s"].dataType
        ).alias("_rrow"),
    )
    r2 = right.select(
        F.col(on).alias("_k"), F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_tag"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
        ).alias("_lrow"),
        F.struct(ts_col, *rpayload).alias("_rrow"),
    )
    w = (Window.partitionBy("_k")
         .orderBy(F.asc("_ts"), F.asc("_tag"), F.asc("_rrow"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    joined = (
        l2.unionByName(r2)
        .withColumn("_last_r", F.last("_rrow", ignorenulls=True).over(w))
        .filter(F.col("_tag") == 1)
    )
    out_cols = [F.col(f"_lrow.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"_last_r.{ts_col}").alias(f"{right_prefix}{ts_col}")]
    out_cols += [F.col(f"_last_r.{c}").alias(f"{right_prefix}{c}")
                 for c in rpayload]
    return joined.select(*out_cols)
