"""As-of (point-in-time) join — for every left row, the latest right row
with right.ts <= left.ts for the same key.

Reference analog: page assignment — "last page_mapping position <=
char_start" (core/semantic_chunker.py:603-611), the one true as-of lookup in
the reference, done there as an ordered scan per document.

Spark-first shape: NOT a range join (an inequality join explodes to
|left|·|right| per key before pruning). Instead the classic union trick:
tag both sides, union on (key, ts), and carry the most recent right-side
payload forward with a running `last(..., ignorenulls)` window — one shuffle
on the key, linear in |left| + |right|.

Hot keys: a window partition cannot be split (AQE skew handling applies to
joins, not windows), so with the default un-bucketed plan a pathologically
hot key is a single-task straggler. Pass `bucket=<time width>` to split
every key's timeline into fixed time buckets: the running-last window then
partitions by (key, bucket) — parallel across buckets — and a second, small
per-(key, bucket) pass stitches the boundaries by carrying the last right
row of earlier buckets forward. Results are identical to the un-bucketed
plan (tested); the extra cost is one aggregate + one equi-join on narrow
per-bucket rows, both AQE-skew-splittable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _has_unorderable(dt: T.DataType) -> bool:
    """True if the type contains a MapType anywhere — maps are not orderable
    in Spark, so a sort key containing one fails at analysis."""
    if isinstance(dt, T.MapType):
        return True
    if isinstance(dt, T.ArrayType):
        return _has_unorderable(dt.elementType)
    if isinstance(dt, T.StructType):
        return any(_has_unorderable(f.dataType) for f in dt.fields)
    return False


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    right_prefix: str = "asof_",
    tiebreak: str | None = None,
    bucket: float | None = None,
) -> DataFrame:
    """Left rows + `right_prefix`-prefixed columns of the latest right row at
    or before the left row's timestamp (null when no such row — a LEFT as-of
    join). Ties on the same (key, ts): right rows sort before left rows, so
    an exactly-simultaneous right row IS visible to the left row; among
    simultaneous right rows the greatest tiebreak wins, deterministically.

    tiebreak: right column ordering simultaneous right rows (the greatest
      value wins). Default: the full right payload struct when its type is
      orderable, else a 64-bit hash of its JSON form (maps etc. — still
      deterministic, modulo a 2⁻⁶⁴ hash collision between distinct payloads).
    bucket: optional time-bucket width (units of `ts_col`, after a cast to
      double — seconds-since-epoch for timestamps). Splits hot keys across
      window partitions; see module docstring.
    """
    if bucket is not None and bucket <= 0:
        # a negative width INVERTS bucket order — the boundary stitch would
        # then carry FUTURE right rows backwards; fail instead
        raise ValueError(f"as_of_join: bucket must be > 0, got {bucket}")
    rpayload = [c for c in right.columns if c not in (on, ts_col)]
    # fail loudly instead of silently shadowing left columns in the output
    clash = [c for c in [ts_col] + rpayload
             if f"{right_prefix}{c}" in left.columns]
    if clash:
        raise ValueError(
            f"as_of_join: output column(s) "
            f"{[right_prefix + c for c in clash]} already exist in left; "
            f"pass a different right_prefix")
    # a right row with a null timestamp can never satisfy ts <= left.ts —
    # without this filter the nulls-first window order would hand its
    # payload to left rows that have NO preceding right row
    right = right.filter(F.col(ts_col).isNotNull())

    rstruct = right.select(
        F.struct(ts_col, *rpayload).alias("s")).schema["s"].dataType
    if tiebreak is not None:
        tie = F.col(tiebreak)
    elif _has_unorderable(rstruct):
        tie = F.xxhash64(F.to_json(F.struct(ts_col, *rpayload)))
    else:
        tie = F.struct(ts_col, *rpayload)

    l2 = left.select(
        F.col(on).alias("_k"), F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_tag"),
        F.struct(*left.columns).alias("_lrow"),
        F.lit(None).cast(
            right.select(tie.alias("t")).schema["t"].dataType).alias("_tie"),
        F.lit(None).cast(rstruct).alias("_rrow"),
    )
    r2 = right.select(
        F.col(on).alias("_k"), F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_tag"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
        ).alias("_lrow"),
        tie.alias("_tie"),
        F.struct(ts_col, *rpayload).alias("_rrow"),
    )
    u = l2.unionByName(r2)

    if bucket is None:
        part = Window.partitionBy("_k")
    else:
        # temporal types route through TIMESTAMP (TIMESTAMP_NTZ/DATE have no
        # direct numeric cast) → epoch seconds; numerics cast directly
        ts_dt = u.schema["_ts"].dataType
        tsnum = (F.col("_ts").cast("timestamp").cast("double")
                 if isinstance(ts_dt, (T.TimestampType, T.TimestampNTZType,
                                       T.DateType))
                 else F.col("_ts").cast("double"))
        u = u.withColumn("_b", F.floor(tsnum / F.lit(float(bucket))))
        part = Window.partitionBy("_k", "_b")
    w = (part.orderBy(F.asc("_ts"), F.asc("_tag"), F.asc("_tie"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    joined = (
        u.withColumn("_last_r", F.last("_rrow", ignorenulls=True).over(w))
        .filter(F.col("_tag") == 1)
    )

    if bucket is not None:
        # boundary stitch: the last right row of every (key, bucket), run
        # forward across buckets so a left row whose bucket starts before
        # any same-bucket right row still sees earlier buckets' rows.
        # Narrow rows — one per (key, bucket) seen on either side; the
        # groupBy partial-aggregates map-side, so a hot (key, bucket) never
        # funnels raw rows into one task.
        per_bucket = (
            u.groupBy("_k", "_b")
            .agg(F.max_by(
                F.col("_rrow"),
                # max over (ts, tie) among right rows only; left-only
                # buckets contribute null (ignored by the running last)
                F.when(F.col("_tag") == 0,
                       F.struct(F.col("_ts"), F.col("_tie")))).alias("_br"))
        )
        wc = (Window.partitionBy("_k").orderBy(F.asc("_b"))
              .rowsBetween(Window.unboundedPreceding, -1))
        carry = per_bucket.select(
            "_k", "_b",
            F.last("_br", ignorenulls=True).over(wc).alias("_carry_r"))
        joined = (
            joined.join(carry, ["_k", "_b"], "left")
            .withColumn("_last_r",
                        F.coalesce(F.col("_last_r"), F.col("_carry_r")))
        )

    out_cols = [F.col(f"_lrow.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"_last_r.{ts_col}").alias(f"{right_prefix}{ts_col}")]
    out_cols += [F.col(f"_last_r.{c}").alias(f"{right_prefix}{c}")
                 for c in rpayload]
    return joined.select(*out_cols)


def interval_overlap_join(left: DataFrame, right: DataFrame,
                          left_start: str, left_end: str,
                          right_start: str, right_end: str,
                          bin_width: int) -> DataFrame:
    """Distributed interval-overlap join: pairs every left interval
    [left_start, left_end] with every right interval it intersects
    (closed-interval predicate ls <= re AND rs <= le) — the genomics/
    observability "which incidents hit which sessions" shape that a naive
    theta join turns into a cross product.

    Scale shape: both sides explode into grid cells of `bin_width`
    (sequence of floor(t/bin)), the join is an equi-join on the cell, and
    each matching pair is emitted in exactly ONE cell — the cell containing
    the overlap start greatest(ls, rs) — so no distinct pass and no
    row-identity requirement. Fan-out per row ≈ interval_length/bin_width:
    choose bin_width near the typical interval length. Degenerate inverted
    intervals (end < start) are dropped. Bounds are integers (e.g. epoch
    seconds); column names must not overlap between sides."""
    if bin_width <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")
    overlap_cols = set(left.columns) & set(right.columns)
    if overlap_cols:
        raise ValueError(
            f"overlapping columns between sides: {sorted(overlap_cols)}")
    ls, le = F.col(left_start), F.col(left_end)
    rs, re = F.col(right_start), F.col(right_end)

    def fdiv(c):
        # exact integer floor division: (c - pmod) is an exact multiple of
        # bin_width, and the cell INDEX always fits double's 2^53 exactly —
        # double division of the raw bound would mis-bin past 2^53 (e.g.
        # epoch-nanosecond bounds) and silently drop overlapping pairs
        exact = c.cast("long") - F.pmod(c.cast("long"), F.lit(bin_width))
        return (exact / F.lit(bin_width)).cast("long")

    lc = (left.filter(le >= ls)
          .withColumn("_cell", F.explode(F.sequence(fdiv(ls), fdiv(le)))))
    rc = (right.filter(re >= rs)
          .withColumn("_cell", F.explode(F.sequence(fdiv(rs), fdiv(re)))))
    return (lc.join(rc, "_cell")
            .filter((ls <= re) & (rs <= le)
                    & (F.col("_cell") == fdiv(F.greatest(ls, rs))))
            .drop("_cell"))
