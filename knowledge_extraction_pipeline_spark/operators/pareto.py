"""2-D Pareto frontier (skyline) — multi-criteria selection: keep the
points no other point beats in BOTH dimensions (maximize x and y; p
dominates q iff p >= q everywhere and > somewhere). The classic use in a
data pipeline: pick the quality/cost-efficient corpora, configs or users.

Plan (exact, no nested loop): (1) per distinct x only the max-y point can
survive — one combinable aggregate; (2) among the now-distinct-x
candidates, a point survives iff its y strictly exceeds every y at larger
x — a running max over x-descending order. The running max is computed
two-phase so one global sort never serializes: fixed-width x-buckets get
local running maxes, per-bucket maxes broadcast, and the stitch takes
max(local preceding, all higher buckets) — the same pattern as
text_analysis.domain_budget_sample.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pareto_frontier_2d(points: DataFrame, x: str, y: str,
                       bucket_width: int) -> DataFrame:
    """Distinct skyline points (x, y), maximizing both. Null coordinates
    are dropped (incomparable). `bucket_width` sets the x-bucket size of
    the two-phase running max — any positive value is correct; it is
    deliberately required (a width of 1 on integer x degenerates phase 2
    into a global sort over every distinct x, exactly what the bucketing
    exists to avoid), so pick one giving roughly balanced buckets, e.g.
    (max-min)/shuffle_partitions."""
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
    pts = (points.select(F.col(x).alias("x"), F.col(y).alias("y"))
           .filter(F.col("x").isNotNull() & F.col("y").isNotNull())
           .groupBy("x").agg(F.max("y").alias("y"))
           .withColumn("b", F.floor(F.col("x") / bucket_width)))
    # phase 1: running max of y over strictly-larger x WITHIN the bucket
    wloc = (Window.partitionBy("b").orderBy(F.desc("x"))
            .rowsBetween(Window.unboundedPreceding, -1))
    loc = pts.withColumn("loc_max", F.max("y").over(wloc))
    # phase 2: max y of every strictly-higher bucket (tiny table, broadcast)
    bmax = pts.groupBy("b").agg(F.max("y").alias("bm"))
    wb = (Window.orderBy(F.desc("b"))
          .rowsBetween(Window.unboundedPreceding, -1))
    hi = bmax.withColumn("hi_max", F.max("bm").over(wb)).select("b", "hi_max")
    # greatest() skips nulls (null only when both are) — exactly the
    # "nothing above" semantics the first row of each bucket needs
    best_above = F.greatest(F.col("loc_max"), F.col("hi_max"))
    return (loc.join(F.broadcast(hi), "b", "left")
            .filter(best_above.isNull() | (F.col("y") > best_above))
            .select("x", "y"))
