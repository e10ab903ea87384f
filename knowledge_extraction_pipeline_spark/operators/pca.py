"""PCA top principal component via deterministic distributed power
iteration — dimensionality reduction / drift detection for embedding
columns, built on the repo's cross-engine determinism recipe (the one that
makes IVF/PQ oracle-able, see operators/similarity.py):

  * everything that crosses rows is an exact integer sum of
    floor(x·1e6 + 0.5) fixed-point terms (posexplode + groupBy — order-free,
    partition-invariant);
  * everything float happens either per-row as a sequential left-to-right
    fold (F.aggregate(zip_with), which evaluates in array order — bit-equal
    to the same Python loop) or on the driver over dim-sized vectors with
    the exact code the single-process fixture mirrors.

So the whole run is bit-reproducible and the oracle is a plain-Python
re-evaluation (scripts/gen_pca_fixture.py), same as the IVF fixture.

Scale shape: each iteration is one map-side projection fold plus one
posexplode/groupBy producing `dim` rows — the collected state is O(dim),
never O(rows). n_iters · 2 linear scans; cache the centered vectors.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FXP = 1_000_000.0


def _dim_sums(df: DataFrame, arr_col: str) -> list[int]:
    """Exact per-dimension sums of floor(x·1e6+0.5) for an array column —
    one posexplode + groupBy; returns the dim-length list of longs."""
    rows = (df.select(F.posexplode(F.transform(
                F.col(arr_col),
                lambda x: F.floor(x * F.lit(FXP) + F.lit(0.5))))
            .alias("pos", "sv"))
            .groupBy("pos").agg(F.sum("sv").alias("s"))
            .collect())
    out = {r["pos"]: int(r["s"]) for r in rows}
    return [out[j] for j in range(len(out))]


def top_component(embs: DataFrame, vec_col: str = "embedding",
                  n_iters: int = 8) -> DataFrame:
    """Top principal direction of the mean-centered vectors and its
    eigenvalue (explained variance), as fixed-point integers:
    (dim_idx, loading_e6, eigenvalue_e6). Sign is pinned by the
    deterministic all-ones start vector."""
    spark = embs.sparkSession
    v = embs.select(F.col(vec_col).alias("v")).filter(F.col("v").isNotNull())
    v = v.localCheckpoint(eager=True)
    n = v.count()
    if n == 0:
        return spark.createDataFrame(
            [], "dim_idx long, loading_e6 long, eigenvalue_e6 long")
    mean_sums = _dim_sums(v, "v")
    dim = len(mean_sums)
    mean = [(s // n) / FXP for s in mean_sums]
    m_lit = F.array(*[F.lit(x) for x in mean])
    u = v.select(F.zip_with("v", m_lit, lambda x, m: x - m).alias("u"))
    u = u.localCheckpoint(eager=True)

    w = [1.0 / math.sqrt(dim)] * dim
    for _ in range(n_iters):
        w_lit = F.array(*[F.lit(x) for x in w])
        proj = F.aggregate(F.zip_with("u", w_lit, lambda x, y: x * y),
                           F.lit(0.0), lambda acc, x: acc + x)
        pu = u.withColumn("proj", proj)
        s = (pu.select(F.posexplode(F.transform(
                 F.col("u"),
                 lambda x: F.floor(x * F.col("proj") * F.lit(FXP)
                                   + F.lit(0.5))))
             .alias("pos", "sv"))
             .groupBy("pos").agg(F.sum("sv").alias("s")).collect())
        by = {r["pos"]: int(r["s"]) for r in s}
        vals = [by.get(j, 0) / FXP for j in range(dim)]
        nr = 0.0
        for x in vals:
            nr += x * x
        nr = math.sqrt(nr)
        if nr == 0.0:
            break
        w = [x / nr for x in vals]

    w_lit = F.array(*[F.lit(x) for x in w])
    proj = F.aggregate(F.zip_with("u", w_lit, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)
    lam = (u.select(
        F.floor(proj * proj * F.lit(FXP) + F.lit(0.5)).alias("p2"))
        .agg(F.sum("p2").alias("s")).collect()[0]["s"])
    lam_e6 = int(lam) // n
    rows = [(j, int(math.floor(wj * FXP + 0.5)), lam_e6)
            for j, wj in enumerate(w)]
    return spark.createDataFrame(
        rows, "dim_idx long, loading_e6 long, eigenvalue_e6 long")
