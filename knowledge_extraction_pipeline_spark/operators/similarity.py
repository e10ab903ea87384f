"""Similarity search over embedding columns.

Reference analog: ChromaDB ANN search (core/vector_store.py:158-215) — here a
DataFrame-native brute-force cosine top-k (correctness baseline) and a
sign-random-projection LSH-bucketed variant (the scale path: the probe joins
only its bucket, not the whole corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine, lsh_bucket


def brute_force_topk(
    corpus: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k corpus rows per query row by cosine. query is expected tiny —
    it is broadcast, so the plan is one map-side pass over the corpus plus a
    top-k aggregation (no shuffle of the corpus)."""
    c = corpus.select(F.col(id_col).alias("id"),
                      F.col(vec_col).cast("array<double>").alias("v"))
    q = query.select(F.col(id_col).alias("query_id"),
                     F.col(vec_col).cast("array<double>").alias("qv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("id") != F.col("query_id"))
        .select("query_id", "id",
                F.round(cosine(F.col("v"), F.col("qv")), 6).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "id", "cos", "rank")
    )


def lsh_topk(
    corpus: DataFrame,
    query: DataFrame,
    k: int = 10,
    num_planes: int = 8,
    num_probes: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: sign-random-projection buckets; each query probes
    its own bucket (num_probes=1) or adjacent 1-bit-flip buckets. At 10^9
    vectors the per-bucket candidate set is ~n/2^planes — the cross join
    becomes a bucket-equi-join Catalyst can shuffle-partition."""
    c = corpus.select(F.col(id_col).alias("id"),
                      F.col(vec_col).cast("array<double>").alias("v")) \
              .withColumn("bucket", lsh_bucket(F.col("v"), num_planes))
    q = query.select(F.col(id_col).alias("query_id"),
                     F.col(vec_col).cast("array<double>").alias("qv")) \
             .withColumn("qbucket", lsh_bucket(F.col("qv"), num_planes))
    if num_probes > 1:
        # probe the exact bucket + 1-bit-flip neighbors (multi-probe LSH)
        flips = [F.col("qbucket")] + [
            F.col("qbucket").bitwiseXOR(F.lit(1 << i)) for i in range(num_planes)
        ][: num_probes - 1 + 1]
        q = q.withColumn("bucket", F.explode(F.array(*flips)))
    else:
        q = q.withColumn("bucket", F.col("qbucket"))
    scored = (
        c.join(F.broadcast(q), on="bucket")
        .filter(F.col("id") != F.col("query_id"))
        .select("query_id", "id",
                F.round(cosine(F.col("v"), F.col("qv")), 6).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "id", "cos", "rank")
    )
