"""Similarity search over embedding columns.

Reference analog: ChromaDB ANN search (core/vector_store.py:158-215) — here a
DataFrame-native brute-force cosine top-k (correctness baseline) and a
sign-random-projection LSH-bucketed variant (the scale path: the probe joins
only its bucket, not the whole corpus).

All variants accept `where` — a metadata pre-filter on the corpus (the
reference's `collection.query(..., where=...)` dict, vector_store.py:188-199,
re-expressed as a SQL predicate / Column). The filter is applied BEFORE
scoring/bucketing, so it pushes down into the corpus scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine, dot, lsh_bucket, norm


def _filtered(corpus: DataFrame, where: str | Column | None) -> DataFrame:
    return corpus.filter(where) if where is not None else corpus


def brute_force_topk(
    corpus: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    where: str | Column | None = None,
) -> DataFrame:
    """Top-k corpus rows per query row by cosine. query is expected tiny —
    it is broadcast, so the plan is one map-side pass over the corpus plus a
    top-k aggregation (no shuffle of the corpus)."""
    c = _filtered(corpus, where).select(
        F.col(id_col).alias("id"),
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


def ivf_assignments(
    corpus: DataFrame,
    n_centroids: int = 16,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> tuple[DataFrame, list[tuple[int, list[float]]]]:
    """IVF coarse quantizer: deterministic seeding (the n_centroids vectors
    with smallest xxhash64(id, seed) — a seeded uniform sample) + n_iters of
    Lloyd's k-means as DataFrame joins. Returns (assignments(id, centroid),
    centroid list). Everything distributed except the centroid table itself
    (n_centroids rows on the driver, broadcast back — exactly how IVF
    training works at any scale)."""
    v = corpus.select(F.col(id_col).alias("id"),
                      F.col(vec_col).cast("array<double>").alias("v"))
    seeds = (
        v.withColumn("h", F.xxhash64("id", F.lit(seed)))
        .orderBy("h").limit(n_centroids)
        .select("id", "v").collect()
    )
    centroids = [(i, list(r["v"])) for i, r in enumerate(seeds)]

    spark = corpus.sparkSession
    for _ in range(n_iters):
        cdf = F.broadcast(spark.createDataFrame(
            centroids, "centroid int, cv array<double>"))
        assigned = (
            v.crossJoin(cdf)
            .withColumn("d", dot(F.col("v"), F.col("cv"))
                        / (norm(F.col("v")) * norm(F.col("cv"))))
            .withColumn("rn", F.row_number().over(
                Window.partitionBy("id").orderBy(F.desc("d"), F.asc("centroid"))))
            .filter(F.col("rn") == 1)
            .select("id", "v", "centroid")
        )
        # recompute centroids as per-cluster means (exact, distributed)
        dim = len(centroids[0][1])
        means = (
            assigned.groupBy("centroid")
            .agg(*[F.avg(F.element_at("v", i + 1)).alias(f"m{i}") for i in range(dim)],
                 F.count(F.lit(1)).alias("n"))
            .collect()
        )
        centroids = [(r["centroid"], [r[f"m{i}"] for i in range(dim)])
                     for r in sorted(means, key=lambda r: r["centroid"])]

    cdf = F.broadcast(spark.createDataFrame(centroids, "centroid int, cv array<double>"))
    final = (
        v.crossJoin(cdf)
        .withColumn("d", dot(F.col("v"), F.col("cv"))
                    / (norm(F.col("v")) * norm(F.col("cv"))))
        .withColumn("rn", F.row_number().over(
            Window.partitionBy("id").orderBy(F.desc("d"), F.asc("centroid"))))
        .filter(F.col("rn") == 1)
        .select("id", "centroid")
    )
    return final, centroids


def ivf_topk(
    corpus: DataFrame,
    query: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    where: str | Column | None = None,
) -> DataFrame:
    """IVF ANN: assign corpus to inverted lists, probe the n_probe nearest
    lists per query — the candidate set is ~n·n_probe/n_centroids instead
    of n. Exact cosine on the probed candidates. The metadata filter applies
    before quantizer training so the lists partition the filtered corpus."""
    import math

    corpus = _filtered(corpus, where)
    assigned, centroids = ivf_assignments(corpus, n_centroids, id_col=id_col,
                                          vec_col=vec_col)
    v = corpus.select(F.col(id_col).alias("id"),
                      F.col(vec_col).cast("array<double>").alias("v")) \
        .join(assigned, "id")

    qrows = query.select(F.col(id_col).alias("query_id"),
                         F.col(vec_col).cast("array<double>").alias("qv")).collect()

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb) if na and nb else 0.0

    probe_rows = []
    for r in qrows:
        ranked = sorted(centroids, key=lambda c: (-cos(list(r["qv"]), c[1]), c[0]))
        for c, _ in ranked[:n_probe]:
            probe_rows.append((r["query_id"], list(r["qv"]), c))
    spark = corpus.sparkSession
    probes = F.broadcast(spark.createDataFrame(
        probe_rows, "query_id long, qv array<double>, centroid int"))

    scored = (
        v.join(probes, "centroid")
        .filter(F.col("id") != F.col("query_id"))
        .select("query_id", "id",
                F.round(cosine(F.col("v"), F.col("qv")), 6).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "id", "cos", F.col("rank").cast("long").alias("rank"))
    )


def lsh_topk(
    corpus: DataFrame,
    query: DataFrame,
    k: int = 10,
    num_planes: int = 8,
    num_probes: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    where: str | Column | None = None,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: sign-random-projection buckets; each query probes
    its own bucket (num_probes=1) or adjacent 1-bit-flip buckets. At 10^9
    vectors the per-bucket candidate set is ~n/2^planes — the cross join
    becomes a bucket-equi-join Catalyst can shuffle-partition. Pass `dim`
    (the vector width) to get constant-folded literal planes instead of
    per-row hashed ones (faster, and SQL-mirrorable for the oracle)."""
    c = _filtered(corpus, where).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v")) \
        .withColumn("bucket", lsh_bucket(F.col("v"), num_planes, dim=dim))
    q = query.select(F.col(id_col).alias("query_id"),
                     F.col(vec_col).cast("array<double>").alias("qv")) \
             .withColumn("qbucket", lsh_bucket(F.col("qv"), num_planes, dim=dim))
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
