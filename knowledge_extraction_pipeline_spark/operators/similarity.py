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


FXP_SCALE = 1_000_000.0  # fixed-point scale for exact centroid arithmetic


def _md5_u64(c: Column) -> Column:
    """First 8 md5 bytes of a string column as an unsigned 64-bit value
    (DECIMAL(20,0)) — the engine-portable hash (Python:
    int.from_bytes(md5(s).digest()[:8], 'big'); DuckDB:
    CAST(concat('0x', substr(md5(s),1,16)) AS UBIGINT))."""
    return F.conv(F.substring(F.md5(c), 1, 16), 16, 10).cast("decimal(20,0)")


def _assign(v: DataFrame, cdf: DataFrame, keep_v: bool) -> DataFrame:
    """Nearest-centroid assignment by cosine rounded to 6 dp (tie → smallest
    centroid id) — rounding makes the argmax reproducible across engines."""
    d = F.round(dot(F.col("v"), F.col("cv"))
                / (norm(F.col("v")) * norm(F.col("cv"))), 6)
    out = (
        v.crossJoin(F.broadcast(cdf))
        .withColumn("d", d)
        .withColumn("rn", F.row_number().over(
            Window.partitionBy("id").orderBy(F.desc("d"), F.asc("centroid"))))
        .filter(F.col("rn") == 1)
    )
    return out.select("id", "v", "centroid") if keep_v \
        else out.select("id", "centroid")


def ivf_assignments(
    corpus: DataFrame,
    n_centroids: int | None = 16,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> tuple[DataFrame, list[tuple[int, list[float]]]]:
    """IVF coarse quantizer: deterministic seeding (the n_centroids vectors
    with the smallest md5-derived hash of f"{seed}:{id}" — a seeded uniform
    sample any engine can reproduce) + n_iters of Lloyd's k-means as
    DataFrame joins. Returns (assignments(id, centroid), centroid list).

    n_centroids=None scales the codebook with the corpus (~sqrt(n), the
    standard IVF sizing — candidate volume per probe stays ~sqrt(n)).

    Bit-reproducible by construction, so an independent single-process
    evaluation (scripts/gen_ivf_fixture.py) is a value-exact oracle:
      * assignment ranks by cosine ROUNDED to 6 dp (tie → centroid id) —
        both engines compute the same sequential dot over identical doubles;
      * centroid updates are FIXED-POINT: per-coordinate scaled longs
        floor(x·1e6 + 0.5) summed exactly (order-free integer adds, via
        posexplode → groupBy(centroid, pos), never a dim-wide aggregate),
        new coordinate = (sum // count)/1e6 computed driver-side
        (integer floor division — exact beyond 2^53, unlike float division).
    Everything distributed except the codebook itself (n_centroids·dim sum
    rows collected per iteration — at 1024 lists × 768 dims that is 786k
    small rows, driver-trivial; the codebook is broadcast back, exactly how
    IVF training works at any scale)."""
    import math

    v = corpus.select(F.col(id_col).alias("id"),
                      F.col(vec_col).cast("array<double>").alias("v"))
    if n_centroids is None:
        n_centroids = max(4, int(round(math.sqrt(v.count()))))
    seeds = (
        v.withColumn("h", _md5_u64(F.concat_ws(
            ":", F.lit(str(seed)), F.col("id").cast("string"))))
        .orderBy("h", "id").limit(n_centroids)
        .select("id", "v").collect()
    )
    # codebook coordinates live as scaled longs; the double view (/1e6) is
    # what both engines score against — exact by construction
    cbook: dict[int, list[int]] = {
        i: [int(math.floor(x * FXP_SCALE + 0.5)) for x in r["v"]]
        for i, r in enumerate(seeds)
    }

    spark = corpus.sparkSession

    def _cdf():
        rows = [(c, [x / FXP_SCALE for x in coords])
                for c, coords in sorted(cbook.items())]
        return spark.createDataFrame(rows, "centroid int, cv array<double>")

    for _ in range(n_iters):
        assigned = _assign(v, _cdf(), keep_v=True)
        sums = (
            assigned.select(
                "centroid",
                F.posexplode(F.transform(
                    "v", lambda x: F.floor(x * F.lit(FXP_SCALE) + F.lit(0.5))))
                .alias("pos", "sx"))
            .groupBy("centroid", "pos")
            .agg(F.sum("sx").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        new: dict[int, list[int]] = {}
        for r in sums:
            new.setdefault(r["centroid"], [0] * len(cbook[r["centroid"]]))
            new[r["centroid"]][r["pos"]] = r["s"] // r["n"]  # exact at any magnitude
        # clusters that lost every member keep their previous centroid
        cbook = {c: new.get(c, coords) for c, coords in cbook.items()}

    final = _assign(v, _cdf(), keep_v=False)
    centroids = [(c, [x / FXP_SCALE for x in coords])
                 for c, coords in sorted(cbook.items())]
    return final, centroids


# |Q| at or below this: probe centroids with a driver Python loop (cheap, no
# extra Spark job). Above it: rank centroids per query INSIDE the cluster —
# at 10⁴ queries × 1024 centroids × 768 dims the driver loop is minutes of
# single-threaded Python.
_DRIVER_PROBE_MAX = 512


def _cos_py(a, b) -> float:
    """Driver-side cosine, sequential left-to-right folds — the arithmetic
    the single-process fixture oracles mirror BIT-FOR-BIT (and the same
    order F.aggregate(zip_with(...)) evaluates). Shared by every driver-side
    probe ranking; do not 'optimize' the fold order."""
    import math

    d = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return d / (na * nb) if na and nb else 0.0


def _rank_probes(qv, centroids, n_probe):
    """The n_probe nearest centroids to qv by raw cosine, ties → smallest
    centroid id — the driver-side ranking every IVF-family operator (and its
    fixture oracle) shares."""
    return sorted(centroids,
                  key=lambda c: (-_cos_py(qv, c[1]), c[0]))[:n_probe]


def _probe_df(qdf: DataFrame, centroids, n_probe: int) -> DataFrame:
    """DataFrame probe selection: per query, the n_probe nearest centroids by
    cosine. Bit-identical ranking to the driver loop — dot/norm are the same
    left-to-right float folds (F.aggregate ≡ the sequential Python sum), the
    zero-norm guard returns 0.0 like the Python scorer, and ties break on
    (cos desc, centroid asc) in both paths. Input qdf: (query_id, qv);
    output: (query_id, qv, centroid)."""
    spark = qdf.sparkSession
    cent = F.broadcast(spark.createDataFrame(
        [(c, list(v)) for c, v in centroids], "centroid int, cv array<double>"))
    qn, cn = norm(F.col("qv")), norm(F.col("cv"))
    qc = (F.when((qn == 0) | (cn == 0), F.lit(0.0))
          .otherwise(dot(F.col("qv"), F.col("cv")) / (qn * cn)))
    w = Window.partitionBy("query_id").orderBy(F.desc("_qc"), F.asc("centroid"))
    return (qdf.crossJoin(cent).withColumn("_qc", qc)
            .withColumn("_pr", F.row_number().over(w))
            .filter(F.col("_pr") <= n_probe)
            .select("query_id", "qv", "centroid"))


def ivf_topk(
    corpus: DataFrame,
    query: DataFrame,
    k: int = 10,
    n_centroids: int | None = 16,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    where: str | Column | None = None,
) -> DataFrame:
    """IVF ANN: assign corpus to inverted lists, probe the n_probe nearest
    lists per query — the candidate set is ~n·n_probe/n_centroids instead
    of n. Exact cosine on the probed candidates. The metadata filter applies
    before quantizer training so the lists partition the filtered corpus.
    n_centroids=None sizes the codebook ~sqrt(n) (see ivf_assignments).
    Deterministic end-to-end — scripts/gen_ivf_fixture.py re-evaluates the
    whole spec single-process as the driver's value-exact oracle."""

    corpus = _filtered(corpus, where)
    assigned, centroids = ivf_assignments(corpus, n_centroids, id_col=id_col,
                                          vec_col=vec_col)
    v = corpus.select(F.col(id_col).alias("id"),
                      F.col(vec_col).cast("array<double>").alias("v")) \
        .join(assigned, "id")

    q = query.select(F.col(id_col).alias("query_id"),
                     F.col(vec_col).cast("array<double>").alias("qv"))
    qrows = q.limit(_DRIVER_PROBE_MAX + 1).collect()
    if len(qrows) > _DRIVER_PROBE_MAX:
        # large query set: never collect it — rank probes in the cluster
        # (identical ranking, see _probe_df), and let AQE plan the
        # centroid join (a |Q|·n_probe row table is not broadcastable)
        probes = _probe_df(q, centroids, n_probe)
    else:
        probe_rows = [(r["query_id"], list(r["qv"]), c)
                      for r in qrows
                      for c, _ in _rank_probes(list(r["qv"]), centroids,
                                               n_probe)]
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


def pq_train_encode(
    corpus: DataFrame,
    m: int = 8,
    n_codes: int = 16,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    normalize: bool = True,
) -> tuple[DataFrame, list[tuple[int, int, list[float]]]]:
    """Product-quantization codebooks + codes — the memory path for 10⁹+
    vectors: each vector compresses to m small codes (m·log2(n_codes) bits
    instead of dim·32), scored without ever touching the full vectors.

    Vectors are L2-NORMALIZED first, so inter-vector L2² = 2 − 2·cos and the
    ADC (asymmetric-distance) ordering approximates cosine ordering. Training
    runs all m subspaces in ONE DataFrame pass (posexplode over the m
    slices); per-subspace k-means uses the same deterministic machinery as
    ivf_assignments — md5-seeded sample, 6-dp-rounded argmin (tie → code
    id), fixed-point scaled-long centroid sums — so the whole operator is
    engine-reproducible.

    Returns (codes(id, j, code) — the compressed corpus, books —
    [(j, code, centroid)] broadcastable codebook).

    normalize=False skips the L2 normalization — for callers whose vectors
    already live in the metric space to quantize (residuals in
    ivf_pq_residual_topk, which must NOT be re-normalized)."""
    import math

    from ..functions.vectors import l2_normalize

    vexpr = F.col(vec_col).cast("array<double>")
    v = corpus.select(F.col(id_col).alias("id"),
                      (l2_normalize(vexpr) if normalize else vexpr)
                      .alias("v"))
    dim_row = v.select(F.size("v").alias("d")).limit(1).collect()
    dim = dim_row[0]["d"]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    sub = dim // m

    seeds = (
        v.withColumn("h", _md5_u64(F.concat_ws(
            ":", F.lit(str(seed)), F.col("id").cast("string"))))
        .orderBy("h", "id").limit(n_codes)
        .select("v").collect()
    )
    # books[j][c] = scaled-long subvector (fixed-point, exact arithmetic)
    books: dict[tuple[int, int], list[int]] = {
        (j, c): [int(math.floor(x * FXP_SCALE + 0.5))
                 for x in r["v"][j * sub:(j + 1) * sub]]
        for j in range(m) for c, r in enumerate(seeds)
    }

    slices = F.array(*[F.slice("v", j * sub + 1, sub) for j in range(m)])
    subv = v.select("id", F.posexplode(slices).alias("j", "sv"))

    spark = corpus.sparkSession

    def _books_df():
        rows = [(j, c, [x / FXP_SCALE for x in coords])
                for (j, c), coords in sorted(books.items())]
        return spark.createDataFrame(rows, "j int, code int, cv array<double>")

    def _assign_codes(keep_sv: bool) -> DataFrame:
        d2 = F.round(F.aggregate(
            F.zip_with("sv", "cv", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0), lambda acc, x: acc + x), 6)
        out = (
            subv.join(F.broadcast(_books_df()), on="j")
            .withColumn("d2", d2)
            .withColumn("rn", F.row_number().over(
                Window.partitionBy("id", "j").orderBy(F.asc("d2"),
                                                      F.asc("code"))))
            .filter(F.col("rn") == 1)
        )
        return out.select("id", "j", "code", "sv") if keep_sv \
            else out.select("id", "j", "code")

    for _ in range(n_iters):
        sums = (
            _assign_codes(keep_sv=True)
            .select("j", "code", F.posexplode(F.transform(
                "sv", lambda x: F.floor(x * F.lit(FXP_SCALE) + F.lit(0.5))))
                .alias("pos", "sx"))
            .groupBy("j", "code", "pos")
            .agg(F.sum("sx").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        new: dict[tuple[int, int], list[int]] = {}
        for r in sums:
            key = (r["j"], r["code"])
            new.setdefault(key, [0] * sub)
            new[key][r["pos"]] = r["s"] // r["n"]  # exact at any magnitude
        books = {key: new.get(key, coords) for key, coords in books.items()}

    codes = _assign_codes(keep_sv=False)
    book_list = [(j, c, [x / FXP_SCALE for x in coords])
                 for (j, c), coords in sorted(books.items())]
    return codes, book_list


def _adc_tables(spark, qrows, books, sub) -> DataFrame:
    """Per-query ADC distance tables (query_id, j, code, d) over the
    normalized space the codebooks live in — |Q|·m·n_codes tiny rows,
    broadcast. Each entry is round(L2², 6) (python round, driver-side code
    path, mirrored verbatim by the fixture oracle) stored as a FIXED-POINT
    long (×10⁶): the downstream shortlist sums m entries per candidate with
    F.sum, whose accumulation order depends on partitioning — integer sums
    are order-free where a cross-row double sum is not, so the score is
    bit-reproducible by construction like the centroid updates."""
    import math

    table_rows = []
    for r in qrows:
        qv = list(r["qv"])
        nrm = math.sqrt(sum(x * x for x in qv))
        qn = [x / nrm for x in qv] if nrm else qv
        for j, c, cv in books:
            d = sum((x - y) * (x - y)
                    for x, y in zip(qn[j * sub:(j + 1) * sub], cv))
            table_rows.append((r["query_id"], j, c,
                               int(round(round(d, 6) * 1e6))))
    return F.broadcast(spark.createDataFrame(
        table_rows, "query_id long, j int, code int, d long"))


def _adc_shortlist(scored_codes: DataFrame, tables: DataFrame,
                   join_keys: list[str], shortlist: int) -> DataFrame:
    """(query_id, id) shortlist by summed ADC table lookups."""
    adc = (
        scored_codes.join(tables, on=join_keys)
        .groupBy("query_id", "id")
        # exact long sum (order-free), one float division at the end
        .agg(F.round(F.sum("d") / F.lit(1e6), 6).alias("adc"))
        .filter(F.col("id") != F.col("query_id"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc"), F.asc("id"))
    return adc.withColumn("srn", F.row_number().over(w)) \
              .filter(F.col("srn") <= shortlist).select("query_id", "id")


def _exact_rerank(corpus: DataFrame, short: DataFrame, qrows, k: int,
                  id_col: str, vec_col: str) -> DataFrame:
    """Exact-cosine re-rank of a (query_id, id) shortlist on raw vectors.

    qrows: either collected query rows (interactive path — broadcast) or a
    (query_id, qv) DataFrame (large-|Q| path — the query set is never
    collected; AQE plans the join)."""
    spark = corpus.sparkSession
    v = corpus.select(F.col(id_col).alias("id"),
                      F.col(vec_col).cast("array<double>").alias("v"))
    if isinstance(qrows, DataFrame):
        q = qrows.select("query_id", "qv")
    else:
        q = F.broadcast(spark.createDataFrame(
            [(r["query_id"], list(r["qv"])) for r in qrows],
            "query_id long, qv array<double>"))
    scored = (
        short.join(v, "id").join(q, "query_id")
        .select("query_id", "id",
                F.round(cosine(F.col("v"), F.col("qv")), 6).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "id", "cos", F.col("rank").cast("long").alias("rank"))
    )


def pq_topk(
    corpus: DataFrame,
    query: DataFrame,
    k: int = 10,
    m: int = 8,
    n_codes: int = 16,
    shortlist: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    where: str | Column | None = None,
) -> DataFrame:
    """PQ-ADC top-k with exact re-rank: score every vector from its m codes
    via per-query distance tables (a broadcast of |Q|·m·n_codes tiny rows —
    the corpus vectors are never shuffled, only the narrow code rows), take
    the `shortlist` nearest by ADC, then exact-cosine re-rank the shortlist
    against the raw vectors. The standard billion-scale shape: compressed
    scan + tiny exact tail."""
    corpus = _filtered(corpus, where)
    codes, books = pq_train_encode(corpus, m=m, n_codes=n_codes,
                                   id_col=id_col, vec_col=vec_col)
    sub = len(books[0][2])
    qrows = query.select(F.col(id_col).alias("query_id"),
                         F.col(vec_col).cast("array<double>").alias("qv")) \
                 .collect()
    tables = _adc_tables(corpus.sparkSession, qrows, books, sub)
    short = _adc_shortlist(codes, tables, ["j", "code"], shortlist)
    return _exact_rerank(corpus, short, qrows, k, id_col, vec_col)


def pq_distortion(
    corpus: DataFrame,
    m: int = 8,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-subspace PQ quantization-error report: for the codebooks
    pq_topk actually scores with, the assignment distance (6-dp-rounded
    L2², the operator's own argmin metric) of every vector to its chosen
    code, aggregated per subspace as exact fixed-point integers
    (floor(d2·10⁶+0.5) — a 6-dp double lands within 1/2 ulp of its e6
    integer, so the sum is order-free). The quality gauge every
    compressed-index deployment publishes: a subspace whose avg error
    dwarfs the others needs more codes or a rotation. One extra
    assignment pass over (id, j) rows; codebooks broadcast."""
    codes, books = pq_train_encode(corpus, m=m, n_codes=n_codes,
                                   id_col=id_col, vec_col=vec_col)
    from ..functions.vectors import l2_normalize
    spark = corpus.sparkSession
    sub = len(books[0][2])
    v = corpus.select(F.col(id_col).alias("id"),
                      l2_normalize(F.col(vec_col).cast("array<double>"))
                      .alias("v"))
    slices = F.array(*[F.slice("v", j * sub + 1, sub) for j in range(m)])
    subv = v.select("id", F.posexplode(slices).alias("j", "sv"))
    books_df = spark.createDataFrame(
        [(j, c, cv) for j, c, cv in books],
        "j int, code int, cv array<double>")
    d2 = F.round(F.aggregate(
        F.zip_with("sv", "cv", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, x: acc + x), 6)
    best = (subv.join(F.broadcast(books_df), "j")
            .withColumn("d2", d2)
            .withColumn("rn", F.row_number().over(
                Window.partitionBy("id", "j").orderBy(F.asc("d2"),
                                                      F.asc("code"))))
            .filter(F.col("rn") == 1)
            .select("j", F.floor(F.col("d2") * F.lit(1000000.0)
                                 + F.lit(0.5))
                    .cast("decimal(38,0)").alias("d2_e6")))
    return (best.groupBy(F.col("j").cast("int").alias("subspace"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_vectors"),
                 F.sum("d2_e6").cast("long").alias("sum_d2_e6"),
                 F.expr("CAST(sum(d2_e6) div count(1) AS BIGINT)")
                 .alias("avg_d2_e6")))


def ivf_pq_topk(
    corpus: DataFrame,
    query: DataFrame,
    k: int = 10,
    n_centroids: int | None = None,
    n_probe: int = 8,
    m: int = 8,
    n_codes: int = 16,
    shortlist: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    where: str | Column | None = None,
) -> DataFrame:
    """IVF-PQ: the two scale levers composed — the IVF coarse quantizer
    prunes candidates to the n_probe nearest inverted lists
    (~n·n_probe/n_centroids rows), PQ-ADC scores ONLY those candidates from
    their m codes, and the shortlist is exact-cosine re-ranked. At 10⁹
    vectors this is the standard serving shape: the scan touches narrow
    (id, list, code) rows, never the raw vectors, until the final
    shortlist-sized exact tail."""

    corpus = _filtered(corpus, where)
    assigned, centroids = ivf_assignments(corpus, n_centroids,
                                          id_col=id_col, vec_col=vec_col)
    codes, books = pq_train_encode(corpus, m=m, n_codes=n_codes,
                                   id_col=id_col, vec_col=vec_col)
    sub = len(books[0][2])

    q = query.select(F.col(id_col).alias("query_id"),
                     F.col(vec_col).cast("array<double>").alias("qv"))
    # ADC tables and the exact re-rank need qrows driver-side either way
    # (they are the broadcast |Q|·m·n_codes lookup — that IS the PQ design),
    # so this operator's contract is an interactive-sized query set; above
    # the threshold only the probe RANKING moves into the cluster (saves
    # single-threaded CPU, not driver memory), fed from the already-
    # collected rows so the query plan is never evaluated twice
    qrows = q.collect()

    spark = corpus.sparkSession
    if len(qrows) > _DRIVER_PROBE_MAX:
        qdf = spark.createDataFrame(
            [(r["query_id"], list(r["qv"])) for r in qrows],
            "query_id long, qv array<double>")
        probes = _probe_df(qdf, centroids, n_probe) \
            .select("query_id", "centroid")
    else:
        # probed (query_id, centroid) pairs — the coarse pruning
        probes = F.broadcast(spark.createDataFrame(
            [(r["query_id"], c)
             for r in qrows
             for c, _ in _rank_probes(list(r["qv"]), centroids, n_probe)],
            "query_id long, centroid int"))

    cand_codes = (
        assigned.join(probes, on="centroid")       # prune to probed lists
        .select("query_id", "id")
        .join(codes, on="id")                      # attach the m codes
    )
    tables = _adc_tables(spark, qrows, books, sub)
    short = _adc_shortlist(cand_codes, tables, ["query_id", "j", "code"],
                           shortlist)
    return _exact_rerank(corpus, short, qrows, k, id_col, vec_col)


def ivf_pq_residual_topk(
    corpus: DataFrame,
    query: DataFrame,
    k: int = 10,
    n_centroids: int | None = 8,
    n_probe: int = 2,
    m: int = 8,
    n_codes: int = 16,
    shortlist: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    where: str | Column | None = None,
) -> DataFrame:
    """True IVFADC — residual-quantized IVF-PQ (the IVF+PQ composition of
    Jégou, Douze & Schmid, "Product Quantization for Nearest Neighbor
    Search", TPAMI 2011): PQ codebooks are trained on RESIDUALS
    r = v/‖v‖ − c(list) instead of the normalized vectors themselves, so
    the code budget covers only the within-list spread — finer distances
    than plain ivf_pq_topk at the same m·log₂(n_codes) bits. Scoring is
    exact on the residual identity ‖qₙ − vₙ‖² = ‖(qₙ − c) − (vₙ − c)‖² for
    vectors in list c: per-(query, probed-list) ADC tables are built over
    the QUERY residual against that list.

    Deterministic end-to-end with the same discipline as ivf/pq (md5
    seeding, fixed-point centroid sums, 6-dp-rounded argmins, fixed-point
    long ADC sums) — scripts/gen_ivf_fixture.py re-evaluates the whole
    operator single-process as the value-exact oracle.

    Up to _DRIVER_PROBE_MAX queries the ADC tables are built driver-side
    (|Q|·n_probe·m·n_codes fixed-point rows, broadcast — the
    interactive-serving shape). Above it the query set is NEVER collected:
    probe ranking runs through _probe_df and the per-(query, probed-list)
    residual tables are built as a distributed job — query residuals
    (zip_with against the broadcast centroid) crossed with the broadcast
    m·n_codes codebook, the same left-to-right F.aggregate fold the driver
    loop evaluates, so the two paths rank bit-identically
    (test_residual_table_df_path_matches_driver_path)."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from ..functions.vectors import l2_normalize

    corpus = _filtered(corpus, where)
    assigned, centroids = ivf_assignments(corpus, n_centroids,
                                          id_col=id_col, vec_col=vec_col)
    spark = corpus.sparkSession
    cent_df = spark.createDataFrame(
        [(c, list(v)) for c, v in centroids], "centroid int, cv array<double>")
    # residual corpus: normalized vector minus its (exact 10⁻⁶-multiple)
    # coarse centroid — component-wise subtraction, deterministic
    res = (
        corpus.select(F.col(id_col).alias("id"),
                      l2_normalize(F.col(vec_col).cast("array<double>"))
                      .alias("vn"))
        .join(assigned, "id")
        .join(F.broadcast(cent_df), "centroid")
        .select("id", F.zip_with("vn", "cv", lambda x, y: x - y).alias("rv"))
    )
    codes, books = pq_train_encode(res, m=m, n_codes=n_codes, id_col="id",
                                   vec_col="rv", normalize=False)
    sub = len(books[0][2])

    q = query.select(F.col(id_col).alias("query_id"),
                     F.col(vec_col).cast("array<double>").alias("qv"))
    qrows = q.limit(_DRIVER_PROBE_MAX + 1).collect()

    if len(qrows) > _DRIVER_PROBE_MAX:
        # large batch: probes + residual ADC tables as distributed jobs.
        # _probe_df keeps qv on the probe rows, so the query residual is one
        # broadcast-centroid join away; the codebook (m·n_codes rows) is the
        # only other broadcast. d mirrors the driver fold exactly:
        # left-to-right (x−y)² accumulation (F.aggregate ≡ sequential
        # Python sum) and HALF_UP-at-repr rounding (F.round ≡
        # Decimal(repr(d)).quantize) — then ×10⁶ re-rounded to the exact
        # long (the nearest-double of a 10⁻⁶ multiple is within 1e-9·|d|
        # of the integer, so the second F.round is exact recovery).
        qdf = q
        probes_full = _probe_df(qdf, centroids, n_probe)
        books_df = F.broadcast(spark.createDataFrame(
            [(j, c, cv) for j, c, cv in books],
            "j int, code int, bcv array<double>"))
        qn_col = F.when(norm(F.col("qv")) == 0, F.col("qv")) \
                  .otherwise(l2_normalize(F.col("qv")))
        qres = (
            probes_full.join(F.broadcast(cent_df), "centroid")
            .select("query_id", "centroid",
                    F.zip_with(qn_col, F.col("cv"),
                               lambda x, y: x - y).alias("qr"))
        )
        d_dbl = F.aggregate(
            F.zip_with(F.slice("qr", F.col("j") * sub + 1, sub), "bcv",
                       lambda x, y: (x - y) * (x - y)),
            F.lit(0.0), lambda acc, x: acc + x)
        tables = qres.join(books_df).select(
            "query_id", "centroid", "j", "code",
            F.round(F.round(d_dbl, 6) * 1e6, 0).cast("long").alias("d"))
        probes = probes_full.select("query_id", "centroid")
        rerank_q = qdf
    else:
        probe_rows, table_rows = [], []
        q6 = Decimal("0.000001")
        for r in qrows:
            qv = list(r["qv"])
            nq = math.sqrt(sum(x * x for x in qv))
            qn = [x / nq for x in qv] if nq else qv
            for c, cv in _rank_probes(qv, centroids, n_probe):
                probe_rows.append((r["query_id"], c))
                qr = [a - b for a, b in zip(qn, cv)]
                for j, code, bcv in books:
                    d = sum((x - y) * (x - y)
                            for x, y in zip(qr[j * sub:(j + 1) * sub], bcv))
                    # HALF_UP at the shortest repr == F.round(d, 6): keeps
                    # the driver and DataFrame table builds bit-identical
                    d6 = Decimal(repr(d)).quantize(q6, rounding=ROUND_HALF_UP)
                    table_rows.append((r["query_id"], c, j, code,
                                       int(d6 * 1_000_000)))
        probes = F.broadcast(spark.createDataFrame(
            probe_rows, "query_id long, centroid int"))
        tables = F.broadcast(spark.createDataFrame(
            table_rows, "query_id long, centroid int, j int, code int, d long"))
        rerank_q = qrows

    cand_codes = (
        assigned.join(probes, on="centroid")
        .select("query_id", "centroid", "id")
        .join(codes, on="id")
    )
    short = _adc_shortlist(cand_codes, tables,
                           ["query_id", "centroid", "j", "code"], shortlist)
    return _exact_rerank(corpus, short, rerank_q, k, id_col, vec_col)


def mmr_topk(
    corpus: DataFrame,
    query: DataFrame,
    k: int = 5,
    pool: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    where: str | Column | None = None,
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein, SIGIR
    1998) with λ = 1/2: greedily pick k results from the brute-force
    top-`pool` candidates, each step maximizing
    ½·rel(q, c) − ½·max_{s∈selected} sim(c, s) — relevance traded against
    redundancy, the standard diversified-retrieval tail after any ANN
    operator. Deterministic cross-engine: rel and the pairwise candidate
    sims are 6-dp-rounded cosines, each greedy step orders by (rel − maxsim)
    (a single IEEE subtraction of identical doubles) with an id tie-break,
    and the k-step loop is a fixed unroll — the DuckDB oracle replays the
    identical recursion as chained CTEs."""
    rel = brute_force_topk(corpus, query, k=pool, id_col=id_col,
                           vec_col=vec_col, where=where) \
        .select("query_id", "id", F.col("cos").alias("rel")).persist()
    v = _filtered(corpus, where).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"))
    cand = rel.select("query_id", "id").join(v, "id")
    a = cand.select("query_id", F.col("id").alias("ia"), F.col("v").alias("va"))
    b = cand.select("query_id", F.col("id").alias("ib"), F.col("v").alias("vb"))
    sims = (
        a.join(b, "query_id")
        .filter(F.col("ia") != F.col("ib"))
        .select("query_id", "ia", "ib",
                F.round(cosine(F.col("va"), F.col("vb")), 6).alias("s"))
        .persist()
    )
    # the greedy tail over ≤ |Q|·pool² tiny rounded doubles: run it driver-
    # side for interactive |Q| (k sequential argmaxes cost k Spark stage
    # round-trips otherwise). Bit-identical to the DataFrame loop below —
    # same IEEE doubles, same (rel − ms) subtraction, same tie order, and
    # the output rounding is HALF_UP-at-repr (== F.round); forced-path
    # parity pinned by test_mmr_driver_path_matches_distributed.
    qrows = rel.select("query_id").distinct() \
        .limit(_DRIVER_PROBE_MAX + 1).collect()
    if len(qrows) <= _DRIVER_PROBE_MAX:
        from decimal import ROUND_HALF_UP, Decimal

        spark = corpus.sparkSession
        rel_rows = rel.collect()
        sim_rows = sims.collect()
        relmap: dict = {}
        for r in rel_rows:
            relmap.setdefault(r["query_id"], {})[r["id"]] = r["rel"]
        smap: dict = {}
        for r in sim_rows:
            smap[(r["query_id"], r["ia"], r["ib"])] = r["s"]
        q6 = Decimal("0.000001")

        def r6(x: float) -> float:
            return float(Decimal(repr(x)).quantize(q6, rounding=ROUND_HALF_UP))

        out_rows = []
        for qid in sorted(relmap):
            cands = relmap[qid]
            sel: list = []
            for step in range(1, k + 1):
                best = None
                for cid, rv in cands.items():
                    if cid in sel:
                        continue
                    ms = max((smap[(qid, cid, s)] for s in sel), default=None)
                    score = rv if ms is None else rv - ms
                    key = (-score, cid)
                    if best is None or key < best[0]:
                        best = (key, cid, rv if ms is None else rv - ms)
                if best is None:
                    break
                sel.append(best[1])
                out_rows.append((qid, best[1], r6(best[2] * 0.5), step))
        return spark.createDataFrame(
            out_rows, "query_id long, id long, mmr_score double, rank long")
    w1 = Window.partitionBy("query_id").orderBy(F.desc("rel"), F.asc("id"))
    selected = (
        rel.withColumn("rn", F.row_number().over(w1)).filter(F.col("rn") == 1)
        .select("query_id", "id",
                F.round(F.col("rel") * 0.5, 6).alias("mmr_score"),
                F.lit(1).alias("rank"))
        # each greedy step references the whole selected-so-far set twice
        # (max-sim join + anti-join) — checkpoint per step keeps the plan
        # linear in k instead of doubling it per iteration
        .localCheckpoint(eager=True)
    )
    for step in range(2, k + 1):
        ms = (
            sims.join(selected.select("query_id", F.col("id").alias("ib")),
                      ["query_id", "ib"])
            .groupBy("query_id", F.col("ia").alias("id"))
            .agg(F.max("s").alias("ms"))
        )
        wi = Window.partitionBy("query_id").orderBy(
            F.desc(F.col("rel") - F.col("ms")), F.asc("id"))
        pick = (
            rel.join(selected.select("query_id", "id"),
                     ["query_id", "id"], "left_anti")
            .join(ms, ["query_id", "id"])
            .withColumn("rn", F.row_number().over(wi))
            .filter(F.col("rn") == 1)
            .select("query_id", "id",
                    F.round((F.col("rel") - F.col("ms")) * 0.5, 6)
                    .alias("mmr_score"),
                    F.lit(step).alias("rank"))
        )
        selected = selected.unionByName(pick).localCheckpoint(eager=True)
    return selected.select("query_id", "id", "mmr_score",
                           F.col("rank").cast("long").alias("rank"))


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


def dbscan_labels(embs: DataFrame, threshold: float = 0.30,
                  min_pts: int = 4, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """DBSCAN over an embedding column with a cosine-similarity
    eps-neighborhood (sim >= threshold): CORE points have >= min_pts
    points (self included) in range, clusters are connected components of
    the core-core adjacency (cluster_id = numeric min member), BORDER
    points attach to the smallest cluster id among their core neighbors,
    everything else is NOISE. The density-clustering complement of
    kmeans_assign — no k, finds noise.

    Pair generation is the brute all-pairs scorer at gate scale (the
    disclosed correctness baseline, same posture as ann_knn_graph); at
    10^9 rows candidates come from the LSH band join (dedup.embedding
    path) with identical downstream semantics. The components run on the
    REAL distributed large-star/small-star operator; ids are zero-padded
    for its lexicographic canon, then cast back so cluster_id is the
    numeric min. Returns (id_col, role, cluster_id) — cluster_id NULL for
    noise."""
    from .canonicalize import connected_components
    v = embs.select(F.col(id_col).alias("id"),
                    F.col(vec_col).cast("array<double>").alias("v"))
    b = v.select(F.col("id").alias("j"), F.col("v").alias("w"))
    adj = (v.crossJoin(b).filter(F.col("id") != F.col("j"))
           .select(F.col("id").alias("i"), "j",
                   F.round(cosine(F.col("v"), F.col("w")), 6).alias("cos"))
           .filter(F.col("cos") >= threshold)
           .select("i", "j").persist())
    deg = adj.groupBy("i").agg(F.count(F.lit(1)).alias("d"))
    core = deg.filter(F.col("d") + 1 >= min_pts).select("i")
    ce = (adj.join(core, "i")
          .join(core.select(F.col("i").alias("j")), "j")
          .filter(F.col("i") < F.col("j")))

    def pad(c):
        return F.lpad(F.col(c).cast("string"), 12, "0")

    comp = connected_components(
        ce.select(pad("i").alias("src"), pad("j").alias("dst")))
    comp = comp.select(F.col("norm_term").cast("bigint").alias("i"),
                       F.col("canon").cast("bigint").alias("cid"))
    core_cid = (core.join(comp, "i", "left")
                .select("i", F.coalesce("cid", F.col("i")).alias("cid")))
    nbr = (adj.join(core_cid.select(F.col("i").alias("j"),
                                    F.col("cid").alias("ncid")), "j")
           .groupBy("i").agg(F.min("ncid").alias("bcid")))
    return (v.select("id")
            .join(core_cid.select(F.col("i").alias("id"),
                                  F.col("cid").alias("ccid")), "id", "left")
            .join(nbr.select(F.col("i").alias("id"), "bcid"), "id", "left")
            .select(F.col("id").alias(id_col),
                    F.when(F.col("ccid").isNotNull(), "core")
                    .when(F.col("bcid").isNotNull(), "border")
                    .otherwise("noise").alias("role"),
                    F.when(F.col("ccid").isNotNull(), F.col("ccid"))
                    .when(F.col("bcid").isNotNull(), F.col("bcid"))
                    .cast("long").alias("cluster_id")))
