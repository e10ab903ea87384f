"""TF-IDF document similarity as an inverted-index join — the reference's
O(n²) sparse-cosine loop (scripts/infer_relationships_tfidf.py:85-250)
re-expressed relationally:

    tokens → per-doc tf → df → w = tf·(ln(n/(df+1))+1), L2-normalized
    (the reference's exact weighting, :108-128)
    sim(a,b) = Σ_token w_a·w_b   — a self equi-join on token + groupBy pair
    per-node edge cap 5 by similarity (:225-248) via row_number window

Scale shape: the join is per-token; ultra-common tokens (df > max_df_ratio·n)
are dropped BEFORE the join (the classic inverted-index pruning — without it
a stopword token alone contributes O(n²) join rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# tokenizer constants from the reference (:85-105): lowercase, [a-z][a-z-]*[a-z],
# len > 2, stopword list (subset of its 90 entries that can occur in our corpora)
STOPWORDS = [
    "the", "and", "for", "are", "but", "not", "you", "all", "can", "had",
    "her", "was", "one", "our", "out", "has", "have", "this", "that", "with",
    "from", "they", "been", "were", "which", "their", "there", "would",
]


def tfidf_weights(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text",
                  max_df_ratio: float = 0.5,
                  max_df_abs: int | None = 100_000) -> DataFrame:
    """(id, token, w) with L2-normalized tf-idf weights.

    Postings are pruned by BOTH caps: df <= max_df_ratio·n AND
    df <= max_df_abs. The ratio alone stops being a bound at corpus scale —
    at 10⁹ docs a token in 40 % of them still carries 4·10⁸ postings into
    the similarity self-join; the absolute cap bounds the per-token join
    contribution to max_df_abs² regardless of corpus size. The default
    (100k) is far above any df this repo's test corpora produce, so small-SF
    results are unchanged."""
    n = docs.count()
    tokens = (
        docs.select(F.col(id_col).alias("id"),
                    F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("token"))
        .filter(F.col("token").rlike(r"^[a-z][a-z-]*[a-z]$"))
        .filter(F.length("token") > 2)
        .filter(~F.col("token").isin(STOPWORDS))
    )
    tf = tokens.groupBy("id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df")) \
           .filter(F.col("df") <= int(max_df_ratio * n) if max_df_ratio < 1.0
                   else F.lit(True))
    if max_df_abs is not None:
        df = df.filter(F.col("df") <= max_df_abs)
    w = tf.join(df, "token").withColumn(
        "w", F.col("tf") * (F.log(F.lit(float(n)) / (F.col("df") + 1)) + 1))
    norms = w.groupBy("id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
    return (
        w.join(norms, "id")
        .select("id", "token", (F.col("w") / F.col("nrm")).alias("w"))
    )


def bm25_rank(docs: DataFrame, query_terms: list[str], k: int = 20,
              k1: float = 1.2, b: float = 0.75,
              id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Okapi BM25 ranked retrieval (Robertson & Spärck Jones's probabilistic
    weighting — public textbook formula): per query term,
    idf·tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)), idf = ln((N−df+0.5)/(df+0.5)+1).

    Scale shape: one tokenize scan, tf/df as map-side-combinable aggregates,
    global (N, Σdl) as a broadcast 1-row aggregate, and the final top-k is
    orderBy+limit — Spark's distributed TakeOrdered, never a single-task
    global sort.

    Cross-engine determinism: dl/tf/df/N are integers and Σdl is an exact
    long sum, so avgdl and every idf are identical doubles in any engine;
    per-term contributions are rounded to 6 dp and summed as FIXED-POINT
    longs (order-free), one float division at the end — the same discipline
    as the PQ ADC scores."""
    words = F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                     lambda w: w != "")
    base = docs.select(F.col(id_col).alias("id"), words.alias("_w"))
    dl = base.select("id", F.size("_w").cast("long").alias("dl"))
    tf = (
        base.select("id", F.explode("_w").alias("token"))
        .filter(F.col("token").isin(list(query_terms)))
        .groupBy("id", "token").agg(F.count(F.lit(1)).alias("tf"))
    )
    stats = dl.agg(F.count(F.lit(1)).alias("n"), F.sum("dl").alias("sdl"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    avgdl = F.col("sdl") / F.col("n")
    idf = F.log((F.col("n") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5)) + F.lit(1.0))
    denom = F.col("tf") + F.lit(k1) * (F.lit(1.0 - b)
                                       + F.lit(b) * F.col("dl") / avgdl)
    contrib = (idf * (F.col("tf") * F.lit(k1 + 1.0))) / denom
    scored = (
        tf.join(dl, "id")
        .join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(stats))
        .withColumn("_cq", F.round(F.round(contrib, 6) * F.lit(1e6), 0)
                    .cast("long"))
        .groupBy("id")
        .agg(F.round(F.sum("_cq") / F.lit(1e6), 6).alias("score"),
             F.count(F.lit(1)).cast("long").alias("n_terms"))
    )
    top = scored.orderBy(F.desc("score"), F.asc("id")).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc("id"))  # k rows only
    return top.withColumn("rank", F.row_number().over(w).cast("long")) \
              .select(F.col("id").alias(id_col), "score", "n_terms", "rank")


def tfidf_similar_pairs(docs: DataFrame, threshold: float = 0.3,
                        per_node_cap: int = 5, id_col: str = "doc_id",
                        text_col: str = "text",
                        max_df_ratio: float = 0.5,
                        max_df_abs: int | None = 100_000) -> DataFrame:
    """Top-`per_node_cap` most-similar docs per doc with cosine >= threshold.
    Ranking uses the ROUNDED similarity (6 dp) so ordering is reproducible
    across engines despite float summation order.

    max_df_ratio defaults to 0.5 (matching tfidf_weights): tokens in more than
    half the corpus are dropped before the token self-join — without this a
    single corpus-wide token alone contributes O(n²) join rows."""
    v = tfidf_weights(docs, id_col, text_col, max_df_ratio, max_df_abs)
    a, b = v.alias("a"), v.alias("b")
    sims = (
        a.join(b, "token")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.round(F.sum(F.col("a.w") * F.col("b.w")), 6).alias("sim"))
        .filter(F.col("sim") >= threshold)
    )
    w_cap = Window.partitionBy("id_a").orderBy(F.desc("sim"), F.asc("id_b"))
    return (
        sims.withColumn("rank", F.row_number().over(w_cap))
        .filter(F.col("rank") <= per_node_cap)
        .select("id_a", "id_b", "sim", F.col("rank").cast("long").alias("rank"))
    )


def hybrid_rrf(docs: DataFrame, embeddings: DataFrame,
               query_terms: list[str], query_vec_id: int,
               k: int = 20, n_each: int = 50, rrf_k: int = 60,
               id_col: str = "doc_id", text_col: str = "text",
               vec_id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Hybrid sparse+dense retrieval fused with Reciprocal Rank Fusion
    (Cormack, Clarke & Buettcher, SIGIR 2009): BM25 top-n and brute-force
    cosine top-n are each computed independently, then fused by
    score(d) = Σ_lists 1/(rrf_k + rank_list(d)) — rank-based, so the two
    systems' incomparable score scales never meet.

    Cross-engine determinism: both input ranks are integers, each reciprocal
    is a single IEEE division of exact integers, and the fusion is ONE
    two-operand addition with fixed operand order — bit-identical in any
    engine, no rounding discipline needed (6-dp rounding applied for
    display). Docs missing from a list contribute 0 to the sum and 0 as
    their reported per-list rank.

    Scale shape: both branches are already top-n (n_each rows each), so the
    fusion is a driver-trivial full-outer join of two tiny DataFrames —
    the heavy lifting stays in the two retrieval operators, which scan the
    corpus once each. At 100 TB the dense branch swaps to ivf_topk /
    ivf_pq_residual_topk unchanged (same (id, rank) contract)."""
    from .similarity import brute_force_topk

    b = bm25_rank(docs, query_terms, k=n_each, id_col=id_col,
                  text_col=text_col) \
        .select(F.col(id_col).alias("id"), F.col("rank").alias("bm25_rank"))
    q = embeddings.filter(F.col(vec_id_col) == query_vec_id)
    d = brute_force_topk(embeddings, q, k=n_each, id_col=vec_id_col,
                         vec_col=vec_col) \
        .select("id", F.col("rank").cast("long").alias("cos_rank"))
    fused = (
        b.join(d, "id", "full")
        .withColumn(
            "rrf_score",
            F.round(
                F.coalesce(F.lit(1.0) / (F.lit(rrf_k) + F.col("bm25_rank")),
                           F.lit(0.0))
                + F.coalesce(F.lit(1.0) / (F.lit(rrf_k) + F.col("cos_rank")),
                             F.lit(0.0)), 6))
    )
    top = fused.orderBy(F.desc("rrf_score"), F.asc("id")).limit(k)
    w = Window.orderBy(F.desc("rrf_score"), F.asc("id"))  # k rows only
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .select(F.col("id").alias(id_col), "rrf_score",
                F.coalesce("bm25_rank", F.lit(0)).cast("long").alias("bm25_rank"),
                F.coalesce("cos_rank", F.lit(0)).cast("long").alias("cos_rank"),
                "rank")
    )
