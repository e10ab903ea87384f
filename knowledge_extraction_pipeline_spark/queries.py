"""Driver-contract query registry: every implemented operator class gets a
(spark_fn, oracle_sql) pair. The driver runs the Spark query and the DuckDB
SQL side-by-side at sf0.01 and compares row count + schema + order-insensitive
value hash — so every column is aliased identically on both sides, doubles are
made deterministic (decimal-exact sums, or same-order sequential folds) and
then rounded, and every LIMIT has a total order.

Sections:
  relational  — scan/filter/agg/join/semi/anti/window/top-k/distinct (SURVEY §2.2-2.7)
  kg          — the KG-construction semantics on the `documents` corpus
                (co-occurrence formulas, category-pair typing — SURVEY §2.3-2.4)
  dedup       — exact / n-gram-Jaccard / embedding-cosine (+ rows-only MinHash,
                SimHash)
  similarity  — brute-force ANN top-k (+ rows-only LSH variant)
  text        — token/word stats, quality, fingerprints
  pipeline    — the transcripts KG pipeline itself (rows-only: non-SQL ops)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators import kg_docs
from .sources.tables import load_table

SparkQuery = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, SparkQuery] = {}
ORACLE: dict[str, str] = {}


def register(name: str, sql: str | None = None):
    def deco(fn: SparkQuery):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn
    return deco


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# ───────────────────────── relational ─────────────────────────

# Decimal-exact money math: cast inputs to decimal so the sum is exact and
# order-independent, then cast to double and round — both engines produce
# bit-identical results.
_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_base_price,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 2) AS sum_disc_price,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", _Q1_SQL)
def q1_pricing_summary(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,4)")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(qty).cast("double"), 2).alias("sum_qty"),
            F.round(F.sum(price).cast("double"), 2).alias("sum_base_price"),
            F.round(F.sum(price * (F.lit(1) - disc)).cast("double"), 2).alias("sum_disc_price"),
            F.round(F.sum(qty).cast("double") / F.count(F.lit(1)), 4).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_REV_NATION_SQL = """
SELECT n.n_name AS nation,
       round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE), 2) AS revenue,
       count(DISTINCT o.o_orderkey) AS n_orders
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


@register("q_revenue_by_nation", _REV_NATION_SQL)
def q_revenue_by_nation(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    rev = (F.col("l_extendedprice").cast("decimal(18,2)")
           * (F.lit(1) - F.col("l_discount").cast("decimal(18,4)")))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum(rev).cast("double"), 2).alias("revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    )


_TOP_PARTS_SQL = """
SELECT p.p_partkey, p.p_name,
       round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE), 2) AS revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_partkey, p.p_name
ORDER BY revenue DESC, p_partkey ASC
LIMIT 10
"""


@register("q_top_parts", _TOP_PARTS_SQL)
def q_top_parts(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice").cast("decimal(18,2)")
           * (F.lit(1) - F.col("l_discount").cast("decimal(18,4)")))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_partkey", "p_name")
        .agg(F.round(F.sum(rev).cast("double"), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("p_partkey"))
        .limit(10)
    )


_PRIORITY_SQL = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
GROUP BY o_orderpriority
"""


@register("q_order_priority_semijoin", _PRIORITY_SQL)
def q_order_priority_semijoin(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


_NO_ORDERS_SQL = """
SELECT c_mktsegment, count(*) AS n_customers
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c_mktsegment
"""


@register("q_customers_no_orders_antijoin", _NO_ORDERS_SQL)
def q_customers_no_orders_antijoin(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


_SESSIONS_SQL = """
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions,
       count(*) AS n_events
FROM flagged GROUP BY user_id
"""


@register("q_events_sessionize", _SESSIONS_SQL)
def q_events_sessionize(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    new_s = F.when(
        prev.isNull()
        | ((F.unix_timestamp("ts") - F.unix_timestamp(prev)) > 1800), 1
    ).otherwise(0)
    return (
        e.withColumn("new_session", new_s)
        .groupBy("user_id")
        .agg(F.sum("new_session").cast("long").alias("n_sessions"),
             F.count(F.lit(1)).alias("n_events"))
    )


_RUNNING_SQL = """
SELECT event_id, user_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING), 4) AS running_value,
       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq
FROM events
"""


@register("q_events_running_window", _RUNNING_SQL)
def q_events_running_window(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id") \
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ws = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id", "user_id",
        F.round(F.sum("value").over(w), 4).alias("running_value"),
        F.row_number().over(ws).cast("long").alias("seq"),
    )


_JSON_SQL = """
SELECT event_type,
       round(avg(CAST(json_extract_string(props, '$.k') AS DOUBLE)), 4) AS avg_k,
       count(*) AS n
FROM events GROUP BY event_type
"""


@register("q_events_json_extract", _JSON_SQL)
def q_events_json_extract(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("double")
    return e.groupBy("event_type").agg(
        F.round(F.avg(k), 4).alias("avg_k"),
        F.count(F.lit(1)).alias("n"),
    )


_SEGMENT_SQL = """
SELECT c_mktsegment,
       count(DISTINCT c_nationkey) AS n_nations,
       round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_acctbal,
       round(max(c_acctbal), 2) AS max_acctbal
FROM customer GROUP BY c_mktsegment
"""


@register("q_segment_distinct_agg", _SEGMENT_SQL)
def q_segment_distinct_agg(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.round(F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1)), 4).alias("avg_acctbal"),
        F.round(F.max("c_acctbal"), 2).alias("max_acctbal"),
    )


_ROLLUP_SQL = """
SELECT coalesce(o_orderpriority, 'ALL') AS priority,
       coalesce(o_orderstatus, 'ALL') AS status,
       count(*) AS n,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total
FROM orders
GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
"""


@register("q_rollup_orders", _ROLLUP_SQL)
def q_rollup_orders(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderpriority", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                     .cast("double"), 2).alias("total"))
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "n", "total")
    )


_SETOPS_SQL = """
SELECT c_custkey FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
WHERE year(o.o_orderdate) = 1995
INTERSECT
SELECT c_custkey FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
WHERE year(o.o_orderdate) = 1996
"""


@register("q_setops_repeat_customers", _SETOPS_SQL)
def q_setops_repeat_customers(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    def buyers(year):
        return (c.join(o, c.c_custkey == o.o_custkey)
                .filter(F.year("o_orderdate") == year)
                .select("c_custkey"))
    return buyers(1995).intersect(buyers(1996))


_RANGE_JOIN_SQL = """
SELECT a.event_id, count(b.event_id) AS followups
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTE
GROUP BY a.event_id
"""


@register("q_events_range_join", _RANGE_JOIN_SQL)
def q_events_range_join(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    a = e.alias("a")
    b = e.alias("b")
    return (
        a.join(b, (F.col("a.user_id") == F.col("b.user_id"))
               & (F.col("b.ts") > F.col("a.ts"))
               & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 5 MINUTES")))
        .groupBy(F.col("a.event_id").alias("event_id"))
        .agg(F.count(F.lit(1)).alias("followups"))
    )


# ───────────────────────── kg on documents ─────────────────────────

_KG_MENTIONS_SQL = f"""
SELECT d.doc_id, lex.term, lex.category
FROM documents d, {kg_docs.lexicon_values_sql()}
WHERE list_contains(string_split(d.text, ' '), lex.term)
"""


@register("kg_mentions_docs", _KG_MENTIONS_SQL)
def kg_mentions_docs(spark, sf_dir):
    return kg_docs.doc_mentions(spark, _t(spark, sf_dir, "documents"))


_KG_COOCCUR_SQL = f"""
WITH m AS (
  SELECT DISTINCT d.doc_id, lex.term
  FROM documents d, {kg_docs.lexicon_values_sql()}
  WHERE list_contains(string_split(d.text, ' '), lex.term)
), n AS (
  SELECT term, count(*) AS n FROM m GROUP BY term
), pairs AS (
  SELECT a.term AS term_a, b.term AS term_b, count(*) AS common
  FROM m a JOIN m b ON a.doc_id = b.doc_id AND a.term < b.term
  GROUP BY a.term, b.term
  HAVING count(*) >= 2
)
SELECT p.term_a, p.term_b, p.common,
       round(CAST(p.common AS DOUBLE) / least(na.n, nb.n), 6) AS strength,
       round(least(1.0, CAST(p.common AS DOUBLE) / 10.0), 6) AS confidence
FROM pairs p
JOIN n na ON na.term = p.term_a
JOIN n nb ON nb.term = p.term_b
"""


@register("kg_cooccur_docs", _KG_COOCCUR_SQL)
def kg_cooccur_docs(spark, sf_dir):
    return kg_docs.doc_cooccurrence_edges(spark, _t(spark, sf_dir, "documents"))


_KG_TYPED_SQL = f"""
WITH m AS (
  SELECT DISTINCT d.doc_id, lex.term
  FROM documents d, {kg_docs.lexicon_values_sql()}
  WHERE list_contains(string_split(d.text, ' '), lex.term)
), n AS (
  SELECT term, count(*) AS n FROM m GROUP BY term
), pairs AS (
  SELECT a.term AS term_a, b.term AS term_b, count(*) AS common
  FROM m a JOIN m b ON a.doc_id = b.doc_id AND a.term < b.term
  GROUP BY a.term, b.term
  HAVING count(*) >= 2
)
SELECT p.term_a, typ.pred, p.term_b, p.common,
       round(CAST(p.common AS DOUBLE) / least(na.n, nb.n), 6) AS strength,
       round(least(1.0, CAST(p.common AS DOUBLE) / 10.0), 6) AS confidence
FROM pairs p
JOIN n na ON na.term = p.term_a
JOIN n nb ON nb.term = p.term_b
JOIN {kg_docs.typing_values_sql()} ON typ.term_a = p.term_a AND typ.term_b = p.term_b
"""


@register("kg_typed_edges_docs", _KG_TYPED_SQL)
def kg_typed_edges_docs(spark, sf_dir):
    return kg_docs.doc_typed_edges(spark, _t(spark, sf_dir, "documents"))


_KG_DEGREE_SQL = f"""
WITH m AS (
  SELECT DISTINCT d.doc_id, lex.term
  FROM documents d, {kg_docs.lexicon_values_sql()}
  WHERE list_contains(string_split(d.text, ' '), lex.term)
), pairs AS (
  SELECT a.term AS term_a, b.term AS term_b
  FROM m a JOIN m b ON a.doc_id = b.doc_id AND a.term < b.term
  GROUP BY a.term, b.term
  HAVING count(*) >= 2
), und AS (
  SELECT term_a AS term FROM pairs UNION ALL SELECT term_b FROM pairs
)
SELECT term, count(*) AS degree FROM und GROUP BY term
"""


@register("kg_degree_docs", _KG_DEGREE_SQL)
def kg_degree_docs(spark, sf_dir):
    return kg_docs.doc_degree_centrality(spark, _t(spark, sf_dir, "documents"))


@register("kg_pagerank_docs")  # rows-only: iterative algorithm
def kg_pagerank_docs(spark, sf_dir):
    from .operators.graph_algos import pagerank
    edges = kg_docs.doc_typed_edges(spark, _t(spark, sf_dir, "documents"))
    return pagerank(edges.withColumnRenamed("term_a", "subj")
                    .withColumnRenamed("term_b", "obj"), max_iter=15)


@register("kg_khop_docs")  # rows-only: iterative BFS
def kg_khop_docs(spark, sf_dir):
    from .operators.graph_algos import k_hop_neighborhood
    edges = kg_docs.doc_typed_edges(spark, _t(spark, sf_dir, "documents"))
    return k_hop_neighborhood(
        edges.withColumnRenamed("term_a", "subj").withColumnRenamed("term_b", "obj"),
        ["spark"], k=2)


# ───────────────────────── dedup ─────────────────────────

_DEDUP_EXACT_SQL = """
SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
       min(doc_id) AS keeper_id, count(*) AS group_size
FROM documents GROUP BY 1
"""


@register("dedup_exact_docs", _DEDUP_EXACT_SQL)
def dedup_exact_docs(spark, sf_dir):
    from .operators.dedup import exact_duplicates
    return exact_duplicates(_t(spark, sf_dir, "documents"))


_NGRAM_JACCARD_SQL = """
WITH sh AS (
  SELECT doc_id AS id, lang AS blk,
         list_distinct([array_to_string(words[i:i+2], ' ')
                        for i in range(1, greatest(len(words) - 2, 1) + 1)]) AS s
  FROM (SELECT doc_id, lang,
               string_split_regex(trim(lower(text)), '\\s+') AS words
        FROM documents)
)
SELECT a.id AS id_a, b.id AS id_b,
       round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             / len(list_distinct(list_concat(a.s, b.s))), 6) AS jaccard
FROM sh a JOIN sh b ON a.blk = b.blk AND a.id < b.id
WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
      / len(list_distinct(list_concat(a.s, b.s))) >= 0.1
"""


@register("dedup_ngram_jaccard_docs", _NGRAM_JACCARD_SQL)
def dedup_ngram_jaccard_docs(spark, sf_dir):
    from .operators.dedup import ngram_jaccard_pairs
    return ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), threshold=0.1, k=3)


_EMB_NEAR_DUP_SQL = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
             / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6) AS cos
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
      / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
         * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) >= 0.8
"""


@register("dedup_embedding_cosine", _EMB_NEAR_DUP_SQL)
def dedup_embedding_cosine(spark, sf_dir):
    from .operators.dedup import embedding_near_dup_pairs
    return embedding_near_dup_pairs(_t(spark, sf_dir, "embeddings"), threshold=0.8)


@register("dedup_minhash_docs")  # rows-only: banding is not SQL-expressible
def dedup_minhash_docs(spark, sf_dir):
    from .operators.dedup import minhash_near_dup_pairs
    return minhash_near_dup_pairs(_t(spark, sf_dir, "documents"), threshold=0.1)


@register("dedup_simhash_docs")  # rows-only: 64-bit simhash UDF
def dedup_simhash_docs(spark, sf_dir):
    from .operators.dedup import simhash_near_dup_pairs
    return simhash_near_dup_pairs(_t(spark, sf_dir, "documents"), max_hamming=3)


_TFIDF_STOP = "'" + "', '".join([
    "the", "and", "for", "are", "but", "not", "you", "all", "can", "had",
    "her", "was", "one", "our", "out", "has", "have", "this", "that", "with",
    "from", "they", "been", "were", "which", "their", "there", "would",
]) + "'"

_TFIDF_SQL = f"""
WITH toks AS (
  SELECT doc_id AS id, unnest(string_split_regex(lower(text), '\\s+')) AS token
  FROM documents
), ftoks AS (
  SELECT id, token FROM toks
  WHERE regexp_matches(token, '^[a-z][a-z-]*[a-z]$')
    AND length(token) > 2 AND token NOT IN ({_TFIDF_STOP})
), tf AS (
  SELECT id, token, count(*) AS tf FROM ftoks GROUP BY id, token
), dfreq AS (
  SELECT token, count(*) AS df FROM tf GROUP BY token
), n AS (SELECT count(*) AS n FROM documents),
w AS (
  SELECT tf.id, tf.token,
         tf.tf * (ln(CAST(n.n AS DOUBLE) / (dfreq.df + 1)) + 1) AS w
  FROM tf JOIN dfreq USING (token) CROSS JOIN n
), nrm AS (
  SELECT id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY id
), v AS (
  SELECT w.id, w.token, w.w / nrm.nrm AS w FROM w JOIN nrm USING (id)
), sims AS (
  SELECT a.id AS id_a, b.id AS id_b, round(sum(a.w * b.w), 6) AS sim
  FROM v a JOIN v b ON a.token = b.token AND a.id < b.id
  GROUP BY a.id, b.id
  HAVING round(sum(a.w * b.w), 6) >= 0.3
)
SELECT id_a, id_b, sim, CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY id_a
                                   ORDER BY sim DESC, id_b ASC) AS rank
      FROM sims)
WHERE rank <= 5
"""


@register("tfidf_similar_docs", _TFIDF_SQL)
def tfidf_similar_docs(spark, sf_dir):
    from .operators.tfidf import tfidf_similar_pairs
    return tfidf_similar_pairs(_t(spark, sf_dir, "documents"))


# ───────────────────────── similarity ─────────────────────────

_ANN_SQL = """
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id IN (0, 1, 2)),
scored AS (
  SELECT q.query_id, a.vec_id AS id,
         round(list_dot_product(a.embedding::DOUBLE[], q.qv)
               / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                  * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos
  FROM embeddings a, q WHERE a.vec_id != q.query_id
)
SELECT query_id, id, cos,
       CAST(rank AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, id ASC) AS rank
      FROM scored)
WHERE rank <= 10
"""


@register("ann_topk_cosine", _ANN_SQL)
def ann_topk_cosine(spark, sf_dir):
    from .operators.similarity import brute_force_topk
    embs = _t(spark, sf_dir, "embeddings")
    q = embs.filter(F.col("vec_id").isin(0, 1, 2))
    out = brute_force_topk(embs, q, k=10)
    return out.withColumn("rank", F.col("rank").cast("long"))


@register("ann_lsh_topk")  # rows-only: LSH bucketing is not SQL-expressible
def ann_lsh_topk(spark, sf_dir):
    from .operators.similarity import lsh_topk
    embs = _t(spark, sf_dir, "embeddings")
    q = embs.filter(F.col("vec_id").isin(0, 1, 2))
    out = lsh_topk(embs, q, k=10, num_planes=6)
    return out.withColumn("rank", F.col("rank").cast("long"))


@register("ann_ivf_topk")  # rows-only: iterative k-means quantizer
def ann_ivf_topk(spark, sf_dir):
    from .operators.similarity import ivf_topk
    embs = _t(spark, sf_dir, "embeddings")
    q = embs.filter(F.col("vec_id").isin(0, 1, 2))
    return ivf_topk(embs, q, k=10, n_centroids=8, n_probe=2)


# ───────────────────────── text analysis ─────────────────────────

_TEXT_STATS_SQL = """
SELECT source AS grp, count(*) AS n_docs,
       CAST(sum(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS total_words,
       CAST(sum(list_sum(list_transform(string_split_regex(trim(text), '\\s+'),
                                        w -> CAST(ceil(length(w) / 4.0) AS INT)))) AS BIGINT) AS total_tokens,
       round(CAST(sum(len(string_split_regex(trim(text), '\\s+'))) AS DOUBLE) / count(*), 4) AS avg_words,
       CAST(min(length(text)) AS BIGINT) AS min_chars,
       CAST(max(length(text)) AS BIGINT) AS max_chars
FROM documents GROUP BY source
"""


@register("text_corpus_stats", _TEXT_STATS_SQL)
def text_corpus_stats(spark, sf_dir):
    from .operators.text_analysis import corpus_stats
    s = corpus_stats(_t(spark, sf_dir, "documents"))
    return s.withColumn(
        "avg_words",
        F.round(F.col("total_words").cast("double") / F.col("n_docs"), 4))


_TEXT_TOKENS_SQL = """
SELECT doc_id,
       CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_words,
       CAST(list_sum(list_transform(string_split_regex(trim(text), '\\s+'),
                                    w -> CAST(ceil(length(w) / 4.0) AS INT))) AS BIGINT) AS n_tokens,
       md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
FROM documents
"""


@register("text_tokens_fingerprint", _TEXT_TOKENS_SQL)
def text_tokens_fingerprint(spark, sf_dir):
    from .functions.text import normalize_term, token_count, word_count
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        word_count(F.col("text")).cast("long").alias("n_words"),
        token_count(F.col("text")).cast("long").alias("n_tokens"),
        F.md5(normalize_term(F.col("text"))).alias("fp"),
    )


@register("text_lang_quality")  # rows-only: heuristic scoring, not SQL-mirrored
def text_lang_quality(spark, sf_dir):
    from .operators.text_analysis import annotate
    return annotate(_t(spark, sf_dir, "documents")).select(
        "doc_id", "lang_pred", "quality")


# ───────────────────────── transcripts pipeline (rows-only) ─────────────────────────

_PIPE_CONVS = 200


def _pipeline(spark):
    from .operators.canonicalize import canonicalize_stage
    from .operators.extract import extract_stage
    from .operators.link import distinct_terms, link_stage
    from .operators.materialize import materialize_stage
    from .sources.transcripts_gen import generate_transcripts

    t = generate_transcripts(spark, _PIPE_CONVS)
    m, tr = extract_stage(t)
    m = m.cache()
    asn = canonicalize_stage(distinct_terms(m), link_stage(m))
    return materialize_stage(spark, m, tr, asn)


@register("kg_pipeline_nodes")  # rows-only: full pipeline incl. LSH + CC
def kg_pipeline_nodes(spark, sf_dir):
    nodes, _ = _pipeline(spark)
    return nodes.select("canon", "canonical_term", "primary_category",
                        "primary_importance", "avg_confidence", "mention_count")


@register("kg_pipeline_edges")  # rows-only
def kg_pipeline_edges(spark, sf_dir):
    _, edges = _pipeline(spark)
    return edges.select("subj", "pred", "obj", "common", "strength", "confidence")


@register("kg_semantic_chunks")  # rows-only: applyInPandas stateful scan
def kg_semantic_chunks(spark, sf_dir):
    from .operators.chunking import merge_small_chunks, semantic_chunks
    from .sources.transcripts_gen import generate_transcripts

    t = generate_transcripts(spark, _PIPE_CONVS)
    return merge_small_chunks(semantic_chunks(t)).select(
        "conv_id", "chunk_index", "first_turn_idx", "last_turn_idx",
        "n_words", "coherence")


@register("multimodal_image_features")  # rows-only: binary decode stub + mapInPandas
def multimodal_image_features(spark, sf_dir):
    from .sources.multimodal import extract_image_features, synthetic_media
    return extract_image_features(synthetic_media(spark, 96)).select(
        "media_id", "width", "height", "n_bytes")


_CTX_SQL = """
SELECT d.doc_id,
       CAST(len(string_split_regex(trim(d.text), '\\s+')) AS BIGINT) AS n_words
FROM documents d
WHERE len(string_split_regex(trim(d.text), '\\s+')) >= 20
  AND NOT regexp_matches(lower(d.text), '^(page |chapter )')
"""


@register("kg_substantive_filter", _CTX_SQL)
def kg_substantive_filter(spark, sf_dir):
    """The reference's substantive-chunk predicate (concept_extractor.py:
    355-378): word_count >= 20 and no header-skip pattern."""
    from .functions.text import word_count
    d = _t(spark, sf_dir, "documents")
    return (
        d.filter((word_count(F.col("text")) >= 20)
                 & ~F.lower(F.col("text")).rlike(r"^(page |chapter )"))
        .select("doc_id", word_count(F.col("text")).cast("long").alias("n_words"))
    )
