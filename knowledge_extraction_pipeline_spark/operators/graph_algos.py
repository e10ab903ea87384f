"""Graph analytics over the materialized nodes/edges tables.

Reference analogs (all NetworkX in-memory, core/graph_builder.py):
  degree centrality   :177          → groupBy count / (N-1)
  PageRank            :171-179      → iterative DataFrame joins, damping 0.85
  weakly connected    :154          → the stage-3 CC machinery on edge tables
  k-hop neighborhood  :181-213      → k iterated self-joins
  graph stats         :136-154      → counts + density + degree aggregates

All iterative algorithms localCheckpoint per iteration (lineage truncation) —
same discipline as the canonicalization stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def undirected(edges: DataFrame, src: str = "subj", dst: str = "obj") -> DataFrame:
    fwd = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    return fwd.unionAll(edges.select(F.col(dst).alias("src"), F.col(src).alias("dst")))


def degree_centrality(edges: DataFrame) -> DataFrame:
    """degree / (N-1) per node (nx.degree_centrality semantics)."""
    und = undirected(edges)
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("degree"))
    n = deg.count()
    return deg.select(
        F.col("src").alias("node"),
        F.col("degree").cast("long"),
        F.round(F.col("degree") / F.lit(max(1, n - 1)), 6).alias("centrality"),
    )


def graph_stats(nodes: DataFrame, edges: DataFrame) -> dict:
    """Node/edge counts, density, avg degree (graph_builder.py:136-154)."""
    n = nodes.count()
    e = edges.count()
    return {
        "nodes": n,
        "edges": e,
        "density": (e / (n * (n - 1))) if n > 1 else 0.0,
        "avg_degree": (2 * e / n) if n else 0.0,
    }


def pagerank(edges: DataFrame, damping: float = 0.85, max_iter: int = 10,
             src: str = "subj", dst: str = "obj") -> DataFrame:
    """Iterative PageRank on the directed edge table. Contributions flow
    src→dst; dangling mass redistributed uniformly. One join + one groupBy
    per iteration; ranks localCheckpointed to bound lineage."""
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionAll(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("out_deg")) \
                   .withColumnRenamed(src, "node").localCheckpoint(eager=True)
    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).localCheckpoint(eager=True)
    e = edges.select(F.col(src).alias("node"), F.col(dst).alias("to")) \
             .localCheckpoint(eager=True)

    for _ in range(max_iter):
        contribs = (
            e.join(ranks, "node").join(out_deg, "node")
            .select(F.col("to").alias("node"),
                    (F.col("rank") / F.col("out_deg")).alias("c"))
            .groupBy("node").agg(F.sum("c").alias("in_sum"))
        )
        # dangling mass as a broadcast 1-row aggregate — keeps the whole
        # iteration inside ONE job instead of a collect per round
        dang = (
            ranks.join(out_deg, "node", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dangling"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dang))
            .select("node",
                    (F.lit((1.0 - damping) / n)
                     + F.lit(damping) * (F.coalesce(F.col("in_sum"), F.lit(0.0))
                                         + F.col("dangling") / n)).alias("rank"))
            .localCheckpoint(eager=True)
        )
    return ranks.withColumn("rank", F.round("rank", 8))


def pagerank_scaled(edges: DataFrame, damping_num: int = 85,
                    damping_den: int = 100, max_iter: int = 15,
                    scale: int = 10**12, src: str = "subj",
                    dst: str = "obj",
                    personalize: str | None = None,
                    weight: str | None = None,
                    driver_threshold: int = 50_000) -> DataFrame:
    """Fixed-point PageRank: ranks are BIGINTs scaled by 10^12 and every
    operation is integer (floor division, exact sums), so the result is
    bit-identical regardless of aggregation order — the determinism float
    PageRank fundamentally lacks at cluster scale (shuffle order changes the
    float sum). Same iteration structure as pagerank(); damping expressed as
    the rational damping_num/damping_den.

    personalize: a node id → personalized PageRank (Jeh & Widom, WWW'03
    random-walk-with-restart): ALL teleport mass — the (1−d) restart and the
    dangling redistribution — lands on the seed instead of spreading
    uniformly, and r0 starts as a point mass at the seed. Same integer
    discipline, so equally oracle-able.

    weight: an integer edge-weight column → weighted PageRank: each edge
    carries rank proportional to its weight share, contribution
    (r·w) DIV Σw_out — on a co-occurrence KG this ranks by evidence
    strength, not just link count. (r ≤ scale·den and integer weights
    ≤ ~10^6 keep r·w inside a BIGINT.)

    driver_threshold: when the EDGE table has at most this many rows it is
    collected and the identical integer recurrence runs as a driver loop —
    bit-identical by construction (every operation is an exact integer sum
    or floor division, so evaluation order cannot matter), and it removes
    the ~15 × (join + groupBy + checkpoint) fixed Spark cost that dominates
    on vocabulary-projected graphs (the co-occurrence KG's distinct-term
    graph is lexicon²-bounded regardless of corpus size). Larger graphs take
    the distributed path unchanged; pass 0 to force it
    (test_pagerank_driver_path_matches_distributed pins equality).

    Output: (node, rank_scaled) with rank ≈ rank_scaled / scale."""
    if driver_threshold > 0:
        erows = edges.limit(driver_threshold + 1).collect()
        if len(erows) <= driver_threshold:
            return _pagerank_scaled_driver(
                edges.sparkSession, erows, damping_num, damping_den,
                max_iter, scale, src, dst, personalize, weight,
                node_type=edges.schema[src].dataType.simpleString())
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionAll(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank_scaled", F.lit(0).cast("long"))
    if weight is not None:
        # null/non-positive weights would zero an out-weight sum while the
        # node still "has" out-edges: its mass neither flows nor counts as
        # dangling, silently destroying rank mass (and DIV 0 throws under
        # ANSI). Dropping those edges keeps the semantics clean — a node
        # whose every edge is dropped becomes dangling and its mass
        # redistributes normally.
        edges = edges.filter(F.col(weight).isNotNull()
                             & (F.col(weight) > 0))
    wsum = (F.sum(F.col(weight).cast("long")) if weight is not None
            else F.count(F.lit(1)))
    out_deg = edges.groupBy(src).agg(wsum.alias("deg")) \
                   .withColumnRenamed(src, "node").localCheckpoint(eager=True)
    if personalize is None:
        base = F.lit(((damping_den - damping_num) * scale)
                     // (damping_den * n))
        dang_share = f"(dang DIV {n})"
        r0 = F.lit(scale // n)
    else:
        # seed id as a Column comparison + a boolean marker column — never
        # spliced into a SQL string (ids may contain quotes)
        is_seed = F.col("node") == F.lit(personalize)
        nodes = nodes.withColumn("_seed", is_seed).localCheckpoint(eager=True)
        base = F.when(F.col("_seed"),
                      F.lit(((damping_den - damping_num) * scale)
                            // damping_den)).otherwise(F.lit(0))
        dang_share = "(CASE WHEN _seed THEN dang ELSE 0 END)"
        r0 = F.when(F.col("_seed"), F.lit(scale)).otherwise(F.lit(0))
    ranks = nodes.withColumn("r", r0.cast("long")) \
                 .localCheckpoint(eager=True)
    wcol = (F.col(weight).cast("long") if weight is not None
            else F.lit(None).cast("long"))
    e = edges.select(F.col(src).alias("node"), F.col(dst).alias("to"),
                     wcol.alias("w")) \
             .localCheckpoint(eager=True)
    contrib_expr = "(r * w) DIV deg" if weight is not None else "r DIV deg"

    for _ in range(max_iter):
        contribs = (
            e.join(ranks, "node").join(out_deg, "node")
            .select(F.col("to").alias("node"), F.expr(contrib_expr).alias("c"))
            .groupBy("node").agg(F.sum("c").alias("in_sum"))
        )
        dang = (
            ranks.join(out_deg, "node", "left_anti")
            .agg(F.coalesce(F.sum("r"), F.lit(0)).cast("long").alias("dang"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                (base
                 + F.expr(f"({damping_num} * (coalesce(in_sum, 0) "
                          f"+ {dang_share})) DIV {damping_den}")
                 ).cast("long").alias("r"))
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", F.col("r").alias("rank_scaled"))


def _pagerank_scaled_driver(spark, erows, damping_num, damping_den, max_iter,
                            scale, src, dst, personalize, weight,
                            node_type: str = "string"):
    """The pagerank_scaled recurrence on a collected edge list — every step
    the same exact integer sum / floor division the DataFrame path computes,
    so the two paths agree bit-for-bit (integers have no evaluation-order
    sensitivity). Used below driver_threshold only."""
    edges = []
    for r in erows:
        w = None
        if weight is not None:
            w = r[weight]
            if w is None or w <= 0:
                # mirrors the distributed path's weight filter; the node
                # still exists (it appears via nodes-from-ALL-edges below)
                w = None
        edges.append((r[src], r[dst], int(w) if w is not None else None))
    nodes = sorted({a for a, _, _ in edges} | {b for _, b, _ in edges})
    n = len(nodes)
    if n == 0:
        return spark.createDataFrame(
            [], f"node {node_type}, rank_scaled long")
    kept = [(a, b, w) for a, b, w in edges
            if weight is None or w is not None]
    deg: dict = {}
    for a, b, w in kept:
        deg[a] = deg.get(a, 0) + (w if weight is not None else 1)
    if personalize is None:
        base = {v: ((damping_den - damping_num) * scale)
                // (damping_den * n) for v in nodes}
        r = {v: scale // n for v in nodes}
        dang_share = None  # uniform: dang // n added to every node
    else:
        base = {v: (((damping_den - damping_num) * scale) // damping_den
                    if v == personalize else 0) for v in nodes}
        r = {v: (scale if v == personalize else 0) for v in nodes}
        dang_share = personalize
    for _ in range(max_iter):
        in_sum = {v: 0 for v in nodes}
        for a, b, w in kept:
            c = (r[a] * w) // deg[a] if weight is not None else r[a] // deg[a]
            in_sum[b] += c
        dang = sum(r[v] for v in nodes if v not in deg)
        nxt = {}
        for v in nodes:
            extra = (dang // n if dang_share is None
                     else (dang if v == dang_share else 0))
            nxt[v] = base[v] + (damping_num * (in_sum[v] + extra)) // damping_den
        r = nxt
    return spark.createDataFrame(sorted(r.items()),
                                 f"node {node_type}, rank_scaled long")


def k_hop_neighborhood(edges: DataFrame, start_nodes: list[str], k: int = 2,
                       src: str = "subj", dst: str = "obj") -> DataFrame:
    """All nodes within k undirected hops of the start set, with hop distance
    (graph_builder.py:181-213 forward+reverse BFS)."""
    spark = edges.sparkSession
    und = undirected(edges, src, dst).distinct()
    frontier = spark.createDataFrame([(s, 0) for s in start_nodes],
                                     "node string, hop int")
    seen = frontier
    for hop in range(1, k + 1):
        nxt = (
            und.join(frontier.select(F.col("node").alias("src")), "src")
            .select(F.col("dst").alias("node")).distinct()
            .join(seen.select("node"), "node", "left_anti")
            .withColumn("hop", F.lit(hop))
        )
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        seen = seen.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return seen


def _bfs_all_pairs(edges: DataFrame, max_hops: int, src: str,
                   dst: str) -> DataFrame:
    """All-pairs BFS distances (root, node, d) up to max_hops on the
    undirected projection — frontier state is (root, node) pairs, O(V²)
    worst case, so callers target the PROJECTED concept graph
    (vocabulary-sized). Each hop is one self-equi-join + anti-join,
    localCheckpointed to bound lineage, early exit when every ball
    closes. d is the true geodesic by construction (first visit wins)."""
    und = undirected(edges, src, dst).distinct().localCheckpoint(eager=True)
    verts = und.select(F.col("src").alias("node")).distinct()
    seen = verts.select(F.col("node").alias("root"), "node",
                        F.lit(0).alias("d")).localCheckpoint(eager=True)
    frontier = seen
    for hop in range(1, max_hops + 1):
        nxt = (
            und.join(frontier.select("root", F.col("node").alias("src")),
                     "src")
            .select("root", F.col("dst").alias("node")).distinct()
            .join(seen.select("root", "node"), ["root", "node"], "left_anti")
            .withColumn("d", F.lit(hop))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        seen = seen.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return seen


def distance_distribution(edges: DataFrame, max_hops: int = 12,
                          src: str = "subj", dst: str = "obj",
                          scale: int = 10**6) -> DataFrame:
    """Geodesic distance distribution + ANF-style effective diameter
    (Palmer et al. 2002): histogram of unordered-pair distances from the
    all-pairs BFS, cumulative counts, and the 90th-percentile effective
    diameter with exact linear interpolation — eff = (d₀−1) +
    (0.9T − c_{d₀−1})/(c_{d₀} − c_{d₀−1}), carried as the integer
    cross-multiplication (9T − 10c)·scale // (10Δc) so both engines floor
    identically. Unreachable pairs are excluded (the standard reachable-
    pairs convention). Returns (dist, n_pairs, cum_pairs,
    eff_diameter_e6 constant)."""
    seen = _bfs_all_pairs(edges, max_hops, src, dst)
    pairs = seen.filter((F.col("root") < F.col("node")) & (F.col("d") >= 1))
    h = (pairs.groupBy("d")
         .agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("n")))
    wcum = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.rowsBetween(Window.unboundedPreceding,
                              Window.unboundedFollowing)
    hc = h.select("d", "n", F.sum("n").over(wcum).alias("c"),
                  F.sum("n").over(wall).alias("tt"),
                  (F.sum("n").over(wcum) - F.col("n")).alias("cp"))
    ed = (hc.filter(F.expr("10 * c >= 9 * tt"))
          .orderBy("d").limit(1)
          .select(F.expr(f"CAST((d - 1) * {scale}"
                         f" + (9 * tt - 10 * cp) * {scale}"
                         f" div (10 * (c - cp)) AS BIGINT)")
                  .alias("eff_diameter_e6")))
    return (hc.crossJoin(F.broadcast(ed))
            .select(F.col("d").cast("int").alias("dist"),
                    F.col("n").cast("long").alias("n_pairs"),
                    F.col("c").cast("long").alias("cum_pairs"),
                    "eff_diameter_e6"))


def harmonic_centrality(edges: DataFrame, max_hops: int = 4,
                        src: str = "subj", dst: str = "obj",
                        scale: int = 10**6) -> DataFrame:
    """Closeness-family centralities from all-pairs BFS (bounded depth):
    per node — reachable count, eccentricity, sum of distances, harmonic
    centrality Σ 1/d (Marchiori & Latora 2000; robust on disconnected
    graphs where closeness degenerates), and closeness n/Σd.

    Both scores are emitted as exact integers (Σ scale//d and
    (n·scale)//Σd) — floor-division sums are aggregation-order-free, so
    the result is bit-identical across engines and shuffle orders (the
    repo-wide fixed-point discipline).

    Scale shape: frontier state is (root, node) pairs — O(V²) worst case —
    so this targets the PROJECTED concept graph (vocabulary-sized, like
    every all-pairs analytic here), never the raw corpus. Each hop is one
    self-equi-join + anti-join, localCheckpointed to bound lineage, with
    early exit when every BFS ball has closed."""
    seen = _bfs_all_pairs(edges, max_hops, src, dst)
    return (
        seen.filter(F.col("d") > 0)
        .groupBy(F.col("root").alias("node"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_reached"),
             F.max("d").cast("long").alias("eccentricity"),
             F.sum("d").cast("long").alias("sum_dist"),
             F.sum(F.expr(f"{scale} DIV d")).cast("long")
             .alias("harmonic_e6"))
        .withColumn("closeness_e6",
                    F.expr(f"(n_reached * {scale}) DIV sum_dist"))
    )


def negative_samples(edges: DataFrame, k: int = 3, attempts: int = 8,
                     seed: int = 42, src: str = "subj",
                     dst: str = "obj") -> DataFrame:
    """Deterministic negative sampling for KG-embedding training
    (TransE-family corrupt-tail pairs, Bordes et al. NIPS'13): for each
    positive edge (a, b), up to k tails b' that are NOT neighbors of a
    (and not a itself), chosen by portable hash so every engine / retry /
    cluster width selects the same negatives.

    Mechanics: nodes get a dense rank index (alphabetical row_number);
    attempt i of edge (a,b) proposes index md5("neg:seed:a:b:i") mod V —
    an equi-join against the indexed node table, never a cross join — then
    proposals are anti-joined against the (undirected) adjacency and the
    first k surviving attempts (by i) are kept. Row volume is E·attempts
    narrow rows; all joins are equi-joins on integer/index keys.

    Output: (subj, obj, neg_obj, attempt) — one row per DISTINCT negative
    (colliding proposals are collapsed to their earliest attempt before the
    k-cap, so k means k distinct tails). The dense index is a global
    row_number — a single-task sort, fine for the vocabulary-projected
    graphs every all-pairs analytic here targets."""
    from .similarity import _md5_u64

    if attempts <= 0:
        raise ValueError(f"attempts must be positive, got {attempts}")
    und = undirected(edges, src, dst).distinct().localCheckpoint(eager=True)
    verts = (und.select(F.col("src").alias("node")).distinct()
             .withColumn("_idx", F.row_number().over(
                 Window.orderBy(F.asc("node"))))
             .localCheckpoint(eager=True))
    n = verts.count()
    if n == 0:
        return edges.sparkSession.createDataFrame(
            [], "subj string, obj string, neg_obj string, attempt int")
    pos = edges.select(F.col(src).alias("subj"), F.col(dst).alias("obj")) \
               .distinct()
    att = pos.select(
        "subj", "obj",
        F.explode(F.sequence(F.lit(0), F.lit(attempts - 1))).alias("attempt"))
    h = _md5_u64(F.concat_ws(
        ":", F.lit("neg"), F.lit(str(seed)), F.col("subj"), F.col("obj"),
        F.col("attempt").cast("string")))
    att = att.withColumn("_idx", (h % n).cast("int") + 1)
    cand = (att.join(verts, "_idx")
               .select("subj", "obj", "attempt",
                       F.col("node").alias("neg_obj"))
               .filter(F.col("neg_obj") != F.col("subj")))
    adj = und.select(F.col("src").alias("subj"),
                     F.col("dst").alias("neg_obj"))
    valid = (cand.join(adj, ["subj", "neg_obj"], "left_anti")
                 # colliding proposals → one row per distinct tail, keeping
                 # the earliest attempt, so the k-cap counts DISTINCT tails
                 .groupBy("subj", "obj", "neg_obj")
                 .agg(F.min("attempt").alias("attempt")))
    w = Window.partitionBy("subj", "obj").orderBy(F.asc("attempt"))
    return (valid.withColumn("_rn", F.row_number().over(w))
                 .filter(F.col("_rn") <= k)
                 .select("subj", "obj", "neg_obj", "attempt"))


def top_k_nodes(nodes: DataFrame, k: int = 20,
                score_col: str = "mention_count") -> DataFrame:
    """Top-k concepts (reference: top-N by centrality/evidence,
    graph_builder.py:156-179)."""
    return nodes.orderBy(F.desc(score_col), F.asc("canon")).limit(k)


def shortest_path(edges: DataFrame, src_node: str, dst_node: str,
                  max_hops: int = 6, src: str = "subj",
                  dst: str = "obj") -> list[str] | None:
    """Undirected BFS shortest path with predecessor tracking
    (reference: nx.shortest_path with max_hops cap, graph_builder.py:215-249).
    Frontier expansion is a distributed join per hop; the backtrack walks the
    predecessor chain with <= max_hops single-row lookups against the
    distributed visited table — the driver only ever holds the path itself
    (<= max_hops + 1 node ids), never the BFS ball."""
    if src_node == dst_node:
        return [src_node]
    spark = edges.sparkSession
    und = undirected(edges, src, dst).distinct().localCheckpoint(eager=True)
    visited = spark.createDataFrame([(src_node, None)],
                                    "node string, pred string")
    frontier = visited.select("node")
    for _ in range(max_hops):
        nxt = (
            und.join(frontier.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"), F.col("src").alias("pred"))
            .join(visited.select("node"), "node", "left_anti")
            .groupBy("node").agg(F.min("pred").alias("pred"))  # deterministic
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            return None
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        hit = nxt.filter(F.col("node") == dst_node).collect()
        if hit:
            # backtrack: <= max_hops point lookups, one node id at a time —
            # never collects the visited table (the BFS ball can approach the
            # whole graph; the path cannot exceed max_hops + 1 nodes)
            path, cur = [dst_node], hit[0]["pred"]
            while cur is not None:
                path.append(cur)
                row = visited.filter(F.col("node") == cur).select("pred").collect()
                cur = row[0]["pred"] if row else None
            return list(reversed(path))
        frontier = nxt.select("node")
    return None


def repair_connectivity(edges: DataFrame, sims: DataFrame,
                        min_sim: float = 0.15) -> DataFrame:
    """Give every isolated node its single best-similarity edge if that
    similarity clears min_sim (reference connectivity repair,
    infer_relationships_tfidf.py:253-327). `sims` is a scored candidate pair
    table (id_a, id_b, sim); isolation is judged against `edges`."""
    from pyspark.sql import Window

    connected = undirected(edges).select("src").distinct() \
        .withColumnRenamed("src", "id")
    all_ids = sims.select(F.col("id_a").alias("id")).unionAll(
        sims.select(F.col("id_b").alias("id"))).distinct()
    isolated = all_ids.join(connected, "id", "left_anti")

    cands = sims.select(F.col("id_a").alias("id"), F.col("id_b").alias("other"), "sim") \
        .unionAll(sims.select(F.col("id_b").alias("id"), F.col("id_a").alias("other"), "sim"))
    return (
        isolated.join(cands, "id")
        .filter(F.col("sim") >= min_sim)
        .withColumn("rn", F.row_number().over(
            Window.partitionBy("id").orderBy(F.desc("sim"), F.asc("other"))))
        .filter(F.col("rn") == 1)
        .select(F.col("id").alias("subj"), F.lit("SIMILAR_TO").alias("pred"),
                F.col("other").alias("obj"), F.round("sim", 6).alias("sim"))
    )


def triangle_counts(edges: DataFrame, src: str = "subj",
                    dst: str = "obj") -> DataFrame:
    """Per-node triangle count + local clustering coefficient
    (2·t / (d·(d−1))) — the standard graph-quality / community signals.

    Scale shape: edges are oriented low→high by (degree, node) rank — the
    classic degree-ordered node-iterator — so every wedge join fans out from
    the LOWER-degree endpoint and a hub of degree d contributes O(d) wedge
    rows instead of O(d²); each triangle is found exactly once (the DAG
    orientation gives it a unique two-out-edge apex). Two equi-join shuffles
    total; orientation-invariant counts (the oracle uses plain a<b)."""
    und = (
        edges.select(F.least(src, dst).alias("a"),
                     F.greatest(src, dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = undirected(und.select(F.col("a").alias("subj"),
                                F.col("b").alias("obj"))) \
        .groupBy("src").agg(F.count(F.lit(1)).alias("d")) \
        .select(F.col("src").alias("node"), "d")
    ranked = und \
        .join(deg.select(F.col("node").alias("a"), F.col("d").alias("da")), "a") \
        .join(deg.select(F.col("node").alias("b"), F.col("d").alias("db")), "b")
    lower_first = (F.col("da") < F.col("db")) | \
        ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
    o = ranked.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"),
    )
    e1, e2 = o.alias("e1"), o.alias("e2")
    wedges = (
        e1.join(e2, on="u")
        .filter(F.col("e1.v") != F.col("e2.v"))
        .select(F.col("u").alias("apex"), F.col("e1.v").alias("x"),
                F.col("e2.v").alias("y"))
    )
    closing = o.select(F.col("u").alias("x"), F.col("v").alias("y"))
    tris = wedges.join(closing, on=["x", "y"])  # one orientation closes
    corners = tris.select(F.col("apex").alias("node")) \
        .unionAll(tris.select(F.col("x").alias("node"))) \
        .unionAll(tris.select(F.col("y").alias("node")))
    t = corners.groupBy("node").agg(F.count(F.lit(1)).alias("triangles"))
    return (
        deg.join(t, "node", "left")
        .select(
            "node",
            F.col("d").cast("long").alias("degree"),
            F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles"),
            F.round(F.when(F.col("d") >= 2,
                           2.0 * F.coalesce("triangles", F.lit(0))
                           / (F.col("d") * (F.col("d") - 1)))
                    .otherwise(0.0), 6).alias("clustering"),
        )
    )


def adamic_adar(edges: DataFrame, src: str = "subj", dst: str = "obj",
                include_existing: bool = False) -> DataFrame:
    """Adamic-Adar link prediction: for each non-adjacent node pair, the sum
    over common neighbors z of 1/ln(deg(z)) — the classic KG-completion /
    missing-edge score (rarer shared neighbors weigh more).

    Shape: wedges via one self-join of the undirected edge list on the
    middle node (fan-out O(deg(z)) per z — a hub contributes deg² wedge rows,
    the inherent cost of counting its common-neighbor pairs), groupBy pair,
    anti-join against existing edges. A common neighbor has deg >= 2 by
    construction, so ln(deg) is never 0."""
    und = (
        edges.select(F.least(src, dst).alias("a"),
                     F.greatest(src, dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    both = und.select(F.col("a").alias("z"), F.col("b").alias("x")) \
        .unionAll(und.select(F.col("b").alias("z"), F.col("a").alias("x")))
    deg = both.groupBy("z").agg(F.count(F.lit(1)).alias("d"))
    e1, e2 = both.alias("e1"), both.alias("e2")
    pairs = (
        e1.join(e2, on="z")
        .filter(F.col("e1.x") < F.col("e2.x"))
        .join(deg, on="z")
        .groupBy(F.col("e1.x").alias("a"), F.col("e2.x").alias("b"))
        .agg(F.round(F.sum(1.0 / F.log(F.col("d"))), 6).alias("aa_score"),
             F.count(F.lit(1)).alias("common_neighbors"))
    )
    if not include_existing:
        pairs = pairs.join(und, on=["a", "b"], how="left_anti")
    return pairs.select("a", "b", F.col("common_neighbors").cast("long")
                        .alias("common_neighbors"), "aa_score")


def neighbor_jaccard(edges: DataFrame, src: str = "subj", dst: str = "obj",
                     include_existing: bool = True) -> DataFrame:
    """Neighbor-set Jaccard link scores — |N(a)∩N(b)| / |N(a)∪N(b)| for
    every node pair sharing ≥1 neighbor. The set-overlap complement of
    adamic_adar (same wedge self-join shape); an exact integer ratio, so
    cross-engine deterministic with one rounded double division."""
    und = (
        edges.select(F.least(src, dst).alias("a"),
                     F.greatest(src, dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    both = und.select(F.col("a").alias("z"), F.col("b").alias("x")) \
        .unionAll(und.select(F.col("b").alias("z"), F.col("a").alias("x")))
    deg = both.groupBy("x").agg(F.count(F.lit(1)).alias("d"))
    e1, e2 = both.alias("e1"), both.alias("e2")
    inter = (
        e1.join(e2, on="z")
        .filter(F.col("e1.x") < F.col("e2.x"))
        .groupBy(F.col("e1.x").alias("a"), F.col("e2.x").alias("b"))
        .agg(F.count(F.lit(1)).alias("i"))
    )
    pairs = (
        inter
        .join(deg.select(F.col("x").alias("a"), F.col("d").alias("da")), "a")
        .join(deg.select(F.col("x").alias("b"), F.col("d").alias("db")), "b")
        .select("a", "b", F.col("i").cast("long").alias("common_neighbors"),
                F.round(F.col("i").cast("double")
                        / (F.col("da") + F.col("db") - F.col("i")), 6)
                .alias("jaccard"))
    )
    if not include_existing:
        pairs = pairs.join(und, on=["a", "b"], how="left_anti")
    return pairs


def label_propagation(edges: DataFrame, n_iters: int = 5,
                      src: str = "subj", dst: str = "obj") -> DataFrame:
    """Deterministic synchronous label propagation (Raghavan, Albert &
    Kumara 2007, "Near linear time algorithm to detect community structures
    in large-scale networks") over the undirected edge set: every node
    adopts the most frequent label among its DISTINCT neighbors each round,
    ties broken by the smallest label, for a FIXED n_iters rounds. The
    async/random-order variant of the paper is not reproducible; synchronous
    updates + a total-order tiebreak + fixed iterations make the whole run
    deterministic under any partitioning, so it is SQL-oracle-able via
    unrolled iterations (kg_communities_docs).

    Per round: one equi-join (labels are a narrow (node, label) table) +
    an integer count aggregate + a per-node row_number window whose groups
    are the node's distinct neighbor labels — bounded by degree, and a hub's
    count aggregate combines map-side, so Zipf-hot nodes never funnel raw
    neighbor rows into one task. Isolated nodes keep their own label.
    Output: (node, community)."""
    nbrs = (
        edges.select(F.col(src).alias("node"), F.col(dst).alias("nbr"))
        .unionAll(edges.select(F.col(dst).alias("node"),
                               F.col(src).alias("nbr")))
        .distinct().localCheckpoint(eager=True)
    )
    nodes = nbrs.select("node").distinct().localCheckpoint(eager=True)
    labels = nodes.withColumn("label", F.col("node"))
    w = Window.partitionBy("node").orderBy(F.desc("cnt"), F.asc("label"))
    for _ in range(n_iters):
        counts = (
            nbrs.join(labels.select(F.col("node").alias("nbr"), "label"),
                      "nbr")
            .groupBy("node", "label").agg(F.count(F.lit(1)).alias("cnt"))
        )
        picked = counts.withColumn("rn", F.row_number().over(w)) \
                       .filter(F.col("rn") == 1).select("node", "label")
        labels = (
            nodes.join(picked, "node", "left")
            .join(labels.withColumnRenamed("label", "_prev"), "node")
            .select("node", F.coalesce("label", "_prev").alias("label"))
            .localCheckpoint(eager=True)
        )
    return labels.select("node", F.col("label").alias("community"))


def k_core(edges: DataFrame, k: int = 3, n_rounds: int = 6,
           src: str = "subj", dst: str = "obj") -> DataFrame:
    """Synchronous k-core peeling (Seidman 1983 "Network structure and
    minimum degree"; distributed formulation per Montresor et al. 2013):
    each round drops every node whose degree WITHIN the surviving subgraph
    is < k, for a FIXED n_rounds — the sequential peel order is not
    reproducible under partitioning, but synchronous batch peeling is, and
    it converges to the same fixed point (the k-core is unique). Fixed
    rounds + integer degrees make the run SQL-oracle-able via unrolled
    iterations (kg_kcore_docs); callers needing guaranteed convergence pick
    n_rounds >= the peel depth (<= |V| rounds; in practice O(log |V|)).

    Per round: two semi-joins of the (node, nbr) adjacency against the
    survivor set (narrow, broadcast-able once the frontier shrinks) + an
    integer count — no row-level state, hub counts combine map-side.
    Output: (node, core_deg) for nodes still alive after n_rounds, with
    their degree inside the surviving subgraph."""
    nbrs = (
        edges.select(F.col(src).alias("node"), F.col(dst).alias("nbr"))
        .unionAll(edges.select(F.col(dst).alias("node"),
                               F.col(src).alias("nbr")))
        .distinct().localCheckpoint(eager=True)
    )
    alive = nbrs.select("node").distinct().localCheckpoint(eager=True)
    for _ in range(n_rounds):
        deg = (
            nbrs.join(alive, "node")
            .join(alive.select(F.col("node").alias("nbr")), "nbr")
            .groupBy("node").agg(F.count(F.lit(1)).alias("core_deg"))
        )
        alive = deg.filter(F.col("core_deg") >= k).select("node") \
                   .localCheckpoint(eager=True)
    deg = (
        nbrs.join(alive, "node")
        .join(alive.select(F.col("node").alias("nbr")), "nbr")
        .groupBy("node").agg(F.count(F.lit(1)).cast("long").alias("core_deg"))
    )
    return deg


def random_walks(edges: DataFrame, length: int = 4, walks_per_node: int = 1,
                 seed: int = 42, src: str = "subj",
                 dst: str = "obj") -> DataFrame:
    """Deterministic random-walk corpus generation (the DeepWalk /
    node2vec(p=q=1) data-prep stage, Perozzi et al. KDD'14): one walk of
    `length` steps starts at every node (times walks_per_node); step t moves
    from the current node to the neighbor minimizing
    md5("walk:{seed}:{walk_id}:{t}:{nbr}") — a hash-seeded uniform choice
    that is reproducible across engines, retries and partitionings (the
    rand()-free discipline every sampler in this repo follows).

    Output: (walk_id, start, path) with path = ">"-joined node sequence.
    Dead ends cannot occur on the undirected projection (every vertex in it
    has >= 1 neighbor); isolated vertices are absent from the edge list and
    so start no walk.

    Scale shape: walk state is one row per walk; each step is one equi-join
    on the current node against the adjacency list followed by a
    map-side-combinable min aggregate per walk — L joins total, each
    localCheckpointed to bound lineage. Hot vertices fan out to their degree
    in candidates before the min collapses them; AQE's skew split covers the
    join because it is a plain equi-join (never a window)."""
    if length < 1:
        raise ValueError(f"length must be >= 1, got {length}")
    if walks_per_node < 1:
        raise ValueError(f"walks_per_node must be >= 1, got {walks_per_node}")
    und = undirected(edges, src, dst).distinct().localCheckpoint(eager=True)
    starts = und.select(F.col("src").alias("start")).distinct()
    walks = starts.select(
        F.explode(F.array(*[F.lit(i) for i in range(walks_per_node)]))
        .alias("_w"), "start")
    walks = walks.select(
        F.concat_ws("#", "start", "_w").alias("walk_id"), "start",
        F.col("start").alias("cur"), F.col("start").alias("path"))
    for t in range(1, length + 1):
        cand = walks.join(und, walks["cur"] == und["src"])
        rank = F.md5(F.concat_ws(
            ":", F.lit("walk"), F.lit(str(seed)), F.col("walk_id"),
            F.lit(str(t)), F.col("dst")))
        # min() over "md5:nbr" picks the hash-argmin neighbor; the md5 is a
        # fixed 32 chars so the concatenation preserves hash-first ordering
        # and the nbr suffix both breaks (impossible) ties and rides along.
        step = (cand.select("walk_id", "start", "path",
                            F.concat(rank, F.lit(":"), F.col("dst"))
                            .alias("_key"))
                .groupBy("walk_id", "start", "path")
                .agg(F.min("_key").alias("_k"))
                .select("walk_id", "start",
                        F.substring("_k", 34, 2 ** 30).alias("cur"),
                        F.concat_ws(">", "path",
                                    F.substring("_k", 34, 2 ** 30))
                        .alias("path")))
        walks = step.localCheckpoint(eager=True)
    return walks.select("walk_id", "start", "path")


def k_truss(edges: DataFrame, k: int = 5, n_rounds: int = 6,
            src: str = "subj", dst: str = "obj") -> DataFrame:
    """k-truss decomposition (Cohen 2008): keep edges participating in at
    least k-2 triangles, recomputing support on the surviving subgraph each
    round — the cohesion filter one level stronger than k-core (every
    surviving edge has k-2 common-neighbor witnesses, so spurious
    co-occurrence links without triangle support peel away).

    Synchronous batch peeling with a fixed round count — the k_core
    discipline — so the output is deterministic under any partitioning and
    the recurrence is oracle-mirrorable round by round. Requires k >= 3:
    zero-support edges vanish from the inner-join support table, which only
    coincides with the keep-predicate when k-2 >= 1.

    Output: surviving (a, b, support) with support recomputed on the final
    subgraph.

    Scale shape: per round, support is one self-equi-join on the adjacency
    (wedge enumeration closed by an equi-join — never a cartesian) and a
    map-side-combinable count; rounds are localCheckpointed to bound
    lineage. Wedge fan-out at a hub vertex is the classic hotspot — at
    100 TB, sparsify first (min-cooccurrence threshold) exactly as the
    registered query does, and AQE skew-splits the equi-joins."""
    if k < 3:
        raise ValueError(f"k must be >= 3 for a k-truss, got {k}")
    e = (edges.select(F.least(src, dst).alias("a"),
                      F.greatest(src, dst).alias("b"))
         .filter(F.col("a") != F.col("b")).distinct()
         .localCheckpoint(eager=True))

    def support(ecur: DataFrame) -> DataFrame:
        bd = (ecur.select(F.col("a").alias("u"), F.col("b").alias("v"))
              .unionAll(ecur.select(F.col("b").alias("u"),
                                    F.col("a").alias("v"))))
        x = bd.select(F.col("u").alias("a"), F.col("v").alias("w"))
        y = bd.select(F.col("u").alias("b"), F.col("v").alias("w"))
        return (ecur.join(x, "a").join(y, ["b", "w"])
                .groupBy("a", "b")
                .agg(F.count(F.lit(1)).alias("support")))

    for _ in range(n_rounds):
        sup = support(e)
        nxt = (sup.filter(F.col("support") >= k - 2)
               .select("a", "b").localCheckpoint(eager=True))
        if nxt.count() == e.count():
            e = nxt
            break
        e = nxt
    return support(e).select(
        "a", "b", F.col("support").cast("long").alias("support"))


def modularity(edges: DataFrame, labels: DataFrame, src: str = "subj",
               dst: str = "obj") -> DataFrame:
    """Per-community Newman modularity components (Newman & Girvan 2004)
    for a given node->community assignment: with m undirected edges, the
    community's contribution to Q = Σ_c [e_c/m − (d_c/2m)²] is emitted as
    the EXACT integer fraction q_num/q_den with q_num = 4·m·e_c − d_c² and
    q_den = 4·m² — pure integer arithmetic, no float anywhere, so engines
    agree bit-for-bit and Σ q_num / q_den reconstructs Q exactly.
    Overflow bound: |q_num| <= 4m² must fit a long -> m <= ~1.5·10⁹ edges
    (beyond that, scale to e3 or decimal).

    Output: (community, n_nodes, e_in, d_tot, q_num, q_den).

    Scale shape: degree and community sums are map-side-combinable
    aggregates; the edge labeling is two broadcast-eligible equi-joins on
    the (node, community) table; the edge count broadcasts as one row."""
    e = (edges.select(F.least(src, dst).alias("a"),
                      F.greatest(src, dst).alias("b"))
         .filter(F.col("a") != F.col("b")).distinct())
    m_df = e.agg(F.count(F.lit(1)).alias("_m"))
    bd = (e.select(F.col("a").alias("node"), F.col("b").alias("nbr"))
          .unionAll(e.select(F.col("b").alias("node"),
                             F.col("a").alias("nbr"))))
    deg = bd.groupBy("node").agg(F.count(F.lit(1)).alias("_d"))
    lab = labels.select("node", "community")
    e_in = (e.join(lab.select(F.col("node").alias("a"),
                              F.col("community").alias("_ca")), "a")
             .join(lab.select(F.col("node").alias("b"),
                              F.col("community").alias("_cb")), "b")
             .filter(F.col("_ca") == F.col("_cb"))
             .groupBy(F.col("_ca").alias("community"))
             .agg(F.count(F.lit(1)).alias("e_in")))
    per_c = (lab.join(deg, "node", "left")
             .groupBy("community")
             .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"),
                  F.coalesce(F.sum("_d"), F.lit(0)).cast("long")
                  .alias("d_tot")))
    return (per_c.join(e_in, "community", "left")
            .withColumn("e_in", F.coalesce(F.col("e_in"), F.lit(0))
                        .cast("long"))
            .crossJoin(F.broadcast(m_df))
            .select("community", "n_nodes", "e_in", "d_tot",
                    F.expr("4L * _m * e_in - d_tot * d_tot").alias("q_num"),
                    F.expr("4L * _m * _m").alias("q_den")))


def degree_assortativity(edges: DataFrame, src: str = "subj",
                         dst: str = "obj") -> DataFrame:
    """Degree assortativity coefficient (Newman 2002) — the Pearson
    correlation of endpoint degrees over the directed edge list. Because the
    directed list is symmetric, the x and y marginals coincide and
    r = (n·Σxy − (Σx)²) / (n·Σx² − (Σx)²) — numerator and denominator are
    EXACT integer moments (map-side-combinable long sums), with one final
    IEEE double division rounded to 6dp; a regular graph (den = 0) yields
    NULL. Output: one row (n_dir_edges, sx, sxx, sxy, assortativity)."""
    e = (edges.select(F.least(src, dst).alias("a"),
                      F.greatest(src, dst).alias("b"))
         .filter(F.col("a") != F.col("b")).distinct())
    bd = (e.select(F.col("a").alias("node"), F.col("b").alias("nbr"))
          .unionAll(e.select(F.col("b").alias("node"),
                             F.col("a").alias("nbr"))))
    deg = bd.groupBy("node").agg(F.count(F.lit(1)).alias("_d"))
    pairs = (bd.join(deg, "node")
             .join(deg.select(F.col("node").alias("nbr"),
                              F.col("_d").alias("_dn")), "nbr"))
    mom = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_dir_edges"),
        F.sum("_d").cast("long").alias("sx"),
        F.sum(F.expr("_d * _d")).cast("long").alias("sxx"),
        F.sum(F.expr("_d * _dn")).cast("long").alias("sxy"))
    return mom.select(
        "n_dir_edges", "sx", "sxx", "sxy",
        F.when(F.expr("n_dir_edges * sxx - sx * sx") != 0,
               F.round(F.expr("CAST(n_dir_edges * sxy - sx * sx AS DOUBLE) "
                              "/ CAST(n_dir_edges * sxx - sx * sx AS DOUBLE)"),
                       6)).alias("assortativity"))


def link_prediction_scores(edges: DataFrame, src: str = "subj",
                           dst: str = "obj",
                           include_existing: bool = False) -> DataFrame:
    """The three classical integer-exact link-prediction scores side by side
    (Liben-Nowell & Kleinberg 2003) — common neighbors, Jaccard of
    neighborhoods as an e6 integer ratio, and preferential attachment
    deg(a)·deg(b). Complements adamic_adar (whose 1/ln(d) weights need float
    rounding) with scores that are pure integer arithmetic end to end.

    Shape: one wedge self-join on the middle node for common-neighbor
    counts, a broadcastable degree table joined twice, and an optional
    anti-join to drop existing edges — every join an AQE-eligible
    equi-join."""
    und = (
        edges.select(F.least(src, dst).alias("a"),
                     F.greatest(src, dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    both = und.select(F.col("a").alias("z"), F.col("b").alias("x")) \
        .unionAll(und.select(F.col("b").alias("z"), F.col("a").alias("x")))
    deg = both.groupBy("z").agg(F.count(F.lit(1)).alias("d"))
    e1, e2 = both.alias("e1"), both.alias("e2")
    pairs = (
        e1.join(e2, on="z")
        .filter(F.col("e1.x") < F.col("e2.x"))
        .groupBy(F.col("e1.x").alias("a"), F.col("e2.x").alias("b"))
        .agg(F.count(F.lit(1)).cast("long").alias("common_neighbors"))
    )
    if not include_existing:
        pairs = pairs.join(und, on=["a", "b"], how="left_anti")
    return (pairs
            .join(deg.select(F.col("z").alias("a"),
                             F.col("d").alias("_da")), "a")
            .join(deg.select(F.col("z").alias("b"),
                             F.col("d").alias("_db")), "b")
            .select(
                "a", "b", "common_neighbors",
                # |Γa ∪ Γb| = da + db - cn (a,b not adjacent when
                # include_existing=False; if adjacent, both endpoints count
                # themselves in the union — the standard convention keeps
                # the same formula, documented)
                F.expr("(common_neighbors * 1000000L) div "
                       "(_da + _db - common_neighbors)").alias("jaccard_e6"),
                F.expr("_da * _db").cast("long")
                .alias("preferential_attachment")))


def hits_scaled(edges: DataFrame, n_iters: int = 5, scale: int = 10**6,
                src: str = "subj", dst: str = "obj") -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999) over a directed/bipartite
    edge set in the repo's fixed-point discipline: every iteration sums the
    opposite side's scores (exact long sums, order-free) and renormalizes to
    a total of `scale` via integer division — no float ever enters, so the
    run is bit-identical across engines and partitionings and the recurrence
    unrolls into a SQL oracle.

    Output: (node, role, score_e6) with role in {'hub','authority'}; hubs
    are the src side, authorities the dst side. Hub docs cite many
    authoritative terms; authoritative terms are cited by good hub docs.

    Scale shape: each half-iteration is one map-side-combinable groupBy sum
    over the edge list plus a one-row total broadcast — 2·n_iters linear
    scans, no window, no driver loop over data. Overflow bound: a raw score
    is <= scale · max-degree; keep scale·deg below 2⁶³ (switch the sums to
    decimal(38,0) beyond ~10¹² edge fan-in)."""
    if n_iters <= 0:
        raise ValueError(f"n_iters must be positive, got {n_iters}")
    e = edges.select(F.col(src).alias("h_node"),
                     F.col(dst).alias("a_node")).distinct() \
        .localCheckpoint(eager=True)
    # integer-renormalization underflow guard: with more than ~scale/4
    # similarly-scored nodes on a side, every floor(raw*scale/total) is 0
    # and the next division hits a zero total — demand a larger scale
    # instead of returning NULLs
    side_max = max(
        e.select("h_node").distinct().count(),
        e.select("a_node").distinct().count())
    if side_max * 4 > scale:
        raise ValueError(
            f"hits_scaled: {side_max} nodes on one side exceeds scale/4="
            f"{scale // 4}; raise `scale` so per-node fixed-point scores "
            "cannot all underflow to zero")
    h = (e.select("h_node").distinct()
         .withColumn("h", F.lit(scale).cast("long")))
    a = None
    for _ in range(n_iters):
        araw = (e.join(h, "h_node")
                .groupBy("a_node").agg(F.sum("h").alias("_raw")))
        atot = araw.agg(F.sum("_raw").alias("_t"))
        a = (araw.crossJoin(F.broadcast(atot))
             .select("a_node", F.expr(f"(_raw * {scale}L) div _t")
                     .alias("a")).localCheckpoint(eager=True))
        hraw = (e.join(a, "a_node")
                .groupBy("h_node").agg(F.sum("a").alias("_raw")))
        htot = hraw.agg(F.sum("_raw").alias("_t"))
        h = (hraw.crossJoin(F.broadcast(htot))
             .select("h_node", F.expr(f"(_raw * {scale}L) div _t")
                     .alias("h")).localCheckpoint(eager=True))
    return (h.select(F.col("h_node").alias("node"),
                     F.lit("hub").alias("role"),
                     F.col("h").cast("long").alias("score_e6"))
            .unionByName(
                a.select(F.col("a_node").alias("node"),
                         F.lit("authority").alias("role"),
                         F.col("a").cast("long").alias("score_e6"))))


def max_spanning_forest(edges: DataFrame, src: str = "subj",
                        dst: str = "obj", weight: str = "common",
                        max_rounds: int = 32) -> DataFrame:
    """Maximum spanning forest (the KG "association backbone") via
    distributed Borůvka: each round every component picks its strongest
    incident edge — strength is the unique composite order
    (weight DESC, a ASC, b ASC), so the forest is the unique maximum
    spanning forest and the min_by argmax is tie-free and order-free —
    then picked edges contract components through the existing
    large-star/small-star machinery (canonicalize.connected_components,
    scale-adaptive driver fast path included).

    Scale shape per round: two broadcast-able equi-joins to tag endpoints
    with components, one map-side-combinable min_by per component, one CC
    over <= #components selected edges. Component count at least halves
    every round ⇒ <= ceil(log2 V) rounds, each a linear scan of the edge
    list. Returns (a, b, w): the forest's undirected edges, a < b."""
    from .canonicalize import connected_components

    spark = edges.sparkSession
    e = (edges.select(F.least(src, dst).alias("a"),
                      F.greatest(src, dst).alias("b"),
                      F.col(weight).cast("long").alias("w"))
         .filter(F.col("a") != F.col("b"))
         .groupBy("a", "b").agg(F.max("w").alias("w"))
         .localCheckpoint(eager=True))
    comp = (e.select(F.explode(F.array("a", "b")).alias("node")).distinct()
            .withColumn("c", F.col("node")).localCheckpoint(eager=True))
    chosen = spark.createDataFrame([], "a string, b string, w long")
    ordk = F.struct((-F.col("w")).alias("nw"), F.col("a"), F.col("b"))
    for _ in range(max_rounds):
        ec = (e.join(comp.select(F.col("node").alias("a"),
                                 F.col("c").alias("ca")), "a")
              .join(comp.select(F.col("node").alias("b"),
                                F.col("c").alias("cb")), "b")
              .filter(F.col("ca") != F.col("cb")))
        inc = (ec.select(F.col("ca").alias("c"), "a", "b", "w", "cb")
               .unionByName(ec.select(F.col("cb").alias("c"),
                                      "a", "b", "w",
                                      F.col("ca").alias("cb"))))
        sel = (inc.groupBy("c")
               .agg(F.min_by(F.struct("a", "b", "w", "cb"), ordk).alias("e"))
               .select("e.a", "e.b", "e.w", F.col("c").alias("ca"),
                       F.col("e.cb").alias("cb"))
               .localCheckpoint(eager=True))
        if sel.isEmpty():
            break
        chosen = (chosen.unionByName(sel.select("a", "b", "w")).distinct()
                  .localCheckpoint(eager=True))
        asn = connected_components(sel.select(F.col("ca").alias("src"),
                                              F.col("cb").alias("dst")))
        comp = (comp.join(asn, comp["c"] == asn["norm_term"], "left")
                .select("node", F.coalesce("canon", "c").alias("c"))
                .localCheckpoint(eager=True))
    return chosen


def stress_centrality(edges: DataFrame, src: str = "subj",
                      dst: str = "obj", max_hops: int = 4) -> DataFrame:
    """Stress centrality (Shimbel 1953): for each node v, the number of
    shortest s-t paths passing through v — betweenness's integer-exact
    sibling (no σ_st division), summed over unordered pairs within
    `max_hops`. Uses σ_st(v) = σ_sv · σ_vt whenever
    d(s,v) + d(v,t) = d(s,t): path counts come from a bounded all-pairs
    BFS where each frontier node's σ is the exact long sum of its
    predecessors' σ — order-free, partition-invariant, SQL-unrollable.

    Scale shape: like harmonic_centrality this is an all-pairs walk —
    state is (root, node, d, σ), i.e. O(V · reachable-within-hops); meant
    for bounded-diameter projections (concept graphs), not billion-node
    social graphs. Each hop is one equi-join + combinable sum; the final
    triple join is equi-keyed and AQE-splittable. Nodes with zero stress
    (leaves) are absent from the output."""
    e0 = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
          .filter(F.col("a") != F.col("b")).distinct())
    und = (e0.unionByName(e0.select(F.col("b").alias("a"),
                                    F.col("a").alias("b")))
           .select(F.col("a").alias("u_src"), F.col("b").alias("u_dst"))
           .distinct().localCheckpoint(eager=True))
    nodes = und.select(F.col("u_src").alias("node")).distinct()
    seen = nodes.select(F.col("node").alias("root"), "node",
                        F.lit(0).alias("d"),
                        F.lit(1).cast("long").alias("sig"))
    seen = seen.localCheckpoint(eager=True)
    frontier = seen
    for i in range(1, max_hops + 1):
        nxt = (frontier.join(und, frontier["node"] == und["u_src"])
               .groupBy("root", F.col("u_dst").alias("node"))
               .agg(F.sum("sig").alias("sig"))
               .join(seen.select("root", "node"), ["root", "node"],
                     "left_anti")
               .select("root", "node", F.lit(i).alias("d"), "sig")
               .localCheckpoint(eager=True))
        if nxt.isEmpty():
            break
        seen = seen.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    sv = seen.select(F.col("root").alias("s"), F.col("node").alias("v"),
                     F.col("d").alias("dsv"), F.col("sig").alias("sig_sv"))
    vt = seen.select(F.col("root").alias("v"), F.col("node").alias("t"),
                     F.col("d").alias("dvt"), F.col("sig").alias("sig_vt"))
    st = seen.select(F.col("root").alias("s"), F.col("node").alias("t"),
                     F.col("d").alias("dst_"))
    return (sv.filter(F.col("dsv") > 0)
            .join(vt.filter(F.col("dvt") > 0), "v")
            .join(st, ["s", "t"])
            .filter(F.col("dsv") + F.col("dvt") == F.col("dst_"))
            .groupBy(F.col("v").alias("node"))
            .agg(F.expr("sum(sig_sv * sig_vt) div 2").alias("stress")))


def betweenness_centrality(edges: DataFrame, src: str = "subj",
                           dst: str = "obj", max_hops: int = 4,
                           scale: int = 10**6) -> DataFrame:
    """Betweenness centrality, fixed-point: stress_centrality's BFS with the
    σ_st division applied — node v receives
    ⌊σ_sv·σ_vt·scale / σ_st⌋ per ordered dependent pair, summed and halved
    (each unordered pair appears twice with the identical floor, so the sum
    is even and the halving exact). The per-pair floor IS the operator's
    definition (Brandes' fractional dependency at 10⁻⁶ resolution), which
    makes it order-free and SQL-unrollable where a float σ ratio is not.
    Long-range guard: σ_sv·σ_vt·scale must fit a BIGINT (ANSI mode throws
    on overflow rather than wrapping) — meant for the same bounded-diameter
    projections as stress/harmonic."""
    e0 = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
          .filter(F.col("a") != F.col("b")).distinct())
    und = (e0.unionByName(e0.select(F.col("b").alias("a"),
                                    F.col("a").alias("b")))
           .select(F.col("a").alias("u_src"), F.col("b").alias("u_dst"))
           .distinct().localCheckpoint(eager=True))
    nodes = und.select(F.col("u_src").alias("node")).distinct()
    seen = nodes.select(F.col("node").alias("root"), "node",
                        F.lit(0).alias("d"),
                        F.lit(1).cast("long").alias("sig"))
    seen = seen.localCheckpoint(eager=True)
    frontier = seen
    for i in range(1, max_hops + 1):
        nxt = (frontier.join(und, frontier["node"] == und["u_src"])
               .groupBy("root", F.col("u_dst").alias("node"))
               .agg(F.sum("sig").alias("sig"))
               .join(seen.select("root", "node"), ["root", "node"],
                     "left_anti")
               .select("root", "node", F.lit(i).alias("d"), "sig")
               .localCheckpoint(eager=True))
        if nxt.isEmpty():
            break
        seen = seen.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    sv = seen.select(F.col("root").alias("s"), F.col("node").alias("v"),
                     F.col("d").alias("dsv"), F.col("sig").alias("sig_sv"))
    vt = seen.select(F.col("root").alias("v"), F.col("node").alias("t"),
                     F.col("d").alias("dvt"), F.col("sig").alias("sig_vt"))
    st = seen.select(F.col("root").alias("s"), F.col("node").alias("t"),
                     F.col("d").alias("dst_"), F.col("sig").alias("sig_st"))
    return (sv.filter(F.col("dsv") > 0)
            .join(vt.filter(F.col("dvt") > 0), "v")
            .join(st, ["s", "t"])
            .filter(F.col("dsv") + F.col("dvt") == F.col("dst_"))
            .groupBy(F.col("v").alias("node"))
            .agg(F.expr(f"sum((sig_sv * sig_vt * {scale}) DIV sig_st) div 2")
                 .alias("betweenness_e6")))


def simrank(edges: DataFrame, src: str = "subj", dst: str = "obj",
            c_num: int = 8, c_den: int = 10, n_iters: int = 3,
            scale: int = 10**12) -> DataFrame:
    """Fixed-point SimRank (Jeh & Widom, KDD 2002) on the undirected graph:
    "two nodes are similar when their neighbors are similar" —
    s(a,b) = C/(|N(a)||N(b)|) · Σ_{i∈N(a), j∈N(b)} s(i,j), s(a,a) = 1.
    Integer everywhere: s is a ×scale long, the update is
    (c_num · Σs) DIV (c_den · deg_a · deg_b) with C = c_num/c_den, so the
    result is aggregation-order-free and SQL-unrollable. Per iteration the
    known-similar pairs fan out through both endpoints' adjacency (cost
    Σ_{(i,j)} deg_i·deg_j) — a vocabulary-projection measure like
    stress/harmonic, not a billion-node op. Output: (a, b, simrank_scaled)
    for unordered pairs with nonzero score."""
    e0 = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
          .filter(F.col("u") != F.col("v")).distinct())
    adj = (e0.unionByName(e0.select(F.col("v").alias("u"),
                                    F.col("u").alias("v")))
           .distinct().localCheckpoint(eager=True))
    deg = adj.groupBy("u").agg(F.count(F.lit(1)).alias("d")) \
             .localCheckpoint(eager=True)
    nodes = deg.select(F.col("u").alias("node"))
    diag = nodes.select(F.col("node").alias("i"), F.col("node").alias("j"),
                        F.lit(scale).cast("long").alias("s"))
    # state: unordered (a<b) nonzero pairs; diagonal is implicit (= scale)
    state = diag.filter(F.lit(False))  # empty, same schema
    for _ in range(n_iters):
        sym = state.unionByName(
            state.select(F.col("j").alias("i"), F.col("i").alias("j"), "s")
        ).unionByName(diag)
        nxt = (
            sym.join(adj.select(F.col("u").alias("i"),
                                F.col("v").alias("a")), "i")
            .join(adj.select(F.col("u").alias("j"),
                             F.col("v").alias("b")), "j")
            .filter(F.col("a") < F.col("b"))
            .groupBy("a", "b").agg(F.sum("s").alias("sum_s"))
            .join(deg.select(F.col("u").alias("a"), F.col("d").alias("da")),
                  "a")
            .join(deg.select(F.col("u").alias("b"), F.col("d").alias("db")),
                  "b")
            .select(F.col("a").alias("i"), F.col("b").alias("j"),
                    F.expr(f"({c_num} * sum_s) DIV ({c_den} * da * db)")
                    .cast("long").alias("s"))
            .filter(F.col("s") > 0)
        )
        state = nxt.localCheckpoint(eager=True)
    return state.select(F.col("i").alias("a"), F.col("j").alias("b"),
                        F.col("s").alias("simrank_scaled"))


def maximal_independent_set(edges: DataFrame, src: str = "subj",
                            dst: str = "obj", salt: str = "mis",
                            max_rounds: int = 64) -> DataFrame:
    """Deterministic Luby-style maximal independent set: a node joins the
    set when its priority key beats every still-undecided neighbor's, then
    its neighbors drop out; repeat until no node is undecided. The priority
    is md5-u64(salt:node) rendered as a zero-padded 20-digit string
    concatenated with the node id — a strict total order identical in
    Spark and DuckDB, so rounds (and the final set) are bit-reproducible
    under any partitioning. Use for conflict-free scheduling / seeding
    (e.g. picking non-adjacent pivot entities).

    Scale shape: each round is two equi-joins against the (shrinking)
    undecided set plus an anti-join — all map-side-combinable; at least the
    globally top-priority undecided node wins every round (expected
    O(log V) rounds on bounded-degree graphs). Returns (node, mis_round):
    the members and the round that admitted them."""
    from .similarity import _md5_u64

    spark = edges.sparkSession
    e0 = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
          .filter(F.col("a") != F.col("b")).distinct())
    und = (e0.unionByName(e0.select(F.col("b").alias("a"),
                                    F.col("a").alias("b")))
           .distinct().localCheckpoint(eager=True))
    key = F.concat(
        F.lpad(_md5_u64(F.concat(F.lit(f"{salt}:"), F.col("node")))
               .cast("string"), 20, "0"),
        F.lit("|"), F.col("node"))
    undecided = (und.select(F.col("a").alias("node")).distinct()
                 .withColumn("k", key).localCheckpoint(eager=True))
    out = spark.createDataFrame([], "node string, mis_round long")
    decided = False
    for i in range(1, max_rounds + 1):
        if undecided.isEmpty():
            decided = True
            break
        ue = (und.join(undecided.select(F.col("node").alias("a"),
                                        F.col("k").alias("ka")), "a")
              .join(undecided.select(F.col("node").alias("b"),
                                     F.col("k").alias("kb")), "b"))
        losers = (ue.filter(F.col("kb") > F.col("ka"))
                  .select(F.col("a").alias("node")).distinct())
        winners = undecided.join(losers, "node", "left_anti") \
            .localCheckpoint(eager=True)
        out = out.unionByName(
            winners.select("node", F.lit(i).cast("long").alias("mis_round"))
        ).localCheckpoint(eager=True)
        excluded = (und.join(winners.select(F.col("node").alias("b")), "b")
                    .select(F.col("a").alias("node")).distinct())
        undecided = (undecided
                     .join(winners.select("node"), "node", "left_anti")
                     .join(excluded, "node", "left_anti")
                     .localCheckpoint(eager=True))
    if not decided and not undecided.isEmpty():
        raise RuntimeError(
            f"maximal_independent_set left undecided nodes after "
            f"max_rounds={max_rounds}; the result would not be maximal — "
            "raise max_rounds")
    return out


def weighted_sssp(edges: DataFrame, source: str, src: str = "subj",
                  dst: str = "obj", weight: str = "w",
                  max_rounds: int = 30, directed: bool = False) -> DataFrame:
    """Single-source shortest paths with non-negative integer edge costs —
    distributed Bellman-Ford: each round relaxes every edge once
    (one equi-join + a min aggregate, both map-side-combinable and
    order-free), converging in at most diameter rounds (checked by an O(1)
    count+bit_xor signature, same discipline as connected_components).
    Exact longs end to end ⇒ bit-identical across engines/partitionings,
    and the relaxation unrolls into a SQL oracle. Returns (node, dist) for
    every reachable node.

    Scale shape: state is the reachable frontier's (node, dist) table;
    each round costs one shuffle on dst. Negative costs are refused
    (Bellman-Ford would need the V-1 full rounds and a cycle check)."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"),
                     F.col(weight).cast("long").alias("w"))
    if e.filter(F.col("w") < 0).limit(1).count() > 0:
        raise ValueError("weighted_sssp requires non-negative edge costs")
    if not directed:
        e = e.unionByName(e.select(F.col("dst").alias("src"),
                                   F.col("src").alias("dst"), "w"))
    e = e.localCheckpoint(eager=True)
    spark = edges.sparkSession
    dist = spark.createDataFrame([(source, 0)], "node string, dist long") \
        .localCheckpoint(eager=True)
    prev_sig = None
    for _ in range(max_rounds):
        relaxed = (dist.join(e, dist["node"] == e["src"])
                   .select(F.col("dst").alias("node"),
                           (F.col("dist") + F.col("w")).alias("dist")))
        dist = (dist.unionByName(relaxed)
                .groupBy("node").agg(F.min("dist").alias("dist"))
                .localCheckpoint(eager=True))
        sig_row = dist.select(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("node", "dist")).alias("h")).collect()[0]
        sig = (sig_row["n"], sig_row["h"])
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(
            f"weighted_sssp did not converge within max_rounds="
            f"{max_rounds} (graph hop-diameter exceeds it); distances "
            "would be silently wrong — raise max_rounds")
    return dist


def densest_subgraph(edges: DataFrame, src: str = "subj", dst: str = "obj",
                     max_rounds: int = 64) -> DataFrame:
    """Densest-subgraph 2-approximation (Charikar 2000, batched peel à la
    Bahmani et al. VLDB'12): each round removes every node whose degree is
    at most the current average (compared as deg·n <= 2·e — exact integer
    cross-multiplication, no float density), records the prefix's (n, e),
    and the answer is the prefix with maximum e/n (again compared by exact
    cross-multiplication, ties → earliest round). Returns the member nodes
    of that densest prefix with its (n_nodes, n_edges).

    Scale shape: each round is one degree aggregate + two anti-joins; at
    least one node (a min-degree one) peels per round, and the batch rule
    empties real graphs in O(log n) rounds. Per-round stats are O(1) rows;
    node sets are reconstructed from a (node, removed_at) accumulator, so
    memory never holds per-round snapshots."""
    spark = edges.sparkSession
    e0 = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
          .filter(F.col("a") != F.col("b"))
          .select(F.least("a", "b").alias("a"),
                  F.greatest("a", "b").alias("b"))
          .distinct().localCheckpoint(eager=True))
    nodes = (e0.select(F.explode(F.array("a", "b")).alias("node"))
             .distinct().localCheckpoint(eager=True))
    removed = spark.createDataFrame([], "node string, removed_at long")
    cur_e, cur_n = e0, nodes
    stats: list[tuple[int, int, int]] = []
    emptied = False
    for i in range(1, max_rounds + 1):
        n_cnt = cur_n.count()
        if n_cnt == 0:
            emptied = True
            break
        e_cnt = cur_e.count()
        stats.append((i, n_cnt, e_cnt))
        bd = cur_e.select(F.col("a").alias("node")).unionByName(
            cur_e.select(F.col("b").alias("node")))
        deg = (cur_n.join(bd.groupBy("node")
                          .agg(F.count(F.lit(1)).alias("d")),
                          "node", "left")
               .select("node", F.coalesce("d", F.lit(0)).alias("d")))
        peel = (deg.filter(F.col("d") * n_cnt <= 2 * e_cnt)
                .select("node").localCheckpoint(eager=True))
        removed = removed.unionByName(
            peel.select("node", F.lit(i).cast("long").alias("removed_at"))
        ).localCheckpoint(eager=True)
        cur_n = cur_n.join(peel, "node", "left_anti") \
            .localCheckpoint(eager=True)
        cur_e = (cur_e
                 .join(peel.select(F.col("node").alias("a")), "a",
                       "left_anti")
                 .join(peel.select(F.col("node").alias("b")), "b",
                       "left_anti").localCheckpoint(eager=True))
    if not emptied:
        raise RuntimeError(
            f"densest_subgraph peel did not empty the graph within "
            f"max_rounds={max_rounds}; the 2-approximation needs the full "
            "peel — raise max_rounds")
    if not stats:
        return spark.createDataFrame(
            [], "node string, n_nodes long, n_edges long")
    best_i, best_n, best_e = stats[0]
    for i, n, e in stats[1:]:
        if e * best_n > best_e * n:
            best_i, best_n, best_e = i, n, e
    members = (nodes.join(removed, "node", "left")
               .filter(F.col("removed_at").isNull()
                       | (F.col("removed_at") >= best_i))
               .select("node", F.lit(best_n).cast("long").alias("n_nodes"),
                       F.lit(best_e).cast("long").alias("n_edges")))
    return members


def _reach_min(verts: DataFrame, edges: DataFrame, out_col: str,
               in_col: str, max_iter: int) -> DataFrame:
    """min node-id reachable from each vertex along (out_col -> in_col)
    edges, by label propagation to a fixpoint: label(v) starts at v and
    each round takes the min over successors' labels. Converges in at most
    diameter rounds; every round is one equi-join + map-side-combinable
    min aggregate, localCheckpointed to bound lineage. Returns (v, m)."""
    labels = verts.select("v", F.col("v").alias("m")).localCheckpoint(eager=True)
    for _ in range(max_iter):
        succ = (edges.join(labels, edges[in_col] == labels["v"])
                .groupBy(edges[out_col].alias("sv"))
                .agg(F.min("m").alias("sm")))
        nxt = (labels.join(succ, labels["v"] == succ["sv"], "left")
               .select("v", F.least("m", "sm").alias("m"))
               .localCheckpoint(eager=True))
        if nxt.join(labels.withColumnRenamed("m", "m0"), "v") \
              .filter(F.col("m") < F.col("m0")).isEmpty():
            return nxt
        labels = nxt
    raise RuntimeError(
        f"_reach_min did not converge within max_iter={max_iter}; raise it "
        "(bound = graph diameter)")


def _scc_driver(spark, erows: list) -> DataFrame:
    """Driver-side SCC for vocabulary-bounded edge lists: iterative Tarjan
    (explicit stack, no recursion limit). SCC membership is a property of
    the graph, not the algorithm, and scc_id = min member is algorithm-
    independent, so this is value-identical to the FW-BW peel by
    construction (test_scc_driver_path_matches_distributed pins it)."""
    adj: dict[str, list[str]] = {}
    verts: set[str] = set()
    for s, d in erows:
        adj.setdefault(s, []).append(d)
        verts.add(s)
        verts.add(d)
    index: dict[str, int] = {}
    low: dict[str, int] = {}
    on_stack: set[str] = set()
    stack: list[str] = []
    comp: dict[str, list[str]] = {}
    counter = 0
    for root in sorted(verts):
        if root in index:
            continue
        work = [(root, iter(sorted(adj.get(root, []))))]
        index[root] = low[root] = counter
        counter += 1
        stack.append(root)
        on_stack.add(root)
        while work:
            v, it = work[-1]
            advanced = False
            for w_ in it:
                if w_ not in index:
                    index[w_] = low[w_] = counter
                    counter += 1
                    stack.append(w_)
                    on_stack.add(w_)
                    work.append((w_, iter(sorted(adj.get(w_, [])))))
                    advanced = True
                    break
                if w_ in on_stack:
                    low[v] = min(low[v], index[w_])
            if advanced:
                continue
            work.pop()
            if work:
                pv = work[-1][0]
                low[pv] = min(low[pv], low[v])
            if low[v] == index[v]:
                members = []
                while True:
                    w_ = stack.pop()
                    on_stack.discard(w_)
                    members.append(w_)
                    if w_ == v:
                        break
                m = min(members)
                for u in members:
                    comp[u] = m  # type: ignore[assignment]
    rows = [(u, comp[u]) for u in sorted(comp)]
    return spark.createDataFrame(rows, "node string, scc_id string")


def strongly_connected_components(edges: DataFrame, src: str = "subj",
                                  dst: str = "obj", max_rounds: int = 20,
                                  max_iter: int = 50,
                                  driver_threshold: int = 50_000) -> DataFrame:
    """Strongly connected components of a directed graph by multi-pivot
    forward-backward peeling (Fleischer/Hendrickson/Pinar FW-BW, the
    standard distributed SCC scheme): each round computes, over the
    still-unassigned subgraph, fwdmin(v) = min id reachable FROM v and
    bwdmin(v) = min id that reaches v. fwdmin(v) == bwdmin(v) == m proves
    v <-> m mutual reachability, so v joins SCC(m); every unassigned
    vertex whose component min survives in its own peel level is assigned
    this round (ALL current pivots peel simultaneously), matched vertices
    are removed, and the process repeats. Rounds are bounded by the depth
    of the condensation DAG, not by the SCC count.

    Cross-engine-exact: labels are the node ids themselves (string min is
    deterministic), no floats anywhere, so the output matches a transitive-
    closure SQL oracle row-for-row. Output: (node, scc_id) with scc_id =
    the lexicographically smallest member.

    Scale shape: each propagation round is an equi-join on the edge list +
    a map-side-combinable min — the same shuffle profile as the WCC
    large-star/small-star loop (canonicalize.py); the peel's semi/anti
    joins reuse the assigned set, which is vertex-sized, not edge-sized.

    driver_threshold: at most this many edges → collect and run iterative
    Tarjan on the driver (_scc_driver) — value-identical by construction
    (membership and min-member id don't depend on the algorithm) and it
    removes the per-round join+checkpoint fixed cost that dominates on
    vocabulary-projected graphs. Pass 0 to force the distributed path."""
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")) \
        .filter(F.col("s") != F.col("d")).distinct() \
        .localCheckpoint(eager=True)
    if driver_threshold > 0:
        head = e.limit(driver_threshold + 1).collect()
        if len(head) <= driver_threshold:
            return _scc_driver(edges.sparkSession,
                               [(r["s"], r["d"]) for r in head])
    remaining = (e.select(F.col("s").alias("v"))
                 .union(e.select(F.col("d").alias("v")))
                 .distinct().localCheckpoint(eager=True))
    spark = edges.sparkSession
    assigned = spark.createDataFrame([], "node string, scc_id string")
    for _ in range(max_rounds):
        if remaining.isEmpty():
            return assigned
        ecur = (e.join(remaining.withColumnRenamed("v", "s"), "s", "leftsemi")
                .join(remaining.withColumnRenamed("v", "d"), "d", "leftsemi")
                .localCheckpoint(eager=True))
        fwd = _reach_min(remaining, ecur, "s", "d", max_iter) \
            .withColumnRenamed("m", "fm")
        bwd = _reach_min(remaining, ecur, "d", "s", max_iter) \
            .withColumnRenamed("m", "bm")
        hit = (fwd.join(bwd.withColumnRenamed("v", "bv"),
                        fwd["v"] == F.col("bv"))
               .filter(F.col("fm") == F.col("bm"))
               .select(F.col("v").alias("node"),
                       F.col("fm").alias("scc_id")))
        assigned = assigned.unionByName(hit).localCheckpoint(eager=True)
        remaining = (remaining.join(
            assigned.select(F.col("node").alias("v")), "v", "left_anti")
            .localCheckpoint(eager=True))
    raise RuntimeError(
        f"strongly_connected_components did not finish within max_rounds="
        f"{max_rounds}; bound = condensation-DAG depth — raise max_rounds")


def dag_longest_path_layers(edges: DataFrame, src: str = "subj",
                            dst: str = "obj", max_iter: int = 100,
                            driver_threshold: int = 50_000) -> DataFrame:
    """Longest-path layer of every vertex in a DAG: layer(v) = the length
    of the longest path ENDING at v (sources sit at layer 0) — the
    topological-depth statistic of a dependency/condensation graph, and
    the scheduling depth bound of any stage DAG built on it. Iterative
    relaxation layer(v) = max(layer(v), layer(u)+1 over u→v), which
    converges in exactly longest-path-length rounds on a DAG; a graph with
    a cycle never converges, so hitting max_iter raises instead of
    returning wrong layers (run strongly_connected_components first and
    contract). Integer-only, so cross-engine exact.

    Scale shape: each round is one equi-join + map-side-combinable max on
    the edge list, localCheckpointed. driver_threshold: small edge lists
    run the identical relaxation as a driver loop (value-identical: the
    fixpoint of an integer recurrence does not depend on evaluation
    order); pass 0 to force the distributed path."""
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")) \
        .filter(F.col("s") != F.col("d")).distinct()
    if driver_threshold > 0:
        head = e.limit(driver_threshold + 1).collect()
        if len(head) <= driver_threshold:
            erows = [(r["s"], r["d"]) for r in head]
            layer = {v: 0 for sd in erows for v in sd}
            for _ in range(max_iter):
                changed = False
                for s_, d_ in erows:
                    if layer[s_] + 1 > layer[d_]:
                        layer[d_] = layer[s_] + 1
                        changed = True
                if not changed:
                    spark = edges.sparkSession
                    return spark.createDataFrame(
                        sorted(layer.items()), "node string, layer long")
            raise RuntimeError(
                f"dag_longest_path_layers did not converge in max_iter="
                f"{max_iter} rounds — the graph has a cycle or a longer "
                "path; contract SCCs first or raise max_iter")
    e = e.localCheckpoint(eager=True)
    labels = (e.select(F.col("s").alias("v"))
              .union(e.select(F.col("d").alias("v")))
              .distinct().withColumn("layer", F.lit(0).cast("long"))
              .localCheckpoint(eager=True))
    for _ in range(max_iter):
        pred = (e.join(labels.withColumnRenamed("v", "s"), "s")
                .groupBy(F.col("d").alias("v"))
                .agg((F.max("layer") + 1).alias("cand")))
        nxt = (labels.join(pred, "v", "left")
               .select("v", F.greatest("layer", "cand").alias("layer"))
               .localCheckpoint(eager=True))
        if nxt.join(labels.withColumnRenamed("layer", "l0"), "v") \
              .filter(F.col("layer") > F.col("l0")).isEmpty():
            return nxt.select(F.col("v").alias("node"), "layer")
        labels = nxt
    raise RuntimeError(
        f"dag_longest_path_layers did not converge in max_iter={max_iter} "
        "rounds — the graph has a cycle or a longer path; contract SCCs "
        "first or raise max_iter")


def bridges(edges: DataFrame, src: str = "subj", dst: str = "obj",
            max_rounds: int = 30) -> DataFrame:
    """Bridge (cut-edge) detection — every edge e=(u,v) is probed by a BFS
    from u over the graph minus e, and e is a bridge iff v is never
    reached. All |E| probes advance together as ONE (a, b, node) frontier
    table, so each round is a single equi-join on the shared undirected
    edge list + a distinct — no per-edge driver loop, and the round count
    is bounded by the graph's hop diameter (converge-then-stop via the
    same O(1) count+bit_xor signature the other fixed-point ops use).
    Returns every undirected edge with an `is_bridge` flag.

    Scale shape: frontier state is O(|E|·|V|) worst case — like
    stress/harmonic centrality this is scoped to vocabulary-projected
    graphs (the KG entity graph after canonicalization), not raw-data
    graphs; for those, run per-component on the condensation. The BFS
    unrolls into a SQL oracle (queries._bridges_sql)."""
    e = (edges.select(F.least(src, dst).alias("a"),
                      F.greatest(src, dst).alias("b"))
         .filter(F.col("a") != F.col("b"))
         .distinct().localCheckpoint(eager=True))
    und = e.select(F.col("a").alias("s"), F.col("b").alias("d")).unionByName(
        e.select(F.col("b").alias("s"), F.col("a").alias("d"))) \
        .localCheckpoint(eager=True)
    reach = e.select("a", "b", F.col("a").alias("node")) \
        .localCheckpoint(eager=True)
    prev_sig = None
    for _ in range(max_rounds):
        grown = (reach.join(und, reach["node"] == und["s"])
                 .filter(~((F.least("s", "d") == F.col("a"))
                           & (F.greatest("s", "d") == F.col("b"))))
                 .select("a", "b", F.col("d").alias("node")))
        reach = (reach.unionByName(grown).distinct()
                 .localCheckpoint(eager=True))
        sig_row = reach.select(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("a", "b", "node")).alias("h")).collect()[0]
        sig = (sig_row["n"], sig_row["h"])
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(
            f"bridges did not converge within max_rounds={max_rounds} "
            "(graph hop-diameter exceeds it) — raise max_rounds")
    hit = (reach.filter(F.col("node") == F.col("b"))
           .select("a", "b").withColumn("reached", F.lit(True)))
    return (e.join(hit, ["a", "b"], "left")
            .select(F.col("a").alias("term_a"), F.col("b").alias("term_b"),
                    F.col("reached").isNull().alias("is_bridge")))


def articulation_points(edges: DataFrame, src: str = "subj",
                        dst: str = "obj", max_rounds: int = 30) -> DataFrame:
    """Articulation-point (cut-vertex) detection — node v is one iff its
    neighbors are not all mutually reachable in G−v, probed by a BFS from
    v's minimum neighbor with v excluded. Like `bridges`, all |V| probes
    advance together as ONE (v, node) frontier table: one equi-join per
    round + distinct, converge-then-stop on an O(1) signature. Returns
    every node with an `is_articulation` flag.

    Scale shape: O(|V|·|V|) frontier state worst case — scoped to
    vocabulary-projected KG graphs like stress centrality; unrolls into a
    SQL oracle (queries._articulation_sql)."""
    e = (edges.select(F.least(src, dst).alias("a"),
                      F.greatest(src, dst).alias("b"))
         .filter(F.col("a") != F.col("b"))
         .distinct())
    und = e.select(F.col("a").alias("s"), F.col("b").alias("d")).unionByName(
        e.select(F.col("b").alias("s"), F.col("a").alias("d"))) \
        .localCheckpoint(eager=True)
    reach = (und.groupBy(F.col("s").alias("v"))
             .agg(F.min("d").alias("node"))
             .localCheckpoint(eager=True))
    prev_sig = None
    for _ in range(max_rounds):
        grown = (reach.join(und, reach["node"] == und["s"])
                 .filter((F.col("s") != F.col("v"))
                         & (F.col("d") != F.col("v")))
                 .select("v", F.col("d").alias("node")))
        reach = (reach.unionByName(grown).distinct()
                 .localCheckpoint(eager=True))
        sig_row = reach.select(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("v", "node")).alias("h")).collect()[0]
        sig = (sig_row["n"], sig_row["h"])
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(
            f"articulation_points did not converge within max_rounds="
            f"{max_rounds} — raise max_rounds")
    # v is an articulation point iff some neighbor of v was never reached
    missing = (und.select(F.col("s").alias("v"), F.col("d").alias("node"))
               .join(reach, ["v", "node"], "left_anti")
               .select("v").distinct()
               .withColumn("cut", F.lit(True)))
    nodes = und.select(F.col("s").alias("v")).distinct()
    return (nodes.join(missing, "v", "left")
            .select(F.col("v").alias("term"),
                    F.col("cut").isNotNull().alias("is_articulation")))


def eigencentrality_scaled(edges: DataFrame, n_iters: int = 5,
                           scale: int = 10**6, src: str = "subj",
                           dst: str = "obj") -> DataFrame:
    """Eigenvector centrality (Bonacich 1972) over an undirected edge set
    in the repo's fixed-point discipline: power iteration x ← A·x with an
    exact-long neighbor sum and an integer renormalization to total
    `scale` each round — no float ever enters, so the run is bit-identical
    across engines/partitionings and unrolls into a SQL oracle. Differs
    from PageRank (no damping, no teleport, no out-degree division) and
    from HITS (one symmetric score, not hub/authority halves): score mass
    concentrates on nodes embedded in densely connected cores.

    Output: (node, score_e6). Scale shape: per iteration one
    map-side-combinable groupBy sum over the bidirected edge list + a
    one-row total broadcast — n_iters linear scans, no windows, no driver
    loop over data. Isolated nodes never appear (no edges)."""
    if n_iters <= 0:
        raise ValueError(f"n_iters must be positive, got {n_iters}")
    bd = (edges.select(F.col(src).alias("z"), F.col(dst).alias("x"))
          .unionByName(edges.select(F.col(dst).alias("z"),
                                    F.col(src).alias("x")))
          .distinct().localCheckpoint(eager=True))
    n_nodes = bd.select("z").distinct().count()
    if n_nodes * 4 > scale:
        raise ValueError(
            f"eigencentrality_scaled: {n_nodes} nodes exceeds scale/4="
            f"{scale // 4}; raise `scale` so fixed-point scores cannot "
            "all underflow to zero")
    xs = (bd.select("z").distinct()
          .withColumn("s", F.lit(scale).cast("long")))
    for _ in range(n_iters):
        raw = (bd.join(xs.withColumnRenamed("z", "x"), "x")
               .groupBy("z").agg(F.sum("s").alias("_raw")))
        tot = raw.agg(F.sum("_raw").alias("_t"))
        xs = (raw.crossJoin(F.broadcast(tot))
              .select("z", F.expr(f"(_raw * {scale}L) div _t").alias("s"))
              .localCheckpoint(eager=True))
    return xs.select(F.col("z").alias("node"),
                     F.col("s").cast("long").alias("score_e6"))


def _reach_closure(seed: DataFrame, edges: DataFrame, grow_col: str,
                   match_col: str, max_iter: int = 50) -> DataFrame:
    """Set-reachability fixpoint: starting from seed(v), repeatedly add
    edges[grow_col] wherever edges[match_col] is already reached, until no
    new vertex appears. (grow=src, match=dst) answers "reaches the seed";
    (grow=dst, match=src) answers "reachable from the seed". Every round
    is one equi-join + distinct + anti-join, localCheckpointed to bound
    lineage; converges in at most diameter rounds. Returns (v)."""
    reached = seed.select("v").distinct().localCheckpoint(eager=True)
    for _ in range(max_iter):
        new = (edges.join(reached, edges[match_col] == reached["v"])
               .select(edges[grow_col].alias("v")).distinct()
               .join(reached, "v", "left_anti")
               .localCheckpoint(eager=True))
        if new.isEmpty():
            return reached
        reached = reached.unionByName(new).localCheckpoint(eager=True)
    raise RuntimeError(
        f"_reach_closure did not converge within max_iter={max_iter}; "
        "raise it (bound = graph diameter)")


def bowtie_decomposition(edges: DataFrame, src: str = "src",
                         dst: str = "dst",
                         max_iter: int = 50) -> DataFrame:
    """Broder et al. (2000) bowtie decomposition of a directed graph:
    CORE = the largest SCC (ties broken by smallest scc_id), IN = reaches
    the core, OUT = reachable from the core, and the residue split by
    (reachable-from-IN, reaches-OUT) into TUBE / TENDRIL_IN / TENDRIL_OUT
    / DISCONNECTED. Any IN-to-residue path avoids the core by construction
    (a residue vertex reachable from the core would be OUT), so the
    textbook "avoiding the core" clauses are implied. Built from the real
    distributed pieces: the FW-BW SCC operator plus four set-reachability
    fixpoints (_reach_closure), each one equi-join + distinct per round.
    Returns (node, bowtie_class)."""
    scc = strongly_connected_components(edges, src=src, dst=dst)
    top = (scc.groupBy("scc_id").agg(F.count(F.lit(1)).alias("sz"))
           .orderBy(F.desc("sz"), F.asc("scc_id")).limit(1)
           .select("scc_id"))
    core = (scc.join(top, "scc_id")
            .select(F.col("node").alias("v")).localCheckpoint(eager=True))
    verts = (edges.select(F.col(src).alias("v"))
             .unionByName(edges.select(F.col(dst).alias("v")))
             .distinct())
    fwd = _reach_closure(core, edges, grow_col=dst, match_col=src,
                         max_iter=max_iter)
    bwd = _reach_closure(core, edges, grow_col=src, match_col=dst,
                         max_iter=max_iter)
    in_set = bwd.join(core, "v", "left_anti")
    out_set = fwd.join(core, "v", "left_anti")
    from_in = _reach_closure(in_set, edges, grow_col=dst, match_col=src,
                             max_iter=max_iter)
    to_out = _reach_closure(out_set, edges, grow_col=src, match_col=dst,
                            max_iter=max_iter)

    def flag(df, name):
        return df.select("v", F.lit(1).alias(name))

    return (verts
            .join(flag(core, "f_core"), "v", "left")
            .join(flag(in_set, "f_in"), "v", "left")
            .join(flag(out_set, "f_out"), "v", "left")
            .join(flag(from_in, "f_fi"), "v", "left")
            .join(flag(to_out, "f_to"), "v", "left")
            .select(F.col("v").alias("node"),
                    F.when(F.col("f_core") == 1, "CORE")
                    .when(F.col("f_in") == 1, "IN")
                    .when(F.col("f_out") == 1, "OUT")
                    .when((F.col("f_fi") == 1) & (F.col("f_to") == 1),
                          "TUBE")
                    .when(F.col("f_fi") == 1, "TENDRIL_IN")
                    .when(F.col("f_to") == 1, "TENDRIL_OUT")
                    .otherwise("DISCONNECTED").alias("bowtie_class")))


def bipartite_coloring(edges: DataFrame, n_rounds: int = 12,
                       src: str = "subj", dst: str = "obj") -> DataFrame:
    """Bipartiteness test via the classic BFS parity 2-coloring: color
    every node by (shortest hop distance from its component's min-label
    root) mod 2; the graph (per component) is bipartite iff that coloring
    is proper, i.e. no edge joins two same-color endpoints. Shortest-hop
    parity is independent of traversal order, so the whole test is
    deterministic under any partitioning — unlike stack-order DFS
    coloring. Components come from the REAL large-star/small-star
    operator (canonicalize.connected_components, distributed path);
    distances from n_rounds synchronous min-plus frontier relaxations
    (one narrow equi-join + min aggregate per round, the weighted_sssp
    posture — n_rounds need only exceed the hop diameter for the fixed
    point to be exact).

    Returns one row per node: (node, component, dist, color,
    comp_odd_edges, comp_bipartite)."""
    from .canonicalize import connected_components

    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    comp = (connected_components(e, driver_threshold=0)
            .select(F.col("norm_term").alias("node"),
                    F.col("canon").alias("component"))
            .localCheckpoint(eager=True))
    nbrs = undirected(e, "src", "dst").distinct().localCheckpoint(eager=True)
    dist = comp.select(
        "node",
        F.when(F.col("node") == F.col("component"), F.lit(0))
        .cast("int").alias("dist"))
    for _ in range(n_rounds):
        via = (nbrs.join(dist.select(F.col("node").alias("nbr"),
                                     F.col("dist").alias("nd")),
                         F.col("dst") == F.col("nbr"))
               .filter(F.col("nd").isNotNull())
               .groupBy(F.col("src").alias("node"))
               .agg(F.min(F.col("nd") + 1).alias("via")))
        dist = (dist.join(via, "node", "left")
                .select("node", F.least("dist", "via").alias("dist"))
                .localCheckpoint(eager=True))
    colored = (comp.join(dist, "node")
               .withColumn("color", F.pmod(F.col("dist"), F.lit(2))
                           .cast("int")))
    ca = colored.select(F.col("node").alias("src"),
                        F.col("color").alias("color_a"),
                        F.col("component").alias("cmp"))
    cb = colored.select(F.col("node").alias("dst"),
                        F.col("color").alias("color_b"))
    odd = (e.join(ca, "src").join(cb, "dst")
           .groupBy("cmp")
           .agg(F.sum(F.when(F.col("color_a") == F.col("color_b"), 1)
                      .otherwise(0)).cast("long").alias("comp_odd_edges")))
    return (colored.join(odd, colored.component == odd.cmp, "left")
            .select("node", "component", "dist", "color",
                    F.coalesce("comp_odd_edges", F.lit(0)).cast("long")
                    .alias("comp_odd_edges"))
            .withColumn("comp_bipartite", F.col("comp_odd_edges") == 0))


def salsa_scores(edges: DataFrame, src: str = "subj",
                 dst: str = "obj") -> DataFrame:
    """SALSA (Lempel & Moran 2000, "The stochastic approach for
    link-structure analysis") authority and hub scores in their exact
    closed form: the authority chain's stationary weight of node i is
    (|C_i| / |A|) · d_in(i) / Σ_{j∈C_i} d_in(j), where C_i is i's
    connected component of the CO-CITATION graph (two authorities linked
    iff they share an in-neighbor); hubs symmetrically over the
    bibliographic-coupling graph with out-degrees. No power iteration is
    needed — the closed form IS the fixed point, which makes SALSA the
    exactly-verifiable cousin of HITS (hits_scaled). All score arithmetic
    is integer: score_e9 = n_comp·deg·10⁹ // (n_side·comp_deg_sum).
    Support components run on the REAL large-star/small-star operator.

    Returns (side, node, deg, component, comp_deg_sum, n_comp, score_e9)."""
    from .canonicalize import connected_components

    e = edges.select(F.col(src).alias("src"),
                     F.col(dst).alias("dst")).distinct()

    def one_side(key: str, other: str, side_name: str) -> DataFrame:
        deg = (e.groupBy(F.col(key).alias("node"))
               .agg(F.count(F.lit(1)).cast("long").alias("deg")))
        a, b = e.alias("a"), e.alias("b")
        pairs = (a.join(b, F.col(f"a.{other}") == F.col(f"b.{other}"))
                 .filter(F.col(f"a.{key}") < F.col(f"b.{key}"))
                 .select(F.col(f"a.{key}").alias("src"),
                         F.col(f"b.{key}").alias("dst"))
                 .distinct().localCheckpoint(eager=True))
        cc = (connected_components(pairs, driver_threshold=0)
              .select(F.col("norm_term").alias("node"),
                      F.col("canon").alias("component")))
        comp = (deg.join(cc, "node", "left")
                .select("node", "deg",
                        F.coalesce("component", "node").alias("component")))
        sums = comp.groupBy("component").agg(
            F.sum("deg").alias("comp_deg_sum"),
            F.count(F.lit(1)).cast("long").alias("n_comp"))
        tot = comp.agg(F.count(F.lit(1)).cast("long").alias("n_side"))
        return (comp.join(sums, "component").crossJoin(F.broadcast(tot))
                .select(F.lit(side_name).alias("side"), "node", "deg",
                        "component",
                        F.col("comp_deg_sum").cast("long")
                        .alias("comp_deg_sum"), "n_comp",
                        F.expr("CAST((n_comp * deg * 1000000000) div "
                               "(n_side * comp_deg_sum) AS BIGINT)")
                        .alias("score_e9")))

    return (one_side("dst", "src", "authority")
            .unionByName(one_side("src", "dst", "hub")))


def voterank(edges: DataFrame, rounds: int = 5,
             src: str = "subj", dst: str = "obj") -> DataFrame:
    """VoteRank influential-spreader selection (Zhang, Lü et al. 2016,
    "Identifying a set of influential spreaders in complex networks"):
    every node starts with voting ability 1 (here 1e6 fixed point); each
    round every node's score is the sum of its neighbors' abilities, the
    max-score node is elected (ties to the lexicographically smallest
    term), its ability drops to 0 forever and each NEIGHBOR's ability is
    reduced by δ = 1/⟨k⟩ (floored e6, floored at 0) — so later rounds
    avoid picking spreaders whose audience is already covered, the
    property PageRank-style centralities lack. All arithmetic is integer
    (δ = |V|·1e6 // 2|E|), so the elected sequence is deterministic
    under any partitioning. Per round: one equi-join + sum aggregate on
    the narrow ability table; the single elected row is the only driver
    traffic. Returns (round, node, score)."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nbrs = undirected(e, "src", "dst").distinct() \
        .withColumnRenamed("src", "node").withColumnRenamed("dst", "nbr") \
        .localCheckpoint(eager=True)
    nodes = nbrs.select("node").distinct()
    n_v = nodes.count()
    n_e = e.distinct().count()
    delta = n_v * 1_000_000 // max(2 * n_e, 1)
    va = nodes.withColumn("va", F.lit(1_000_000).cast("long")) \
              .withColumn("done", F.lit(0))
    out = []
    for r in range(1, rounds + 1):
        scores = (nbrs.join(va.select(F.col("node").alias("nbr"),
                                      F.col("va").alias("nva")), "nbr")
                  .groupBy("node")
                  .agg(F.sum("nva").cast("long").alias("score")))
        cand = (va.filter(F.col("done") == 0).join(scores, "node", "left")
                .select("node", F.coalesce("score", F.lit(0))
                        .alias("score"))
                .orderBy(F.desc("score"), F.asc("node")).limit(1)
                .collect())
        if not cand:
            break
        sel, score = cand[0]["node"], int(cand[0]["score"])
        out.append((r, sel, score))
        sel_nbrs = [row["nbr"] for row in
                    nbrs.filter(F.col("node") == sel).collect()]
        va = (va.select(
            "node",
            F.when(F.col("node") == sel, 0)
            .when(F.col("node").isin(sel_nbrs),
                  F.greatest(F.col("va") - delta, F.lit(0)))
            .otherwise(F.col("va")).cast("long").alias("va"),
            F.when(F.col("node") == sel, 1).otherwise(F.col("done"))
            .alias("done")).localCheckpoint(eager=True))
    spark = edges.sparkSession
    return spark.createDataFrame(out,
                                 "round int, node string, score long")
