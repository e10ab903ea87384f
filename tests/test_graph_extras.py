"""Shortest path + connectivity repair."""

import pytest


@pytest.fixture(scope="module")
def path_edges(spark):
    rows = [("a", "R", "b"), ("b", "R", "c"), ("c", "R", "d"),
            ("a", "R", "x"), ("x", "R", "d"),   # shortcut a-x-d
            ("z1", "R", "z2")]                  # separate component
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_shortest_path(spark, path_edges):
    from knowledge_extraction_pipeline_spark.operators.graph_algos import (
        shortest_path,
    )
    p = shortest_path(path_edges, "a", "d")
    assert p == ["a", "x", "d"]
    assert shortest_path(path_edges, "a", "a") == ["a"]
    assert shortest_path(path_edges, "a", "z1") is None
    assert shortest_path(path_edges, "a", "d", max_hops=1) is None


def test_repair_connectivity(spark, path_edges):
    from knowledge_extraction_pipeline_spark.operators.graph_algos import (
        repair_connectivity,
    )
    sims = spark.createDataFrame(
        [("a", "q", 0.9), ("q", "x", 0.4), ("q", "r", 0.05), ("r", "a", 0.05)],
        "id_a string, id_b string, sim double")
    got = {(r["subj"], r["obj"]): r["sim"] for r in
           repair_connectivity(path_edges, sims).collect()}
    # q is isolated → best edge (q,a) at 0.9; r is isolated but best sim 0.05 < 0.15
    assert got == {("q", "a"): 0.9}


def test_label_propagation_planted_communities(spark):
    """Two disconnected 4-cliques: synchronous LPA must converge each clique
    to a single community (the min label) and never mix them; a pendant
    node adopts its only neighbor's community."""
    from knowledge_extraction_pipeline_spark.operators.graph_algos import (
        label_propagation,
    )
    c1, c2 = list("abcd"), list("wxyz")
    rows = [(u, "R", v) for cl in (c1, c2)
            for i, u in enumerate(cl) for v in cl[i + 1:]]
    rows.append(("a", "R", "p"))    # pendant hanging off clique 1
    e = spark.createDataFrame(rows, "subj string, pred string, obj string")
    got = {r["node"]: r["community"]
           for r in label_propagation(e, n_iters=5).collect()}
    assert len({got[n] for n in c1}) == 1
    assert len({got[n] for n in c2}) == 1
    assert got["a"] != got["w"]
    assert got["p"] == got["a"]     # pendant joins its neighbor's community


def test_k_core_planted(spark):
    """4-clique + a 3-node pendant chain: k=2 peels the chain tail-first
    (needs as many rounds as the chain is long — synchronous batch peel),
    k=3 keeps exactly the clique, k=4 empties the graph."""
    from knowledge_extraction_pipeline_spark.operators.graph_algos import (
        k_core,
    )
    clique = list("abcd")
    rows = [(u, "R", v) for i, u in enumerate(clique) for v in clique[i + 1:]]
    rows += [("a", "R", "p1"), ("p1", "R", "p2"), ("p2", "R", "p3")]
    e = spark.createDataFrame(rows, "subj string, pred string, obj string")

    k3 = {r["node"]: r["core_deg"] for r in k_core(e, k=3, n_rounds=4).collect()}
    assert k3 == {n: 3 for n in clique}

    # k=2: p3 (deg 1) falls round 1, then p2, then p1; chain+clique core = clique
    k2 = {r["node"]: r["core_deg"] for r in k_core(e, k=2, n_rounds=4).collect()}
    assert set(k2) == set(clique)

    # insufficient rounds ⇒ peel not converged yet: after 1 round only p3 gone
    k2_partial = {r["node"] for r in k_core(e, k=2, n_rounds=1).collect()}
    assert k2_partial == set(clique) | {"p1", "p2"}

    assert k_core(e, k=4, n_rounds=4).count() == 0


def test_harmonic_centrality_path_graph(spark, path_edges):
    from knowledge_extraction_pipeline_spark.operators.graph_algos import (
        harmonic_centrality,
    )
    out = {r["node"]: r for r in harmonic_centrality(path_edges).collect()}
    # component {a,b,c,d,x}: from a — b:1, x:1, c:2, d:2 (via x), so
    # harmonic(a) = 2·(1e6//1) + 2·(1e6//2), ecc 2, Σd 6, closeness 4e6//6
    a = out["a"]
    assert a["n_reached"] == 4
    assert a["eccentricity"] == 2
    assert a["sum_dist"] == 6
    assert a["harmonic_e6"] == 2 * 10**6 + 2 * 500_000
    assert a["closeness_e6"] == (4 * 10**6) // 6
    # the separate z1-z2 component never mixes in
    z = out["z1"]
    assert z["n_reached"] == 1 and z["eccentricity"] == 1
    # depth cap: with max_hops=1, a only reaches its direct neighbors
    capped = {r["node"]: r
              for r in harmonic_centrality(path_edges, max_hops=1).collect()}
    assert capped["a"]["n_reached"] == 2


def test_negative_samples_validity(spark):
    from knowledge_extraction_pipeline_spark.operators.graph_algos import (
        negative_samples,
    )
    rows = [("a", "R", "b"), ("b", "R", "c"), ("d", "R", "e"),
            ("f", "R", "g")]
    edges = spark.createDataFrame(rows,
                                  "subj string, pred string, obj string")
    out = negative_samples(edges, k=2, attempts=16)
    got = out.collect()
    assert got, "sparse graph must yield negatives"
    adj = {("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"),
           ("d", "e"), ("e", "d"), ("f", "g"), ("g", "f")}
    per_edge = {}
    for r in got:
        # a negative is never the head itself nor one of its neighbors
        assert r["neg_obj"] != r["subj"]
        assert (r["subj"], r["neg_obj"]) not in adj
        per_edge.setdefault((r["subj"], r["obj"]), []).append(r["neg_obj"])
    # k means k DISTINCT tails — colliding attempts must not eat slots
    assert all(len(v) <= 2 and len(set(v)) == len(v)
               for v in per_edge.values())
    # deterministic under repartitioning
    re = negative_samples(edges.repartition(7), k=2, attempts=16).collect()
    assert sorted(map(tuple, re)) == sorted(map(tuple, got))


def test_pagerank_driver_path_matches_distributed(spark):
    """pagerank_scaled's small-graph driver loop must equal the distributed
    iteration BIT-for-bit in all three modes (plain / weighted /
    personalized) — every step is exact integer arithmetic, so the only way
    they could diverge is a formula transcription bug; this pins it."""
    from knowledge_extraction_pipeline_spark.operators.graph_algos import (
        pagerank_scaled,
    )
    edges = spark.createDataFrame(
        [("h", "a", 9), ("h", "b", 1), ("a", "h", 1), ("b", "h", 1),
         ("c", "a", 3), ("d", "d2", None), ("e", "a", 0)],
        "subj string, obj string, common int")
    for kw in ({}, {"weight": "common"}, {"personalize": "h"},
               {"personalize": "h", "weight": "common"}):
        drv = sorted(map(tuple, pagerank_scaled(
            edges, max_iter=7, **kw).collect()))
        dist = sorted(map(tuple, pagerank_scaled(
            edges, max_iter=7, driver_threshold=0, **kw).collect()))
        assert drv == dist, kw


def test_weighted_pagerank_follows_edge_weight(spark):
    from knowledge_extraction_pipeline_spark.operators.graph_algos import (
        pagerank_scaled,
    )
    # star: hub h links to a (weight 9) and b (weight 1); unweighted they
    # tie, weighted a must outrank b
    edges = spark.createDataFrame(
        [("h", "a", 9), ("h", "b", 1), ("a", "h", 1), ("b", "h", 1)],
        "subj string, obj string, common int")
    unw = {r["node"]: r["rank_scaled"]
           for r in pagerank_scaled(edges, max_iter=10).collect()}
    assert unw["a"] == unw["b"]
    w = {r["node"]: r["rank_scaled"]
         for r in pagerank_scaled(edges, max_iter=10,
                                  weight="common").collect()}
    assert w["a"] > w["b"]
    # mass is conserved up to floor-division dust in both modes
    assert abs(sum(w.values()) - 10**12) < 10**6


def test_weighted_pagerank_drops_nonpositive_weights(spark):
    from knowledge_extraction_pipeline_spark.operators.graph_algos import (
        pagerank_scaled,
    )
    # c's only out-edge has weight 0: it must become dangling (mass
    # redistributes) rather than silently destroying its rank mass
    edges = spark.createDataFrame(
        [("a", "b", 2), ("b", "a", 2), ("c", "a", 0), ("a", "c", None)],
        "subj string, obj string, common int")
    w = {r["node"]: r["rank_scaled"]
         for r in pagerank_scaled(edges, max_iter=10,
                                  weight="common").collect()}
    assert set(w) == {"a", "b", "c"}
    # total mass conserved up to floor-division dust
    assert abs(sum(w.values()) - 10**12) < 10**6


def test_random_walks_follow_edges_and_are_deterministic(spark):
    from knowledge_extraction_pipeline_spark.operators.graph_algos import (
        random_walks,
    )
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("a", "c")],
        ["subj", "obj"],
    )
    adj = {}
    for s, o in edges.collect():
        adj.setdefault(s, set()).add(o)
        adj.setdefault(o, set()).add(s)

    out1 = {r["walk_id"]: r["path"]
            for r in random_walks(edges, length=5, seed=7).collect()}
    # every node starts exactly one walk; every step follows a real edge
    assert set(out1) == {f"{n}#0" for n in adj}
    for wid, path in out1.items():
        seq = path.split(">")
        assert len(seq) == 6  # start + 5 steps
        assert seq[0] == wid.split("#")[0]
        for u, v in zip(seq, seq[1:]):
            assert v in adj[u], f"{u}->{v} is not an edge"

    # deterministic under different parallelism
    out2 = {r["walk_id"]: r["path"]
            for r in random_walks(edges.repartition(7), length=5, seed=7)
            .collect()}
    assert out1 == out2

    # a different seed changes at least one walk on this graph
    out3 = {r["walk_id"]: r["path"]
            for r in random_walks(edges, length=5, seed=8).collect()}
    assert out1 != out3


def test_random_walks_multiple_walks_per_node(spark):
    from knowledge_extraction_pipeline_spark.operators.graph_algos import (
        random_walks,
    )
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c")], ["subj", "obj"])
    out = random_walks(edges, length=3, walks_per_node=2, seed=1).collect()
    assert len(out) == 6  # 3 nodes x 2 walks
    ids = {r["walk_id"] for r in out}
    assert ids == {f"{n}#{i}" for n in "abc" for i in (0, 1)}


def test_k_truss_planted(spark):
    from knowledge_extraction_pipeline_spark.operators.graph_algos import (
        k_truss,
    )
    # K4 on {a,b,c,d}: every edge in 2 triangles -> survives 4-truss.
    # Pendant path d-e-f: zero triangle support -> peels immediately.
    # Triangle {x,y,z} hanging off a: each of its edges has 1 triangle ->
    # peels in a 4-truss (needs support >= 2).
    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
          ("c", "d")]
    extra = [("d", "e"), ("e", "f"), ("a", "x"), ("a", "y"), ("x", "y"),
             ("x", "z"), ("y", "z")]
    edges = spark.createDataFrame(k4 + extra, ["subj", "obj"])
    out = {(r["a"], r["b"]): r["support"]
           for r in k_truss(edges, k=4, n_rounds=6).collect()}
    assert set(out) == {tuple(sorted(e)) for e in k4}
    assert all(s == 2 for s in out.values())

    with pytest.raises(ValueError):
        k_truss(edges, k=2)


def test_k_truss_cascading_peel(spark):
    from knowledge_extraction_pipeline_spark.operators.graph_algos import (
        k_truss,
    )
    # Two K4s sharing the edge (a,b): edge (a,b) has support 4, the rest 2.
    # In a 5-truss (support >= 3) the outer edges peel first, which then
    # starves (a,b) -> everything peels. One round would wrongly keep (a,b).
    e = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
         ("c", "d"), ("a", "e"), ("a", "f"), ("b", "e"), ("b", "f"),
         ("e", "f")]
    edges = spark.createDataFrame(e, ["subj", "obj"])
    assert k_truss(edges, k=5, n_rounds=6).count() == 0


def test_modularity_two_triangles_with_bridge(spark):
    from knowledge_extraction_pipeline_spark.operators.graph_algos import (
        modularity,
    )
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"),
         ("d", "e"), ("e", "f"), ("d", "f"), ("c", "d")],
        ["subj", "obj"])
    labels = spark.createDataFrame(
        [("a", 1), ("b", 1), ("c", 1), ("d", 2), ("e", 2), ("f", 2)],
        ["node", "community"])
    out = {r["community"]: r for r in modularity(edges, labels).collect()}
    # m=7; each triangle: e_in=3, d_tot=7 -> q_num = 4*7*3 - 49 = 35
    for c in (1, 2):
        assert out[c]["n_nodes"] == 3
        assert out[c]["e_in"] == 3
        assert out[c]["d_tot"] == 7
        assert out[c]["q_num"] == 35
        assert out[c]["q_den"] == 196
    # Q = 70/196 ~ 0.357 > 0: the planted split is a good partition
    assert sum(r["q_num"] for r in out.values()) / out[1]["q_den"] > 0.3


def test_assortativity_star_is_minus_one(spark):
    from knowledge_extraction_pipeline_spark.operators.graph_algos import (
        degree_assortativity,
    )
    edges = spark.createDataFrame(
        [("hub", f"leaf{i}") for i in range(5)], ["subj", "obj"])
    r = degree_assortativity(edges).collect()[0]
    assert r["n_dir_edges"] == 10
    assert r["assortativity"] == -1.0

    # regular graph (cycle): zero variance -> NULL, not a crash
    cyc = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], ["subj", "obj"])
    assert degree_assortativity(cyc).collect()[0]["assortativity"] is None


def test_link_prediction_scores_square_with_diagonal_gap(spark):
    from knowledge_extraction_pipeline_spark.operators.graph_algos import (
        link_prediction_scores,
    )
    # Square a-b-c-d-a: non-adjacent pairs (a,c) and (b,d) each share both
    # their neighbors; all degrees are 2.
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("a", "d")], ["subj", "obj"])
    out = {(r["a"], r["b"]): r
           for r in link_prediction_scores(edges).collect()}
    assert set(out) == {("a", "c"), ("b", "d")}
    for r in out.values():
        assert r["common_neighbors"] == 2
        # |union| = 2 + 2 - 2 = 2 -> Jaccard = 1.0
        assert r["jaccard_e6"] == 1_000_000
        assert r["preferential_attachment"] == 4


def test_hits_bipartite_ranking_and_partition_invariance(spark):
    from knowledge_extraction_pipeline_spark.operators.graph_algos import (
        hits_scaled,
    )
    # d1 cites t1,t2,t3; d2 cites only t1 -> d1 is the stronger hub and t1
    # (cited by both) the stronger authority; t2/t3 are symmetric so their
    # fixed-point scores must be identical.
    edges = spark.createDataFrame(
        [("d1", "t1"), ("d1", "t2"), ("d1", "t3"), ("d2", "t1")],
        ["subj", "obj"])
    out = {(r["role"], r["node"]): r["score_e6"]
           for r in hits_scaled(edges).collect()}
    assert out[("hub", "d1")] > out[("hub", "d2")]
    assert out[("authority", "t1")] > out[("authority", "t2")]
    assert out[("authority", "t2")] == out[("authority", "t3")]
    # integer renormalization: each side sums to scale minus division dust
    for role, n in (("hub", 2), ("authority", 3)):
        tot = sum(v for (ro, _), v in out.items() if ro == role)
        assert 10**6 - n < tot <= 10**6
    # fixed-point discipline => bit-identical under any partitioning
    out7 = {(r["role"], r["node"]): r["score_e6"]
            for r in hits_scaled(edges.repartition(7)).collect()}
    assert out7 == out


def test_max_spanning_forest_kruskal_by_hand(spark):
    from knowledge_extraction_pipeline_spark.operators.graph_algos import (
        max_spanning_forest,
    )
    # square + diagonal: ab(3) cd(3) beat bc(2); the (2)-tie between ac and
    # bc resolves lexicographically to ac; ad(1) always cycles. Plus a
    # disconnected pair e-f -> forest, not tree.
    edges = spark.createDataFrame(
        [("a", "b", 3), ("b", "c", 2), ("c", "d", 3), ("a", "d", 1),
         ("a", "c", 2), ("e", "f", 1)], ["subj", "obj", "common"])
    got = {(r["a"], r["b"], r["w"])
           for r in max_spanning_forest(edges).collect()}
    assert got == {("a", "b", 3), ("c", "d", 3), ("a", "c", 2),
                   ("e", "f", 1)}
    # partition invariance (unique composite order -> unique forest)
    got7 = {(r["a"], r["b"], r["w"])
            for r in max_spanning_forest(edges.repartition(7)).collect()}
    assert got7 == got


def test_stress_centrality_path_and_diamond(spark):
    from knowledge_extraction_pipeline_spark.operators.graph_algos import (
        stress_centrality,
    )
    # path a-b-c-d: b carries (a,c) and (a,d); c carries (a,d) and (b,d);
    # leaves carry nothing and are absent.
    path = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], ["subj", "obj"])
    got = {r["node"]: r["stress"] for r in stress_centrality(path).collect()}
    assert got == {"b": 2, "c": 2}
    # diamond a-b-d / a-c-d: every node carries exactly one path — b and c
    # each carry one of the two shortest a-d paths, while a carries b-a-c
    # and d carries b-d-c (each one of the two shortest b-c paths).
    dia = spark.createDataFrame(
        [("a", "b"), ("b", "d"), ("a", "c"), ("c", "d")], ["subj", "obj"])
    got = {r["node"]: r["stress"] for r in stress_centrality(dia).collect()}
    assert got == {"a": 1, "b": 1, "c": 1, "d": 1}


def test_mis_independence_maximality_determinism(spark):
    from knowledge_extraction_pipeline_spark.operators.graph_algos import (
        maximal_independent_set,
    )
    # 3x3 grid graph: MIS properties must hold whatever the hash order.
    def nid(r, c):
        return f"n{r}{c}"
    rows = []
    for r in range(3):
        for c in range(3):
            if c < 2:
                rows.append((nid(r, c), nid(r, c + 1)))
            if r < 2:
                rows.append((nid(r, c), nid(r + 1, c)))
    edges = spark.createDataFrame(rows, ["subj", "obj"])
    mis = {r["node"] for r in maximal_independent_set(edges).collect()}
    adj = set(map(tuple, rows)) | {(b, a) for a, b in rows}
    # independence: no edge inside the set
    assert not any((a, b) in adj for a in mis for b in mis)
    # maximality: every excluded node has a neighbor in the set
    allnodes = {n for e in rows for n in e}
    for n in allnodes - mis:
        assert any((n, m) in adj for m in mis)
    # determinism under partitioning
    mis7 = {r["node"]
            for r in maximal_independent_set(edges.repartition(7)).collect()}
    assert mis7 == mis


def test_weighted_sssp_prefers_cheap_detour(spark):
    import pytest

    from knowledge_extraction_pipeline_spark.operators.graph_algos import (
        weighted_sssp,
    )
    # direct a-d costs 10; detour a-b-c-d costs 3+3+3=9; unreachable z
    edges = spark.createDataFrame(
        [("a", "d", 10), ("a", "b", 3), ("b", "c", 3), ("c", "d", 3),
         ("z1", "z2", 1)], "subj string, obj string, w long")
    got = {r["node"]: r["dist"] for r in weighted_sssp(edges, "a").collect()}
    assert got == {"a": 0, "b": 3, "c": 6, "d": 9}
    # directed mode: edges only flow src->dst, so 'a' is a source-only node
    gd = {r["node"]: r["dist"]
          for r in weighted_sssp(edges, "d", directed=True).collect()}
    assert gd == {"d": 0}
    with pytest.raises(ValueError):
        weighted_sssp(spark.createDataFrame(
            [("a", "b", -1)], "subj string, obj string, w long"), "a")


def test_densest_subgraph_planted_clique(spark):
    from knowledge_extraction_pipeline_spark.operators.graph_algos import (
        densest_subgraph,
    )
    # 5-clique (density 2.0) with a pendant chain e-f-g diluting round 1
    clique = list("abcde")
    rows = [(u, v) for i, u in enumerate(clique) for v in clique[i + 1:]]
    rows += [("e", "f"), ("f", "g")]
    edges = spark.createDataFrame(rows, ["subj", "obj"])
    got = densest_subgraph(edges).collect()
    assert {r["node"] for r in got} == set(clique)
    assert got[0]["n_nodes"] == 5 and got[0]["n_edges"] == 10
    # partition invariance (exact integer thresholds)
    got7 = {r["node"] for r in densest_subgraph(edges.repartition(7))
            .collect()}
    assert got7 == set(clique)


def test_betweenness_matches_networkx(spark):
    """External cross-check: fixed-point betweenness on a random connected
    graph must equal networkx's exact betweenness (normalized=False,
    unordered pairs) to within the floor-division dust — an independent
    implementation agreeing on every node is strong evidence the σ-BFS and
    the dependency accumulation are right."""
    import random

    import networkx as nx

    from knowledge_extraction_pipeline_spark.operators.graph_algos import (
        betweenness_centrality,
    )
    rng = random.Random(11)
    g = nx.Graph()
    nodes = [f"n{i:02d}" for i in range(12)]
    g.add_edges_from((a, b) for a in nodes for b in nodes
                     if a < b and rng.random() < 0.3)
    g = g.subgraph(max(nx.connected_components(g), key=len)).copy()
    edges = spark.createDataFrame(list(g.edges()), "subj string, obj string")
    got = {r["node"]: r["betweenness_e6"] / 1e6
           for r in betweenness_centrality(edges, max_hops=12).collect()}
    want = nx.betweenness_centrality(g, normalized=False, endpoints=False)
    n_pairs = g.number_of_nodes() ** 2
    for v, bw in want.items():
        assert abs(got.get(v, 0.0) - bw) <= n_pairs / 1e6 + 1e-9, (v, bw, got.get(v))


def test_pagerank_matches_float_power_iteration(spark):
    """External cross-check: the ×10¹² integer PageRank must agree with a
    plain float power iteration (the textbook Google-matrix recurrence,
    written independently here) to ~1e-6 per node on a random directed
    graph with dangling nodes — same damping, same uniform dangling
    handling. (networkx's pagerank needs scipy, absent in this container.)"""
    import random

    from knowledge_extraction_pipeline_spark.operators.graph_algos import (
        pagerank_scaled,
    )
    rng = random.Random(7)
    nodes = [f"v{i:02d}" for i in range(14)]
    pairs = [(a, b) for a in nodes for b in nodes
             if a != b and rng.random() < 0.18]
    touched = sorted({x for p in pairs for x in p})
    edges = spark.createDataFrame(pairs, "subj string, obj string")
    got = {r["node"]: r["rank_scaled"] / 1e12
           for r in pagerank_scaled(edges, max_iter=60).collect()}

    out: dict = {}
    for a, b in pairs:
        out.setdefault(a, []).append(b)
    n, d = len(touched), 0.85
    r = {v: 1.0 / n for v in touched}
    for _ in range(200):
        dang = sum(r[v] for v in touched if v not in out)
        nxt = {v: (1 - d) / n + d * dang / n for v in touched}
        for a, succ in out.items():
            share = r[a] / len(succ)
            for b in succ:
                nxt[b] += d * share
        r = nxt
    for v in touched:
        assert abs(got[v] - r[v]) < 5e-6, (v, r[v], got[v])


def test_scc_driver_path_matches_distributed(spark):
    """strongly_connected_components' driver Tarjan must equal the FW-BW
    multi-pivot peel exactly — membership and min-member ids are algorithm-
    independent graph properties, so any divergence is a bug in one path.
    The fixture has a 3-cycle, a 2-cycle feeding it, DAG tail vertices and
    a self-contained pair reachable only one way."""
    from knowledge_extraction_pipeline_spark.operators.graph_algos import (
        strongly_connected_components,
    )
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"),        # 3-cycle {a,b,c}
         ("d", "e"), ("e", "d"),                    # 2-cycle {d,e}
         ("e", "a"),                                # bridge into the cycle
         ("c", "f"), ("f", "g"),                    # DAG tail f -> g
         ("x", "y")],                               # one-way pair
        "subj string, obj string")
    drv = sorted(map(tuple, strongly_connected_components(edges).collect()))
    dist = sorted(map(tuple, strongly_connected_components(
        edges, driver_threshold=0).collect()))
    assert drv == dist
    comp = dict(drv)
    assert comp["a"] == comp["b"] == comp["c"] == "a"
    assert comp["d"] == comp["e"] == "d"
    assert comp["f"] == "f" and comp["g"] == "g"
    assert comp["x"] == "x" and comp["y"] == "y"


def test_dag_layers_driver_path_matches_distributed(spark):
    """dag_longest_path_layers: the driver relaxation must equal the
    distributed fixpoint (same integer recurrence, evaluation order can't
    matter), and a cyclic graph must raise rather than return layers."""
    import pytest as _pytest

    from knowledge_extraction_pipeline_spark.operators.graph_algos import (
        dag_longest_path_layers,
    )
    dag = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "e"),
         ("x", "e")],  # diamond a->{b,c}->d->e plus a short side feed x->e
        "subj string, obj string")
    drv = sorted(map(tuple, dag_longest_path_layers(dag).collect()))
    dist = sorted(map(tuple, dag_longest_path_layers(
        dag, driver_threshold=0).collect()))
    assert drv == dist
    assert dict(drv) == {"a": 0, "b": 1, "c": 1, "d": 2, "e": 3, "x": 0}
    cyc = spark.createDataFrame(
        [("a", "b"), ("b", "a")], "subj string, obj string")
    with _pytest.raises(RuntimeError):
        dag_longest_path_layers(cyc, max_iter=5)
    with _pytest.raises(RuntimeError):
        dag_longest_path_layers(cyc, max_iter=5, driver_threshold=0)


def test_eigencentrality_core_concentration(spark):
    """Eigenvector centrality must rank the dense-core node above
    peripheral nodes, match a float power iteration's ranking, and sum to
    ~scale (integer renormalization invariant)."""
    from knowledge_extraction_pipeline_spark.operators.graph_algos import (
        eigencentrality_scaled,
    )
    # kite-ish: triangle a-b-c plus pendant chain c-d, d-e
    edges = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e")]
    df = spark.createDataFrame(edges, "subj string, obj string")
    out = {r.node: r.score_e6 for r in
           eigencentrality_scaled(df, n_iters=8).collect()}
    assert set(out) == {"a", "b", "c", "d", "e"}
    assert abs(sum(out.values()) - 10**6) <= len(out)  # floor rounding
    assert out["c"] == max(out.values())               # densest embedding
    assert out["e"] == min(out.values())               # periphery
    # float reference ranking (same 8 rounds, L1 normalization)
    import numpy as np
    nodes = sorted(out)
    A = np.zeros((5, 5))
    for u, v in edges:
        A[nodes.index(u), nodes.index(v)] = 1
        A[nodes.index(v), nodes.index(u)] = 1
    x = np.ones(5)
    for _ in range(8):
        x = A @ x
        x = x / x.sum()
    ref_rank = [nodes[i] for i in np.argsort(-x)]
    got_rank = sorted(nodes, key=lambda z: -out[z])
    assert got_rank == ref_rank
