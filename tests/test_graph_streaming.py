"""Graph analytics + streaming extract."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def small_edges(spark):
    # a -> b -> c, a -> c, d isolated-ish (d -> a)
    rows = [("a", "RELATED_TO", "b"), ("b", "RELATED_TO", "c"),
            ("a", "RELATED_TO", "c"), ("d", "RELATED_TO", "a")]
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_degree_centrality(spark, small_edges):
    from knowledge_extraction_pipeline_spark.operators.graph_algos import (
        degree_centrality,
    )
    got = {r["node"]: r["degree"] for r in degree_centrality(small_edges).collect()}
    assert got == {"a": 3, "b": 2, "c": 2, "d": 1}


def _py_pagerank(edges, damping=0.85, iters=100):
    nodes = sorted({x for e in edges for x in e})
    out = {}
    for s, t in edges:
        out.setdefault(s, []).append(t)
    n = len(nodes)
    r = {x: 1.0 / n for x in nodes}
    for _ in range(iters):
        dangling = sum(r[x] for x in nodes if x not in out)
        nr = {x: (1 - damping) / n + damping * dangling / n for x in nodes}
        for s, ts in out.items():
            share = r[s] / len(ts)
            for t in ts:
                nr[t] += damping * share
        r = nr
    return r


def test_pagerank_against_power_iteration(spark, small_edges):
    from knowledge_extraction_pipeline_spark.operators.graph_algos import pagerank

    got = {r["node"]: r["rank"] for r in pagerank(small_edges, max_iter=30).collect()}
    want = _py_pagerank([("a", "b"), ("b", "c"), ("a", "c"), ("d", "a")])
    assert got.keys() == want.keys()
    for k in want:
        assert abs(got[k] - want[k]) < 1e-3, (k, got[k], want[k])
    assert abs(sum(got.values()) - 1.0) < 1e-6


def test_k_hop(spark, small_edges):
    from knowledge_extraction_pipeline_spark.operators.graph_algos import (
        k_hop_neighborhood,
    )
    got = {r["node"]: r["hop"] for r in
           k_hop_neighborhood(small_edges, ["d"], k=2).collect()}
    assert got == {"d": 0, "a": 1, "b": 2, "c": 2}


def test_streaming_extract(spark, transcripts, tmp_path):
    """File-source stream → foreachBatch extract → same outputs as batch."""
    from knowledge_extraction_pipeline_spark.operators.extract import extract_stage
    from knowledge_extraction_pipeline_spark.streaming.stream import (
        read_transcript_stream,
        start_streaming_extract,
    )

    src = str(tmp_path / "stream_src")
    out = str(tmp_path / "stream_out")
    ckpt = str(tmp_path / "ckpt")
    # write input as several files so multiple micro-batches fire
    transcripts.limit(200).repartition(4).write.parquet(src)

    q = start_streaming_extract(read_transcript_stream(spark, src, 1), out, ckpt)
    q.awaitTermination(120)

    got = spark.read.parquet(f"{out}/mentions").drop("_batch_id")
    want, _ = extract_stage(spark.read.parquet(src))
    assert got.count() == want.count()
    assert want.exceptAll(got).count() == 0


def test_mention_rate_windows(spark, transcripts, tmp_path):
    from knowledge_extraction_pipeline_spark.streaming.stream import (
        mention_rate_windows,
        read_transcript_stream,
    )
    src = str(tmp_path / "win_src")
    transcripts.limit(100).write.parquet(src)
    agg = mention_rate_windows(read_transcript_stream(spark, src))
    q = (agg.writeStream.format("memory").queryName("mention_rates")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.sql("select * from mention_rates").collect()
    assert rows and all(r["n_turns"] > 0 for r in rows)
    assert {"win_start", "win_end", "role", "n_turns", "n_mentions"} <= set(
        spark.table("mention_rates").columns)


def test_stream_exact_dedup(spark, tmp_path):
    """Duplicate texts across micro-batches are dropped within the watermark
    horizon; distinct texts all survive."""
    import datetime as dt

    from knowledge_extraction_pipeline_spark.streaming.stream import (
        TRANSCRIPT_SCHEMA,
        read_transcript_stream,
        stream_exact_dedup,
    )
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = []
    for i in range(40):
        text = f"unique document number {i}" if i % 2 == 0 \
            else "THE  same   repeated text"
        rows.append((f"c{i}", 0, "user", text, None,
                     t0 + dt.timedelta(seconds=i)))
    src = str(tmp_path / "dedup_src")
    spark.createDataFrame(rows, TRANSCRIPT_SCHEMA) \
        .repartition(4).write.parquet(src)

    out = stream_exact_dedup(read_transcript_stream(spark, src, 1))
    q = (out.writeStream.format("memory").queryName("deduped")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("select text from deduped").collect()
    texts = [r["text"] for r in got]
    # all 20 unique texts + exactly one representative of the repeated text
    assert sorted(set(texts)) == sorted(
        {f"unique document number {i}" for i in range(0, 40, 2)}
        | {"THE  same   repeated text"})
    assert len(texts) == 21


def test_as_of_join_semantics(spark):
    """Planted cases: latest preceding right row wins; an exactly
    simultaneous right row IS visible; no preceding row → nulls (left join);
    keys never leak across."""
    import datetime as dt

    from knowledge_extraction_pipeline_spark.operators.asof import as_of_join

    t = lambda s: dt.datetime(2026, 1, 1, 12, 0, s)
    left = spark.createDataFrame(
        [(1, 100, t(10)), (2, 100, t(5)), (3, 200, t(10)), (4, 300, t(10))],
        "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(91, 100, t(3), 1.0), (92, 100, t(8), 2.0), (93, 100, t(11), 3.0),
         (94, 200, t(10), 4.0)],   # simultaneous with left event 3
        "event_id long, user_id long, ts timestamp, value double")

    got = {r["event_id"]: r for r in
           as_of_join(left, right, on="user_id", ts_col="ts",
                      right_prefix="v_").collect()}
    assert len(got) == 4
    assert got[1]["v_event_id"] == 92      # latest preceding (t8), not t3/t11
    assert got[2]["v_event_id"] == 91      # only t3 precedes t5
    assert got[3]["v_event_id"] == 94 and got[3]["v_value"] == 4.0  # same ts
    assert got[4]["v_event_id"] is None and got[4]["v_ts"] is None  # no match


def test_triangle_counts_planted(spark):
    """Planted graph: K4 on a-d (every node in 3 triangles, clustering 1.0)
    plus a pendant node e attached to a (degree 1, no triangles)."""
    from knowledge_extraction_pipeline_spark.operators.graph_algos import (
        triangle_counts,
    )
    k4 = [(x, "R", y) for i, x in enumerate("abcd") for y in "abcd"[i + 1:]]
    rows = k4 + [("a", "R", "e")]
    e = spark.createDataFrame(rows, "subj string, pred string, obj string")
    got = {r["node"]: r for r in triangle_counts(e).collect()}
    assert got["e"]["triangles"] == 0 and got["e"]["clustering"] == 0.0
    for n in "bcd":
        assert got[n]["triangles"] == 3 and got[n]["clustering"] == 1.0
    assert got["a"]["degree"] == 4 and got["a"]["triangles"] == 3
    assert got["a"]["clustering"] == 0.5  # 2*3/(4*3)


def test_as_of_join_null_ts_right_rows_ignored(spark):
    """A right row with a NULL timestamp can never satisfy ts <= left.ts —
    it must not be handed to left rows that have no real preceding match."""
    import datetime as dt

    from knowledge_extraction_pipeline_spark.operators.asof import as_of_join

    t = lambda s: dt.datetime(2026, 1, 1, 12, 0, s)
    left = spark.createDataFrame([(1, 100, t(10))],
                                 "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame([(91, 100, None, 5.0)],
                                  "event_id long, user_id long, ts timestamp, value double")
    got = as_of_join(left, right, on="user_id", right_prefix="v_").collect()
    assert len(got) == 1
    assert got[0]["v_event_id"] is None and got[0]["v_value"] is None


def test_adamic_adar_planted(spark):
    """Path graph a-b-c plus hub: (a,c) share only b (deg 2) →
    score 1/ln(2); pairs sharing the hub score 1/ln(hub_deg) — rarer
    neighbors weigh more; existing edges excluded by default."""
    import math

    from knowledge_extraction_pipeline_spark.operators.graph_algos import (
        adamic_adar,
    )
    rows = [("a", "R", "b"), ("b", "R", "c"),
            ("h", "R", "p"), ("h", "R", "q"), ("h", "R", "r"), ("h", "R", "a")]
    e = spark.createDataFrame(rows, "subj string, pred string, obj string")
    got = {(r["a"], r["b"]): r for r in adamic_adar(e).collect()}
    assert round(got[("a", "c")]["aa_score"], 6) == round(1 / math.log(2), 6)
    assert got[("a", "c")]["common_neighbors"] == 1
    # hub has degree 4 → weaker signal than the degree-2 bridge
    assert round(got[("p", "q")]["aa_score"], 6) == round(1 / math.log(4), 6)
    assert got[("a", "c")]["aa_score"] > got[("p", "q")]["aa_score"]
    # existing edges never appear in the default output
    assert ("a", "b") not in got and ("h", "p") not in got


def test_as_of_join_bucketed_equivalence(spark):
    """bucket= splits hot keys across window partitions; results must be
    IDENTICAL to the un-bucketed plan — including left rows whose bucket
    contains no right row (boundary stitch) and keys with no right rows at
    all."""
    import random

    rnd = random.Random(7)
    left = [(i, rnd.randrange(5), float(rnd.randrange(0, 1000)))
            for i in range(400)]
    right = [(1000 + i, rnd.randrange(5), float(rnd.randrange(0, 1000)),
              float(i)) for i in range(150)]
    # key 4 has no right rows at all; key 3's right rows all in one burst
    right = [r for r in right if r[1] != 4]
    right += [(2000 + i, 3, 500.0 + i, -1.0) for i in range(5)]
    l = spark.createDataFrame(left, "event_id long, user_id long, ts double")
    r = spark.createDataFrame(
        right, "event_id long, user_id long, ts double, value double")

    from knowledge_extraction_pipeline_spark.operators.asof import as_of_join
    base = sorted(map(tuple, as_of_join(l, r, on="user_id").collect()))
    for width in (50.0, 1000.0, 7.0):
        got = sorted(map(tuple,
                         as_of_join(l, r, on="user_id",
                                    bucket=width).collect()))
        assert got == base, f"bucket={width} diverged"


def test_as_of_join_hot_key_bucketed(spark):
    """One key holding ~10⁶ rows: bucketing must spread the window across
    many (key, bucket) partitions and still return exact results."""
    from pyspark.sql import functions as F

    from knowledge_extraction_pipeline_spark.operators.asof import as_of_join

    n = 1_000_000
    left = (spark.range(n)
            .select(F.col("id").alias("event_id"), F.lit(1).alias("user_id"),
                    (F.col("id") * 2 + 1).cast("double").alias("ts")))
    # right rows at every multiple of 1000 up to 1,999,000
    right = (spark.range(n // 500)
             .select((F.col("id") + 10).alias("rid"), F.lit(1).alias("user_id"),
                     (F.col("id") * 1000).cast("double").alias("ts")))
    out = as_of_join(left, right, on="user_id", bucket=10_000.0)
    # exactness spot-check on a sample + full-count invariants
    assert out.count() == n
    sample = out.filter(F.col("event_id").isin(0, 499, 500, 999_999)).collect()
    got = {r["event_id"]: r["asof_ts"] for r in sample}
    assert got[0] == 0.0           # left ts 1 → right 0
    assert got[499] == 0.0         # left ts 999 → right 0
    assert got[500] == 1000.0      # left ts 1001 → right 1000
    assert got[999_999] == 1_999_000.0  # left ts 1999999 → right 1999000
    assert out.filter(F.col("asof_ts").isNull()).count() == 0


def test_as_of_join_guards(spark):
    """Prefix collisions raise early; a map-typed right payload (not
    orderable) still joins via the hashed tiebreak."""
    import pytest as _pytest

    from knowledge_extraction_pipeline_spark.operators.asof import as_of_join

    left = spark.createDataFrame([(1, 100, 5.0, "x")],
                                 "event_id long, user_id long, ts double, asof_value string")
    right = spark.createDataFrame([(91, 100, 3.0, "a")],
                                  "rid long, user_id long, ts double, value string")
    with _pytest.raises(ValueError, match="asof_value"):
        as_of_join(left, right, on="user_id")

    l2 = spark.createDataFrame([(1, 100, 5.0)],
                               "event_id long, user_id long, ts double")
    r2 = spark.createDataFrame([(100, 3.0, {"k": "v"}), (100, 3.0, {"k": "w"})],
                               "user_id long, ts double, meta map<string,string>")
    got = as_of_join(l2, r2, on="user_id").collect()
    assert len(got) == 1 and got[0]["asof_meta"] is not None


def test_personalized_pagerank_point_mass(spark, small_edges):
    """PPR seeded at 'a': all restart + dangling mass returns to the seed,
    so (1) total mass stays ≈ scale (integer truncation only shrinks it),
    (2) the seed outranks every other node in this near-symmetric graph,
    (3) a uniform run differs — personalization actually changed the
    distribution."""
    from knowledge_extraction_pipeline_spark.operators.graph_algos import (
        pagerank_scaled,
    )
    scale = 10**12
    ppr = {r["node"]: r["rank_scaled"] for r in
           pagerank_scaled(small_edges, max_iter=30,
                           personalize="a").collect()}
    uni = {r["node"]: r["rank_scaled"] for r in
           pagerank_scaled(small_edges, max_iter=30).collect()}
    total = sum(ppr.values())
    assert 0.98 * scale < total <= scale
    assert ppr["a"] == max(ppr.values())
    assert ppr != uni
    # seed share must exceed its uniform-PageRank share (mass concentrates)
    assert ppr["a"] / total > uni["a"] / sum(uni.values())


def test_trending_terms_windows(spark, transcripts, tmp_path):
    """Windowed term counts from the stream equal a batch recount with the
    same tokenizer over the same rows (stream/batch agreement), and the
    consumer-side rank yields a coherent top-k per window."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from knowledge_extraction_pipeline_spark.operators.text_analysis import (
        _corpus_words,
    )
    from knowledge_extraction_pipeline_spark.streaming.stream import (
        read_transcript_stream,
        trending_terms_windows,
    )
    src = str(tmp_path / "trend_src")
    batch = transcripts.limit(200).cache()
    batch.write.parquet(src)
    agg = trending_terms_windows(read_transcript_stream(spark, src))
    q = (agg.writeStream.format("memory").queryName("trending")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["win_start"], r["term"]): r["n"]
           for r in spark.sql("select * from trending").collect()}
    assert got
    # batch recount with the identical tokenizer + window spec
    want = {(r["win_start"], r["term"]): r["n"] for r in (
        batch.select("ts", F.explode(_corpus_words(F.col("text")))
              .alias("term"))
        .groupBy(F.window("ts", "10 minutes", "5 minutes"), "term")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("win_start"), "term", "n")
        .collect())}
    assert got == want
    # consumer-side top-3 per window is well-formed
    top = (spark.table("trending")
           .withColumn("rk", F.row_number().over(
               Window.partitionBy("win_start")
               .orderBy(F.desc("n"), F.asc("term"))))
           .filter(F.col("rk") <= 3).collect())
    assert top and all(r["rk"] <= 3 for r in top)


def test_interval_overlap_join_grid_emits_each_pair_once(spark):
    import pytest

    from knowledge_extraction_pipeline_spark.operators.asof import (
        interval_overlap_join,
    )
    # bins of width 10; intervals deliberately span multiple cells and sit
    # on boundaries so the one-cell emission rule is what dedupes
    left = spark.createDataFrame(
        [("L1", 0, 25), ("L2", 30, 31), ("L3", 50, 40)],  # L3 inverted
        "lid string, ls long, le long")
    right = spark.createDataFrame(
        [("R1", 20, 35),   # overlaps L1 [20,25] and L2 [30,31]
         ("R2", 26, 29),   # gap: overlaps nothing
         ("R3", 0, 100)],  # overlaps both L1 and L2
        "rid string, rs long, re long")
    got = {(r["lid"], r["rid"]) for r in interval_overlap_join(
        left, right, "ls", "le", "rs", "re", bin_width=10).collect()}
    assert got == {("L1", "R1"), ("L2", "R1"), ("L1", "R3"), ("L2", "R3")}
    # exactly once each — no duplicate rows despite multi-cell overlap
    n = interval_overlap_join(left, right, "ls", "le", "rs", "re",
                              bin_width=10).count()
    assert n == 4
    with pytest.raises(ValueError):
        interval_overlap_join(left, right, "ls", "le", "rs", "re", 0)
    with pytest.raises(ValueError):
        interval_overlap_join(left, left, "ls", "le", "ls", "le", 10)
