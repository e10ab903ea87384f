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
