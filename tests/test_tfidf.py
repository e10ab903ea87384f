"""TF-IDF inverted-index similarity (reference infer_relationships_tfidf.py)."""

import math

from knowledge_extraction_pipeline_spark.operators.tfidf import (
    STOPWORDS,
    tfidf_similar_pairs,
    tfidf_weights,
)


def _py_tfidf(docs: dict[int, str]):
    """Plain-python re-implementation of the reference weighting
    (infer_relationships_tfidf.py:108-148)."""
    import re
    tok = lambda t: [w for w in t.lower().split()
                     if re.match(r"^[a-z][a-z-]*[a-z]$", w)
                     and len(w) > 2 and w not in STOPWORDS]
    tfs = {i: {} for i in docs}
    for i, t in docs.items():
        for w in tok(t):
            tfs[i][w] = tfs[i].get(w, 0) + 1
    df = {}
    for i in tfs:
        for w in tfs[i]:
            df[w] = df.get(w, 0) + 1
    n = len(docs)
    vecs = {}
    for i in tfs:
        v = {w: c * (math.log(n / (df[w] + 1)) + 1) for w, c in tfs[i].items()}
        nrm = math.sqrt(sum(x * x for x in v.values())) or 1.0
        vecs[i] = {w: x / nrm for w, x in v.items()}
    return vecs


def test_tfidf_weights_match_reference_formula(spark):
    docs = {
        1: "sparse vectors measure cosine similarity between documents",
        2: "cosine similarity between sparse documents works well",
        3: "completely unrelated topic about graph traversal algorithms",
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {(r["id"], r["token"]): r["w"]
           for r in tfidf_weights(df, max_df_ratio=1.0).collect()}
    want = _py_tfidf(docs)
    for (i, w), val in got.items():
        assert abs(val - want[i][w]) < 1e-9, (i, w)

    pairs = {(r["id_a"], r["id_b"]): r["sim"]
             for r in tfidf_similar_pairs(df, threshold=0.0,
                                          max_df_ratio=1.0).collect()}
    # exact cosine cross-check
    for (a, b), s in pairs.items():
        va, vb = want[a], want[b]
        exact = sum(va[w] * vb.get(w, 0.0) for w in va)
        assert abs(s - round(exact, 6)) < 1e-6
    # doc 1 and 2 are the most similar pair
    assert max(pairs, key=pairs.get) == (1, 2)


def test_tfidf_per_node_cap(spark):
    rows = [(i, "shared common tokens appear everywhere plus "
             f"unique{i} marker{i}") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = tfidf_similar_pairs(df, threshold=0.0, per_node_cap=3,
                              max_df_ratio=1.0)
    counts = out.groupBy("id_a").count().collect()
    assert all(r["count"] <= 3 for r in counts)


def test_hybrid_rrf_fusion(spark):
    """RRF internal consistency on real test data: every emitted score is
    exactly round(1/(60+bm25) + 1/(60+cos), 6) with absent-list ranks
    reported as 0 and contributing 0; ranks are the dense 1..k prefix."""
    from knowledge_extraction_pipeline_spark.operators.tfidf import hybrid_rrf
    from knowledge_extraction_pipeline_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    out = hybrid_rrf(load_table(spark, sf, "documents"),
                     load_table(spark, sf, "embeddings"),
                     ["spark", "join", "vector"], query_vec_id=0,
                     k=15, n_each=25).collect()
    assert [r["rank"] for r in out] == list(range(1, len(out) + 1))
    assert len(out) == 15
    for r in out:
        want = 0.0
        if r["bm25_rank"] > 0:
            want += 1.0 / (60 + r["bm25_rank"])
        if r["cos_rank"] > 0:
            want += 1.0 / (60 + r["cos_rank"])
        assert r["rrf_score"] == round(want, 6)
    # fused ordering is monotone in score
    scores = [r["rrf_score"] for r in out]
    assert scores == sorted(scores, reverse=True)
