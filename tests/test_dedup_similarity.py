"""Dedup + similarity operators: MinHash/SimHash validated against exact
baselines; ANN LSH validated against brute force."""

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def test_exact_dedup_roundtrip(spark):
    from knowledge_extraction_pipeline_spark.operators.dedup import (
        exact_dedup_keep_first,
        exact_duplicates,
    )
    d = spark.createDataFrame(
        [(1, "Hello  world"), (2, "hello world"), (3, "other doc"),
         (4, "HELLO WORLD "), (5, "other doc")],
        "doc_id long, text string")
    groups = exact_duplicates(d).collect()
    sizes = sorted(r["group_size"] for r in groups)
    assert sizes == [2, 3]
    kept = sorted(r["doc_id"] for r in exact_dedup_keep_first(d).collect())
    assert kept == [1, 3]


def test_minhash_vs_exact_jaccard(spark, docs):
    """MinHash+LSH pairs at threshold t must be a subset of exact-Jaccard
    pairs at t (verification is exact), and recall high-sim pairs."""
    from knowledge_extraction_pipeline_spark.operators.dedup import (
        minhash_near_dup_pairs,
        ngram_jaccard_pairs,
    )
    exact = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(docs, threshold=0.1, block_col=None).collect()}
    mh = {(r["id_a"], r["id_b"]): r["jaccard"]
          for r in minhash_near_dup_pairs(docs, threshold=0.1).collect()}
    assert set(mh) <= set(exact)
    for k, v in mh.items():
        assert abs(v - exact[k]) < 1e-9
    # every strong pair (J >= 0.3) must be recalled by the banding
    strong = {k for k, v in exact.items() if v >= 0.3}
    assert strong <= set(mh)


def test_simhash_flags_near_identical(spark):
    from knowledge_extraction_pipeline_spark.operators.dedup import (
        simhash_near_dup_pairs,
    )
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (1, base),
        (2, base.replace("today", "tonight")),    # 1-word change
        (3, "completely different content about spark dataframes and shuffles"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in simhash_near_dup_pairs(d, max_hamming=16).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_embedding_near_dup_and_ann(spark, embs):
    from knowledge_extraction_pipeline_spark.operators.similarity import (
        brute_force_topk,
        lsh_topk,
    )
    q = embs.filter(F.col("vec_id") == 0)
    bf = brute_force_topk(embs, q, k=5).collect()
    assert len(bf) == 5
    assert [r["rank"] for r in bf] == [1, 2, 3, 4, 5]
    sims = [r["cos"] for r in bf]
    assert sims == sorted(sims, reverse=True)

    # LSH top-k returns a subset ranked consistently with brute force scores
    lsh = lsh_topk(embs, q, k=5, num_planes=4).collect()
    assert 0 < len(lsh) <= 5
    bf_all = {r["id"]: r["cos"]
              for r in brute_force_topk(embs, q, k=10**6).collect()}
    for r in lsh:
        assert abs(bf_all[r["id"]] - r["cos"]) < 1e-9


def test_ivf_topk(spark, embs):
    from knowledge_extraction_pipeline_spark.operators.similarity import (
        brute_force_topk,
        ivf_assignments,
        ivf_topk,
    )
    assigned, centroids = ivf_assignments(embs, n_centroids=4)
    got = assigned.groupBy("centroid").count().collect()
    assert sum(r["count"] for r in got) == embs.count()
    assert len(centroids) == 4

    q = embs.filter(F.col("vec_id") == 0)
    ivf = ivf_topk(embs, q, k=5, n_centroids=4, n_probe=2).collect()
    assert 0 < len(ivf) <= 5
    # scores agree with brute force for every returned candidate
    bf_all = {r["id"]: r["cos"] for r in brute_force_topk(embs, q, k=10**6).collect()}
    for r in ivf:
        assert abs(bf_all[r["id"]] - r["cos"]) < 1e-9
    # probing half the lists should recall most of the true top-5
    bf5 = {r["id"] for r in brute_force_topk(embs, q, k=5).collect()}
    assert len(bf5 & {r["id"] for r in ivf}) >= 2


def test_multimodal_plumbing(spark):
    from knowledge_extraction_pipeline_spark.sources.multimodal import (
        extract_image_features,
        frame_sample_plan,
        synthetic_media,
    )
    media = synthetic_media(spark, 30)
    feats = extract_image_features(media).collect()
    assert len(feats) == 10  # every 3rd row is an image
    for r in feats:
        assert len(r["embedding"]) == 8 and r["n_bytes"] > 0
    frames = frame_sample_plan(media, every_n_seconds=5)
    per_video = frames.groupBy("media_id").count().collect()
    assert all(r["count"] >= 2 for r in per_video)
