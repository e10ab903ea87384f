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
          for r in minhash_near_dup_pairs(
              docs, threshold=0.1, pre_collapse_exact=False).collect()}
    assert set(mh) <= set(exact)
    for k, v in mh.items():
        assert abs(v - exact[k]) < 1e-9
    # every strong pair (J >= 0.3) must be recalled by the banding
    strong = {k for k, v in exact.items() if v >= 0.3}
    assert strong <= set(mh)


def test_ngram_prefix_filter_equals_brute(spark):
    """The prefix-filtered candidate path must emit the EXACT pair set the
    all-pairs self-join emits — prefix filtering is a provably-lossless
    candidate pruning, not an approximation. Checked on the real corpus at
    two thresholds, blocked and unblocked."""
    from knowledge_extraction_pipeline_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    for thr in (0.1, 0.6):
        for blk in ("lang", None):
            fast = sorted(map(tuple, ngram_jaccard_pairs(
                docs, threshold=thr, block_col=blk).collect()))
            brute = sorted(map(tuple, ngram_jaccard_pairs(
                docs, threshold=thr, block_col=blk, brute=True).collect()))
            assert fast == brute, (thr, blk, len(fast), len(brute))


def test_duplicated_spans_maximal_merge(spark):
    """A 10-token verbatim span shared by two docs must come back as ONE
    maximal span per doc (three overlapping 8-token windows merged), a
    within-doc-only repeat must NOT count (min_docs is a distinct-doc
    count), and n<2 is refused."""
    import pytest as _pytest

    from knowledge_extraction_pipeline_spark.operators.dedup import (
        duplicated_spans,
    )
    shared = " ".join(f"s{i}" for i in range(10))          # 10 shared tokens
    selfrep = " ".join(f"r{i}" for i in range(8))          # 8-token unit
    rows = [
        (1, f"a1 a2 a3 {shared} a4 a5"),                   # span at pos 4..13
        (2, f"{shared} b1 b2 b3 b4 b5 b6 b7"),             # span at pos 1..10
        (3, f"{selfrep} x1 x2 {selfrep}"),                 # repeats only in 3
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
           for r in duplicated_spans(d, n=8).collect()}
    assert got == {(1, 4, 13, 10), (2, 1, 10, 10)}, got
    with _pytest.raises(ValueError):
        duplicated_spans(d, n=1)


def test_ngram_prefix_filter_prunes_single_block(spark):
    """On a one-block corpus of mutually-dissimilar docs the prefix join must
    generate FAR fewer candidates than the n(n−1)/2 an all-pairs self-join
    would — the O(n²) single-language straggler is the case this kills."""
    from pyspark.sql import functions as SF

    from knowledge_extraction_pipeline_spark.operators.dedup import (
        _prefix_candidates,
    )
    from knowledge_extraction_pipeline_spark.functions.text import (
        word_shingles,
    )
    n = 200
    rows = [(i, " ".join(f"w{i}x{j}" for j in range(12))) for i in range(n)]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    sh = docs.select(
        SF.col("doc_id").alias("id"), SF.lit("all").alias("blk"),
        SF.array_distinct(word_shingles(SF.col("text"), 3)).alias("sh"),
    ).withColumn("n", SF.size("sh"))
    got = _prefix_candidates(sh, 0.6).count()
    assert got < n * (n - 1) / 2 / 10, got  # ≪ 19900 all-pairs candidates


def test_simhash_flags_near_identical(spark):
    """The planted (1,2) pair has hamming distance exactly 4 — outside the
    4x16-bit blocking guarantee (radius 3) but inside the 8x8-bit one
    (radius 7). The old max_hamming=8 default silently relied on luck here."""
    import pytest as _pytest

    from knowledge_extraction_pipeline_spark.operators.dedup import (
        simhash_near_dup_pairs,
    )
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (1, base),
        (2, base.replace("today", "tonight")),    # 1-word change → hamming 4
        (3, "completely different content about spark dataframes and shuffles"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in simhash_near_dup_pairs(d, max_hamming=7).collect()}
    assert pairs.get((1, 2)) == 4  # guaranteed by 8x8 pigeonhole, not luck
    assert (1, 3) not in pairs and (2, 3) not in pairs

    # the default radius (3) must exclude the hamming-4 pair, not miss it
    strict = {(r["id_a"], r["id_b"])
              for r in simhash_near_dup_pairs(d).collect()}
    assert (1, 2) not in strict

    # radii beyond the blocking guarantee are refused, never silently lossy
    with _pytest.raises(ValueError):
        simhash_near_dup_pairs(d, max_hamming=16)


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


def test_embedding_lsh_matches_brute_force(spark):
    """Planted near-dup clusters: the default (LSH-blocked) path must return
    exactly the pairs the brute-force baseline returns — recall through the
    banding, precision through the exact-cosine verify."""
    import numpy as np

    from knowledge_extraction_pipeline_spark.operators.dedup import (
        embedding_near_dup_pairs,
    )
    rng = np.random.default_rng(7)
    rows = []
    vid = 0
    for c in range(12):                      # 12 clusters of 4 near-dups
        center = rng.standard_normal(64)
        center /= np.linalg.norm(center)
        for _ in range(4):
            v = center + rng.standard_normal(64) * 0.02   # cos ≈ 0.97
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    for _ in range(60):                      # unrelated background vectors
        v = rng.standard_normal(64)
        rows.append((vid, [float(x) for x in v]))
        vid += 1
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    brute = {(r["id_a"], r["id_b"]): r["cos"]
             for r in embedding_near_dup_pairs(
                 embs, threshold=0.9, method="brute").collect()}
    lsh = {(r["id_a"], r["id_b"]): r["cos"]
           for r in embedding_near_dup_pairs(
               embs, threshold=0.9, method="lsh").collect()}
    assert len(brute) >= 12 * 6  # sanity: the planted pairs exist
    assert lsh == brute

    # and the default plan must not contain a cartesian product
    plan = embedding_near_dup_pairs(embs, threshold=0.9)._jdf \
        .queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_minhash_flood_guards(spark):
    """Degenerate-corpus guards: 3000 identical docs collapse to one
    representative before hashing (no g² candidate blowup), and an oversized
    band bucket of *distinct* texts is dropped by bucket_cap."""
    from knowledge_extraction_pipeline_spark.operators.dedup import (
        minhash_near_dup_pairs,
    )
    flood = [(i, "the same document text repeated verbatim in every row here")
             for i in range(3000)]
    flood += [(9001, "an unrelated document about distributed query engines"),
              (9002, "an unrelated document about distributed query engine")]
    d = spark.createDataFrame(flood, "doc_id long, text string")
    pairs = minhash_near_dup_pairs(d, threshold=0.3).collect()
    ids = {x for r in pairs for x in (r["id_a"], r["id_b"])}
    assert 0 not in ids or all(
        not (0 < r["id_a"] < 3000 and 0 < r["id_b"] < 3000) for r in pairs
    )  # no intra-flood pair survives pre-collapse
    assert (9001, 9002) in {(r["id_a"], r["id_b"]) for r in pairs}

    # bucket_cap drops oversize buckets instead of joining them
    near = [(i, f"shared prefix words forming most shingles here variant {i}")
            for i in range(300)]
    d2 = spark.createDataFrame(near, "doc_id long, text string")
    capped = minhash_near_dup_pairs(d2, threshold=0.1, bucket_cap=10).count()
    uncapped = minhash_near_dup_pairs(d2, threshold=0.1, bucket_cap=None).count()
    assert capped < uncapped


def test_ann_metadata_filter(spark, embs):
    """`where` pre-filter (reference collection.query(where=...)): results
    equal brute-force over the manually filtered corpus, and never contain
    an excluded row."""
    from knowledge_extraction_pipeline_spark.operators.similarity import (
        brute_force_topk,
        lsh_topk,
    )
    q = embs.filter(F.col("vec_id") == 0)
    got = brute_force_topk(embs, q, k=5, where=F.col("label") == 2).collect()
    manual = brute_force_topk(embs.filter(F.col("label") == 2), q, k=5).collect()
    assert [(r["id"], r["cos"]) for r in got] == [(r["id"], r["cos"]) for r in manual]
    allowed = {r["vec_id"] for r in embs.filter(F.col("label") == 2).collect()}
    assert all(r["id"] in allowed for r in got)

    lsh = lsh_topk(embs, q, k=5, num_planes=4, where="label = 2").collect()
    assert all(r["id"] in allowed for r in lsh)


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


def test_simhash_flood_guards(spark):
    """SimHash mirror of the MinHash degenerate-corpus guards: a flood of
    identical texts lands on ONE signature — pre_collapse_identical folds it
    to a single representative before blocking (no g² block self-join) — and
    block_cap drops oversize blocks of *distinct* signatures."""
    from knowledge_extraction_pipeline_spark.operators.dedup import (
        simhash_near_dup_pairs,
    )
    near_base = ("an unrelated document about distributed query engines and "
                 "the many optimizations they perform on large analytical "
                 "workloads every day")
    flood = [(i, "the same document text repeated verbatim in every row here")
             for i in range(5000)]
    flood += [(9001, near_base),
              (9002, near_base.replace("day", "night"))]  # hamming 2
    d = spark.createDataFrame(flood, "doc_id long, text string")
    pairs = simhash_near_dup_pairs(d, max_hamming=3).collect()
    # no intra-flood pair survives the signature collapse
    assert not any(r["id_a"] < 5000 and r["id_b"] < 5000 for r in pairs)
    # the planted near-dup pair is still found
    assert (9001, 9002) in {(r["id_a"], r["id_b"]) for r in pairs}

    # block_cap drops hot blocks instead of joining them
    near = [(i, f"shared base words forming the whole signature variant {i}")
            for i in range(300)]
    d2 = spark.createDataFrame(near, "doc_id long, text string")
    capped = simhash_near_dup_pairs(d2, max_hamming=7, block_cap=10).count()
    uncapped = simhash_near_dup_pairs(d2, max_hamming=7, block_cap=None).count()
    assert capped < uncapped


def test_ivf_matches_single_process_fixture(spark):
    """The distributed IVF plan must equal the plain-Python single-process
    evaluation of the same spec (the driver checks sf0.01; this pins the
    second dataset)."""
    from knowledge_extraction_pipeline_spark.ivf_fixture import IVF_TOPK
    from knowledge_extraction_pipeline_spark.operators.similarity import ivf_topk

    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = embs.filter(F.col("vec_id").isin(0, 1, 2))
    got = sorted((r["query_id"], r["id"], r["cos"], r["rank"])
                 for r in ivf_topk(embs, q, k=10, n_centroids=8,
                                   n_probe=2).collect())
    assert got == sorted(IVF_TOPK["0.001"])


def test_ivf_recall_vs_brute(spark):
    """IVF recall knob: at n_centroids=64 on the sf0.01 embeddings, recall
    vs brute-force top-10 must clear 0.9 and grow with n_probe. These
    synthetic embeddings are ISOTROPIC (median pairwise cosine ~0, no cluster
    structure), the worst case for IVF — clearing 0.9 takes probing half the
    codebook here, where clustered real embeddings need a few lists; the test
    pins that the n_probe/recall tradeoff works, not a data-dependent
    constant."""
    from knowledge_extraction_pipeline_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )
    embs = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").cache()
    q = embs.filter(F.col("vec_id") < 20)

    def topsets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["query_id"], set()).add(r["id"])
        return out

    truth = topsets(brute_force_topk(embs, q, k=10))

    def recall(n_probe):
        got = topsets(ivf_topk(embs, q, k=10, n_centroids=64, n_probe=n_probe))
        return sum(len(got.get(qid, set()) & t) for qid, t in truth.items()) \
            / sum(len(t) for t in truth.values())

    r_lo, r_hi = recall(8), recall(32)
    assert r_hi >= 0.9
    assert r_hi > r_lo


def test_ivf_sqrt_n_default(spark):
    """n_centroids=None sizes the codebook ~sqrt(n)."""
    from knowledge_extraction_pipeline_spark.operators.similarity import (
        ivf_assignments,
    )
    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    asn, centroids = ivf_assignments(embs, n_centroids=None, n_iters=1)
    assert len(centroids) == 22  # round(sqrt(500))
    assert asn.select("centroid").distinct().count() <= 22


def test_lsh_bucket_dim_guard(spark):
    """A dim/vector-length mismatch must raise, not silently collapse every
    vector into bucket 0 (zip_with null-pads the shorter array)."""
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    from knowledge_extraction_pipeline_spark.functions.vectors import lsh_bucket

    d = spark.createDataFrame([(1, [0.1, 0.2, 0.3])], "id long, v array<double>")
    with _pytest.raises((Py4JJavaError, Exception)):
        d.select(lsh_bucket(F.col("v"), 4, dim=8).alias("b")).collect()


def test_lsh_bucket_null_vector_gets_null_bucket(spark):
    """A NULL embedding maps to a NULL bucket (dropped by the bucketed
    equi-join) — one bad row must not abort a whole job (ADVICE r3)."""
    from knowledge_extraction_pipeline_spark.functions.vectors import lsh_bucket

    d = spark.createDataFrame(
        [(1, [0.1, 0.2, 0.3]), (2, None)], "id long, v array<double>")
    got = {r["id"]: r["b"] for r in
           d.select("id", lsh_bucket(F.col("v"), 4, dim=3).alias("b"))
           .collect()}
    assert got[1] is not None and got[2] is None


def test_multimodal_real_decode(spark):
    """REAL decoders: BMP pixel round-trip (encode → decode is identity) and
    WAV PCM decode (stdlib wave) with sane features."""
    import numpy as np

    from knowledge_extraction_pipeline_spark.sources.multimodal import (
        decode_bmp,
        encode_bmp,
        decode_ppm,
        extract_audio_features,
        extract_image_features_real,
        synthetic_bmp_media,
    )
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(13, 21, 3), dtype=np.uint8)
    w, h, back = decode_bmp(encode_bmp(px))
    assert (w, h) == (21, 13) and (back == px).all()

    ppm = b"P6\n21 13\n255\n" + px.tobytes()
    w2, h2, back2 = decode_ppm(ppm)
    assert (w2, h2) == (21, 13) and (back2 == px).all()

    media = synthetic_bmp_media(spark, 30)
    feats = {r["media_id"]: r for r in extract_image_features_real(media).collect()}
    assert len(feats) == 10
    assert all(0.0 <= f["r_mean"] <= 255.0 and len(f["embedding"]) == 12
               for f in feats.values())

    audio = {r["media_id"]: r for r in extract_audio_features(media).collect()}
    assert len(audio) == 10
    for a in audio.values():
        assert a["sample_rate"] == 8000 and a["n_samples"] >= 400
        assert 7000 < a["rms"] < 10000        # sine at amplitude 12000
        assert a["zero_crossings"] > 10


def test_pq_topk_recall(spark):
    """PQ-ADC shortlist + exact re-rank: recall >=0.85 vs brute-force top-10
    at m=16 subspaces x 16 codes, shortlist=100 on the sf0.01 embeddings
    (isotropic — PQ's worst case, same caveat as the IVF test), and the
    shortlist knob trades recall for scan size."""
    from knowledge_extraction_pipeline_spark.operators.similarity import (
        brute_force_topk,
        pq_topk,
    )
    embs = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").cache()
    q = embs.filter(F.col("vec_id") < 20)

    def topsets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["query_id"], set()).add(r["id"])
        return out

    truth = topsets(brute_force_topk(embs, q, k=10))

    def recall(shortlist):
        got = topsets(pq_topk(embs, q, k=10, m=16, n_codes=16,
                              shortlist=shortlist))
        return sum(len(got.get(qid, set()) & t) for qid, t in truth.items()) \
            / sum(len(t) for t in truth.values())

    r_hi = recall(100)
    assert r_hi >= 0.85
    assert r_hi > recall(25)
    # returned scores are EXACT cosines (the re-rank is not approximate)
    got = pq_topk(embs, q.limit(1), k=5, m=16, n_codes=16, shortlist=100)
    bf = {(r["query_id"], r["id"]): r["cos"]
          for r in brute_force_topk(embs, q.limit(1), k=10**6).collect()}
    for r in got.collect():
        assert abs(bf[(r["query_id"], r["id"])] - r["cos"]) < 1e-9


def test_ivf_pq_topk_recall(spark):
    """IVF-PQ composition: coarse-list pruning + ADC code scoring + exact
    re-rank. Both prunings compound, so recall is below either alone on this
    isotropic worst-case data — >=0.8 at n_probe=32/64 lists, monotone in
    n_probe, scores exact."""
    from knowledge_extraction_pipeline_spark.operators.similarity import (
        brute_force_topk,
        ivf_pq_topk,
    )
    embs = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").cache()
    q = embs.filter(F.col("vec_id") < 20)

    def topsets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["query_id"], set()).add(r["id"])
        return out

    truth = topsets(brute_force_topk(embs, q, k=10))

    def recall(n_probe):
        got = topsets(ivf_pq_topk(embs, q, k=10, n_centroids=64,
                                  n_probe=n_probe, m=16, n_codes=16,
                                  shortlist=100))
        return sum(len(got.get(qid, set()) & t) for qid, t in truth.items()) \
            / sum(len(t) for t in truth.values())

    r_hi = recall(32)
    assert r_hi >= 0.8
    assert r_hi > recall(8)


def test_ivf_probe_df_path_matches_driver_path(spark, monkeypatch):
    """The DataFrame probe-selection path (used for large query sets) must
    rank identically to the driver loop — forced via _DRIVER_PROBE_MAX=0."""
    from knowledge_extraction_pipeline_spark.operators import similarity as S

    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = embs.limit(6)
    base = S.ivf_topk(embs, q, k=5, n_centroids=8, n_probe=2).collect()
    monkeypatch.setattr(S, "_DRIVER_PROBE_MAX", 0)
    forced = S.ivf_topk(embs, q, k=5, n_centroids=8, n_probe=2).collect()
    assert sorted(map(tuple, forced)) == sorted(map(tuple, base))

    base_pq = S.ivf_pq_topk(embs, q, k=5, n_centroids=8, n_probe=4,
                            m=8, n_codes=8, shortlist=50).collect()
    monkeypatch.undo()
    monkeypatch.setattr(S, "_DRIVER_PROBE_MAX", 0)
    # already 0 — verify pq path with DF probes equals itself run twice is
    # trivial; instead compare against driver path:
    monkeypatch.setattr(S, "_DRIVER_PROBE_MAX", 512)
    driver_pq = S.ivf_pq_topk(embs, q, k=5, n_centroids=8, n_probe=4,
                              m=8, n_codes=8, shortlist=50).collect()
    assert sorted(map(tuple, base_pq)) == sorted(map(tuple, driver_pq))


def test_residual_table_df_path_matches_driver_path(spark, monkeypatch):
    """ivf_pq_residual_topk's distributed branch (probe ranking via _probe_df
    + residual ADC tables built as a job) must rank BIT-identically to the
    driver loop — same left-to-right folds, same HALF_UP-at-repr rounding.
    Forced via _DRIVER_PROBE_MAX=0."""
    from knowledge_extraction_pipeline_spark.operators import similarity as S

    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = embs.limit(6)
    kw = dict(k=5, n_centroids=8, n_probe=2, m=8, n_codes=8, shortlist=50)
    base = S.ivf_pq_residual_topk(embs, q, **kw).collect()
    monkeypatch.setattr(S, "_DRIVER_PROBE_MAX", 0)
    forced = S.ivf_pq_residual_topk(embs, q, **kw).collect()
    assert sorted(map(tuple, forced)) == sorted(map(tuple, base))


def test_residual_large_query_set_completes(spark):
    """1000 queries through ivf_pq_residual_topk: the ADC tables must be
    built in the cluster (|Q|·n_probe·m·n_codes rows would be a driver-side
    Python loop of ~10⁶ tuples otherwise) and the query set never collected."""
    import time

    from knowledge_extraction_pipeline_spark.operators.similarity import (
        ivf_pq_residual_topk,
    )
    embs = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    q = embs.limit(1000)
    t0 = time.time()
    out = ivf_pq_residual_topk(embs, q, k=3, n_centroids=16, n_probe=2,
                               m=8, n_codes=8, shortlist=20)
    n = out.count()
    wall = time.time() - t0
    assert n > 900 * 3
    assert wall < 300, f"1k-query residual IVFADC took {wall:.0f}s"


def test_mmr_driver_path_matches_distributed(spark, monkeypatch):
    """mmr_topk's driver greedy must equal the DataFrame loop bit-for-bit
    (same rounded-cosine inputs, same (rel−ms) IEEE subtraction, same tie
    order). Forced via _DRIVER_PROBE_MAX=0. Also sanity: ranks 1..k per
    query, rank-1 is the brute-force nearest, and picks are distinct."""
    from knowledge_extraction_pipeline_spark.operators import similarity as S

    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = embs.limit(6)
    base = S.mmr_topk(embs, q, k=4, pool=12).collect()
    monkeypatch.setattr(S, "_DRIVER_PROBE_MAX", 0)
    forced = S.mmr_topk(embs, q, k=4, pool=12).collect()
    assert sorted(map(tuple, forced)) == sorted(map(tuple, base))

    monkeypatch.undo()
    by_q = {}
    for r in base:
        by_q.setdefault(r["query_id"], []).append(r)
    bf = {(r["query_id"], r["rank"]): r["id"]
          for r in S.brute_force_topk(embs, q, k=1).collect()}
    for qid, rows in by_q.items():
        assert sorted(r["rank"] for r in rows) == [1, 2, 3, 4]
        assert len({r["id"] for r in rows}) == 4
        first = next(r["id"] for r in rows if r["rank"] == 1)
        assert first == bf[(qid, 1)]


def test_ivf_large_query_set_completes(spark):
    """1000 queries: probe selection must not stall the driver (the old
    Python loop was |Q|·n_centroids·dim single-threaded)."""
    import time

    from knowledge_extraction_pipeline_spark.operators.similarity import (
        ivf_topk,
    )
    embs = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    q = embs.limit(1000)
    t0 = time.time()
    out = ivf_topk(embs, q, k=3, n_centroids=16, n_probe=2)
    n = out.count()
    wall = time.time() - t0
    assert n > 900 * 3  # nearly every query returns k rows
    assert wall < 300, f"1k-query IVF took {wall:.0f}s"


def test_ivf_pq_residual_topk_recall(spark):
    """True IVFADC: PQ codebooks on residuals vs the coarse centroid. On
    isotropic data residuals ≈ the vectors themselves (centroids hug the
    origin) so recall lands near plain IVF-PQ — asserted ≥ 0.75 at
    n_probe=32 — and every returned cosine must match brute force (the
    re-rank is exact)."""
    from knowledge_extraction_pipeline_spark.operators.similarity import (
        brute_force_topk,
        ivf_pq_residual_topk,
    )
    embs = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").cache()
    q = embs.filter(F.col("vec_id") < 20)

    def topsets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["query_id"], set()).add(r["id"])
        return out

    truth = topsets(brute_force_topk(embs, q, k=10))
    got_df = ivf_pq_residual_topk(embs, q, k=10, n_centroids=64, n_probe=32,
                                  m=16, n_codes=16, shortlist=100)
    rows = got_df.collect()
    got = {}
    for r in rows:
        got.setdefault(r["query_id"], set()).add(r["id"])
    rec = sum(len(got.get(qid, set()) & t) for qid, t in truth.items()) \
        / sum(len(t) for t in truth.values())
    assert rec >= 0.75, rec

    bf_all = {(r["query_id"], r["id"]): r["cos"]
              for r in brute_force_topk(embs, q, k=10**6).collect()}
    for r in rows:
        assert abs(bf_all[(r["query_id"], r["id"])] - r["cos"]) < 1e-9


def test_png_codec_round_trip_and_guards():
    import numpy as np
    import pytest

    from knowledge_extraction_pipeline_spark.sources.multimodal import (
        decode_image,
        decode_png,
        encode_png,
    )
    rng = np.random.RandomState(3)
    # random pixels defeat any filter shortcut; RGB and RGBA; odd sizes
    for ch in (3, 4):
        px = rng.randint(0, 256, size=(11, 7, ch), dtype=np.uint8)
        w, h, back = decode_png(encode_png(px))
        assert (w, h) == (7, 11)
        assert np.array_equal(back, px[:, :, :3])
    # dispatch recognizes the PNG signature
    w, h, _ = decode_image(encode_png(px))
    assert (w, h) == (7, 11)
    with pytest.raises(ValueError):
        decode_png(b"not a png")
    # 16-bit / interlaced stay honestly unsupported
    import struct
    import zlib
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    bad = (b"\x89PNG\r\n\x1a\n"
           + struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
           + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr)))
    with pytest.raises(NotImplementedError):
        decode_png(bad)


def test_tiff_codec_round_trip_and_guards():
    import struct

    import numpy as np
    import pytest

    from knowledge_extraction_pipeline_spark.sources.multimodal import (
        decode_image,
        decode_tiff,
        encode_tiff,
    )
    rng = np.random.RandomState(7)
    # random pixels, strip heights spanning multi-strip / single-strip
    # (single strip exercises the inline-value IFD path)
    for rps in (1, 3, 100):
        px = rng.randint(0, 256, size=(11, 7, 3), dtype=np.uint8)
        w, h, back = decode_tiff(encode_tiff(px, rows_per_strip=rps))
        assert (w, h) == (7, 11)
        assert np.array_equal(back, px)
    # grayscale replicates to 3 channels
    g = rng.randint(0, 256, size=(6, 9), dtype=np.uint8)
    w, h, back = decode_tiff(encode_tiff(g, rows_per_strip=2))
    assert (w, h) == (9, 6)
    assert np.array_equal(back, np.repeat(g[:, :, None], 3, axis=2))
    # dispatch recognizes the TIFF magic
    w, h, _ = decode_image(encode_tiff(px))
    assert (w, h) == (7, 11)
    with pytest.raises(ValueError):
        decode_tiff(b"not a tiff")
    # compressed stays honestly unsupported (entry 259 is the 4th; its
    # value field sits at header(8) + count(2) + 3 entries + tag/type/count)
    bad = bytearray(encode_tiff(px))
    off = 8 + 2 + 3 * 12 + 8
    assert struct.unpack_from("<I", bad, off)[0] == 1
    struct.pack_into("<I", bad, off, 5)  # LZW
    with pytest.raises(NotImplementedError):
        decode_tiff(bytes(bad))


def test_gif_lzw_codec_round_trip_and_guards():
    import numpy as np
    import pytest

    from knowledge_extraction_pipeline_spark.sources.multimodal import (
        _gif_palette,
        _lzw_decode,
        _lzw_encode,
        decode_gif,
        decode_image,
        encode_gif,
    )
    rng = np.random.RandomState(5)
    # LZW: random (table fills -> mid-stream CLEAR), constant (deep
    # sequences), small alphabet with width growth from 3 bits
    for data, mcs in ((list(rng.randint(0, 256, 6000)), 8),
                      ([9] * 8000, 8),
                      (list(rng.randint(0, 4, 3000)), 2)):
        data = [int(x) for x in data]
        assert _lzw_decode(_lzw_encode(data, mcs), mcs) == data
    idx = rng.randint(0, 256, size=(19, 23), dtype=np.uint8)
    w, h, px = decode_gif(encode_gif(idx))
    pal = np.array(_gif_palette(), dtype=np.uint8)
    assert (w, h) == (23, 19)
    assert np.array_equal(px, pal[idx.astype(np.int32)])
    w2, h2, _ = decode_image(encode_gif(idx))
    assert (w2, h2) == (23, 19)
    with pytest.raises(ValueError):
        decode_gif(b"JFIF....")


def test_mp4_container_parse_and_guards():
    import struct

    import pytest

    from knowledge_extraction_pipeline_spark.sources.multimodal import (
        encode_mp4_skeleton,
        parse_mp4,
    )
    d, ts, nt, codecs = parse_mp4(
        encode_mp4_skeleton(45, 600, ["av01"]))
    assert (d, ts, nt, codecs) == (45.0, 600, 1, ["av01"])
    with pytest.raises(ValueError):
        parse_mp4(b"RIFF....WEBP")
    # truncated/malformed box sizes fail loudly, never loop or misread
    good = encode_mp4_skeleton(45, 600, ["av01"])
    # ftyp is 24 bytes, so offset 24 is the moov box's size field;
    # size 4 < 8 is malformed and must fail loudly
    bad = good[:24] + struct.pack(">I", 4) + good[28:]
    with pytest.raises(ValueError):
        parse_mp4(bad)


def test_webp_container_parse_and_guards():
    import struct

    import pytest

    from knowledge_extraction_pipeline_spark.sources.multimodal import (
        encode_webp_skeleton,
        parse_webp,
    )
    # simple lossless: dims from the VP8L packed header, alpha bit honored
    w, h, fmt, alpha, chunks = parse_webp(
        encode_webp_skeleton(321, 199, lossless=True, alpha=True))
    assert (w, h, fmt, alpha, chunks) == (321, 199, "lossless", True,
                                          ["VP8L"])
    # simple lossy: dims from the VP8 keyframe start code
    w, h, fmt, alpha, chunks = parse_webp(
        encode_webp_skeleton(640, 480, lossless=False))
    assert (w, h, fmt, alpha, chunks) == (640, 480, "lossy", False, ["VP8 "])
    # extended: VP8X canvas dims win; ALPH/EXIF chunks inventoried
    w, h, fmt, alpha, chunks = parse_webp(
        encode_webp_skeleton(1000, 777, lossless=False, alpha=True,
                             exif=True))
    assert (w, h, fmt, alpha) == (1000, 777, "lossy", True)
    assert chunks == ["VP8X", "ALPH", "EXIF", "VP8 "]
    # odd-sized chunk bodies are padded to even offsets per RIFF
    odd = encode_webp_skeleton(33, 33, lossless=False, alpha=True)
    assert parse_webp(odd)[0] == 33
    with pytest.raises(ValueError):
        parse_webp(b"not a webp at all")
    # chunk size overrunning the RIFF extent fails loudly
    good = bytearray(encode_webp_skeleton(64, 64, lossless=True))
    struct.pack_into("<I", good, 16, 10_000)  # first chunk's size field
    with pytest.raises(ValueError):
        parse_webp(bytes(good))


def test_containment_prefix_filter_equals_brute(spark):
    """Containment's contained-side-only prefix filter must emit the EXACT
    directional pair set the all-pairs join emits — lossless pruning, not
    an approximation. Also pins the asymmetry: a short doc pasted into a
    long one scores containment 1.0 forward and < 0.5 backward."""
    from knowledge_extraction_pipeline_spark.operators.dedup import (
        containment_pairs,
    )
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    # two (threshold, blocking) combos keep suite time bounded while still
    # exercising the low-threshold wide-prefix and unblocked paths
    for thr, blk in ((0.3, "lang"), (0.7, None)):
        fast = sorted(map(tuple, containment_pairs(
            docs, threshold=thr, block_col=blk).collect()))
        brute = sorted(map(tuple, containment_pairs(
            docs, threshold=thr, block_col=blk, brute=True).collect()))
        assert fast == brute, (thr, blk, len(fast), len(brute))
    short = "alpha beta gamma delta epsilon zeta"
    long_ = short + " " + " ".join(f"w{i} w{i+1} w{i+2}" for i in range(40))
    planted = spark.createDataFrame(
        [(1, short, "en"), (2, long_, "en")],
        "doc_id long, text string, lang string")
    rows = {(r["id_sub"], r["id_super"]): r["containment"]
            for r in containment_pairs(planted, threshold=0.5).collect()}
    assert rows.get((1, 2)) == 1.0
    assert (2, 1) not in rows


def test_pdf_metadata_parse_and_guards():
    import re

    import pytest

    from knowledge_extraction_pipeline_spark.sources.pdf import (
        encode_pdf,
        page_content,
        parse_pdf,
    )
    # full round-trip: version, object count, page walk, MediaBox,
    # stream-byte total, Info title
    p = encode_pdf(7, 3, 595, 842, "hello")
    assert parse_pdf(p) == (
        "1.4", 9, 3, 595, 842,
        sum(len(page_content(7, i)) for i in range(3)), "hello")
    # the parse is xref-OFFSET-driven: corrupting one entry fails loudly
    m = re.search(rb"xref\n0 \d+\n.{20}", p, re.S)
    bad = bytearray(p)
    bad[m.end():m.end() + 10] = b"0000000003"
    with pytest.raises(ValueError):
        parse_pdf(bytes(bad))
    # non-PDF and missing-tail payloads refused
    with pytest.raises(ValueError):
        parse_pdf(b"%!PS not a pdf")
    with pytest.raises(ValueError):
        parse_pdf(p.replace(b"startxref", b"startxrEf"))
    # a compressed-xref document (startxref pointing at an object, not an
    # xref table) is an honest refusal, not a silent mis-parse
    with pytest.raises(ValueError):
        parse_pdf(p.replace(b"xref\n0 ", b"xrEf\n0 ", 1))


def test_pdf_text_extraction_feeds_kg_pipeline(spark):
    """PDF is the reference's primary input: text extracted from real
    content streams (escapes, TJ arrays) must flow straight into the KG
    extract stage and produce lexicon mentions."""
    from pyspark.sql import functions as F

    from knowledge_extraction_pipeline_spark.operators.extract import (
        extract_stage,
    )
    from knowledge_extraction_pipeline_spark.sources.pdf import (
        encode_pdf,
        pdf_documents,
        pdf_text,
        rich_page_content,
        rich_page_text,
        synthetic_pdf_text_media,
    )
    p = encode_pdf(5, 2, 612, 792, "t", content_fn=rich_page_content)
    n_pages, text = pdf_text(p)
    assert n_pages == 2
    assert text == " ".join(rich_page_text(5, i) for i in range(2))
    # escapes decoded, TJ segments concatenated, ops joined by one space
    assert "(doc 5)" in text and "machine learning page 0" in text

    docs = pdf_documents(synthetic_pdf_text_media(spark, 6))
    assert docs.columns == ["doc_id", "text"]
    transcripts = docs.select(
        F.col("doc_id").alias("conv_id"), F.lit(0).alias("turn_idx"),
        F.lit("user").alias("role"), "text", F.lit(None).cast("string")
        .alias("tool"), F.current_timestamp().alias("ts"))
    m, _triples = extract_stage(transcripts)
    terms = {r["norm_term"] for r in m.collect()}
    # the rich fixture embeds real lexicon terms
    assert {"machine learning", "neural network",
            "gradient descent"} <= terms


def test_pdf_fallback_chain_and_epub_ingest(spark):
    """The reference's process_file contract: ordered PDF extractor chain
    with provenance (first success wins), real OCF/EPUB container walk,
    failures as rows, not throws."""
    from knowledge_extraction_pipeline_spark.sources.ingest import (
        encode_epub,
        epub_text,
        ingest_documents,
        synthetic_mixed_corpus,
    )
    from knowledge_extraction_pipeline_spark.sources.pdf import (
        corrupt_pdf,
        encode_pdf,
        pdf_text_chain,
        rich_page_content,
    )
    base = encode_pdf(9, 2, 612, 792, "t", content_fn=rich_page_content)
    intact = pdf_text_chain(base)
    broken_xref = pdf_text_chain(corrupt_pdf(base, 1))
    broken_tree = pdf_text_chain(corrupt_pdf(base, 2))
    assert intact[0] == "xref" and broken_xref[0] == "scan" \
        and broken_tree[0] == "harvest"
    # every recovery stage extracts the IDENTICAL text
    assert intact[2] == broken_xref[2] == broken_tree[2]
    # harvest has no page-tree: page count honestly unknown
    assert broken_tree[1] == 0 and intact[1] == broken_xref[1] == 2
    assert pdf_text_chain(b"%PDF-1.4\ngarbage") == ("failed", 0, "")

    # EPUB: tag strip + entity decode + spine order
    title, n_ch, text = epub_text(encode_epub(3, 2, "book-3"))
    assert (title, n_ch) == ("book-3", 2)
    assert "machine learning & neural network" in text
    assert "<" not in text and "&amp;" not in text

    out = {r["doc_type"]: r for r in
           ingest_documents(synthetic_mixed_corpus(spark, 7)).collect()}
    assert set(out) == {"pdf", "epub", "text", "unsupported"}
    assert out["unsupported"]["extractor"] == "none"
    assert out["text"]["n_pages"] == 1


def test_pdf_pages_char_offsets_exact():
    """page_mapping parity: every page's [char_start, char_end) span must
    slice the concatenated document text to exactly that page's text."""
    from knowledge_extraction_pipeline_spark.sources.pdf import (
        encode_pdf,
        pdf_pages,
        pdf_text,
        rich_page_content,
    )
    p = encode_pdf(4, 3, 612, 792, "t", content_fn=rich_page_content)
    _n, full = pdf_text(p)
    spans = pdf_pages(p)
    assert [s[0] for s in spans] == [0, 1, 2]
    for _pg, text, cs, ce in spans:
        assert full[cs:ce] == text
    assert spans[-1][3] == len(full)


def test_edit_distance_prefix_filter_equals_brute(spark, docs):
    """The positional-q-gram prefix-filtered plan must return EXACTLY the
    brute within-block pairs (the filter is a lossless bound), including
    planted typo pairs at every distance 0..k."""
    from knowledge_extraction_pipeline_spark.operators.dedup import (
        edit_distance_pairs,
    )
    base = "the quick brown fox jumps over it"  # 33 chars -> 32-prefix
    planted = [(9001, base, "en"), (9002, base, "en"),             # d=0
               (9003, base[:10] + "X" + base[11:], "en"),          # d=1
               (9004, "AB" + base[2:16] + "YZ" + base[18:], "en"),  # d=4
               (9005, base, "zz")]                                  # other blk
    extra = spark.createDataFrame(planted, "doc_id long, text string, lang string")
    d = docs.select("doc_id", "text", "lang").unionByName(extra)
    for k in (2, 4):
        fast = sorted(map(tuple, edit_distance_pairs(
            d, max_dist=k).collect()))
        brute = sorted(map(tuple, edit_distance_pairs(
            d, max_dist=k, brute=True).collect()))
        assert fast == brute, (k, len(fast), len(brute))
    pairs = {(a, b): dist for a, b, _, dist in
             edit_distance_pairs(d, max_dist=4).collect()}
    assert pairs[(9001, 9002)] == 0
    assert pairs[(9001, 9003)] == 1
    assert pairs[(9001, 9004)] == 4
    assert (9001, 9005) not in pairs  # different block never joined


def test_tga_codec_round_trip_and_guards():
    import numpy as np
    import pytest

    from knowledge_extraction_pipeline_spark.sources.multimodal import (
        decode_image,
        decode_tga,
        encode_tga,
    )
    rng = np.random.RandomState(7)
    # random pixels defeat any RLE shortcut; run-heavy pixels exercise it
    rand_px = rng.randint(0, 256, size=(9, 13, 3), dtype=np.uint8)
    runs_px = np.repeat(rng.randint(0, 256, size=(6, 4, 3),
                                    dtype=np.uint8), 5, axis=1)
    for px in (rand_px, runs_px):
        for rle in (False, True):
            for top_down in (True, False):
                w, h, back = decode_tga(
                    encode_tga(px, rle=rle, top_down=top_down))
                assert (w, h) == (px.shape[1], px.shape[0])
                assert np.array_equal(back, px), (rle, top_down)
    # RLE packets must not cross scanlines: a column-constant image still
    # round-trips exactly even though runs continue on the next row
    col_px = np.tile(np.arange(12, dtype=np.uint8).reshape(1, 4, 3),
                     (5, 1, 1))
    _, _, back = decode_tga(encode_tga(col_px, rle=True))
    assert np.array_equal(back, col_px)
    # dispatch recognizes the 2.0 footer signature
    w, h, _ = decode_image(encode_tga(rand_px))
    assert (w, h) == (13, 9)
    # colormapped / 32-bit stay honestly unsupported
    hdr = bytearray(encode_tga(rand_px))
    hdr[2] = 1  # colormapped
    with pytest.raises(NotImplementedError):
        decode_tga(bytes(hdr))
    hdr[2] = 2
    hdr[16] = 32
    with pytest.raises(NotImplementedError):
        decode_tga(bytes(hdr))


def test_wav_manual_parse_matches_stdlib():
    """The hand-rolled RIFF walk must parse 16-bit PCM byte-identically to
    the stdlib wave module, and handle odd-sized chunks (pad byte) plus
    chunk orders wave chokes on."""
    import io
    import struct
    import wave as wave_mod

    import numpy as np

    from knowledge_extraction_pipeline_spark.sources.multimodal import (
        decode_wav,
    )
    rng = np.random.RandomState(11)
    x = rng.randint(-32768, 32768, size=1237, dtype="<i2")
    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(22050)
        wf.writeframes(x.tobytes())
    payload = buf.getvalue()
    rate, got = decode_wav(payload)
    with wave_mod.open(io.BytesIO(payload)) as wf:
        ref = np.frombuffer(wf.readframes(wf.getnframes()), dtype="<i2")
        assert rate == wf.getframerate()
    assert np.array_equal(got, ref)
    # an odd-sized LIST chunk before fmt: the walker must honor the pad
    # byte (stdlib wave also tolerates this, but via a different path)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    data = x[:9].tobytes()
    odd = b"LIST\x05\x00\x00\x00INFOx\x00"  # 5 bytes + 1 pad
    body = (odd + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    payload2 = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    rate2, got2 = decode_wav(payload2)
    assert rate2 == 8000 and np.array_equal(got2, x[:9])


def test_g711_ulaw_codec_round_trip_and_guards():
    import numpy as np
    import pytest

    from knowledge_extraction_pipeline_spark.sources.multimodal import (
        decode_wav,
        encode_wav_ulaw,
        ulaw_compress,
        ulaw_expand,
    )
    # code-level involution: every byte except 0x7F (negative zero, which
    # canonicalizes to +0 = 0xFF per G.711) survives expand→compress
    codes = np.arange(256, dtype=np.uint8)
    back = ulaw_compress(ulaw_expand(codes))
    keep = codes != 0x7F
    assert np.array_equal(back[keep], codes[keep])
    assert back[~keep][0] == 0xFF
    # sample-level: companding error is bounded by the segment quantum
    rng = np.random.RandomState(13)
    x = rng.randint(-32768, 32768, size=4096).astype(np.int16)
    y = ulaw_expand(ulaw_compress(x))
    v = np.minimum(np.abs(x.astype(np.int32)), 32635) + 0x84
    seg = np.floor(np.log2(v >> 7)).astype(np.int32)
    assert (np.abs(y.astype(np.int32)
                   - np.sign(x) * np.minimum(np.abs(x), 32635))
            <= (1 << (seg + 2))).all()
    # full file round-trip through the format-7 RIFF writer/reader
    rate, got = decode_wav(encode_wav_ulaw(8000, x))
    assert rate == 8000 and np.array_equal(got, y)
    # guards: non-RIFF and unsupported format codes refuse
    with pytest.raises(NotImplementedError):
        decode_wav(b"OggS" + b"\x00" * 40)
    bad = bytearray(encode_wav_ulaw(8000, x[:4]))
    bad[20] = 85  # wFormatTag=85 (MP3)
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(bad))


def test_damerau_matches_duckdb(spark):
    """The Lowrance-Wagner pandas-UDF DP must equal DuckDB's native
    damerau_levenshtein (true DL, not OSA) on random strings — including
    the 'ca'→'abc' = 2 case OSA gets wrong (OSA says 3)."""
    import random

    import duckdb

    from knowledge_extraction_pipeline_spark.operators.dedup import (
        _damerau_udf,
    )
    random.seed(5)
    pairs = [("ca", "abc"), ("abc", "ca"), ("", ""), ("a", ""),
             ("abcdef", "abdcfe")]
    pairs += [("".join(random.choice("abcd") for _ in
                       range(random.randint(0, 12))),
               "".join(random.choice("abcd") for _ in
                       range(random.randint(0, 12))))
              for _ in range(120)]
    df = spark.createDataFrame(pairs, "a string, b string")
    got = {(r.a, r.b): r.d for r in
           df.select("a", "b", _damerau_udf("a", "b").alias("d")).collect()}
    con = duckdb.connect()
    for a, b in pairs:
        want = con.sql("select damerau_levenshtein(?, ?)",
                       params=[a, b]).fetchone()[0]
        assert got[(a, b)] == want, (a, b, got[(a, b)], want)
    assert got[("ca", "abc")] == 2  # true DL, not OSA


def test_damerau_prefix_filter_equals_brute(spark, docs):
    """The k·(q+1)-budget positional-q-gram filter must be lossless for
    true Damerau-Levenshtein, including planted transposition pairs where
    DL < Levenshtein."""
    from knowledge_extraction_pipeline_spark.operators.dedup import (
        damerau_pairs,
    )
    base = "the quick brown fox jump"  # 24 chars
    swapped3 = base[:4] + base[5] + base[4] + base[6:10] + base[11] \
        + base[10] + base[12:20] + base[21] + base[20] + base[22:]
    planted = [(9001, base, "en"), (9002, base, "en"),           # d=0
               (9003, swapped3, "en"),                            # 3 swaps
               (9004, base[2:] + "xy", "en"),                     # shifted
               (9005, base, "zz")]
    extra = spark.createDataFrame(
        planted, "doc_id long, text string, lang string")
    d = docs.select("doc_id", "text", "lang").unionByName(extra)
    for k in (1, 3):
        fast = sorted(map(tuple, damerau_pairs(d, max_dist=k).collect()))
        brute = sorted(map(tuple, damerau_pairs(
            d, max_dist=k, brute=True).collect()))
        assert fast == brute, (k, len(fast), len(brute))
    pairs = {(a, b): dist for a, b, _, dist in
             damerau_pairs(d, max_dist=3).collect()}
    assert pairs[(9001, 9002)] == 0
    assert pairs[(9001, 9003)] == 3  # three transpositions cost 3, not 6
    assert (9001, 9005) not in pairs


def test_jaro_winkler_matches_duckdb(spark):
    """The pandas-UDF Jaro-Winkler must be BIT-identical (raw float64, no
    rounding) to DuckDB's jaro_winkler_similarity, including the 0.7 boost
    threshold edge and the both-empty → 0.0 convention."""
    import random

    import duckdb

    from knowledge_extraction_pipeline_spark.operators.dedup import (
        _jaro_winkler_udf,
    )
    random.seed(9)
    pairs = [("martha", "marhta"), ("dixon", "dicksonx"),
             ("jellyfish", "smellyfish"), ("", ""), ("a", ""),
             ("same", "same"), ("abcd", "dcba")]
    pairs += [("".join(random.choice("abcdef ") for _ in
                       range(random.randint(1, 30))),
               "".join(random.choice("abcdef ") for _ in
                       range(random.randint(1, 30))))
              for _ in range(200)]
    df = spark.createDataFrame(pairs, "a string, b string")
    got = {(r.a, r.b): r.s for r in
           df.select("a", "b",
                     _jaro_winkler_udf("a", "b").alias("s")).collect()}
    con = duckdb.connect()
    for a, b in pairs:
        want = con.sql("select jaro_winkler_similarity(?, ?)",
                       params=[a, b]).fetchone()[0]
        assert got[(a, b)] == want, (a, b, got[(a, b)], want)


def test_jw_length_band_is_exact(spark):
    """The min/max ≥ 3·(t−0.4)/0.6 − 2 length band must never drop a
    qualifying pair: banded plan ≡ same plan with the band disabled
    (threshold 0 band) on a corpus with planted extreme-length pairs."""
    from knowledge_extraction_pipeline_spark.operators.dedup import (
        jaro_winkler_pairs,
    )
    rows = [(1, "b", "prefix"), (2, "b", "prefix plus a long tail here"),
            (3, "b", "prefix plut"), (4, "b", "prefix plus"),
            (5, "b", "x"), (6, "b", "prefixxxxxxxxxxxxxxxxxxxxxxxxxxx")]
    names = spark.createDataFrame(rows, "id long, blk string, name string")
    t = 0.92
    banded = sorted((r.id_a, r.id_b, r.jw) for r in
                    jaro_winkler_pairs(names, threshold=t).collect())
    full = sorted(
        (r.id_a, r.id_b, r.jw) for r in
        jaro_winkler_pairs(names, threshold=0.0).collect()
        if r.jw >= t)
    assert banded == full and banded, (banded, full)


def test_qoi_codec_round_trip_and_guards():
    import numpy as np
    import pytest

    from knowledge_extraction_pipeline_spark.sources.multimodal import (
        decode_image,
        decode_qoi,
        encode_qoi,
    )
    rng = np.random.RandomState(17)
    # random pixels force literal ops; RGB and RGBA; odd sizes; 1x1
    for ch in (3, 4):
        for shape in ((9, 7), (1, 1), (3, 62 * 2 + 5)):
            px = rng.randint(0, 256, size=(*shape, ch), dtype=np.uint8)
            w, h, back = decode_qoi(encode_qoi(px))
            assert (w, h) == (shape[1], shape[0])
            assert np.array_equal(back, px[:, :, :3]), (ch, shape)
    # flat image: exercises >62-length runs split at the cap
    flat = np.full((10, 40, 3), 200, dtype=np.uint8)
    _, _, back = decode_qoi(encode_qoi(flat))
    assert np.array_equal(back, flat)
    # gradient exercises DIFF/LUMA; few-color tiling exercises INDEX
    yy, xx = np.mgrid[0:17, 0:23]
    grad = np.stack([(xx + yy) % 256, (2 * xx) % 256, (3 * yy) % 256],
                    axis=-1).astype(np.uint8)
    _, _, back = decode_qoi(encode_qoi(grad))
    assert np.array_equal(back, grad)
    # dispatch recognizes the qoif magic
    w, h, _ = decode_image(encode_qoi(grad))
    assert (w, h) == (23, 17)
    with pytest.raises(NotImplementedError):
        decode_qoi(b"not qoi at all")
    bad = bytearray(encode_qoi(grad))
    bad[12] = 7  # channels=7
    with pytest.raises(NotImplementedError):
        decode_qoi(bytes(bad))


def test_alaw_codec_round_trip_and_guards():
    import numpy as np
    import pytest

    from knowledge_extraction_pipeline_spark.sources.multimodal import (
        alaw_compress,
        alaw_expand,
        decode_wav,
        encode_wav_alaw,
    )
    # A-law is involutive on ALL 256 codes (no negative-zero collapse)
    codes = np.arange(256, dtype=np.uint8)
    assert np.array_equal(alaw_compress(alaw_expand(codes)), codes)
    # sign convention: expanded levels are symmetric and nonzero
    lv = alaw_expand(codes).astype(int)
    assert (np.abs(lv) >= 8).all()
    assert sorted(lv[lv > 0]) == sorted(-lv[lv < 0])
    # sample-level error bounded by the top-segment half step
    rng = np.random.RandomState(23)
    x = rng.randint(-32768, 32768, size=4096).astype(np.int16)
    y = alaw_expand(alaw_compress(x))
    assert (np.abs(y.astype(int)
                   - np.clip(x.astype(int), -32767, 32767)) <= 512).all()
    rate, got = decode_wav(encode_wav_alaw(8000, x))
    assert rate == 8000 and np.array_equal(got, y)


def test_aiff_codec_round_trip_and_guards():
    import struct

    import numpy as np
    import pytest

    from knowledge_extraction_pipeline_spark.sources.multimodal import (
        _f80_decode,
        _f80_encode,
        decode_aiff,
        decode_wav,
        encode_aiff,
    )
    # 80-bit extended float: exact for every practical sample rate
    for rate in (8000, 11025, 16000, 22050, 44100, 48000, 96000, 192000):
        assert _f80_decode(_f80_encode(rate)) == rate
    rng = np.random.RandomState(29)
    x = rng.randint(-32768, 32768, size=1031).astype("<i2")
    payload = encode_aiff(44100, x)
    r, got = decode_aiff(payload)
    assert r == 44100 and np.array_equal(got, x)
    # dispatch: decode_wav routes FORM payloads to the AIFF parser
    r2, got2 = decode_wav(payload)
    assert r2 == 44100 and np.array_equal(got2, x)
    # AIFC and stereo refuse honestly
    with pytest.raises(NotImplementedError):
        decode_aiff(payload[:8] + b"AIFC" + payload[12:])
    bad = bytearray(payload)
    off = payload.index(b"COMM") + 8
    bad[off:off + 2] = struct.pack(">h", 2)  # channels=2
    with pytest.raises(NotImplementedError):
        decode_aiff(bytes(bad))


def test_pcx_codec_round_trip_and_guards():
    import numpy as np
    import pytest

    from knowledge_extraction_pipeline_spark.sources.multimodal import (
        decode_image,
        decode_pcx,
        encode_pcx,
    )
    rng = np.random.RandomState(23)
    # random pixels (literal-heavy), odd/even widths for the pad path, 1x1
    for shape in ((9, 7), (1, 1), (12, 16), (5, 63)):
        px = rng.randint(0, 256, size=(*shape, 3), dtype=np.uint8)
        w, h, back = decode_pcx(encode_pcx(px))
        assert (w, h) == (shape[1], shape[0])
        assert np.array_equal(back, px), shape
    # flat image: runs capped at 63 and values >= 0xC0 forced into runs
    flat = np.full((6, 200, 3), 0xC5, dtype=np.uint8)
    _, _, back = decode_pcx(encode_pcx(flat))
    assert np.array_equal(back, flat)
    # dispatch recognizes the 0x0A/version/RLE header
    w, h, _ = decode_image(encode_pcx(flat))
    assert (w, h) == (200, 6)
    # guards: non-RLE encoding byte and unsupported plane count refuse
    good = bytearray(encode_pcx(flat))
    bad = bytearray(good)
    bad[2] = 0
    with pytest.raises(NotImplementedError):
        decode_pcx(bytes(bad))
    bad = bytearray(good)
    bad[65] = 1  # nplanes=1 (paletted) unsupported
    with pytest.raises(NotImplementedError):
        decode_pcx(bytes(bad))


def test_midi_codec_round_trip_and_guards():
    import pytest

    from knowledge_extraction_pipeline_spark.sources.multimodal import (
        _vlq,
        encode_midi,
        midi_note_formula,
        parse_midi,
    )
    # VLQ edges: 0, 127, 128, 16383, 16384 re-parse through a real track
    for delta in (0, 127, 128, 16383, 16384, 2097151):
        f = parse_midi(encode_midi([(delta, 7, 60, 90)]))
        assert f["total_ticks"] == delta + 7, delta
    assert _vlq(0) == b"\x00" and _vlq(127) == b"\x7f"
    assert _vlq(128) == b"\x81\x00" and _vlq(16384) == b"\x81\x80\x00"
    # formula files: every feature closed-form
    for i in (0, 7, 13, 29):
        notes, tempo = midi_note_formula(i)
        f = parse_midi(encode_midi(notes, tempo_us=tempo))
        assert f["n_tracks"] == 2 and f["division"] == 480
        assert f["tempo_us"] == tempo and f["n_notes"] == len(notes)
        assert f["pitch_sum"] == sum(p for _, _, p, _ in notes)
        assert f["vel_sum"] == sum(v for _, _, _, v in notes)
        assert f["total_ticks"] == sum(d + du for d, du, _, _ in notes)
    with pytest.raises(NotImplementedError):
        parse_midi(b"RIFFnope")


def test_bmp_rle8_codec_round_trip_and_guards():
    import numpy as np

    from knowledge_extraction_pipeline_spark.sources.multimodal import (
        decode_bmp,
        decode_image,
        encode_bmp_rle8,
    )
    palette = np.stack([(np.arange(256) * 7) % 256,
                        (np.arange(256) * 29) % 256,
                        (np.arange(256) * 13) % 256], axis=-1)
    rng = np.random.RandomState(31)
    # random indices (absolute-mode heavy) and banded (run-heavy)
    for shape in ((7, 9), (1, 1), (11, 254), (5, 255)):
        idx = rng.randint(0, 256, shape).astype(np.uint8)
        w, h, rgb = decode_bmp(encode_bmp_rle8(idx, palette))
        assert (w, h) == (shape[1], shape[0])
        assert np.array_equal(rgb, palette[idx].astype(np.uint8)), shape
    banded = np.repeat(np.arange(6, dtype=np.uint8), 40).reshape(6, 40)
    w, h, rgb = decode_image(encode_bmp_rle8(banded, palette))
    assert (w, h) == (40, 6)
    # hand-crafted delta escape: 2px run, delta (+2,+1), run — decoder only
    import struct
    pal = b"".join(bytes((int(b), int(g), int(r), 0))
                   for r, g, b in palette)
    data = bytes((2, 5, 0, 2, 2, 1, 3, 9, 0, 0, 0, 1))
    off = 14 + 40 + len(pal)
    payload = (b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
               + struct.pack("<IiiHHIIiiII", 40, 8, 2, 1, 8, 1, len(data),
                             2835, 2835, 256, 0) + pal + data)
    w, h, rgb = decode_bmp(payload)
    assert (w, h) == (8, 2)
    # bottom row: two 5s then delta skips (2,1) -> row above, x=4: three 9s
    assert np.array_equal(rgb[1, 0:2], palette[np.uint8(5)][:3].astype(np.uint8) * np.array([1, 1])[:, None])
    assert (rgb[0, 4:7] == palette[np.uint8(9)].astype(np.uint8)).all()
