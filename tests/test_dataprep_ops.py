"""Training-data prep operators: contamination check, per-domain token
budgeting, sequence packing. Each test pins the semantic invariants the
oracle queries can't (planted cases, flood guard, parallelism invariance)."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from knowledge_extraction_pipeline_spark.operators.packing import pack_sequences
from knowledge_extraction_pipeline_spark.operators.text_analysis import (
    contamination_check,
    domain_budget_sample,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_contamination_planted_overlap(spark):
    eval_docs = _docs(spark, [(100, "the quick brown fox jumps over dogs")])
    train = _docs(spark, [
        (1, "intro text then the quick brown fox jumps here"),  # 2 shared 4-grams
        (2, "completely unrelated words about sorting algorithms"),
        (3, "short"),  # < n words: contributes nothing
    ])
    out = {r["train_id"]: r for r in
           contamination_check(train, eval_docs, n=4).collect()}
    # eval doc has 7 words -> 4 distinct 4-grams
    assert set(out) == {1}
    r = out[1]
    assert r["eval_ngrams"] == 4
    # shared: "the quick brown fox", "quick brown fox jumps"
    assert r["n_overlap"] == 2
    assert abs(r["contamination_frac"] - 0.5) < 1e-9


def test_contamination_max_df_flood_guard(spark):
    # the same 4-gram appears in 3 train docs; with max_train_df=2 it is
    # dropped as boilerplate and the pair rows disappear entirely
    phrase = "terms of service apply here"
    train = _docs(spark, [(i, f"doc {i} says {phrase}") for i in range(3)])
    eval_docs = _docs(spark, [(9, phrase)])
    full = contamination_check(train, eval_docs, n=4).collect()
    assert len(full) == 3
    guarded = contamination_check(train, eval_docs, n=4,
                                  max_train_df=2).collect()
    assert guarded == []


def test_domain_budget_two_phase_equals_single_window(spark):
    docs = spark.createDataFrame(
        [(i, "w " * (5 + i % 37), f"s{i % 3}") for i in range(200)],
        "doc_id long, text string, source string")
    got = domain_budget_sample(docs, 150)
    rows = got.collect()
    # invariant: every kept row's cumulative fits the budget
    assert rows and all(r["cum_tokens"] <= 150 for r in rows)
    # the bucketed two-phase sum must equal the naive single-window scan
    from knowledge_extraction_pipeline_spark.functions.text import token_count
    h = F.md5(F.concat_ws(":", F.lit("budget"), F.lit("42"),
                          F.col("doc_id").cast("string")))
    naive = (docs.select("doc_id", "source", h.alias("_h"),
                         token_count(F.col("text")).cast("long")
                         .alias("n_tokens"))
             .withColumn("cum_tokens",
                         F.sum("n_tokens").over(
                             Window.partitionBy("source")
                             .orderBy("_h", "doc_id")
                             .rowsBetween(Window.unboundedPreceding, 0)))
             .filter(F.col("cum_tokens") <= 150)
             .select("doc_id", "source", "n_tokens", "cum_tokens"))
    assert sorted(map(tuple, rows)) == sorted(map(tuple, naive.collect()))
    # parallelism invariance: same keep-set from a repartitioned input
    re = domain_budget_sample(docs.repartition(13), 150).collect()
    assert sorted(map(tuple, re)) == sorted(map(tuple, rows))


def test_pack_sequences_invariants(spark):
    docs = spark.createDataFrame(
        [(i, "tok " * (10 + (i * 7) % 90)) for i in range(300)],
        "doc_id long, text string")
    out = pack_sequences(docs, max_tokens=120, n_shards=8).collect()
    assert len(out) == 300
    by_bin = {}
    for r in out:
        by_bin.setdefault((r["shard"], r["bin"]), []).append(r)
    for (shard, b), rows in by_bin.items():
        tot = sum(r["n_tokens"] for r in rows)
        # a bin only exceeds capacity when a single oversized doc owns it
        assert tot <= 120 or len(rows) == 1
        assert max(r["bin_fill"] for r in rows) == tot
    # bins are contiguous 0..max within each shard
    for shard in {r["shard"] for r in out}:
        bins = sorted({r["bin"] for r in out if r["shard"] == shard})
        assert bins == list(range(len(bins)))
    # deterministic under repartitioning
    re = pack_sequences(docs.repartition(17), max_tokens=120,
                        n_shards=8).collect()
    assert sorted(map(tuple, re)) == sorted(map(tuple, out))


def test_textrank_hub_word_ranks_first(spark):
    from knowledge_extraction_pipeline_spark.operators.text_analysis import (
        textrank_keywords,
    )
    # "spark" is adjacent to every other word; satellites only touch the hub
    docs = _docs(spark, [
        (i, f"spark {w} spark {w} spark {w}")
        for i, w in enumerate(["join", "scan", "agg", "sort", "merge"])
    ])
    out = textrank_keywords(docs, top_n=3, min_cooc=2).collect()
    assert out[0]["keyword"] == "spark"
    assert out[0]["rank_scaled"] > out[1]["rank_scaled"]


def test_pack_sequences_oversized_doc_gets_own_bin(spark):
    docs = _docs(spark, [(1, "x " * 1000), (2, "y " * 10), (3, "z " * 10)])
    out = pack_sequences(docs, max_tokens=50, n_shards=1).collect()
    big = next(r for r in out if r["doc_id"] == 1)
    others = [r for r in out if r["doc_id"] != 1]
    # next-fit over tokens DESC: the oversized doc is placed first, alone
    assert big["bin"] == 0 and big["n_tokens"] > 50
    assert all(r["bin"] == 1 for r in others)


def test_stratified_sample_exact_quota(spark):
    from knowledge_extraction_pipeline_spark.operators.text_analysis import (
        stratified_sample,
    )
    docs = spark.createDataFrame(
        [(i, "txt", f"s{i % 4}") for i in range(100)] + [(900, "txt", "tiny")],
        "doc_id long, text string, source string")
    out = stratified_sample(docs, 7, stratum_col="source").collect()
    by = {}
    for r in out:
        by.setdefault(r["source"], []).append(r["doc_id"])
    assert all(len(v) == 7 for k, v in by.items() if k != "tiny")
    assert by["tiny"] == [900]  # under-quota stratum keeps all rows
    # deterministic under repartitioning
    re = stratified_sample(docs.repartition(9), 7,
                           stratum_col="source").collect()
    assert sorted(map(tuple, re)) == sorted(map(tuple, out))


def test_repeated_ngrams_counts_overlapping_occurrences(spark):
    from knowledge_extraction_pipeline_spark.operators.text_analysis import (
        repeated_ngrams,
    )
    docs = spark.createDataFrame(
        [
            # "a b a b a b" contains the 3-gram "a b a" twice (overlapping)
            (1, "a b a b a b"),
            (2, "x a b a y"),
            (3, "totally different words here"),
            (4, "short one"),  # < n words -> no ngrams
        ],
        ["doc_id", "text"],
    )
    rows = {r["ngram"]: r for r in
            repeated_ngrams(docs, n=3, min_docs=2, top_n=10).collect()}
    assert "a b a" in rows
    assert rows["a b a"]["n_occ"] == 3  # 2 overlapping in doc1 + 1 in doc2
    assert rows["a b a"]["n_docs"] == 2
    # nothing appearing in only one document may be reported
    assert all(r["n_docs"] >= 2 for r in rows.values())


def test_repeated_ngrams_rejects_unigrams(spark):
    import pytest as _pytest

    from knowledge_extraction_pipeline_spark.operators.text_analysis import (
        repeated_ngrams,
    )
    docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with _pytest.raises(ValueError):
        repeated_ngrams(docs, n=1)


def test_temperature_weights_upweights_small_domains(spark):
    from knowledge_extraction_pipeline_spark.operators.text_analysis import (
        temperature_weights,
    )
    docs = spark.createDataFrame(
        [(i, "t", "big" if i < 900 else "small") for i in range(1000)],
        ["doc_id", "text", "source"],
    )
    out = {r["source"]: r for r in
           temperature_weights(docs, budget_docs=10_000).collect()}
    big, small = out["big"], out["small"]
    assert big["n_docs"] == 900 and small["n_docs"] == 100
    # sqrt flattening: small domain gets more than its proportional share
    assert small["p_e6"] / 1e6 > 0.1
    assert big["p_e6"] / 1e6 < 0.9
    # fixed-point identities
    assert big["w_e6"] == 30_000_000  # sqrt(900)=30 exactly
    assert small["w_e6"] == 10_000_000
    assert big["p_e6"] == 750_000 and small["p_e6"] == 250_000
    # floor rounding keeps total planned within budget
    assert big["planned_docs"] + small["planned_docs"] <= 10_000


def test_bpe_train_merge_order_tiebreak_and_overlap(spark):
    from knowledge_extraction_pipeline_spark.operators.bpe import bpe_train

    docs = spark.createDataFrame(
        [(1, "aa aa ab"), (2, "aaa b")], ["doc_id", "text"])
    got = [(r["lhs"], r["rhs"], r["pair_count"], r["merged"])
           for r in bpe_train(spark, docs, n_merges=3)
           .orderBy("merge_rank").collect()]
    # (a,a) appears 2x in each "aa" plus 2x inside "aaa" = 4; greedy
    # left-to-right then rewrites "aaa" as (aa, a) — never (a, aa).
    assert got[0] == ("a", "a", 4, "aa")
    # round 2: (a,b)=1 ties with (aa,a)=1 -> lexicographic (l,r) wins
    assert got[1] == ("a", "b", 1, "ab")
    assert got[2] == ("aa", "a", 1, "aaa")
    # early stop: once every word is one token there are no pairs left
    tiny = spark.createDataFrame([(1, "x y")], ["doc_id", "text"])
    assert bpe_train(spark, tiny, n_merges=5).count() == 0


def test_bpe_encode_applies_merges_in_training_order(spark):
    from knowledge_extraction_pipeline_spark.operators.bpe import bpe_encode

    docs = spark.createDataFrame(
        [(1, "aaa ab"), (2, "aaaa")], ["doc_id", "text"])
    merges = [("a", "a"), ("a", "b"), ("aa", "a")]
    got = {r["doc_id"]: r["bpe_tokens"]
           for r in bpe_encode(docs, merges).collect()}
    assert got[1] == ["aaa", "ab"]
    # "aaaa" -> <aa><aa> after merge 1; merge 3 (<aa><a>) never matches
    assert got[2] == ["aa", "aa"]


def test_pareto_frontier_dominance_and_ties(spark):
    import pytest

    from knowledge_extraction_pipeline_spark.operators.pareto import (
        pareto_frontier_2d,
    )
    pts = spark.createDataFrame(
        [(1, 10), (2, 9), (3, 9), (3, 3), (5, 1), (4, 1), (2, 11),
         (None, 99), (7, None)], "x long, y long")
    got = {(r["x"], r["y"]) for r in
           pareto_frontier_2d(pts, "x", "y", bucket_width=2).collect()}
    # (2,11) dominates (1,10) and (2,9); (3,9) survives (nothing has both
    # x>=3,y>=9 strictly better); (5,1) dominates (4,1); nulls dropped
    assert got == {(2, 11), (3, 9), (5, 1)}
    # bucket width must not change the answer
    for bw in (1, 3, 100):
        same = {(r["x"], r["y"]) for r in
                pareto_frontier_2d(pts, "x", "y", bucket_width=bw).collect()}
        assert same == got
    with pytest.raises(ValueError):
        pareto_frontier_2d(pts, "x", "y", bucket_width=0)


def test_interleave_manifest_epoch_balance(spark):
    """A source with 2x the docs must appear ~2x as often in EVERY prefix
    of the manifest (epoch balance), global_ix must be a 1..N permutation,
    and shards must cut at exactly shard_size."""
    import pytest

    from knowledge_extraction_pipeline_spark.operators.text_analysis import (
        interleave_manifest,
    )
    rows = ([(i, "big") for i in range(20)]
            + [(100 + i, "small") for i in range(10)])
    d = spark.createDataFrame(rows, "doc_id long, source string")
    m = interleave_manifest(d, shard_size=6)
    got = sorted(((r["global_ix"], r["source"], r["shard"])
                  for r in m.collect()))
    assert [g for g, _, _ in got] == list(range(1, 31))
    # every prefix stays within one doc of the ideal 2:1 ratio
    for k in range(3, 31, 3):
        n_big = sum(1 for g, s, _ in got[:k] if s == "big")
        assert abs(n_big - 2 * k / 3) <= 1, (k, n_big)
    assert [sh for _, _, sh in got] == [i // 6 for i in range(30)]
    with pytest.raises(ValueError):
        interleave_manifest(d, shard_size=0)
