"""Episode mining + Markov transitions (operators/sequences)."""

import pytest


@pytest.fixture(scope="module")
def timeline(spark):
    # u1: a b a b a   u2: a b c   u3: c c
    rows = []
    for uid, seq in ((1, "ababa"), (2, "abc"), (3, "cc")):
        for i, ch in enumerate(seq):
            rows.append((uid * 100 + i, i, uid, ch))
    return spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, event_type string")


def test_ngram_support_counts_and_filter(spark, timeline):
    from knowledge_extraction_pipeline_spark.operators.sequences import (
        ngram_sequences,
    )
    out = {(r["g1"], r["g2"]): (r["n_keys"], r["n_occurrences"])
           for r in ngram_sequences(timeline, n=2, min_support=1).collect()}
    # (a,b): u1 twice + u2 once; (b,a): u1 twice; (b,c): u2; (c,c): u3
    assert out == {("a", "b"): (2, 3), ("b", "a"): (1, 2),
                   ("b", "c"): (1, 1), ("c", "c"): (1, 1)}
    sup2 = {(r["g1"], r["g2"])
            for r in ngram_sequences(timeline, n=2, min_support=2).collect()}
    assert sup2 == {("a", "b")}
    with pytest.raises(ValueError):
        ngram_sequences(timeline, n=1)


def test_markov_rows_exact_and_rows_normalize(spark, timeline):
    from knowledge_extraction_pipeline_spark.operators.sequences import (
        markov_transitions,
    )
    out = {(r["src"], r["dst"]): r for r in
           markov_transitions(timeline).collect()}
    assert out[("a", "b")]["n_transitions"] == 3
    assert out[("a", "b")]["prob_e6"] == 1_000_000  # a always -> b
    assert out[("b", "a")]["n_transitions"] == 2
    assert out[("b", "a")]["prob_e6"] == 666_666    # 2/3 floor
    assert out[("b", "c")]["prob_e6"] == 333_333
    # each src row group sums to scale minus division dust
    srcs = {k[0] for k in out}
    for s in srcs:
        tot = sum(r["prob_e6"] for k, r in out.items() if k[0] == s)
        n = sum(1 for k in out if k[0] == s)
        assert 10**6 - n < tot <= 10**6
    # partition invariance of the fixed-point probabilities
    out7 = {(r["src"], r["dst"]): r["prob_e6"] for r in
            markov_transitions(timeline.repartition(7)).collect()}
    assert out7 == {k: r["prob_e6"] for k, r in out.items()}
