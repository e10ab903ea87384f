"""Sequential-pattern operators over ordered event streams: contiguous
n-gram episode mining (support = distinct sequence keys) and first-order
Markov transition estimation. Both are generic over any (key, order, symbol)
table; the registered queries run them on events(user_id, ts, event_type).

Scale shape: one shuffle each — the lead() window partitions by the sequence
key, so per-key work is linear and map-local; the follow-up support/transition
counts are map-side-combinable groupBys. A pathological hot key (one user
holding ~10⁸ events) degrades the window to a single task — the same
time-bucket pre-partitioning used by operators/asof.as_of_join applies, since
contiguous n-grams only need (n-1) rows of carry across bucket boundaries.
Transition probabilities are fixed-point (count·10⁶ div total): exact longs,
order-free, oracle-able.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ngram_sequences(events: DataFrame, n: int = 3, min_support: int = 2,
                    key: str = "user_id", symbol: str = "event_type",
                    order: tuple[str, ...] = ("ts", "event_id")) -> DataFrame:
    """Frequent contiguous n-grams of `symbol` per `key` sequence, ordered by
    `order` (include a unique tiebreaker for determinism). Returns one row per
    surviving gram: (g1..gn, n_keys, n_occurrences), keeping grams present in
    at least `min_support` distinct keys."""
    if n < 2:
        raise ValueError(f"n must be >= 2, got {n}")
    w = Window.partitionBy(key).orderBy(*order)
    gcols = [F.col(symbol).alias("g1")] + [
        F.lead(symbol, i).over(w).alias(f"g{i + 1}") for i in range(1, n)]
    grams = (events.select(F.col(key).alias("_k"), *gcols)
             .filter(F.col(f"g{n}").isNotNull()))
    names = [f"g{i}" for i in range(1, n + 1)]
    return (grams.groupBy(*names)
            .agg(F.countDistinct("_k").alias("n_keys"),
                 F.count(F.lit(1)).alias("n_occurrences"))
            .filter(F.col("n_keys") >= min_support))


def markov_transitions(events: DataFrame, scale: int = 10**6,
                       key: str = "user_id", symbol: str = "event_type",
                       order: tuple[str, ...] = ("ts", "event_id")) -> DataFrame:
    """First-order Markov transition table over per-key symbol sequences:
    (src, dst, n_transitions, prob_e6) with prob_e6 the fixed-point
    P(dst | src) = n_transitions·scale div Σ_dst n_transitions — exact
    integer division, bit-identical across engines and partitionings."""
    w = Window.partitionBy(key).orderBy(*order)
    steps = (events.select(F.col(symbol).alias("src"),
                           F.lead(symbol, 1).over(w).alias("dst"))
             .filter(F.col("dst").isNotNull()))
    counts = steps.groupBy("src", "dst").agg(
        F.count(F.lit(1)).alias("n_transitions"))
    totals = counts.groupBy("src").agg(
        F.sum("n_transitions").alias("_tot"))
    return (counts.join(totals, "src")
            .select("src", "dst", "n_transitions",
                    F.expr(f"(n_transitions * {scale}L) div _tot")
                    .alias("prob_e6")))
