"""Text-analysis operators over a document corpus: language ID, quality
scoring, token counting, fingerprinting. All JVM-side Column expressions
(functions/text.py) — a single map-side scan at any corpus size."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import (
    fingerprint,
    lang_id,
    quality_score,
    token_count,
    word_count,
)


def annotate(docs: DataFrame, text_col: str = "text") -> DataFrame:
    c = F.col(text_col)
    return docs.select(
        "*",
        lang_id(c).alias("lang_pred"),
        quality_score(c).alias("quality"),
        word_count(c).alias("n_words"),
        token_count(c).alias("n_tokens"),
        fingerprint(c).alias("fp64"),
    )


def _hash_bucket(key_col, seed: int, tag: str, buckets: int = 10_000):
    """Engine-portable deterministic bucket in [0, buckets): first 8 md5
    bytes of f"{tag}:{seed}:{key}" mod buckets — the same uint64 DuckDB
    computes with CAST(concat('0x', substr(md5(...),1,16)) AS UBIGINT).
    The per-operator `tag` decorrelates the bucket spaces: without it a
    default 20% sample kept exactly buckets 0-1999 — entirely inside the
    train split's 0-8999 — so sample∘split silently had zero val/test
    rows."""
    h = F.conv(F.substring(F.md5(F.concat_ws(
        ":", F.lit(tag), F.lit(str(seed)), key_col.cast("string"))),
        1, 16), 16, 10).cast("decimal(20,0)")
    return (h % buckets).cast("int")


def deterministic_sample(docs: DataFrame, fraction: float,
                         key_col: str = "doc_id",
                         seed: int = 42) -> DataFrame:
    """Reproducible corpus sampling for web-scale data prep: keep a row iff
    its key's hash bucket falls below fraction·10⁴. No RNG state, no
    shuffle, stable under re-runs / retries / repartitioning — the property
    `rand()`-based sampling loses the moment a task retries — and stable
    under corpus growth (a kept key stays kept)."""
    return docs.filter(
        _hash_bucket(F.col(key_col), seed, "sample")
        < int(round(fraction * 10_000)))


def hash_split(docs: DataFrame, weights: dict[str, float] | None = None,
               key_col: str = "doc_id", seed: int = 42) -> DataFrame:
    """Deterministic train/val/test assignment: the key's hash bucket is cut
    at the cumulative weight boundaries. Every engine that can md5 agrees on
    the split, so downstream stages (and the oracle) never disagree about
    which rows are train."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    if abs(sum(weights.values()) - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {weights}")
    b = _hash_bucket(F.col(key_col), seed, "split")
    expr, acc = None, 0.0
    for name, wt in weights.items():
        acc += wt
        cond = b < int(round(acc * 10_000))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    # float-accumulation guard: the last boundary is exactly 10_000
    return docs.withColumn("split", expr.otherwise(list(weights)[-1]))


# PII patterns — deliberately RE2-safe (no lookaround/backrefs) so the exact
# same pattern strings run in Spark's Java regex AND the DuckDB oracle's RE2.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("phone", r"\+?\d{1,2}[-. ]?\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
]


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Training-data hygiene: replace emails / phone numbers / SSN-shaped ids
    / IPv4 addresses with typed tags ([EMAIL], [PHONE], ...), plus per-kind
    match counts. Pure regexp expressions — one codegen'd map-side scan, no
    shuffle, no Python."""
    out = docs
    red = F.col(text_col)
    for kind, pat in PII_PATTERNS:
        out = out.withColumn(
            f"n_{kind}", F.size(F.regexp_extract_all(red, F.lit(pat), F.lit(0)))
            .cast("long"))
        red = F.regexp_replace(red, pat, f"[{kind.upper()}]")
    return out.withColumn("text_redacted", red)


def repetition_stats(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Gopher/C4-style repetition quality signals: distinct-word ratio,
    most-common-word fraction and most-common-bigram fraction (high values ⇒
    degenerate/boilerplate text a training-data pipeline should down-weight
    or drop).

    Counting strategy: explode tokens → groupBy(doc, token).count() →
    per-doc max — LINEAR in document length. (The previous pure-expression
    form computed `transform(uniq, u -> size(filter(words, w == u)))`,
    O(|uniq|·|words|) inside one row: ~10¹⁰ comparisons in a single task for
    a 100k-word high-entropy document, and long degenerate documents are
    exactly what this filter exists to catch.) The (doc, token) grouping key
    keeps partial aggregation effective — a degenerate doc repeating one
    word collapses map-side, so shuffle volume is per-doc vocabulary, not
    token count — and cannot be skewed across docs since doc_id is in the
    key. explode_outer keeps empty documents (null token row) so every input
    row appears in the output with zero stats."""
    words = F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                     lambda w: w != "")
    n = F.size(words)
    bigrams = F.zip_with(F.slice(words, 1, F.greatest(n - 1, F.lit(0))),
                         F.slice(words, 2, F.greatest(n - 1, F.lit(0))),
                         lambda a, b: F.concat_ws(" ", a, b))
    base = docs.select(F.col(id_col).alias("_id"), words.alias("_words"),
                       bigrams.alias("_bigrams"))

    def _stats(col: str, tok: str):
        return (
            base.select("_id", F.explode_outer(col).alias(tok))
            .groupBy("_id", tok).agg(F.count(F.lit(1)).alias("_c"))
            .groupBy("_id")
            .agg(
                F.sum(F.when(F.col(tok).isNotNull(), F.col("_c"))
                      .otherwise(F.lit(0))).cast("long").alias(f"_n{tok}"),
                F.count(F.col(tok)).cast("long").alias(f"_u{tok}"),
                F.max(F.when(F.col(tok).isNotNull(), F.col("_c")))
                .alias(f"_top{tok}"),
            ))

    w, b = _stats("_words", "_w"), _stats("_bigrams", "_b")
    # both sides are aggregates on _id — co-partitioned, no extra shuffle
    joined = w.join(b, "_id")
    nw = F.greatest(F.col("_n_w"), F.lit(1)).cast("double")
    return joined.select(
        F.col("_id").alias(id_col),
        F.col("_n_w").alias("n_words"),
        F.round(F.col("_u_w") / nw, 6).alias("distinct_word_ratio"),
        F.round(F.coalesce(F.col("_top_w"), F.lit(0)) / nw, 6)
        .alias("top_word_frac"),
        F.round(F.coalesce(F.col("_top_b"), F.lit(0))
                / F.greatest(F.col("_n_b"), F.lit(1)).cast("double"), 6)
        .alias("top_bigram_frac"),
    )


def corpus_stats(docs: DataFrame, text_col: str = "text",
                 group_col: str = "source") -> DataFrame:
    """Per-source corpus statistics (reference analog: chunk stats,
    core/semantic_chunker.py:642-659)."""
    c = F.col(text_col)
    return (
        docs
        .select(F.col(group_col).alias("grp"),
                word_count(c).alias("w"), token_count(c).alias("t"),
                F.length(c).alias("n"))
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("w").cast("long").alias("total_words"),
            F.sum("t").cast("long").alias("total_tokens"),
            F.round(F.avg("w"), 4).alias("avg_words"),
            F.min("n").cast("long").alias("min_chars"),
            F.max("n").cast("long").alias("max_chars"),
        )
    )


def collocations(docs: DataFrame, top_n: int = 30, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Corpus bigram collocations ranked by frequency with an association
    LIFT score — the KG-construction term-mining step (which adjacent word
    pairs co-occur more than chance predicts; Manning & Schütze ch. 5).

    lift(a,b) = P(ab) / (P(a)·P(b)) = c_ab·N / (c_a·c_b) with N = total
    token count. PMI is ln(lift) — monotone in it — but ln() last-ulp parity
    across engines is not guaranteed, so the score is emitted as the exact
    integer fixed-point lift_e6 = (c_ab·N·10^6) div (c_a·c_b): pure integer
    arithmetic, bit-identical in any engine (the repo-wide discipline).

    Scale shape: bigrams are built per-row with zip_with over two array
    slices (no positional self-join), counts are map-side-combinable
    aggregates, the unigram join is onto the bigram-count table (already
    aggregated, not the raw token stream), and top-n is TakeOrdered.
    Overflow: c_ab·N·10^6 <= N²·10^6 — safe in a long to N ≈ 3·10^6 tokens
    per job; beyond that scale the score to e3."""
    words = F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                     lambda w: w != "")
    base = docs.select(F.col(id_col).alias("id"), words.alias("_w"))
    uni = (base.select(F.explode("_w").alias("tok"))
           .groupBy("tok").agg(F.count(F.lit(1)).alias("c")))
    n_tokens = uni.agg(F.sum("c").alias("n"))
    big = base.select(F.explode(
        F.zip_with(F.slice(F.col("_w"), 1, F.greatest(F.size("_w") - 1, F.lit(0))),
                   F.slice(F.col("_w"), 2, F.greatest(F.size("_w") - 1, F.lit(0))),
                   lambda a, b: F.concat_ws(" ", a, b))).alias("bigram"))
    bc = big.groupBy("bigram").agg(F.count(F.lit(1)).alias("c_ab"))
    parts = bc.withColumn("_a", F.split_part(F.col("bigram"), F.lit(" "), F.lit(1))) \
              .withColumn("_b", F.split_part(F.col("bigram"), F.lit(" "), F.lit(2)))
    scored = (
        parts
        .join(uni.select(F.col("tok").alias("_a"), F.col("c").alias("c_a")), "_a")
        .join(uni.select(F.col("tok").alias("_b"), F.col("c").alias("c_b")), "_b")
        .crossJoin(F.broadcast(n_tokens))
        .select(
            "bigram",
            F.col("c_ab").cast("long").alias("c_ab"),
            F.col("c_a").cast("long").alias("c_a"),
            F.col("c_b").cast("long").alias("c_b"),
            F.expr("(c_ab * n * 1000000L) div (c_a * c_b)").alias("lift_e6"))
    )
    return scored.orderBy(F.desc("c_ab"), F.asc("bigram")).limit(top_n)
