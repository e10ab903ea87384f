"""Byte-pair-encoding vocabulary induction over a document corpus — the
tokenizer-training step of an LLM data pipeline (Sennrich et al. 2016),
re-expressed as a deterministic distributed recurrence.

Representation trick that makes the run engine-portable: a word's symbol
sequence is stored as a bracket-wrapped string, e.g. "agg" → ``<a><g><g>``.
Applying a merge (l, r) is then one *literal* string replace of ``<l><r>``
with ``<lr>`` — and because every token is delimited on both sides, adjacent
matches never share boundary characters, so the engine's non-overlapping
left-to-right replace is exactly the greedy sequential BPE merge (including
the classic "aaa + (a,a) → (aa, a)" overlap rule). Spark's ``replace`` and
DuckDB's ``replace`` therefore produce byte-identical vocab states, and the
whole recurrence unrolls into a SQL oracle.

Scale shape: training state is the *distinct-word frequency table* (≪ corpus;
~10⁷-10⁸ rows at 100 TB), built by one exact groupBy over the corpus. Each
merge iteration is (a) one map-side-combinable pair-count aggregate over that
table, (b) a 1-row argmax collected to the driver (count desc, then
lexicographic pair — deterministic under any partitioning since the counts
are exact longs), and (c) one map-side literal replace. n_merges iterations ⇒
n_merges linear scans of the vocab table, never of the corpus. The argmax
driver round-trip is inherent to BPE's sequential dependency; everything else
stays distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MERGES_SCHEMA = ("merge_rank long, lhs string, rhs string, pair_count long, "
                 "merged string")


def _word_freq(docs: DataFrame, text_col: str) -> DataFrame:
    """Distinct-word frequency table with bracket-wrapped character symbols."""
    words = (docs.select(F.explode(F.split(F.col(text_col), " "))
                         .alias("word"))
             .filter(F.col("word") != "")
             .groupBy("word").agg(F.count(F.lit(1)).alias("cnt")))
    # the bracket symbol encoding reserves '<' and '>'; a corpus word
    # containing them would corrupt pair splits and merge replaces, so
    # refuse loudly (one tiny aggregate over the vocab, not the corpus)
    n_bad = words.filter(F.col("word").rlike("[<>]")).limit(1).count()
    if n_bad:
        raise ValueError(
            "bpe_train: corpus words contain '<' or '>', which the "
            "bracket symbol encoding reserves — escape or strip them "
            "upstream (e.g. regexp_replace) before training")
    chars = F.filter(F.split(F.col("word"), ""), lambda c: c != "")
    syms = F.concat_ws(
        "", F.transform(chars, lambda c: F.concat(F.lit("<"), c, F.lit(">"))))
    return words.select(syms.alias("syms"), "cnt")


def _adjacent_pairs(vocab: DataFrame) -> DataFrame:
    """(l, r, c): corpus-weighted counts of adjacent symbol pairs."""
    toks = F.split(
        F.expr("substring(syms, 2, length(syms) - 2)"), "><")
    pairs = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("l"), b.alias("r")))
    return (vocab.filter(F.size(toks) >= 2)
            .select(F.explode(pairs).alias("p"), "cnt")
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("cnt").alias("c")))


def bpe_train(spark: SparkSession, docs: DataFrame, text_col: str = "text",
              n_merges: int = 12) -> DataFrame:
    """Learn `n_merges` BPE merges; returns the merge table
    (merge_rank, lhs, rhs, pair_count, merged) in training order. Stops early
    (fewer rows) only if the vocabulary runs out of adjacent pairs."""
    if n_merges <= 0:
        raise ValueError(f"n_merges must be positive, got {n_merges}")
    vocab = _word_freq(docs, text_col).localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, int, str]] = []
    for rank in range(1, n_merges + 1):
        best = (_adjacent_pairs(vocab)
                .orderBy(F.desc("c"), "l", "r").limit(1).collect())
        if not best:
            break
        l, r, c = best[0]["l"], best[0]["r"], int(best[0]["c"])
        merges.append((rank, l, r, c, l + r))
        vocab = (vocab.select(
            F.replace(F.col("syms"),
                      F.lit(f"<{l}><{r}>"), F.lit(f"<{l}{r}>")).alias("syms"),
            "cnt").localCheckpoint(eager=True))
    return spark.createDataFrame(merges, MERGES_SCHEMA)


def bpe_encode(docs: DataFrame, merges: list[tuple[str, str]],
               text_col: str = "text") -> DataFrame:
    """Tokenize text with a learned merge list: apply every merge in training
    order as the same literal bracket replace (map-side only, no shuffle),
    appending an array<string> `bpe_tokens` column. `merges` is the
    driver-side [(lhs, rhs), ...] list — small by construction (the vocab
    budget), applied as a chain of literal replaces."""
    words = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    sym = F.transform(
        words,
        lambda w: F.concat_ws("", F.transform(
            F.filter(F.split(w, ""), lambda c: c != ""),
            lambda c: F.concat(F.lit("<"), c, F.lit(">")))))
    col = sym
    for l, r in merges:
        col = F.transform(
            col, lambda s: F.replace(s, F.lit(f"<{l}><{r}>"),
                                     F.lit(f"<{l}{r}>")))
    toks = F.flatten(F.transform(
        col,
        lambda s: F.split(F.substring(s, F.lit(2), F.length(s) - 2), "><")))
    return docs.withColumn("bpe_tokens", toks)
