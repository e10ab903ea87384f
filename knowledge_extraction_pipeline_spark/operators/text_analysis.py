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
