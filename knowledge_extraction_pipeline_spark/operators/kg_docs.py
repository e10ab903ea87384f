"""KG-construction semantics expressed over the generic `documents` corpus —
the DuckDB-oracle-checkable twin of the transcripts pipeline (same formulas,
same thresholds; documents stand in for turns, doc_id for chunk_id).

Used by __spark_entry__.queries()/oracle_sql() so the co-occurrence / typing /
dedup semantics get independently verified against SQL every round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import (
    CATEGORY_RELATIONSHIPS,
    CONFIDENCE_SATURATION,
    DEFAULT_RELATIONSHIP_TYPE,
    MIN_COOCCURRENCES,
)

# Lexicon over the synthetic documents vocabulary; categories chosen from the
# reference's core set so category-pair typing is exercised.
DOC_LEXICON: list[tuple[str, str]] = [
    ("spark", "tool"), ("hash", "method"), ("merge", "method"),
    ("window", "concept"), ("scan", "method"), ("join", "method"),
    ("filter", "method"), ("sort", "method"), ("vector", "concept"),
    ("stream", "phenomenon"), ("batch", "concept"), ("agg", "method"),
    ("query", "concept"), ("table", "tool"), ("column", "concept"),
]


def resolved_type(cat_a: str, cat_b: str) -> str:
    return CATEGORY_RELATIONSHIPS.get(
        (cat_a, cat_b),
        CATEGORY_RELATIONSHIPS.get((cat_b, cat_a), DEFAULT_RELATIONSHIP_TYPE))


def lexicon_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(DOC_LEXICON, "term string, category string")


def doc_mentions(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """(doc_id, term, category) for every lexicon term present in the doc.
    Broadcast nested-loop over a 15-row lexicon — map-side only."""
    lex = F.broadcast(lexicon_df(spark))
    words = F.split(F.col("text"), " ")
    return (
        docs.select("doc_id", words.alias("words"))
        .join(lex)
        .filter(F.array_contains(F.col("words"), F.col("term")))
        .select("doc_id", "term", "category")
    )


def doc_cooccurrence_edges(spark: SparkSession, docs: DataFrame,
                           min_cooccurrences: int = MIN_COOCCURRENCES) -> DataFrame:
    """Co-occurrence edges over documents with the reference's exact formulas
    (graph_tools.py:203-231); pair orientation = lexicographic (both the Spark
    and SQL sides use the same rule)."""
    m = doc_mentions(spark, docs).select("doc_id", "term").distinct()
    n_docs = m.groupBy("term").count().withColumnRenamed("count", "n")
    a, b = m.alias("a"), m.alias("b")
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("a.term") < F.col("b.term"))
        .groupBy(F.col("a.term").alias("term_a"), F.col("b.term").alias("term_b"))
        .agg(F.count(F.lit(1)).alias("common"))
        .filter(F.col("common") >= min_cooccurrences)
    )
    return (
        pairs
        .join(F.broadcast(n_docs.select(F.col("term").alias("term_a"),
                                        F.col("n").alias("n_a"))), "term_a")
        .join(F.broadcast(n_docs.select(F.col("term").alias("term_b"),
                                        F.col("n").alias("n_b"))), "term_b")
        .select(
            "term_a", "term_b", "common",
            F.round(F.col("common") / F.least("n_a", "n_b"), 6).alias("strength"),
            F.round(F.least(F.lit(1.0), F.col("common") / CONFIDENCE_SATURATION), 6)
            .alias("confidence"),
        )
    )


def doc_typed_edges(spark: SparkSession, docs: DataFrame,
                    edges: DataFrame | None = None) -> DataFrame:
    """Co-occurrence edges upgraded to semantic types via the category-pair
    rule table (scripts/type_relationships.py:27-128). Pass `edges` to reuse
    an already-built co-occurrence table (the queries registry memoizes it
    across the sweep)."""
    if edges is None:
        edges = doc_cooccurrence_edges(spark, docs)
    lex = lexicon_df(spark)
    typing = spark.createDataFrame(
        [(a, b, resolved_type(ca, cb))
         for a, ca in DOC_LEXICON for b, cb in DOC_LEXICON],
        "term_a string, term_b string, pred string")
    return (
        edges.join(F.broadcast(typing), on=["term_a", "term_b"])
        .select("term_a", "pred", "term_b", "common", "strength", "confidence")
    )


def doc_degree_centrality(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Degree per entity over the co-occurrence graph (reference:
    nx.degree_centrality, graph_builder.py:177)."""
    e = doc_cooccurrence_edges(spark, docs)
    und = e.select(F.col("term_a").alias("term")).unionAll(
        e.select(F.col("term_b").alias("term")))
    return und.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("degree"))


def lexicon_values_sql() -> str:
    vals = ", ".join(f"('{t}', '{c}')" for t, c in DOC_LEXICON)
    return f"(VALUES {vals}) AS lex(term, category)"


def typing_values_sql() -> str:
    vals = ", ".join(
        f"('{a}', '{b}', '{resolved_type(ca, cb)}')"
        for a, ca in DOC_LEXICON for b, cb in DOC_LEXICON)
    return f"(VALUES {vals}) AS typ(term_a, term_b, pred)"
