"""The orchestrated, checkpointed, resumable KG-construction pipeline.

Spark analog of the reference's run_complete_pipeline
(scripts/process_pdf.py:42-354) and batch_process (scripts/batch_process.py):
each stage reads the previous checkpoint table, writes its own + metrics rows,
and is skipped on re-run if already committed (resume without recompute).

    run_pipeline(spark, transcripts, run_dir)
        extract      → mentions, triples_raw
        link         → candidate edges (alias + MinHash-LSH)
        canonicalize → assignments(norm_term, canon)
        materialize  → nodes, edges

Ship via: spark-submit --py-files kg_spark.zip jobs/run_pipeline.py ...
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ..operators.canonicalize import canonicalize_stage
from ..operators.extract import extract_stage
from ..operators.link import distinct_terms, link_stage
from ..operators.materialize import materialize_stage
from ..sources.tables import checkpoint_read, checkpoint_write, stage_committed


@dataclass
class PipelineResult:
    mentions: DataFrame
    triples_raw: DataFrame
    candidates: DataFrame
    assignments: DataFrame
    nodes: DataFrame
    edges: DataFrame
    recomputed_stages: list[str]


def run_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    run_dir: str,
    enable_fuzzy: bool = True,
) -> PipelineResult:
    recomputed: list[str] = []

    # ── stage 1: extract ────────────────────────────────────────────
    if stage_committed(run_dir, "extract", "mentions") and \
       stage_committed(run_dir, "extract", "triples_raw"):
        mentions = checkpoint_read(spark, run_dir, "extract", "mentions")
        triples_raw = checkpoint_read(spark, run_dir, "extract", "triples_raw")
    else:
        m, tr = extract_stage(transcripts)
        mentions = checkpoint_write(m, run_dir, "extract", "mentions")
        triples_raw = checkpoint_write(tr, run_dir, "extract", "triples_raw")
        recomputed.append("extract")

    # the vocabulary is consumed by both stage 2 and stage 3 — one scan
    terms = None

    def _terms():
        nonlocal terms
        if terms is None:
            terms = distinct_terms(mentions).localCheckpoint(eager=True)
        return terms

    # ── stage 2: link ───────────────────────────────────────────────
    if stage_committed(run_dir, "link", "candidates"):
        candidates = checkpoint_read(spark, run_dir, "link", "candidates")
    else:
        candidates = checkpoint_write(
            link_stage(mentions, enable_fuzzy=enable_fuzzy, terms=_terms()),
            run_dir, "link", "candidates")
        recomputed.append("link")

    # ── stage 3: canonicalize ───────────────────────────────────────
    if stage_committed(run_dir, "canonicalize", "assignments"):
        assignments = checkpoint_read(spark, run_dir, "canonicalize", "assignments")
    else:
        assignments = checkpoint_write(
            canonicalize_stage(_terms(), candidates),
            run_dir, "canonicalize", "assignments")
        recomputed.append("canonicalize")

    # ── stage 4: materialize ────────────────────────────────────────
    if stage_committed(run_dir, "materialize", "nodes") and \
       stage_committed(run_dir, "materialize", "edges"):
        nodes = checkpoint_read(spark, run_dir, "materialize", "nodes")
        edges = checkpoint_read(spark, run_dir, "materialize", "edges")
    else:
        n, e = materialize_stage(spark, mentions, triples_raw, assignments)
        nodes = checkpoint_write(n, run_dir, "materialize", "nodes")
        edges = checkpoint_write(e, run_dir, "materialize", "edges")
        recomputed.append("materialize")

    return PipelineResult(
        mentions=mentions, triples_raw=triples_raw, candidates=candidates,
        assignments=assignments, nodes=nodes, edges=edges,
        recomputed_stages=recomputed,
    )
