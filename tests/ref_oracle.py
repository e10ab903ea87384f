"""Reference-parity oracle: runs the reference repo's own deterministic
operators in-process (imported straight from /root/reference — NOT copied)
over concepts derived from the same transcripts, producing the expected
entity groups and typed relationships for the P/R >= 0.95 assertion
(BASELINE.json metric).

Deterministic reference path exercised:
  exact_string_resolution + known_alias_resolution +
  extract_cooccurrence_relationships      (mcp/graph_tools.py:32-234)
  infer_relationship_type                 (scripts/type_relationships.py:107-128)
"""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

REF = Path("/root/reference")


def _load(name: str, rel: str):
    spec = importlib.util.spec_from_file_location(name, REF / rel)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


graph_tools = _load("ref_graph_tools", "src/knowledge_extraction/mcp/graph_tools.py")
type_rel = _load("ref_type_relationships", "scripts/type_relationships.py")


def concepts_from_rows(rows) -> list[dict]:
    """Turn collected transcript rows into the reference's concept dicts using
    the SAME lexicon matcher the Spark UDF uses. Order = (conv_id, turn_idx,
    start) — the global first-occurrence order our pipeline reproduces."""
    from knowledge_extraction_pipeline_spark.functions.lexicon import (
        extract_mentions_text,
    )

    rows = sorted(rows, key=lambda r: (r["conv_id"], r["turn_idx"]))
    concepts = []
    for r in rows:
        for m in extract_mentions_text(r["text"]):
            concepts.append({
                "term": m["term"],
                "category": m["category"],
                "importance": m["importance"],
                "chunk_id": f'{r["conv_id"]}#{r["turn_idx"]}',
                "source_file": r["conv_id"],
                "page": r["turn_idx"],
            })
    return concepts


def oracle_graph(rows, min_cooccurrences: int = 2):
    """→ (entities, typed_relationships) per the reference's deterministic
    path, over the given transcript rows."""
    concepts = concepts_from_rows(rows)
    entities, _ = graph_tools.exact_string_resolution(concepts)
    entities = graph_tools.known_alias_resolution(entities)
    chunk_ids = sorted({c["chunk_id"] for c in concepts})
    chunks = [{"chunk_id": cid, "text": ""} for cid in chunk_ids]
    rels = graph_tools.extract_cooccurrence_relationships(
        entities, chunks, min_cooccurrences=min_cooccurrences)

    entity_category = {}
    for e in entities:
        term = e.get("canonical_term") or e.get("term")
        entity_category[term] = e.get("category", "concept")
    for r in rels:
        r["type"] = type_rel.infer_relationship_type(
            entity_category.get(r["source"], "concept"),
            entity_category.get(r["target"], "concept"),
        )
    return entities, rels
