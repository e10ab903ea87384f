"""Graph export sinks — reference analogs of core/graph_builder.py:
export_json (:251-293) and export_graphml (:295-317).

At scale the graph IS the nodes/edges Parquet tables; these exporters exist
for interop with the reference's consumers (Cytoscape.js JSON, GraphML) and
are driver-side by design — they are for human-scale subgraphs (the reference
itself caps visualization at ~10K nodes, mcp/server.py:570). Callers should
filter/top-k first; a hard cap guards against accidentally collecting a
billion-row table."""

from __future__ import annotations

import json
from pathlib import Path
from xml.sax.saxutils import escape

from pyspark.sql import DataFrame

MAX_EXPORT_ROWS = 100_000


def _collect_capped(df: DataFrame, what: str) -> list[dict]:
    rows = df.limit(MAX_EXPORT_ROWS + 1).collect()
    if len(rows) > MAX_EXPORT_ROWS:
        raise ValueError(
            f"{what} has more than {MAX_EXPORT_ROWS} rows — filter or top-k "
            "before exporting (driver-side export is for subgraphs)")
    return [r.asDict(recursive=True) for r in rows]


def export_json(nodes: DataFrame, edges: DataFrame, path: str) -> dict:
    """nodes+edges+stats JSON document (graph_builder.py:251-293 schema:
    {nodes:[{id,+attrs}], edges:[{source,target,+attrs}], stats})."""
    n = _collect_capped(nodes, "nodes")
    e = _collect_capped(edges, "edges")
    doc = {
        "nodes": [{"id": r.get("canon") or r.get("id"), **r} for r in n],
        "edges": [{"source": r.get("subj"), "target": r.get("obj"), **r} for r in e],
        "stats": {"nodes": len(n), "edges": len(e)},
    }
    Path(path).write_text(json.dumps(doc, indent=2, default=str))
    return doc["stats"]


def export_graphml(nodes: DataFrame, edges: DataFrame, path: str) -> int:
    """Minimal GraphML writer; list attrs flattened to comma-joined strings
    (exactly the reference's behavior, graph_builder.py:295-317)."""
    n = _collect_capped(nodes, "nodes")
    e = _collect_capped(edges, "edges")

    def flat(v):
        if isinstance(v, (list, tuple)):
            return ",".join(str(x) for x in v)
        if isinstance(v, dict):
            return ",".join(f"{k}:{x}" for k, x in v.items())
        return "" if v is None else str(v)

    lines = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<graphml xmlns="http://graphml.graphdrawing.org/xmlns">',
        '<graph edgedefault="directed">',
    ]
    for r in n:
        nid = escape(str(r.get("canon") or r.get("id")))
        lines.append(f'<node id="{nid}">')
        for k, v in r.items():
            lines.append(f'  <data key="{escape(k)}">{escape(flat(v))}</data>')
        lines.append("</node>")
    for r in e:
        s, t = escape(str(r.get("subj"))), escape(str(r.get("obj")))
        lines.append(f'<edge source="{s}" target="{t}">')
        for k, v in r.items():
            lines.append(f'  <data key="{escape(k)}">{escape(flat(v))}</data>')
        lines.append("</edge>")
    lines += ["</graph>", "</graphml>"]
    Path(path).write_text("\n".join(lines))
    return len(n) + len(e)
