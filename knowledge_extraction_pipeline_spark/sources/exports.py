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


def export_html(nodes: DataFrame, edges: DataFrame, path: str,
                title: str = "Knowledge graph") -> dict:
    """Self-contained interactive HTML visualization — the reference's
    create_graph_visualization (visualization/graph_viz.py + the BFS
    component layout of optimized_renderer.py:19-42) without its pyvis/
    networkx dependency: one file, embedded JSON, canvas renderer with a
    deterministic component-grid + per-component circular layout computed
    HERE (driver-side, row-capped like every export), pan/zoom/hover in
    ~60 lines of inline JS."""
    import math
    from collections import defaultdict, deque

    n = _collect_capped(nodes, "nodes")
    e = _collect_capped(edges, "edges")
    ids = [str(r.get("canon") or r.get("id")) for r in n]
    idset = set(ids)
    adj = defaultdict(list)
    for r in e:
        s, t = str(r.get("subj")), str(r.get("obj"))
        if s in idset and t in idset:
            adj[s].append(t)
            adj[t].append(s)

    # connected components by BFS, largest first (optimized_renderer.py:19-42)
    seen: set[str] = set()
    comps: list[list[str]] = []
    for nid in ids:
        if nid in seen:
            continue
        comp, q = [], deque([nid])
        seen.add(nid)
        while q:
            u = q.popleft()
            comp.append(u)
            for v in adj[u]:
                if v not in seen:
                    seen.add(v)
                    q.append(v)
        comps.append(comp)
    comps.sort(key=len, reverse=True)

    # component grid; nodes on a circle within their component cell
    pos = {}
    grid = max(1, math.ceil(math.sqrt(len(comps))))
    for ci, comp in enumerate(comps):
        cx = (ci % grid) * 400 + 200
        cy = (ci // grid) * 400 + 200
        radius = 40 + 12 * math.sqrt(len(comp))
        for j, nid in enumerate(sorted(comp)):
            a = 2 * math.pi * j / max(1, len(comp))
            pos[nid] = (round(cx + radius * math.cos(a), 1),
                        round(cy + radius * math.sin(a), 1))

    deg = {nid: len(adj[nid]) for nid in ids}
    doc = {
        "nodes": [{"id": nid,
                   "x": pos[nid][0], "y": pos[nid][1],
                   "deg": deg.get(nid, 0),
                   "label": str(r.get("canonical_term") or nid)}
                  for nid, r in zip(ids, n)],
        "edges": [{"s": str(r.get("subj")), "t": str(r.get("obj")),
                   "p": str(r.get("pred", ""))}
                  for r in e
                  if str(r.get("subj")) in idset and str(r.get("obj")) in idset],
    }
    # escape for <script> context: any '<' in the payload could open
    # '</script>' or the '<!--' double-escaped-script state (markup/script
    # injection from graph data — the reference's pyvis path HTML-escapes
    # labels); the \\u003c escape is the identical string to a JSON parser
    g_json = json.dumps(doc).replace("<", "\\u003c")
    html = f"""<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{escape(title)}</title>
<style>body{{margin:0;font:13px sans-serif}}#tip{{position:fixed;background:#222;
color:#fff;padding:4px 8px;border-radius:4px;pointer-events:none;display:none}}
canvas{{display:block}}</style></head><body>
<div id="tip"></div><canvas id="c"></canvas>
<script>
const G={g_json};
const cv=document.getElementById('c'),cx=cv.getContext('2d'),tip=document.getElementById('tip');
let sc=0.9,ox=30,oy=30,drag=null;
const byId={{}};G.nodes.forEach(n=>byId[n.id]=n);
function draw(){{cv.width=innerWidth;cv.height=innerHeight;cx.clearRect(0,0,cv.width,cv.height);
cx.save();cx.translate(ox,oy);cx.scale(sc,sc);
cx.strokeStyle='#bbb';G.edges.forEach(e=>{{const a=byId[e.s],b=byId[e.t];if(!a||!b)return;
cx.beginPath();cx.moveTo(a.x,a.y);cx.lineTo(b.x,b.y);cx.stroke();}});
G.nodes.forEach(n=>{{const r=3+Math.sqrt(n.deg)*2;cx.fillStyle='#3b6fb6';
cx.beginPath();cx.arc(n.x,n.y,r,0,7);cx.fill();
if(sc>0.7){{cx.fillStyle='#333';cx.fillText(n.label,n.x+r+2,n.y+3);}}}});cx.restore();}}
cv.onwheel=e=>{{e.preventDefault();const f=e.deltaY<0?1.1:0.9;
ox=e.clientX-(e.clientX-ox)*f;oy=e.clientY-(e.clientY-oy)*f;sc*=f;draw();}};
cv.onmousedown=e=>drag=[e.clientX-ox,e.clientY-oy];
cv.onmouseup=()=>drag=null;
cv.onmousemove=e=>{{if(drag){{ox=e.clientX-drag[0];oy=e.clientY-drag[1];draw();return;}}
const mx=(e.clientX-ox)/sc,my=(e.clientY-oy)/sc;
const hit=G.nodes.find(n=>(n.x-mx)**2+(n.y-my)**2<64);
if(hit){{tip.style.display='block';tip.style.left=(e.clientX+10)+'px';
tip.style.top=(e.clientY+10)+'px';tip.textContent=hit.label+' (deg '+hit.deg+')';}}
else tip.style.display='none';}};
addEventListener('resize',draw);draw();
</script></body></html>"""
    Path(path).write_text(html)
    return {"nodes": len(doc["nodes"]), "edges": len(doc["edges"]),
            "components": len(comps)}


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
