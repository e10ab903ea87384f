import json
import xml.etree.ElementTree as ET

import pytest

from knowledge_extraction_pipeline_spark.sources.exports import (
    export_graphml,
    export_json,
)


@pytest.fixture()
def small_graph(spark):
    nodes = spark.createDataFrame(
        [("a", "A Term", ["alias1"]), ("b", "B Term", [])],
        "canon string, canonical_term string, aliases array<string>")
    edges = spark.createDataFrame(
        [("a", "RELATED_TO", "b", 3)],
        "subj string, pred string, obj string, common long")
    return nodes, edges


def test_export_json(spark, small_graph, tmp_path):
    nodes, edges = small_graph
    p = tmp_path / "g.json"
    stats = export_json(nodes, edges, str(p))
    doc = json.loads(p.read_text())
    assert stats == {"nodes": 2, "edges": 1}
    assert {n["id"] for n in doc["nodes"]} == {"a", "b"}
    assert doc["edges"][0]["source"] == "a" and doc["edges"][0]["target"] == "b"


def test_export_graphml_parses(spark, small_graph, tmp_path):
    nodes, edges = small_graph
    p = tmp_path / "g.graphml"
    n = export_graphml(nodes, edges, str(p))
    assert n == 3
    root = ET.parse(p).getroot()
    ns = "{http://graphml.graphdrawing.org/xmlns}"
    g = root.find(f"{ns}graph")
    assert len(g.findall(f"{ns}node")) == 2
    assert len(g.findall(f"{ns}edge")) == 1


def test_export_html(spark, small_graph, tmp_path):
    from knowledge_extraction_pipeline_spark.sources.exports import export_html
    nodes, edges = small_graph
    # + an isolated node so the component layout has two components
    nodes = nodes.union(spark.createDataFrame(
        [("z", "Z Term", [])], nodes.schema))
    p = tmp_path / "g.html"
    stats = export_html(nodes, edges, str(p))
    assert stats == {"nodes": 3, "edges": 1, "components": 2}
    html = p.read_text()
    assert html.startswith("<!DOCTYPE html>")
    assert "canvas" in html and '"id": "a"' in html
    # every node got deterministic coordinates
    doc = json.loads(html.split("const G=")[1].split(";\n")[0])
    assert all("x" in n and "y" in n for n in doc["nodes"])


def test_export_cap(spark, tmp_path):
    from knowledge_extraction_pipeline_spark.sources import exports
    old = exports.MAX_EXPORT_ROWS
    exports.MAX_EXPORT_ROWS = 5
    try:
        big = spark.range(10).selectExpr("cast(id as string) canon")
        edges = spark.createDataFrame([], "subj string, obj string")
        with pytest.raises(ValueError, match="filter or top-k"):
            export_json(big, edges, str(tmp_path / "x.json"))
    finally:
        exports.MAX_EXPORT_ROWS = old


def test_export_html_script_injection_escaped(spark, tmp_path):
    """Graph data containing '</script>' or '<!--<script' must not break out
    of the script element — every '<' in the payload is \\u003c-escaped."""
    from knowledge_extraction_pipeline_spark.sources.exports import export_html

    nodes = spark.createDataFrame(
        [("</script><b>x", "<!--<script evil"), ("n2", "ok")],
        "canon string, canonical_term string")
    edges = spark.createDataFrame(
        [("</script><b>x", "RELATED_TO", "n2")],
        "subj string, pred string, obj string")
    p = tmp_path / "inj.html"
    export_html(nodes, edges, str(p))
    html = p.read_text()
    start = html.index("const G=")
    end = html.index(";\n", start)
    payload = html[start:end]
    assert "<" not in payload[len("const G="):]
    assert "\\u003c" in payload
