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
