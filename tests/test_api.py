"""Public API facade — one function per reference MCP tool."""

from pyspark.sql import functions as F

from knowledge_extraction_pipeline_spark import api


def test_api_end_to_end(spark, transcripts, tmp_path):
    sub = transcripts.filter(F.col("conv_id") < "conv000000030").cache()

    m = api.extract_concepts(sub)
    assert m.count() > 0
    stats = api.get_extraction_stats(m)
    assert stats["conversations"] == 30 and stats["mentions"] == m.count()

    asn = api.resolve_entities(sub)
    assert asn.count() == m.select("norm_term").distinct().count()

    nodes, edges = api.build_knowledge_graph(spark, sub)
    gstats = api.get_graph_statistics(nodes, edges, top_k=5)
    assert gstats["nodes"] == nodes.count()
    assert len(gstats["top_concepts"]) == 5

    chunks = api.create_semantic_chunks(sub)
    assert chunks.count() > 0

    api.export_graph(nodes, edges, str(tmp_path / "g"), fmt="parquet")
    assert spark.read.parquet(str(tmp_path / "g/nodes")).count() == nodes.count()
    api.export_graph(nodes.limit(50), edges.limit(50),
                     str(tmp_path / "g.json"), fmt="json")


def test_api_search_with_filter(spark):
    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = embs.filter(F.col("vec_id") == 0)
    out = api.search_semantic(embs, q, k=5, min_similarity=-1.0,
                              where=F.col("label") >= 0)
    rows = out.collect()
    assert 0 < len(rows) <= 5
    assert all(r["cos"] >= -1.0 for r in rows)


def test_api_search_methods(spark):
    """Every ANN method name routes to its operator and returns the
    (query_id, id, cos, rank) shape; unknown names raise."""
    import pytest as _pytest

    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    q = embs.filter(F.col("vec_id") == 0)
    exact = {r["id"]: r["cos"]
             for r in api.search_semantic(embs, q, k=10**6,
                                          min_similarity=-1.0).collect()}
    for method in (True, "lsh", "ivf", "pq", "ivfpq"):
        rows = api.search_semantic(embs, q, k=5, min_similarity=-1.0,
                                   approximate=method).collect()
        assert 0 < len(rows) <= 5, method
        # every returned score is the exact cosine (approximation affects
        # WHICH candidates are scored, never the score itself)
        for r in rows:
            assert abs(exact[r["id"]] - r["cos"]) < 1e-9, method
    with _pytest.raises(ValueError):
        api.search_semantic(embs, q, approximate="annoy")


def test_jsonl_and_csv_source_roundtrip(spark, tmp_path):
    """Source-format coverage beyond parquet: the documents table written as
    JSONL and CSV reads back value-identical (schema enforced on read —
    never inferred, so a 100 TB read plans without a sampling pass)."""
    from pyspark.sql import functions as F

    from knowledge_extraction_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    schema = "doc_id bigint, text string, lang string, source string, n_chars bigint"

    jdir = str(tmp_path / "docs_jsonl")
    docs.write.json(jdir)
    back_j = spark.read.schema(schema).json(jdir)
    assert back_j.count() == docs.count()
    assert back_j.exceptAll(docs).count() == 0
    assert docs.exceptAll(back_j).count() == 0

    cdir = str(tmp_path / "docs_csv")
    # quote/escape so multi-line or comma-bearing text survives
    docs.write.option("header", True).option("escape", '"').csv(cdir)
    back_c = (spark.read.schema(schema).option("header", True)
              .option("escape", '"').option("multiLine", True).csv(cdir)
              .withColumn("text", F.coalesce("text", F.lit(""))))
    assert back_c.count() == docs.count()
    assert back_c.exceptAll(docs).count() == 0


def test_dataprep_job(spark, tmp_path):
    """The composed data-prep job (jobs/run_dataprep.py): dedup → quality
    gate → PII redaction → split → partitioned write, with a metrics row;
    counts are monotone non-increasing through the gates and the split
    partitions re-read to the gated total."""
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "run_dataprep",
        pathlib.Path(__file__).resolve().parents[1] / "jobs" / "run_dataprep.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    out = str(tmp_path / "prep")
    import os
    os.makedirs(out, exist_ok=True)
    m = mod.run(spark, "/root/testdata/sf0.001", out)
    assert m["n_input"] >= m["n_after_dedup"] >= m["n_after_quality"] > 0
    assert set(m["split_counts"]) <= {"train", "val", "test"}
    assert sum(m["split_counts"].values()) == m["n_after_quality"]

    # full-option run: decontaminate + domain budget + packing manifest
    out2 = str(tmp_path / "prep_full")
    os.makedirs(out2, exist_ok=True)
    m2 = mod.run(spark, "/root/testdata/sf0.001", out2,
                 decontaminate_threshold=0.8, domain_budget=500,
                 pack_tokens=256)
    total2 = sum(m2["split_counts"].values())
    assert total2 == (m2["n_after_quality"] - m2["n_decontaminated"]
                      - m2["n_over_budget"])
    assert m2["n_pack_bins"] > 0
    packed = spark.read.parquet(os.path.join(out2, "packing"))
    docs2 = spark.read.parquet(os.path.join(out2, "documents"))
    # the manifest covers exactly the train shard that was written
    assert packed.count() == docs2.filter("split = 'train'").count()
    back = spark.read.parquet(out + "/documents")
    assert back.count() == m["n_after_quality"]
    assert set(r["split"] for r in back.select("split").distinct().collect()) \
        == set(m["split_counts"])
