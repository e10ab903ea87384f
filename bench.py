#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline metric: KG-pipeline triple throughput (triples/sec) at
local[$SPARK_GRAFT_CPUS], plus the north-rule two-cluster-size criterion
evidenced as local[N/4] vs local[N] scaling efficiency on identical input
(BASELINE.json: efficiency >= 0.8 between N and 4N executors).

Env:
  SPARK_GRAFT_SF_DIR  (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    (default 32)
  BENCH_SKIP_SCALING  (set to skip the second, smaller-parallelism run)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else 0.1

# ~1M turns/sf-unit, ~8 turns/conv → conv count scaled to sf.
N_CONVS = max(200, int(125_000 * SF))

HEADLINE_QUERIES = [
    "q1_pricing_summary",
    "q_revenue_by_nation",
    "q_top_parts",
    "q_events_sessionize",
    "kg_typed_edges_docs",
    "dedup_minhash_docs",
    "dedup_exact_docs",
    "ann_topk_cosine",
    "text_corpus_stats",
]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_pipeline(master: str, shuffle: int) -> tuple[float, int]:
    """Full extract→link→canonicalize→materialize on generated transcripts.
    Returns (wall_seconds, emitted_triples)."""
    from knowledge_extraction_pipeline_spark.operators.canonicalize import (
        canonicalize_stage,
    )
    from knowledge_extraction_pipeline_spark.operators.extract import extract_stage
    from knowledge_extraction_pipeline_spark.operators.link import (
        distinct_terms,
        link_stage,
    )
    from knowledge_extraction_pipeline_spark.operators.materialize import (
        materialize_stage,
    )
    from knowledge_extraction_pipeline_spark.session import get_spark
    from knowledge_extraction_pipeline_spark.sources.transcripts_gen import (
        generate_transcripts,
    )

    spark = get_spark(app_name=f"bench-{master}", master=master,
                      shuffle_partitions=shuffle)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        t = generate_transcripts(spark, N_CONVS)
        # materialize the input once so generation cost is out of the timing
        t = t.cache()
        n_turns = t.count()
        t0 = time.time()
        m, tr = extract_stage(t)
        m = m.localCheckpoint(eager=True)
        tr = tr.localCheckpoint(eager=True)
        asn = canonicalize_stage(distinct_terms(m), link_stage(m))
        nodes, edges = materialize_stage(spark, m, tr, asn)
        n_nodes = nodes.count()
        n_edges = edges.count()
        n_triples = tr.count()
        wall = time.time() - t0
        log(f"  {master}: turns={n_turns} triples={n_triples} "
            f"nodes={n_nodes} edges={n_edges} wall={wall:.1f}s")
        return wall, n_triples
    finally:
        spark.stop()


def main():
    from knowledge_extraction_pipeline_spark.queries import QUERIES
    from knowledge_extraction_pipeline_spark.session import get_spark

    results: dict[str, float] = {}

    spark = get_spark(app_name="bench-queries", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    for name in HEADLINE_QUERIES:
        t0 = time.time()
        n = QUERIES[name](spark, SF_DIR).count()
        dt = time.time() - t0
        results[name] = round(dt, 3)
        log(f"  {name}: {n} rows in {dt:.2f}s")
    spark.stop()

    # KG pipeline at full parallelism, then quarter parallelism (two-cluster
    # scaling criterion: N vs 4N cores on identical input).
    wall_full, triples = run_pipeline(f"local[{CPUS}]", CPUS)
    results["kg_pipeline"] = round(wall_full, 3)
    thr_full = triples / wall_full

    scaling = {}
    if not os.environ.get("BENCH_SKIP_SCALING"):
        small = max(1, CPUS // 4)
        wall_small, _ = run_pipeline(f"local[{small}]", small)
        thr_small = triples / wall_small
        eff = (thr_full / thr_small) / (CPUS / small)
        scaling = {
            "cores_small": small, "cores_large": CPUS,
            "triples_per_sec_small": round(thr_small, 1),
            "triples_per_sec_large": round(thr_full, 1),
            "speedup": round(thr_full / thr_small, 3),
            "scaling_efficiency": round(eff, 3),
        }
        results["kg_pipeline_quarter_cores"] = round(wall_small, 3)

    out = {
        "metric": "kg_pipeline_triples_per_sec",
        "value": round(thr_full, 1),
        "unit": "sec",
        "queries": results,
        "sf": SF,
        "n_convs": N_CONVS,
        "triples": triples,
        "scaling": scaling,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
