#!/usr/bin/env python
"""Per-phase wall-clock profile of the bench scaling run.

Usage: python scripts/profile_scaling.py <cores> <n_convs>

Times each pipeline phase separately so the serial/fixed component (Amdahl F)
can be separated from the parallel work (W): eff(1→4) = (F+W)/(4F+W), so
every second of F costs ~3s of the small-run budget.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    cores = int(sys.argv[1])
    n_convs = int(sys.argv[2])
    shuffle = int(sys.argv[3]) if len(sys.argv) > 3 else 8

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

    extra = {}
    if os.environ.get("PROF_AQE_OFF"):
        extra["spark.sql.adaptive.enabled"] = "false"
    if os.environ.get("PROF_JAVA_OPTS"):
        extra["spark.driver.extraJavaOptions"] = os.environ["PROF_JAVA_OPTS"]
    spark = get_spark(app_name=f"profile-{cores}", master=f"local[{cores}]",
                      shuffle_partitions=shuffle, extra_conf=extra or None)
    spark.sparkContext.setLogLevel("ERROR")

    t = generate_transcripts(spark, n_convs).cache()
    n_turns = t.count()
    print(f"cores={cores} convs={n_convs} turns={n_turns}", flush=True)

    marks = []

    def mark(label, t0):
        dt = time.time() - t0
        marks.append((label, dt))
        print(f"  {label}: {dt:.2f}s", flush=True)

    t_all = time.time()

    t0 = time.time()
    m, tr = extract_stage(t)
    terms = distinct_terms(m).localCheckpoint(eager=True)
    mark("extract+distinct_terms (regex scan + persist)", t0)

    t0 = time.time()
    asn = canonicalize_stage(terms, link_stage(m, terms=terms)) \
        .localCheckpoint(eager=True)
    mark("link+canonicalize (LSH + CC)", t0)

    t0 = time.time()
    nodes, edges = materialize_stage(spark, m, tr, asn)
    mark("materialize plan build (driver only)", t0)

    t0 = time.time()
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(2) as ex:
        f_nodes = ex.submit(nodes.count)
        f_edges = ex.submit(edges.count)
        n_nodes, n_edges = f_nodes.result(), f_edges.result()
    mark(f"nodes+edges counts concurrent ({n_nodes}/{n_edges})", t0)

    wall = time.time() - t_all
    print(f"TOTAL {wall:.2f}s", flush=True)

    t0 = time.time()
    n_triples = tr.count()
    mark(f"triples.count ({n_triples}) [untimed in bench]", t0)
    spark.stop()


if __name__ == "__main__":
    main()
