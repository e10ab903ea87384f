#!/usr/bin/env python
"""spark-submit entry point for the KG-construction pipeline.

    zip -r kg_spark.zip knowledge_extraction_pipeline_spark/
    spark-submit --py-files kg_spark.zip \
        jobs/run_pipeline.py \
        --input /path/to/transcripts_parquet_or_iceberg \
        --run-dir /path/to/checkpoints/run_0001 \
        [--generate-convs 100000]   # synthetic input instead of --input

Re-running with the same --run-dir resumes: committed stages are read from
their checkpoint tables, only missing stages execute. With --append-from
OLD_RUN_DIR, --input is treated as a DELTA folded into the old run's
extraction checkpoints (incremental daily-append; exact — equality with the
full recompute is pytest-pinned).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="transcripts table path (parquet dir)")
    ap.add_argument("--run-dir", required=True)
    ap.add_argument("--generate-convs", type=int,
                    help="generate synthetic transcripts instead of --input")
    ap.add_argument("--no-fuzzy", action="store_true")
    ap.add_argument("--append-from",
                    help="existing run dir to fold the --input DELTA into "
                         "(incremental: old history is never re-extracted; "
                         "--run-dir becomes the new complete run)")
    args = ap.parse_args()

    from knowledge_extraction_pipeline_spark.plans.pipeline import (
        append_transcripts,
        run_pipeline,
    )
    from knowledge_extraction_pipeline_spark.session import get_spark

    spark = get_spark(app_name="kg-pipeline")
    if args.generate_convs:
        from knowledge_extraction_pipeline_spark.sources.transcripts_gen import (
            generate_transcripts,
        )
        transcripts = generate_transcripts(spark, args.generate_convs)
    elif args.input:
        transcripts = spark.read.parquet(args.input)
    else:
        ap.error("one of --input / --generate-convs is required")

    t0 = time.time()
    if args.append_from:
        res = append_transcripts(spark, transcripts, args.append_from,
                                 args.run_dir,
                                 enable_fuzzy=not args.no_fuzzy)
    else:
        res = run_pipeline(spark, transcripts, args.run_dir,
                           enable_fuzzy=not args.no_fuzzy)
    summary = {
        "run_dir": args.run_dir,
        "recomputed_stages": res.recomputed_stages,
        "nodes": res.nodes.count(),
        "edges": res.edges.count(),
        "wall_s": round(time.time() - t0, 1),
    }
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
