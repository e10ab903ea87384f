#!/usr/bin/env python
"""Training-data preparation job — the composition a 100 TB corpus run needs,
end-to-end over the documents table:

    load → exact dedup (keep min-id per normalized-text group)
         → annotate (lang-id, quality, word/token counts, fingerprint)
         → quality gate (min quality score, min words)
         → PII redaction
         → deterministic train/val/test split (md5 buckets)
         → write parquet partitioned by split + one metrics row per stage

Every stage is an operator this repo's driver gate already value-checks;
this job only composes them, so the composition is the only new surface
(covered by tests/test_api.py::test_dataprep_job). All randomness is md5
buckets — re-runs, task retries, and corpus growth never flip a row's fate.

Usage:
    spark-submit --py-files kg_spark.zip jobs/run_dataprep.py \
        --sf-dir /root/testdata/sf0.01 --out-dir /tmp/dataprep_run \
        [--min-quality 0.2] [--min-words 5] [--sample 1.0]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def run(spark, sf_dir: str, out_dir: str, min_quality: float = 0.2,
        min_words: int = 5, sample: float = 1.0) -> dict:
    from knowledge_extraction_pipeline_spark.operators.dedup import (
        exact_duplicates,
    )
    from knowledge_extraction_pipeline_spark.operators.text_analysis import (
        annotate,
        deterministic_sample,
        hash_split,
        redact_pii,
    )
    from knowledge_extraction_pipeline_spark.sources.tables import load_table

    t0 = time.monotonic()
    docs = load_table(spark, sf_dir, "documents")
    if sample < 1.0:
        docs = deterministic_sample(docs, sample)
    n_in = docs.count()

    keepers = exact_duplicates(docs).select(
        F.col("keeper_id").alias("doc_id"))
    deduped = docs.join(keepers, "doc_id")
    n_dedup = deduped.count()

    ann = annotate(deduped)
    gated = ann.filter((F.col("quality") >= min_quality)
                       & (F.col("n_words") >= min_words))
    n_gated = gated.count()

    clean = redact_pii(gated)
    out = hash_split(clean)
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}

    out.write.mode("overwrite").partitionBy("split") \
       .parquet(os.path.join(out_dir, "documents"))
    metrics = {
        "n_input": n_in,
        "n_after_dedup": n_dedup,
        "n_after_quality": n_gated,
        "split_counts": counts,
        "wall_s": round(time.monotonic() - t0, 3),
    }
    with open(os.path.join(out_dir, "metrics.json"), "w") as f:
        json.dump(metrics, f)
    return metrics


def main():
    from knowledge_extraction_pipeline_spark.session import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--min-quality", type=float, default=0.2)
    ap.add_argument("--min-words", type=int, default=5)
    ap.add_argument("--sample", type=float, default=1.0)
    args = ap.parse_args()

    spark = get_spark()
    os.makedirs(args.out_dir, exist_ok=True)
    metrics = run(spark, args.sf_dir, args.out_dir, args.min_quality,
                  args.min_words, args.sample)
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
