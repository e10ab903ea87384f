#!/usr/bin/env python
"""Training-data preparation job — the composition a 100 TB corpus run needs,
end-to-end over the documents table:

    load → exact dedup (keep min-id per normalized-text group)
         → annotate (lang-id, quality, word/token counts, fingerprint)
         → quality gate (min quality score, min words)
         → PII redaction
         → deterministic train/val/test split (md5 buckets)
         → optional decontamination (drop train docs whose n-gram overlap
           with the held-out shard exceeds a threshold)
         → optional per-source token budget on the train shard
         → optional sequence packing manifest for the train shard
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
        min_words: int = 5, sample: float = 1.0,
        decontaminate_threshold: float | None = None, contam_n: int = 4,
        domain_budget: int | None = None,
        pack_tokens: int | None = None) -> dict:
    from knowledge_extraction_pipeline_spark.operators.dedup import (
        exact_duplicates,
    )
    from knowledge_extraction_pipeline_spark.operators.text_analysis import (
        annotate,
        contamination_check,
        deterministic_sample,
        domain_budget_sample,
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

    n_decontaminated = 0
    if decontaminate_threshold is not None:
        is_train = F.col("split") == "train"
        flagged = (
            contamination_check(out.filter(is_train), out.filter(~is_train),
                                n=contam_n)
            .filter(F.col("contamination_frac") >= decontaminate_threshold)
            .select(F.col("train_id").alias("doc_id")).distinct())
        n_decontaminated = flagged.count()
        out = out.join(flagged, "doc_id", "left_anti")

    n_over_budget = 0
    if domain_budget is not None:
        is_train = F.col("split") == "train"
        train = out.filter(is_train)
        keep = domain_budget_sample(train, domain_budget).select("doc_id")
        capped = train.join(keep, "doc_id", "left_semi")
        n_over_budget = train.count() - capped.count()
        out = out.filter(~is_train).unionByName(capped)

    n_bins = 0
    if pack_tokens is not None:
        from knowledge_extraction_pipeline_spark.operators.packing import (
            pack_sequences,
        )
        packed = pack_sequences(out.filter(F.col("split") == "train"),
                                pack_tokens)
        packed.write.mode("overwrite") \
              .parquet(os.path.join(out_dir, "packing"))
        n_bins = packed.select("shard", "bin").distinct().count()

    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}

    out.write.mode("overwrite").partitionBy("split") \
       .parquet(os.path.join(out_dir, "documents"))
    metrics = {
        "n_input": n_in,
        "n_after_dedup": n_dedup,
        "n_after_quality": n_gated,
        "n_decontaminated": n_decontaminated,
        "n_over_budget": n_over_budget,
        "n_pack_bins": n_bins,
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
    ap.add_argument("--decontaminate-threshold", type=float, default=None,
                    help="drop train docs whose n-gram overlap fraction "
                         "with val/test reaches this value")
    ap.add_argument("--contam-n", type=int, default=4)
    ap.add_argument("--domain-budget", type=int, default=None,
                    help="max tokens kept per source in the train shard")
    ap.add_argument("--pack-tokens", type=int, default=None,
                    help="write a train-shard packing manifest with this "
                         "bin capacity")
    args = ap.parse_args()

    spark = get_spark()
    os.makedirs(args.out_dir, exist_ok=True)
    metrics = run(spark, args.sf_dir, args.out_dir, args.min_quality,
                  args.min_words, args.sample,
                  decontaminate_threshold=args.decontaminate_threshold,
                  contam_n=args.contam_n, domain_budget=args.domain_budget,
                  pack_tokens=args.pack_tokens)
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
