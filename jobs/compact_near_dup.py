#!/usr/bin/env python
"""Periodic near-dup compaction over accumulated streaming output — the
batch half of the contract stated in streaming/stream.py:start_stream_near_dup
("cross-horizon duplicates are the periodic batch compaction's job"): the
streaming operator bounds its state to a time horizon, so duplicates that
arrive further apart than the horizon both survive; this job removes them.

    read {out_dir}/docs (all _bid partitions)
      → exact dedup (keep min id per normalized text)
      → MinHash-LSH near-dup pairs at the stream's threshold
      → connected components over the pair graph (transitive groups)
      → drop every non-representative member (keep min id per group)
      → rewrite compacted output atomically (tmp + rename)

Deterministic end-to-end (md5 hashing, min-id representatives), so re-running
compaction is idempotent. Usage:

    spark-submit --py-files kg_spark.zip jobs/compact_near_dup.py \
        --docs-dir /path/to/stream_out/docs --out-dir /path/to/compacted \
        [--threshold 0.6]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def compact(spark, docs_df, threshold: float = 0.6, id_col: str = "doc_id",
            text_col: str = "text"):
    """Returns (survivors_df, metrics dict). Survivors = one representative
    (min id) per exact group, then per near-dup connected component."""
    from knowledge_extraction_pipeline_spark.operators.canonicalize import (
        connected_components,
    )
    from knowledge_extraction_pipeline_spark.operators.dedup import (
        exact_duplicates,
        minhash_near_dup_pairs,
    )

    n_in = docs_df.count()
    keepers = exact_duplicates(docs_df, id_col=id_col, text_col=text_col) \
        .select(F.col("keeper_id").alias(id_col))
    exact_kept = docs_df.join(keepers, id_col)

    pairs = minhash_near_dup_pairs(exact_kept, threshold=threshold,
                                   id_col=id_col, text_col=text_col)
    pad = lambda c: F.lpad(F.col(c).cast("string"), 12, "0")
    asn = connected_components(
        pairs.select(pad("id_a").alias("src"), pad("id_b").alias("dst")))
    # every clustered doc that is NOT its component's min id is dropped
    losers = asn.filter(F.col("norm_term") != F.col("canon")) \
                .select(F.col("norm_term").cast("long").alias(id_col))
    survivors = exact_kept.join(losers, id_col, "left_anti")
    n_out = survivors.count()
    return survivors, {"n_input": n_in, "n_after_exact": exact_kept.count(),
                       "n_survivors": n_out}


def main():
    from knowledge_extraction_pipeline_spark.session import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--docs-dir", required=True)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--threshold", type=float, default=0.6)
    args = ap.parse_args()

    spark = get_spark()
    docs = spark.read.parquet(args.docs_dir)
    survivors, metrics = compact(spark, docs, args.threshold)
    tmp = args.out_dir + "._tmp"
    survivors.write.mode("overwrite").parquet(tmp)
    if os.path.isdir(args.out_dir):
        import shutil
        shutil.rmtree(args.out_dir)
    os.rename(tmp, args.out_dir)
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
