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


def conversation_state_tracker(stream: DataFrame,
                               idle_timeout_ms: int = 30 * 60 * 1000) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState: per
    conversation, maintain (turns seen, distinct entities seen, last ts) and
    emit an updated summary row per micro-batch; state evicts after
    idle_timeout without new turns (bounded state — the requirement for any
    10^12-turn stream)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "conv_id string, n_turns long, n_entities long, last_ts timestamp, expired boolean"
    state_schema = "n_turns long, entities array<string>, last_ts timestamp"

    def track(key, pdfs, state: GroupState):
        import pandas as pd

        from knowledge_extraction_pipeline_spark.functions.lexicon import (
            extract_mentions_text,
        )
        (conv_id,) = key
        if state.hasTimedOut:
            n_turns, entities, last_ts = state.get
            state.remove()
            yield pd.DataFrame([(conv_id, n_turns, len(entities), last_ts, True)],
                               columns=["conv_id", "n_turns", "n_entities",
                                        "last_ts", "expired"])
            return
        n_turns, entities, last_ts = state.get if state.exists else (0, [], None)
        ents = set(entities)
        for pdf in pdfs:
            n_turns += len(pdf)
            for t in pdf["text"]:
                ents.update(m["norm_term"] for m in extract_mentions_text(t))
            mx = pdf["ts"].max()
            last_ts = mx if last_ts is None or mx > last_ts else last_ts
        state.update((n_turns, sorted(ents), last_ts))
        state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame([(conv_id, n_turns, len(ents), last_ts, False)],
                           columns=["conv_id", "n_turns", "n_entities",
                                    "last_ts", "expired"])

    return (
        stream.groupBy("conv_id").applyInPandasWithState(
            track, outputStructType=out_schema, stateStructType=state_schema,
            outputMode="update", timeoutConf=GroupStateTimeout.ProcessingTimeTimeout)
    )


def stream_exact_dedup(stream: DataFrame, text_col: str = "text",
                       ts_col: str = "ts",
                       watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup — the ingest-side counterpart of
    operators.dedup.exact_duplicates for a training-data pipeline: rows whose
    normalized-text fingerprint was already seen within the watermark horizon
    are dropped. dropDuplicatesWithinWatermark keys state by fingerprint and
    evicts it once the watermark passes, so state stays bounded by the
    duplicate-arrival window, not the stream length (the requirement for a
    10^12-row stream; cross-horizon duplicates are the batch compaction
    pass's job, exactly like canonicalization)."""
    from ..functions.text import normalize_term

    return (
        stream
        .withColumn("fp", F.md5(normalize_term(F.col(text_col))))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["fp"])
        .drop("fp")
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
