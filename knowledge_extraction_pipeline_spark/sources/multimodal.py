"""Multimodal column plumbing: image/audio/video as opaque binary columns with
typed metadata, processed via Arrow-batched mapInPandas.

The Spark-side machinery (schemas, partitioning, UDF signatures, batch
iteration) is real and tested; the actual media decode is STUBBED behind
`decode_image` / `extract_audio_features` (the container has no image/audio
libraries) — swap the stub body for PIL/librosa/ffmpeg calls on a real
cluster. A deterministic fake decoder is provided so tests exercise the full
plumbing end to end.

Reference analog: none (the reference ingests PDFs only, and we replace its
PDF scan with the already-tabular transcripts input — SURVEY §2.1); this is
part of the training-data-pipeline tier of operators.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),        # image | audio | video
    T.StructField("mime", T.StringType()),
    T.StructField("payload", T.BinaryType()),     # opaque bytes
    T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
])

IMAGE_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("embedding", T.ArrayType(T.FloatType())),
])


def _fake_decode(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Deterministic stand-in for a real image decode: dimensions and an
    8-dim 'embedding' derived purely from the bytes. Replace with
    PIL.Image.open + a vision model on a real cluster."""
    if payload is None or len(payload) == 0:
        raise NotImplementedError(
            "real media decode is stubbed in this environment")
    h = np.frombuffer(payload[:64].ljust(64, b"\0"), dtype=np.uint8).astype(np.float32)
    w = int(64 + (len(payload) % 1024))
    hh = int(64 + (sum(payload[:16]) % 1024))
    emb = (h.reshape(8, 8).mean(axis=1) / 255.0).astype(np.float32)
    return w, hh, emb


def extract_image_features(media: DataFrame, batch_size: int = 256) -> DataFrame:
    """mapInPandas over binary payloads — the canonical multimodal pattern:
    Arrow ships the bytes column to Python in batches, each batch is decoded
    vectorized, only features come back (never the raw bytes)."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, emb = _fake_decode(bytes(payload))
                rows.append((mid, w, h, len(payload), emb.tolist()))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "n_bytes", "embedding"])

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(process, schema=IMAGE_FEATURES_SCHEMA)
    )


def frame_sample_plan(media: DataFrame, every_n_seconds: int = 5) -> DataFrame:
    """Video frame-sampling *plan*: expands each video row into the frame
    timestamps a decoder would extract — pure column ops (sequence/explode);
    the decode itself is the stubbed step."""
    dur = F.coalesce(F.element_at("meta", "duration_s").cast("int"), F.lit(0))
    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", F.explode(
            F.sequence(F.lit(0), F.greatest(dur - 1, F.lit(0)),
                       F.lit(every_n_seconds))).alias("frame_ts_s"))
    )


def synthetic_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests: payload bytes derived from
    the id, duration metadata for videos."""
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.when(F.col("id") % 3 == 0, "image")
         .when(F.col("id") % 3 == 1, "audio").otherwise("video").alias("kind"),
        F.when(F.col("id") % 3 == 0, "image/png")
         .when(F.col("id") % 3 == 1, "audio/wav").otherwise("video/mp4").alias("mime"),
        F.sha2(F.concat(F.lit(str(seed)), F.col("id").cast("string")), 512)
         .cast("binary").alias("payload"),
        F.create_map(F.lit("duration_s"),
                     (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(60)) + 10)
                     .cast("string")).alias("meta"),
    )
