"""Deduplication operators over a document corpus — the training-data-pipeline
tier: exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

Everything except SimHash is pure Column expressions; SimHash packs 64 bits
per document inside an Arrow-batched pandas UDF (bit-bucketed popcount has no
clean expression form).

Scale posture: near-dup methods never do an unblocked cross join — MinHash
bands / SimHash prefix buckets / same-lang blocking turn O(n²) into
O(sum over buckets |b|²).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import (
    fingerprint,
    lsh_bands,
    minhash_signature,
    normalize_term,
    word_shingles,
)


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Hash-groupBy exact dedup: one row per duplicate group with the keeper
    (min id) and the group size. Reference analog: the exact-phase hash
    pre-grouping (entity_resolver.py:343-370) applied to whole documents."""
    return (
        docs
        .withColumn("fp", F.md5(normalize_term(F.col(text_col))))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("group_size"),
        )
    )


def exact_dedup_keep_first(docs: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text") -> DataFrame:
    """The deduplicated corpus itself (keeper rows only)."""
    w_fp = F.md5(normalize_term(F.col(text_col)))
    d = docs.withColumn("fp", w_fp)
    keep = d.groupBy("fp").agg(F.min(id_col).alias(id_col))
    return d.join(keep, on=["fp", id_col]).drop("fp")


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.6,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_col: str | None = "lang",
) -> DataFrame:
    """All near-duplicate pairs by exact k-word-shingle Jaccard, blocked by
    `block_col` to bound the self-join (the correctness baseline the MinHash
    variant is validated against)."""
    sh = docs.select(
        F.col(id_col).alias("id"),
        (F.col(block_col) if block_col else F.lit("all")).alias("blk"),
        F.array_distinct(word_shingles(F.col(text_col), k)).alias("sh"),
    )
    a, b = sh.alias("a"), sh.alias("b")
    pairs = (
        a.join(b, F.col("a.blk") == F.col("b.blk"))
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
            (F.size(F.array_intersect("a.sh", "b.sh")).cast("double")
             / F.size(F.array_union("a.sh", "b.sh"))).alias("jaccard"),
        )
    )
    return pairs.filter(F.col("jaccard") >= threshold) \
                .withColumn("jaccard", F.round("jaccard", 6))


def minhash_near_dup_pairs(
    docs: DataFrame,
    threshold: float = 0.6,
    k: int = 3,
    num_hashes: int = 32,
    num_bands: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """MinHash+LSH near-dup: shingle → minhash → band → bucket-join →
    exact-Jaccard verify. The scale path: candidate generation is linear in
    corpus size + bucket-local joins."""
    sh = docs.select(
        F.col(id_col).alias("id"),
        F.array_distinct(word_shingles(F.col(text_col), k)).alias("sh"),
    ).persist()
    # bands stay NARROW (id + band key only) — the shingle arrays would be
    # replicated x num_bands through the explode and the bucket shuffle
    bands = sh.withColumn("sig", minhash_signature(F.col("sh"), num_hashes)) \
        .select("id", F.posexplode(lsh_bands(F.col("sig"), num_hashes, num_bands))
                .alias("band_idx", "band_hash"))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, on=["band_idx", "band_hash"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .join(sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
    )
    j = (F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
         / F.size(F.array_union("sh_a", "sh_b")))
    return cand.withColumn("jaccard", F.round(j, 6)) \
               .filter(F.col("jaccard") >= threshold) \
               .select("id_a", "id_b", "jaccard")


_SIMHASH_OUT = T.StructType([T.StructField("simhash", T.LongType())])


@F.pandas_udf(T.LongType())
def simhash64_udf(texts: pd.Series) -> pd.Series:
    """64-bit SimHash over word tokens (numpy-vectorized bit accumulation)."""
    import hashlib

    def one(t: str) -> int:
        if not t:
            return 0
        acc = np.zeros(64, dtype=np.int64)
        for w in t.lower().split():
            h = int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big")
            bits = np.unpackbits(
                np.frombuffer(h.to_bytes(8, "big"), dtype=np.uint8)).astype(np.int64)
            acc += bits * 2 - 1
        out = np.packbits((acc >= 0).astype(np.uint8)).tobytes()
        return int.from_bytes(out, "big", signed=True)

    return texts.map(one)


def simhash_near_dup_pairs(
    docs: DataFrame,
    max_hamming: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """SimHash near-dup: 64-bit signature, candidates = equal 16-bit prefix
    block in any of 4 rotations (each block a bucket — standard Charikar
    blocking: <= max_hamming bits differ ⇒ some 16-bit block is identical
    when max_hamming < 4), verified by exact Hamming distance."""
    s = docs.select(F.col(id_col).alias("id"),
                    simhash64_udf(F.col(text_col)).alias("sim"))
    blocks = s.select(
        "id", "sim",
        F.posexplode(F.array(*[
            F.shiftright("sim", 16 * i).bitwiseAND(F.lit(0xFFFF)) for i in range(4)
        ])).alias("block_idx", "block_val"),
    )
    a, b = blocks.alias("a"), blocks.alias("b")
    xor = F.col("a.sim").bitwiseXOR(F.col("b.sim"))
    return (
        a.join(b, on=["block_idx", "block_val"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                F.bit_count(xor).alias("hamming"))
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )


def embedding_near_dup_pairs(
    embs: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup over array<float> — JVM-side zip_with dot.
    Brute-force all-pairs (correctness baseline; see similarity.lsh_topk for
    the bucketed scale path)."""
    from ..functions.vectors import cosine

    v = embs.select(F.col(id_col).alias("id"),
                    F.col(vec_col).cast("array<double>").alias("v"))
    a, b = v.alias("a"), v.alias("b")
    return (
        a.crossJoin(b)
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                F.round(cosine(F.col("a.v"), F.col("b.v")), 6).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )
