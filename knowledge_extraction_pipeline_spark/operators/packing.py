"""Deterministic sequence packing for training-batch preparation: assign
documents to fixed-token-capacity bins (the "example packing" step that turns
a ragged corpus into dense max_seq_len training rows).

Packing is inherently sequential *within* a bin stream, so the operator
shards the corpus by a portable hash and packs each shard independently —
shards are the parallelism unit, and each shard's packing is a single
O(rows) pass over an Arrow batch. At 100 TB you raise `n_shards` to
O(cores) and every shard still packs locally with O(1) state; no global
order, no driver collect, no shuffle beyond the one hash partition.

The discipline is NEXT-FIT over a deterministic order (n_tokens DESC,
doc_id ASC): a bin closes the moment the next document would overflow it.
Next-fit (rather than first-fit) is what keeps the scan O(rows) with O(1)
state and — critically for the oracle — what makes the assignment exactly
expressible as a linear recurrence, so DuckDB can replay it with a recursive
CTE and the value-hash comparison stays exact. Documents longer than
`max_tokens` open (and overflow) a bin of their own, deterministically in
both engines.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import token_count

_OUT_SCHEMA = ("shard int, doc_id long, n_tokens long, bin long, "
               "bin_fill long")


def _pack_shard(pdf: pd.DataFrame) -> pd.DataFrame:
    cap = int(pdf["_cap"].iloc[0])
    pdf = pdf.sort_values(["n_tokens", "doc_id"],
                          ascending=[False, True], ignore_index=True)
    bins, fills = [], []
    b, fill = 0, 0
    first = True
    for tok in pdf["n_tokens"].tolist():
        if first:
            fill = tok
            first = False
        elif fill + tok > cap:
            b += 1
            fill = tok
        else:
            fill += tok
        bins.append(b)
        fills.append(fill)
    out = pdf[["shard", "doc_id", "n_tokens"]].copy()
    out["bin"] = pd.Series(bins, dtype="int64")
    out["bin_fill"] = pd.Series(fills, dtype="int64")
    return out


def pack_sequences(docs: DataFrame, max_tokens: int, n_shards: int = 16,
                   id_col: str = "doc_id", text_col: str = "text",
                   seed: int = 42) -> DataFrame:
    """Pack documents into token bins of capacity `max_tokens`, sharded
    `n_shards` ways by a portable md5 hash of the id. Returns one row per
    document: (shard, doc_id, n_tokens, bin, bin_fill) where `bin` is the
    shard-local bin index and `bin_fill` the bin's running fill after this
    document was placed."""
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    from .text_analysis import _hash_bucket
    base = docs.select(
        _hash_bucket(F.col(id_col), seed, "pack", n_shards).alias("shard"),
        F.col(id_col).cast("long").alias("doc_id"),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
        F.lit(max_tokens).cast("long").alias("_cap"))
    return base.groupBy("shard").applyInPandas(_pack_shard, _OUT_SCHEMA)


_FFD_SCHEMA = ("shard int, doc_id long, n_tokens long, bin long, "
               "bin_fill long, n_bins long")


def _pack_shard_ffd(pdf: pd.DataFrame) -> pd.DataFrame:
    cap = int(pdf["_cap"].iloc[0])
    pdf = pdf.sort_values(["n_tokens", "doc_id"],
                          ascending=[False, True], ignore_index=True)
    loads: list[int] = []
    bins, fills, nb = [], [], []
    for tok in pdf["n_tokens"].tolist():
        placed = None
        for j, ld in enumerate(loads):
            if ld + tok <= cap:
                placed = j
                break
        if placed is None:
            loads.append(tok)
            placed = len(loads) - 1
        else:
            loads[placed] += tok
        bins.append(placed)
        fills.append(loads[placed])
        nb.append(len(loads))
    out = pdf[["shard", "doc_id", "n_tokens"]].copy()
    out["bin"] = pd.Series(bins, dtype="int64")
    out["bin_fill"] = pd.Series(fills, dtype="int64")
    out["n_bins"] = pd.Series(nb, dtype="int64")
    return out


def pack_sequences_ffd(docs: DataFrame, max_tokens: int, n_shards: int = 16,
                       id_col: str = "doc_id", text_col: str = "text",
                       seed: int = 42) -> DataFrame:
    """First-Fit-Decreasing packing — the quality upgrade over next-fit
    (`pack_sequences`): every document goes into the FIRST open bin it
    fits (bins stay open for the whole shard), so FFD's waste is bounded
    at 11/9·OPT + 6/9 vs next-fit's 2·OPT. The price is O(bins) state
    per shard instead of O(1) — still shard-local, still zero driver
    state, still one Arrow pass; the shard count is the parallelism
    knob exactly as in pack_sequences. Output adds n_bins (open-bin
    count after each placement) so the oracle can verify the whole bin
    ledger, not just assignments."""
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")
    from .text_analysis import _hash_bucket
    from ..functions.text import token_count
    base = docs.select(
        _hash_bucket(F.col(id_col), seed, "pack", n_shards).alias("shard"),
        F.col(id_col).cast("long").alias("doc_id"),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
        F.lit(max_tokens).cast("long").alias("_cap"))
    return base.groupBy("shard").applyInPandas(_pack_shard_ffd, _FFD_SCHEMA)
