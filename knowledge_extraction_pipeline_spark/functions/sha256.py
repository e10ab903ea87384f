"""From-scratch SHA-256 (FIPS 180-4), vectorized with numpy across an
Arrow batch — one message per row, all 64 compression rounds computed
on uint32 arrays of shape (n,) so the whole batch moves through each
round together (no per-row Python). Single-block only: messages must
be ≤ 55 bytes so padding (0x80 + length) fits one 512-bit block —
callers feed fixed 32-byte md5-hex strings or short prefixes.

This exists as an independent third implementation to pin against the
two native ones (Spark's JVM `sha2`, DuckDB's `sha256`): agreement of
scratch-vs-native inside the engine AND engine-vs-oracle across the
gate is a machine-checked equivalence of three codebases on real data.
Reference analog: none (the reference pipeline hashes with Python's
hashlib for cache keys only, src/knowledge_extraction/core/cache.py).
"""

import numpy as np
import pandas as pd

_K = np.array([
    0x428a2f98, 0x71374491, 0xb5c0fbcf, 0xe9b5dba5,
    0x3956c25b, 0x59f111f1, 0x923f82a4, 0xab1c5ed5,
    0xd807aa98, 0x12835b01, 0x243185be, 0x550c7dc3,
    0x72be5d74, 0x80deb1fe, 0x9bdc06a7, 0xc19bf174,
    0xe49b69c1, 0xefbe4786, 0x0fc19dc6, 0x240ca1cc,
    0x2de92c6f, 0x4a7484aa, 0x5cb0a9dc, 0x76f988da,
    0x983e5152, 0xa831c66d, 0xb00327c8, 0xbf597fc7,
    0xc6e00bf3, 0xd5a79147, 0x06ca6351, 0x14292967,
    0x27b70a85, 0x2e1b2138, 0x4d2c6dfc, 0x53380d13,
    0x650a7354, 0x766a0abb, 0x81c2c92e, 0x92722c85,
    0xa2bfe8a1, 0xa81a664b, 0xc24b8b70, 0xc76c51a3,
    0xd192e819, 0xd6990624, 0xf40e3585, 0x106aa070,
    0x19a4c116, 0x1e376c08, 0x2748774c, 0x34b0bcb5,
    0x391c0cb3, 0x4ed8aa4a, 0x5b9cca4f, 0x682e6ff3,
    0x748f82ee, 0x78a5636f, 0x84c87814, 0x8cc70208,
    0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2],
    dtype=np.uint32)

_H0 = np.array([
    0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
    0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19],
    dtype=np.uint32)


def _ror(x: np.ndarray, r: int) -> np.ndarray:
    return (x >> np.uint32(r)) | (x << np.uint32(32 - r))


def sha256_batch(messages: list[bytes]) -> list[str]:
    """SHA-256 hex digests for a batch of ≤55-byte messages, all rows
    advanced together through the schedule and the 64 rounds."""
    n = len(messages)
    if n == 0:
        return []
    lens = np.array([len(m) for m in messages], dtype=np.int64)
    if (lens > 55).any():
        raise ValueError("single-block sha256: messages must be <= 55 B")
    block = np.zeros((n, 64), dtype=np.uint8)
    for i, m in enumerate(messages):  # byte placement only; math below
        block[i, :lens[i]] = np.frombuffer(m, dtype=np.uint8)
    block[np.arange(n), lens] = 0x80
    bitlen = (lens * 8).astype(">u8")
    block[:, 56:64] = bitlen.view(np.uint8).reshape(n, 8)

    w = np.zeros((n, 64), dtype=np.uint32)
    w[:, :16] = block.reshape(n, 16, 4).astype(np.uint32) @ np.array(
        [1 << 24, 1 << 16, 1 << 8, 1], dtype=np.uint32)
    for t in range(16, 64):
        s0 = _ror(w[:, t - 15], 7) ^ _ror(w[:, t - 15], 18) \
            ^ (w[:, t - 15] >> np.uint32(3))
        s1 = _ror(w[:, t - 2], 17) ^ _ror(w[:, t - 2], 19) \
            ^ (w[:, t - 2] >> np.uint32(10))
        w[:, t] = w[:, t - 16] + s0 + w[:, t - 7] + s1

    a, b, c, d, e, f, g, h = (np.full(n, _H0[j], dtype=np.uint32)
                              for j in range(8))
    for t in range(64):
        s1 = _ror(e, 6) ^ _ror(e, 11) ^ _ror(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = h + s1 + ch + _K[t] + w[:, t]
        s0 = _ror(a, 2) ^ _ror(a, 13) ^ _ror(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = s0 + maj
        h, g, f, e, d, c, b, a = g, f, e, d + t1, c, b, a, t1 + t2
    digest = np.stack([a + _H0[0], b + _H0[1], c + _H0[2], d + _H0[3],
                       e + _H0[4], f + _H0[5], g + _H0[6], h + _H0[7]],
                      axis=1)
    return ["".join(f"{int(x):08x}" for x in row) for row in digest]


def sha256_hex_udf():
    """Arrow-batched scalar UDF: UTF-8 encode each string, hash the
    whole batch through the vectorized rounds. Defined here (not in
    queries.py) so the pd.Series type hints resolve at def time."""
    from pyspark.sql import functions as F

    @F.pandas_udf("string")
    def _sha(s: pd.Series) -> pd.Series:
        return pd.Series(
            sha256_batch([x.encode("utf-8") for x in s]),
            index=s.index)

    return _sha
