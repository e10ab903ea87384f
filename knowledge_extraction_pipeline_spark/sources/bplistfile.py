"""Binary property-list walking — the `bplist00` format under every
Apple-ecosystem export and many mobile-app data dumps. The writer is
the stdlib plistlib (the REAL bplist writer); the reader is hand-rolled
from the public format (Apple CFBinaryPList.c header comments): the
8-byte magic, the 32-byte TRAILER read first (offset-int size,
object-ref size, object count, top-object id, offset-table position),
the offset table, and marker-nibble object decode — 0x0 null/bool,
0x1 int (2^n big-endian bytes), 0x4 data, 0x5 ASCII string, 0x6
UTF-16BE string, 0xA array and 0xD dict (ref-width object references,
keys then values), with the 0xF length-escape (length lives in a
following int object). Reals/dates/sets are honestly refused. Cycle
protection bounds the reference walk.

The oracle re-derives every manifest column from the pure (doc_id,
seed) spec formulas. Runs as mapInPandas over an opaque binary column.
"""

from __future__ import annotations

import hashlib
import plistlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

BP_FILE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("payload", T.BinaryType()),
])

BP_MANIFEST_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_objects", T.IntegerType()),
    T.StructField("top_keys", T.StringType()),
    T.StructField("name", T.StringType()),
    T.StructField("count", T.LongType()),
    T.StructField("n_flags", T.IntegerType()),
    T.StructField("n_true_flags", T.IntegerType()),
    T.StructField("blob_md5", T.StringType()),
    T.StructField("nested_depth", T.IntegerType()),
    T.StructField("unicode_name", T.StringType()),
])


def bplist_doc_spec(i: int, seed: int = 42) -> dict:
    return {
        "name": f"record-{i:03d}",
        "count": (i * 7919 + seed) % 100_000 + 2 ** (8 * (i % 4)),
        "flags": [(i + j) % 3 == 0 for j in range(2 + i % 6)],
        "blob": bytes((i * 13 + j) % 256 for j in range(5 + i % 20)),
        "unicode_name": f"répertoire-{i % 9}",
        "nested": {"level": 2, "deeper": {"level": 3}},
    }


def build_bplist(i: int, seed: int = 42) -> bytes:
    s = bplist_doc_spec(i, seed)
    return plistlib.dumps(
        {"name": s["name"], "count": s["count"], "flags": s["flags"],
         "blob": s["blob"], "unicode_name": s["unicode_name"],
         "nested": s["nested"]},
        fmt=plistlib.FMT_BINARY, sort_keys=True)


def synthetic_bplists(spark: SparkSession, n: int,
                      seed: int = 42) -> DataFrame:
    rows = [(i, build_bplist(i, seed)) for i in range(n)]
    return spark.createDataFrame(rows, BP_FILE_SCHEMA)


# ── reader ──────────────────────────────────────────────────────────────

def parse_bplist(raw: bytes):
    if raw[:8] != b"bplist00":
        raise ValueError("not a bplist00")
    trailer = raw[-32:]
    off_size, ref_size, n_obj, top, table_off = struct.unpack(
        ">BBQQQ", trailer[6:])
    offsets = [int.from_bytes(
        raw[table_off + k * off_size:table_off + (k + 1) * off_size],
        "big") for k in range(n_obj)]

    def read_len(pos: int, nib: int) -> tuple[int, int]:
        if nib != 0xF:
            return nib, pos
        m = raw[pos]
        if m >> 4 != 0x1:
            raise ValueError("length escape must be an int object")
        nbytes = 1 << (m & 0x0F)
        val = int.from_bytes(raw[pos + 1:pos + 1 + nbytes], "big")
        return val, pos + 1 + nbytes

    def obj(idx: int, depth: int = 0):
        if depth > 32:
            raise ValueError("reference cycle or over-deep plist")
        pos = offsets[idx]
        marker = raw[pos]
        kind, nib = marker >> 4, marker & 0x0F
        pos += 1
        if kind == 0x0:
            if nib == 0x0:
                return None
            if nib == 0x8:
                return False
            if nib == 0x9:
                return True
            raise NotImplementedError(f"0x0 variant {nib:x}")
        if kind == 0x1:
            nbytes = 1 << nib
            return int.from_bytes(raw[pos:pos + nbytes], "big",
                                  signed=nbytes == 8)
        if kind == 0x4:
            ln, pos = read_len(pos, nib)
            return raw[pos:pos + ln]
        if kind == 0x5:
            ln, pos = read_len(pos, nib)
            return raw[pos:pos + ln].decode("ascii")
        if kind == 0x6:
            ln, pos = read_len(pos, nib)
            return raw[pos:pos + 2 * ln].decode("utf-16-be")
        if kind == 0xA:
            ln, pos = read_len(pos, nib)
            refs = [int.from_bytes(raw[pos + k * ref_size:
                                       pos + (k + 1) * ref_size], "big")
                    for k in range(ln)]
            return [obj(r, depth + 1) for r in refs]
        if kind == 0xD:
            ln, pos = read_len(pos, nib)
            kr = [int.from_bytes(raw[pos + k * ref_size:
                                     pos + (k + 1) * ref_size], "big")
                  for k in range(ln)]
            vr = [int.from_bytes(
                raw[pos + (ln + k) * ref_size:
                    pos + (ln + k + 1) * ref_size], "big")
                for k in range(ln)]
            return {obj(k2, depth + 1): obj(v2, depth + 1)
                    for k2, v2 in zip(kr, vr)}
        raise NotImplementedError(f"bplist marker kind 0x{kind:x}")

    return obj(top), n_obj


def _depth(v) -> int:
    if isinstance(v, dict):
        return 1 + max((_depth(x) for x in v.values()), default=0)
    if isinstance(v, list):
        return 1 + max((_depth(x) for x in v), default=0)
    return 0


def bplist_manifest(blobs: DataFrame) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                top, n_obj = parse_bplist(bytes(payload))
                rows.append({
                    "doc_id": int(doc_id),
                    "n_objects": n_obj,
                    "top_keys": ",".join(sorted(top.keys())),
                    "name": top["name"],
                    "count": top["count"],
                    "n_flags": len(top["flags"]),
                    "n_true_flags": sum(1 for f in top["flags"] if f),
                    "blob_md5": hashlib.md5(top["blob"]).hexdigest(),
                    "nested_depth": _depth(top),
                    "unicode_name": top["unicode_name"],
                })
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              BP_MANIFEST_SCHEMA.fields])

    return blobs.mapInPandas(run, BP_MANIFEST_SCHEMA)
