"""XZ-container and binary-plist walkers vs the real stdlib writers,
plus corruption/refusal paths."""

import plistlib

import pytest

from knowledge_extraction_pipeline_spark.sources.bplistfile import (
    bplist_doc_spec,
    build_bplist,
    parse_bplist,
)
from knowledge_extraction_pipeline_spark.sources.xzfile import (
    build_xz,
    parse_xz,
    xz_doc_spec,
)


def test_xz_multi_stream_accounting():
    for i in (0, 1, 2, 8):
        spec = xz_doc_spec(i)
        p = parse_xz(build_xz(i))
        assert p["n_streams"] == len(spec)
        assert p["uncompressed_total"] == sum(len(c) for c in spec)
        assert p["index_crcs_ok"] and p["flags_echo_ok"]
        assert p["check_type"] == 1     # CRC32


def test_xz_corruption_detected():
    raw = bytearray(build_xz(0))
    raw[-1] ^= 0xFF                     # footer magic
    with pytest.raises(ValueError):
        parse_xz(bytes(raw))
    raw2 = bytearray(build_xz(0))
    raw2[-12] ^= 0xFF                   # footer CRC
    with pytest.raises(ValueError):
        parse_xz(bytes(raw2))


def test_bplist_roundtrip_matches_spec():
    for i in (0, 2, 3, 9):
        s = bplist_doc_spec(i)
        top, n_obj = parse_bplist(build_bplist(i))
        assert top["name"] == s["name"]
        assert top["count"] == s["count"]          # 1/2/4/8-byte ints
        assert top["flags"] == s["flags"]
        assert top["blob"] == s["blob"]
        assert top["unicode_name"] == s["unicode_name"]
        assert top["nested"]["deeper"]["level"] == 3
        assert n_obj == 20


def test_bplist_refusals():
    with pytest.raises(ValueError):
        parse_bplist(b"not a plist at all................")
    real = plistlib.dumps({"r": 1.5}, fmt=plistlib.FMT_BINARY)
    with pytest.raises(NotImplementedError):
        parse_bplist(real)              # real (0x2) honestly refused
