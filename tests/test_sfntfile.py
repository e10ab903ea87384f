"""Checksum circularity, binary-search-plan verification, cmap
format-4 semantics, and refusals for the sfnt walk."""

import struct

import pytest

from knowledge_extraction_pipeline_spark.sources.sfntfile import (
    _checksum,
    build_sfnt,
    parse_sfnt,
    sfnt_file_spec,
)


def test_whole_file_checksum_is_b1b0afba():
    for i in (0, 1, 7):
        raw = build_sfnt(i)
        assert _checksum(raw) == 0xB1B0AFBA
        assert parse_sfnt(raw)["file_ok"] is True


def test_head_adjustment_is_zeroed_in_table_sum():
    # corrupting the adjustment must break the FILE sum but not the
    # head TABLE sum (which excludes it by spec)
    raw = bytearray(build_sfnt(0))
    n = struct.unpack(">H", raw[4:6])[0]
    head_off = None
    for k in range(n):
        tag, _, off, _ = struct.unpack(">4sIII",
                                       raw[12 + 16 * k:28 + 16 * k])
        if tag == b"head":
            head_off = off
    raw[head_off + 8:head_off + 12] = b"\xde\xad\xbe\xef"
    r = parse_sfnt(bytes(raw))
    assert r["sums_ok"] is True          # table sums still fine
    assert r["file_ok"] is False         # whole-file sum broken


def test_search_plan_verified():
    raw = bytearray(build_sfnt(0))
    raw[6:8] = struct.pack(">H", 999)    # bogus searchRange
    assert parse_sfnt(bytes(raw))["plan_ok"] is False


def test_cmap_probe_glyphs_match_spec():
    for i in (0, 2, 5):
        sp = sfnt_file_spec(i)
        r = parse_sfnt(build_sfnt(i))

        def g(c):
            for s in sp["segs"]:
                if s["end"] >= c:
                    return (c - s["start"] + s["first_gid"]
                            if s["start"] <= c else 0)
            return 0

        assert r["probe_sum"] == sum(g(ord(c)) for c in "ABCDE")


def test_refusals():
    with pytest.raises(NotImplementedError):
        parse_sfnt(b"OTTO" + b"\x00" * 20)
    with pytest.raises(NotImplementedError):
        parse_sfnt(b"ttcf" + b"\x00" * 20)
    with pytest.raises(ValueError):
        parse_sfnt(b"\x00\x02\x00\x00" + b"\x00" * 20)
