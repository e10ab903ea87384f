"""VINT width semantics, wide-size handling, and refusals for the
EBML walk."""

import pytest

from knowledge_extraction_pipeline_spark.sources.ebmlfile import (
    build_ebml,
    ebml_file_spec,
    encode_vint_size,
    parse_ebml,
    read_vint,
)


def test_vint_widths():
    # 1-byte: 0x81 = value 1; 2-byte: 0x4001 = value 1 (wide)
    assert read_vint(b"\x81", 0, keep_marker=False)[0] == 1
    assert read_vint(b"\x40\x01", 0, keep_marker=False)[0] == 1
    # marker kept for IDs: 0x1A45DFA3 reads back as itself
    v, w, _ = read_vint(bytes.fromhex("1a45dfa3"), 0, keep_marker=True)
    assert (v, w) == (0x1A45DFA3, 4)
    # minimal boundary: 126 fits 1 byte, 127 is the reserved all-ones
    assert encode_vint_size(126) == b"\xfe"
    assert len(encode_vint_size(127)) == 2


def test_wide_sizes_counted_not_rederived():
    for i in (0, 1, 2, 3):
        sp = ebml_file_spec(i)
        wb = sp["width_bump"]
        exp_wide = ((1 if wb % 2 else 0) + (1 if wb else 0)
                    + (1 if wb % 3 else 0) + 1)
        assert parse_ebml(build_ebml(i))["wide"] == exp_wide


def test_parse_matches_spec():
    for i in (0, 5, 11, 29):
        sp = ebml_file_spec(i)
        r = parse_ebml(build_ebml(i))
        assert r["doctype"] == sp["doctype"]
        assert r["tcs"] == sp["timecode_scale"]
        assert r["unknown"] == sp["n_void"]
        assert r["n"] == 14 + sp["n_void"]


def test_refusals():
    with pytest.raises(ValueError):
        read_vint(b"\x00\x01", 0, keep_marker=False)  # reserved zero
    with pytest.raises(NotImplementedError):
        read_vint(b"\xff", 0, keep_marker=False)      # unknown size
    raw = bytearray(build_ebml(0))
    raw[4] = 0xFF                                     # hdr size → all-ones
    with pytest.raises(NotImplementedError):
        parse_ebml(bytes(raw))
    with pytest.raises(ValueError):
        parse_ebml(build_ebml(0)[:-3])                # truncation
