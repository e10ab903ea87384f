"""LZ4 block-format vectors: round-trip, foreign blocks, overlap copy."""

import pytest

from knowledge_extraction_pipeline_spark.sources.lz4block import (
    lz4_compress_with_stats,
    lz4_decompress,
    lz4_doc_spec,
)


def test_foreign_block_simple_match():
    # hand-written: 4 literals "abcd", match offset 4 len 4+0,
    # then final literals "XY"
    blk = b"\x40abcd\x04\x00" + b"\x20XY"
    text, st = lz4_decompress(blk)
    assert text == b"abcdabcdXY"
    assert st["n_matches"] == 1
    assert st["n_overlap_matches"] == 0


def test_foreign_block_overlap_rle():
    # 1 literal "z", match offset 1 len 4+6=10 → "z" * 11, then "!" tail
    blk = b"\x16z\x01\x00" + b"\x10!"
    text, st = lz4_decompress(blk)
    assert text == b"z" * 11 + b"!"
    assert st["n_overlap_matches"] == 1
    assert st["max_match_len"] == 10


def test_foreign_block_long_lengths():
    # one final literals-only sequence: length 15 + extension 240 = 255
    blk = b"\xf0" + bytes([240]) + b"a" * 255
    text, st = lz4_decompress(blk)
    assert text == b"a" * 255
    assert st["n_sequences"] == 1
    assert st["n_matches"] == 0


def test_invalid_offset_rejected():
    with pytest.raises(ValueError):
        lz4_decompress(b"\x10a\x05\x00")   # offset 5 > output so far
    with pytest.raises(ValueError):
        lz4_decompress(b"\x10a\x00\x00")   # offset 0 illegal


def test_roundtrip_and_stats_agree():
    for i in (0, 3, 9, 17):
        text = lz4_doc_spec(i)
        blk, wst = lz4_compress_with_stats(text)
        out, rst = lz4_decompress(blk)
        assert out == text
        assert rst == wst
        assert wst["n_overlap_matches"] >= 1   # planted run fired
        assert len(blk) < len(text)            # it actually compresses
