"""Golden encoding vectors + structural checks for the Avro OCF pair."""

import pytest

from knowledge_extraction_pipeline_spark.sources.avrofile import (
    _avro_str,
    _zz_long,
    avro_file_spec,
    build_avro,
    parse_avro,
)


def test_zigzag_long_golden():
    # spec examples: 0→00, -1→01, 1→02, -2→03, 2→04, -64→7f, 64→80 01
    assert _zz_long(0) == b"\x00"
    assert _zz_long(-1) == b"\x01"
    assert _zz_long(1) == b"\x02"
    assert _zz_long(-2) == b"\x03"
    assert _zz_long(2) == b"\x04"
    assert _zz_long(-64) == b"\x7f"
    assert _zz_long(64) == b"\x80\x01"


def test_string_golden():
    # "foo" → length 3 (zigzag 06) + bytes
    assert _avro_str("foo") == b"\x06foo"
    assert _avro_str("") == b"\x00"


def test_multi_block_roundtrip():
    # file 20 has 5 + (20*7+42) % 23 = 5 + 182 % 23 = 5 + 21 = 26 records
    # → 4 blocks of 8/8/8/2 under block_records=8
    recs = avro_file_spec(20)
    p = parse_avro(build_avro(20))
    assert p["n_blocks"] == (len(recs) + 7) // 8
    assert len(p["records"]) == len(recs)
    assert p["sync_ok"] is True
    assert [r["amount"] for r in p["records"]] == [a for a, _, _ in recs]
    assert [r["active"] for r in p["records"]] == [x for _, _, x in recs]


def test_reader_is_schema_driven():
    # Corrupting a sync marker is detected, not ignored.
    buf = bytearray(build_avro(3))
    buf[-1] ^= 0xFF
    assert parse_avro(bytes(buf))["sync_ok"] is False
    # Unknown codec → honest refusal.
    raw = build_avro(3)
    bad = raw.replace(b"\x08null", b"\x08gzip", 1)
    with pytest.raises(NotImplementedError):
        parse_avro(bad)


def test_bad_magic():
    with pytest.raises(ValueError):
        parse_avro(b"Not an avro file")
