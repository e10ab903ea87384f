"""Golden wire-format vectors for the protobuf writer/reader pair.

These pin the WRITER to byte encodings known from the public spec
(https://protobuf.dev/programming-guides/encoding/), so a writer/reader
bug pair that cancels in the round-trip manifest cannot survive: the
writer's bytes are compared against hand-derived constants, and the
reader is additionally driven over foreign byte strings it never wrote.
"""

import hashlib

from knowledge_extraction_pipeline_spark.sources.protobuf import (
    _key,
    _ld,
    _varint,
    _zigzag,
    build_message,
    message_spec,
    parse_message,
)


def test_varint_golden():
    # spec examples: 1 = 0x01, 150 = 0x96 0x01, 300 = 0xAC 0x02
    assert _varint(0) == b"\x00"
    assert _varint(1) == b"\x01"
    assert _varint(127) == b"\x7f"
    assert _varint(128) == b"\x80\x01"
    assert _varint(150) == b"\x96\x01"
    assert _varint(300) == b"\xac\x02"
    assert _varint(2 ** 56) == b"\x80\x80\x80\x80\x80\x80\x80\x80\x01"


def test_zigzag_golden():
    # spec table: 0→0, -1→1, 1→2, -2→3, 2147483647→4294967294
    assert _zigzag(0) == 0
    assert _zigzag(-1) == 1
    assert _zigzag(1) == 2
    assert _zigzag(-2) == 3
    assert _zigzag(2147483647) == 4294967294
    assert _zigzag(-2147483648) == 4294967295


def test_key_and_ld_golden():
    # field 1 wire 0 → 0x08 ; field 2 wire 2 → 0x12 (spec examples)
    assert _key(1, 0) == b"\x08"
    assert _key(2, 2) == b"\x12"
    # `testing` as field-2 string → 12 07 74 65 73 74 69 6e 67
    assert _ld(2, b"testing") == b"\x12\x07testing"


def test_reader_on_foreign_bytes():
    # A message assembled by hand, field order scrambled, with an
    # unknown field (9, wire 0) the reader must skip and count.
    buf = (b"\x12\x03abc"          # field 2 (name) = "abc"
           + b"\x48\x2a"            # field 9 varint 42 — UNKNOWN
           + b"\x08\xac\x02"        # field 1 (rec_id) = 300
           + b"\x18\x03"            # field 3 (score) zigzag 3 → -2
           + b"\x3a\x02\x96\x01")   # field 7 packed vals = [150]
    m = parse_message(buf)
    assert m["rec_id"] == 300
    assert m["name"] == "abc"
    assert m["score"] == -2
    assert m["vals"] == [150]
    assert m["n_unknown"] == 1


def test_roundtrip_matches_spec():
    for i in (0, 1, 3, 7, 12):
        s = message_spec(i)
        m = parse_message(build_message(i))
        assert m["rec_id"] == s["rec_id"]
        assert m["name"] == s["name"]
        assert m["score"] == s["score"]
        assert m["flags"] == s["flags"]
        assert m["meta_hour"] == s["meta_hour"]
        assert m["meta_tag"] == s["meta_tag"]
        assert m["tags"] == s["tags"]
        assert m["vals"] == s["vals"]
        assert m["big"] == s["big"]
        assert m["n_unknown"] == (2 if s["extra_unk"] else 1)
        assert (hashlib.md5("|".join(m["tags"]).encode()).hexdigest()
                == hashlib.md5("|".join(s["tags"]).encode()).hexdigest())


def test_truncated_varint_raises():
    import pytest
    with pytest.raises(ValueError):
        parse_message(b"\x08\x80")  # continuation bit set, no next byte
