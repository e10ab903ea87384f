"""Golden spec vectors for the MessagePack writer/reader pair."""

import pytest

from knowledge_extraction_pipeline_spark.sources.msgpackfile import (
    _mp_array_hdr,
    _mp_int,
    _mp_map_hdr,
    _mp_str,
    build_msgpack,
    decode_msgpack,
    msgpack_spec,
)


def test_int_golden():
    # spec: minimal encodings at every boundary
    assert _mp_int(0) == b"\x00"
    assert _mp_int(127) == b"\x7f"
    assert _mp_int(128) == b"\xcc\x80"
    assert _mp_int(255) == b"\xcc\xff"
    assert _mp_int(256) == b"\xcd\x01\x00"
    assert _mp_int(65_535) == b"\xcd\xff\xff"
    assert _mp_int(65_536) == b"\xce\x00\x01\x00\x00"
    assert _mp_int(2 ** 32) == b"\xcf\x00\x00\x00\x01\x00\x00\x00\x00"
    assert _mp_int(-1) == b"\xff"
    assert _mp_int(-32) == b"\xe0"
    assert _mp_int(-33) == b"\xd0\xdf"
    assert _mp_int(-128) == b"\xd0\x80"
    assert _mp_int(-129) == b"\xd1\xff\x7f"


def test_str_array_map_golden():
    assert _mp_str("hello") == b"\xa5hello"
    assert _mp_str("x" * 31) == b"\xbf" + b"x" * 31
    assert _mp_str("x" * 32) == b"\xd9\x20" + b"x" * 32
    assert _mp_array_hdr(15) == b"\x9f"
    assert _mp_array_hdr(16) == b"\xdc\x00\x10"
    assert _mp_map_hdr(15) == b"\x8f"
    assert _mp_map_hdr(16) == b"\xde\x00\x10"


def test_decode_foreign_bytes():
    # {"a": 1, "b": [-1, true, nil]} assembled by hand
    raw = b"\x82\xa1a\x01\xa1b\x93\xff\xc3\xc0"
    assert decode_msgpack(raw) == {"a": 1, "b": [-1, True, None]}
    with pytest.raises(NotImplementedError):
        decode_msgpack(b"\xca\x00\x00\x00\x00")   # float32 refused
    with pytest.raises(ValueError):
        decode_msgpack(b"\x00\x00")               # trailing bytes


def test_roundtrip_matches_spec():
    for i in (0, 4, 5, 15, 33):
        s = msgpack_spec(i)
        m = decode_msgpack(build_msgpack(i))
        assert m["rec_id"] == s["rec_id"]
        assert m["neg"] == s["neg"]
        assert m["name"] == s["name"]
        assert m["tags"] == s["tags"]
        assert m["flag"] == s["flag"]
        assert m["nil"] is None
        assert m["big"] == s["big"]
        assert m["m"] == {"hour": s["meta_hour"]}
