"""X.690 golden vectors for the DER writer/reader pair."""

import pytest

from knowledge_extraction_pipeline_spark.sources.derfile import (
    _decode_int,
    _decode_oid,
    _der_int,
    _der_oid,
    _len,
    build_der,
    der_doc_spec,
    parse_cert_like,
)


def test_length_golden():
    assert _len(5) == b"\x05"
    assert _len(127) == b"\x7f"
    assert _len(128) == b"\x81\x80"
    assert _len(300) == b"\x82\x01\x2c"


def test_integer_golden():
    # X.690 classics: 0, 127, 128, 256, -128, -129
    assert _der_int(0) == b"\x02\x01\x00"
    assert _der_int(127) == b"\x02\x01\x7f"
    assert _der_int(128) == b"\x02\x02\x00\x80"
    assert _der_int(256) == b"\x02\x02\x01\x00"
    assert _der_int(-128) == b"\x02\x01\x80"
    assert _der_int(-129) == b"\x02\x02\xff\x7f"
    with pytest.raises(ValueError):
        _decode_int(b"\x00\x7f")          # redundant 0x00
    with pytest.raises(ValueError):
        _decode_int(b"\xff\x80")          # redundant 0xFF


def test_oid_golden():
    # the RSA arc: 1.2.840.113549 → 2a 86 48 86 f7 0d
    assert _der_oid("1.2.840.113549") == \
        b"\x06\x06\x2a\x86\x48\x86\xf7\x0d"
    assert _decode_oid(b"\x2a\x86\x48\x86\xf7\x0d") == "1.2.840.113549"
    assert _decode_oid(b"\x55\x04\x03") == "2.5.4.3"   # CN


def test_roundtrip_matches_spec():
    for i in (0, 7, 13):
        s = der_doc_spec(i)
        p = parse_cert_like(build_der(i))
        assert p["serial"] == s["serial"]
        assert p["subject"] == s["subject"]
        assert p["not_before"] == s["not_before"]
        assert p["sigalg_oid"] == s["sigalg"]
        assert p["key"] == s["key"]
        assert p["key_bits"] == 8 * len(s["key"])


def test_indefinite_length_rejected():
    with pytest.raises(ValueError):
        parse_cert_like(b"\x30\x80\x02\x01\x05\x00\x00")
