"""Golden BEP-3 vectors for the bencode writer/reader pair."""

import pytest

from knowledge_extraction_pipeline_spark.sources.bencodefile import (
    _benc,
    build_torrent,
    decode_bencode,
    torrent_spec,
)


def test_spec_golden_vectors():
    assert _benc(42) == b"i42e"
    assert _benc(-3) == b"i-3e"
    assert _benc(0) == b"i0e"
    assert _benc("spam") == b"4:spam"
    assert _benc(["spam"]) == b"l4:spame"
    assert _benc({"cow": "moo"}) == b"d3:cow3:mooe"
    assert decode_bencode(b"i42e") == 42
    assert decode_bencode(b"l4:spami-3ee") == [b"spam", -3]
    assert decode_bencode(b"d3:cow3:moo4:spami1ee") == \
        {"cow": b"moo", "spam": 1}


def test_canonical_rules_enforced():
    with pytest.raises(ValueError):
        decode_bencode(b"i042e")          # leading zero
    with pytest.raises(ValueError):
        decode_bencode(b"i-0e")           # negative zero
    with pytest.raises(ValueError):
        decode_bencode(b"d4:spami1e3:cowi2ee")   # unsorted keys
    with pytest.raises(ValueError):
        decode_bencode(b"i1ei2e")         # trailing bytes


def test_roundtrip_matches_spec():
    for i in (0, 5, 13):
        s = torrent_spec(i)
        t = decode_bencode(build_torrent(i))
        assert t["announce"].decode() == s["announce"]
        assert t["info"]["name"].decode() == s["name"]
        assert t["info"]["piece length"] == s["piece_length"]
        assert t["info"]["length"] == s["length"]
        assert len(t["info"]["pieces"]) == 20 * s["n_pieces"]
        assert len(t["announce-list"]) == len(s["trackers"])
