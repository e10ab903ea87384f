"""RFC 1035 compression-pointer vectors for the DNS walk."""

import pytest

from knowledge_extraction_pipeline_spark.sources.dnsfile import (
    _labels,
    build_dns,
    dns_msg_spec,
    parse_dns,
    read_name,
)


def test_label_encoding():
    assert _labels("a.bc") == b"\x01a\x02bc\x00"
    assert _labels("example") == b"\x07example\x00"


def test_pointer_following_and_mid_name_target():
    # buf: name "x.y" at 0; at 6 a pointer to offset 2 (the "y" label)
    buf = b"\x01x\x01y\x00\x00\xc0\x02"
    name, nxt, jumps = read_name(buf, 0)
    assert (name, nxt, jumps) == ("x.y", 5, 0)
    name2, nxt2, jumps2 = read_name(buf, 6)
    assert (name2, nxt2, jumps2) == ("y", 8, 1)


def test_pointer_loop_guarded():
    buf = b"\xc0\x02\x00\x00\xc0\x00"   # 4→0→2... craft a real loop
    loop = b"\xc0\x00"                  # points at itself
    with pytest.raises(ValueError):
        read_name(loop, 0)


def test_parse_matches_spec():
    for i in (0, 3, 4, 9):
        s = dns_msg_spec(i)
        p = parse_dns(build_dns(i))
        assert p["txn_id"] == s["txn_id"]
        assert p["qname"] == s["qname"]
        assert p["a_records"] == s["ips"]
        assert p["cnames"] == [s["cname"]]
        assert p["n_skipped"] == (1 if s["with_txt"] else 0)
        ttls = [300] + ([30] if s["with_txt"] else []) + s["ttls"]
        assert p["min_ttl"] == min(ttls)
