"""Golden RFC 1071 checksum vector + structural checks for the pcap walk."""

import pytest

from knowledge_extraction_pipeline_spark.sources.pcapfile import (
    build_pcap,
    ip_checksum,
    parse_pcap,
    pcap_file_spec,
)


def test_rfc1071_golden_header():
    # The classic textbook IPv4 header: checksum field zeroed computes
    # to 0xB1E6 (Wikipedia/RFC example).
    hdr = bytes.fromhex(
        "4500003c1c4640004006" + "0000" + "ac100a63ac100a0c")
    assert ip_checksum(hdr) == 0xB1E6
    # verifying a header WITH its checksum in place yields 0
    full = bytes.fromhex(
        "4500003c1c4640004006" + "b1e6" + "ac100a63ac100a0c")
    total = 0
    for w in range(0, len(full), 2):
        total += int.from_bytes(full[w:w + 2], "big")
    while total >> 16:
        total = (total & 0xFFFF) + (total >> 16)
    assert (~total) & 0xFFFF == 0


def test_parse_matches_spec():
    for i in (0, 5, 11):
        spec = pcap_file_spec(i)
        pkts = parse_pcap(build_pcap(i))
        assert len(pkts) == len(spec)
        assert [not p["ck_ok"] for p in pkts] == \
            [s["corrupt"] for s in spec]
        assert [p["payload"] for p in pkts] == \
            [s["payload"] for s in spec]
        assert all(p["proto"] == 17 for p in pkts)


def test_refusals():
    with pytest.raises(ValueError):
        parse_pcap(b"\x00" * 24)                      # bad magic
    swapped = b"\xd4\xc3\xb2\xa1" + b"\x00" * 20
    with pytest.raises(NotImplementedError):
        parse_pcap(swapped)                           # byte-swapped
    raw = bytearray(build_pcap(0))
    raw[20:24] = (1).to_bytes(4, "little")            # ethernet linktype
    with pytest.raises(NotImplementedError):
        parse_pcap(bytes(raw))
