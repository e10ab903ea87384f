"""Golden CRC-32/OGG vector, lacing edge cases, and refusals for the
Ogg page walk."""

import struct

import pytest

from knowledge_extraction_pipeline_spark.sources.oggfile import (
    build_ogg,
    ogg_crc,
    ogg_file_spec,
    packet_bytes,
    paginate_stream,
    parse_ogg,
)


def test_ogg_crc_is_not_zlib():
    import zlib
    data = b"OggS golden vector"
    # forward (unreflected) CRC with poly 0x04C11DB7 differs from the
    # reflected zlib variant on any non-trivial input
    assert ogg_crc(data) != zlib.crc32(data)
    # golden property: CRC of empty input is 0, single zero byte too
    assert ogg_crc(b"") == 0
    assert ogg_crc(b"\x00") == 0
    # known vector: one 0x01 byte pushes the poly through 8 shifts
    assert ogg_crc(b"\x01") == 0x04C11DB7


def test_lacing_boundaries():
    # 510 bytes = [255, 255, 0]; 255 = [255, 0]; 0 = [0]
    pages = paginate_stream([510])
    assert [v for p in pages for v in p["lacing"]] == [255, 255, 0]
    pages = paginate_stream([255])
    assert [v for p in pages for v in p["lacing"]] == [255, 0]
    pages = paginate_stream([0])
    assert [v for p in pages for v in p["lacing"]] == [0]


def test_nogranule_sentinel_and_spanning():
    # a >=1275-byte packet yields a page of five 255s: no packet
    # completes there, so its granule must be the -1 sentinel
    pages = paginate_stream([1600])
    assert any(p["granule"] == -1 for p in pages)
    assert any(p["continued"] for p in pages)


def test_parse_matches_spec():
    for i in (0, 3, 7, 11):
        r = parse_ogg(build_ogg(i))
        spec = ogg_file_spec(i)
        assert sum(len(v) for v in r["packets"].values()) \
            == sum(len(st["sizes"]) for st in spec)
        for s, st in enumerate(spec):
            assert r["packets"][st["serial"]] == [
                packet_bytes(i, s, p, sz)
                for p, sz in enumerate(st["sizes"])]
        bad = sum(1 for p in r["pages"] if not p["crc_ok"])
        assert (bad == 1) == (i % 4 == 3)


def test_refusals():
    with pytest.raises(ValueError):
        parse_ogg(b"NotO" + b"\x00" * 30)             # bad magic
    raw = bytearray(build_ogg(0))
    raw[4] = 1                                        # version 1
    with pytest.raises(NotImplementedError):
        parse_ogg(bytes(raw))
    with pytest.raises(ValueError):
        parse_ogg(build_ogg(0)[:-3])                  # truncated body
    # sequence gap: bump the seq field of the second page
    raw = bytearray(build_ogg(1))
    # find the second page of the first serial
    first_serial = struct.unpack("<I", raw[14:18])[0]
    pos, hits = 0, 0
    while pos < len(raw):
        serial = struct.unpack("<I", raw[pos + 14:pos + 18])[0]
        nseg = raw[pos + 26]
        plen = sum(raw[pos + 27:pos + 27 + nseg])
        if serial == first_serial:
            hits += 1
            if hits == 2:
                raw[pos + 18:pos + 22] = struct.pack("<I", 99)
                break
        pos += 27 + nseg + plen
    with pytest.raises(ValueError):
        parse_ogg(bytes(raw))
