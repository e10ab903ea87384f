"""Mixed-endianness, bbox verification, and refusals for the
shapefile walk."""

import struct

import pytest

from knowledge_extraction_pipeline_spark.sources.shapefile import (
    build_shp,
    parse_shp,
    shp_file_spec,
)


def test_parse_matches_spec():
    for i in (0, 1, 4, 9):
        recs = shp_file_spec(i)
        r = parse_shp(build_shp(i))
        assert r["n_records"] == len(recs)
        assert r["n_null"] == sum(1 for s in recs if s["type"] == 0)
        assert r["file_bbox_ok"] and r["record_bboxes_ok"]
        assert r["file_len_ok"]


def test_bbox_is_verified_not_trusted():
    raw = bytearray(build_shp(1))
    # corrupt the file-level Xmin double (bytes 36..44, LE)
    raw[36:44] = struct.pack("<d", -999999.0)
    assert parse_shp(bytes(raw))["file_bbox_ok"] is False


def test_length_is_in_words():
    raw = build_shp(0)
    words = struct.unpack(">i", raw[24:28])[0]
    assert words * 2 == len(raw)          # words, not bytes
    assert parse_shp(raw)["file_len_ok"] is True


def test_refusals():
    with pytest.raises(ValueError):
        parse_shp(b"\x00" * 100)                        # bad code
    # little-endian 9994 in the big-endian slot = endianness slip
    bad = struct.pack("<i", 9994) + b"\x00" * 96
    with pytest.raises(ValueError):
        parse_shp(bad)
    raw = bytearray(build_shp(2))
    # find a record content and flip its shape type to PointZ (11)
    pos = 100
    num, words = struct.unpack(">ii", raw[pos:pos + 8])
    raw[pos + 8:pos + 12] = struct.pack("<i", 11)
    with pytest.raises(NotImplementedError):
        parse_shp(bytes(raw))
    with pytest.raises(ValueError):
        parse_shp(build_shp(0)[:-3])                    # truncation


def test_url_canonicalizer_grammar():
    import pytest

    from knowledge_extraction_pipeline_spark.functions.urltools import (
        canonicalize_url as c,
    )
    assert c("HTTP://Example-3.COM:80/a/b/../c?b=2&a=1#frag") \
        == "http://example-3.com/a/c?a=1&b=2"
    assert c("http://e.com/x/y/../../a/c") == "http://e.com/a/c"
    assert c("http://e.com/../../a") == "http://e.com/a"
    with pytest.raises(ValueError):
        c("no-scheme.com/a")


def test_html_extract_traps():
    from knowledge_extraction_pipeline_spark.sources.htmlextract import (
        build_html,
        doc_words,
        expected_text,
        extract_html,
    )
    words = doc_words("alpha beta gamma " + "word " * 40)
    html = build_html(7, words)
    extracted, n_tags, n_ent = extract_html(html)
    # independent derivation, script/style leak trap, head exclusion
    assert extracted == expected_text(words)
    assert "leak" not in extracted
    assert "doc 7" not in extracted
    m = len(words) - 3
    assert n_tags == 8 + 2 * (m // 5)
    assert n_ent == m // 7 + m // 11
    import pytest
    with pytest.raises(ValueError):
        extract_html("<p>unterminated <")
    with pytest.raises(ValueError):
        extract_html("bad &unknown; entity")
