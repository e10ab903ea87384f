"""VINT width semantics, wide-size handling, and refusals for the
EBML walk."""

import pytest

from knowledge_extraction_pipeline_spark.sources.ebmlfile import (
    build_ebml,
    ebml_file_spec,
    encode_vint_size,
    parse_ebml,
    read_vint,
)


def test_vint_widths():
    # 1-byte: 0x81 = value 1; 2-byte: 0x4001 = value 1 (wide)
    assert read_vint(b"\x81", 0, keep_marker=False)[0] == 1
    assert read_vint(b"\x40\x01", 0, keep_marker=False)[0] == 1
    # marker kept for IDs: 0x1A45DFA3 reads back as itself
    v, w, _ = read_vint(bytes.fromhex("1a45dfa3"), 0, keep_marker=True)
    assert (v, w) == (0x1A45DFA3, 4)
    # minimal boundary: 126 fits 1 byte, 127 is the reserved all-ones
    assert encode_vint_size(126) == b"\xfe"
    assert len(encode_vint_size(127)) == 2


def test_wide_sizes_counted_not_rederived():
    for i in (0, 1, 2, 3):
        sp = ebml_file_spec(i)
        wb = sp["width_bump"]
        exp_wide = ((1 if wb % 2 else 0) + (1 if wb else 0)
                    + (1 if wb % 3 else 0) + 1)
        assert parse_ebml(build_ebml(i))["wide"] == exp_wide


def test_parse_matches_spec():
    for i in (0, 5, 11, 29):
        sp = ebml_file_spec(i)
        r = parse_ebml(build_ebml(i))
        assert r["doctype"] == sp["doctype"]
        assert r["tcs"] == sp["timecode_scale"]
        assert r["unknown"] == sp["n_void"]
        assert r["n"] == 14 + sp["n_void"]


def test_refusals():
    with pytest.raises(ValueError):
        read_vint(b"\x00\x01", 0, keep_marker=False)  # reserved zero
    with pytest.raises(NotImplementedError):
        read_vint(b"\xff", 0, keep_marker=False)      # unknown size
    raw = bytearray(build_ebml(0))
    raw[4] = 0xFF                                     # hdr size → all-ones
    with pytest.raises(NotImplementedError):
        parse_ebml(bytes(raw))
    with pytest.raises(ValueError):
        parse_ebml(build_ebml(0)[:-3])                # truncation


def test_warc_walk_and_refusals():
    import pytest

    from knowledge_extraction_pipeline_spark.sources.warcfile import (
        build_warc,
        parse_warc,
        warc_file_spec,
    )
    for i in (0, 1, 5):
        rs = parse_warc(build_warc(i))
        assert len(rs) == len(warc_file_spec(i))
        bad = sum(1 for r in rs if r["digest_ok"] is False)
        assert (bad == 1) == (i % 5 == 0)
    with pytest.raises(ValueError):
        parse_warc(build_warc(1)[:-2])       # separator clipped
    raw = bytearray(build_warc(1))
    raw[5] = ord("2")                        # WARC/2.0
    with pytest.raises(NotImplementedError):
        parse_warc(bytes(raw))


def test_robots_precedence_and_suppression():
    from knowledge_extraction_pipeline_spark.sources.robotsfile import (
        _pattern_matches,
        build_robots,
        decide,
        parse_robots,
    )
    # longest match wins; allow wins exact ties
    parsed = parse_robots(
        b"User-agent: *\nDisallow: /a/\nAllow: /a/b\n")
    assert decide(parsed, "x", "/a/b.html")["allowed"] is True
    assert decide(parsed, "x", "/a/c.html")["allowed"] is False
    tie = parse_robots(b"User-agent: *\nDisallow: /a/\nAllow: /a/\n")
    assert decide(tie, "x", "/a/z")["allowed"] is True
    # a specific group suppresses the fallback entirely
    p = parse_robots(build_robots(0))      # i=0: kep-bot group exists
    assert decide(p, "kep-bot", "/cgi-bin/run?q=1")["allowed"] is True
    assert decide(p, "other-bot", "/cgi-bin/run?q=1")["allowed"] \
        is False
    # wildcards and end anchor
    assert _pattern_matches("/*.php$", "/tmp/x.php")
    assert not _pattern_matches("/*.php$", "/tmp/x.php3")
    assert _pattern_matches("/a*b*c", "/aXXbYYc-and-more")


def test_sitemap_walk_and_refusals():
    import pytest

    from knowledge_extraction_pipeline_spark.sources.sitemapfile import (
        build_sitemap,
        parse_sitemap,
        sitemap_file_spec,
    )
    for i in (0, 3, 9):
        sp = sitemap_file_spec(i)
        r = parse_sitemap(build_sitemap(i))
        assert [u["loc"] for u in r["urls"]] == [u["loc"] for u in sp]
        assert [u["priority"] for u in r["urls"]] \
            == [u["priority_e1"] for u in sp]
    with pytest.raises(NotImplementedError):
        parse_sitemap(b'<sitemapindex xmlns="x"></sitemapindex>')
    with pytest.raises(ValueError):
        parse_sitemap(b"<urlset></urlset>")          # missing xmlns
    with pytest.raises(ValueError):
        parse_sitemap(build_sitemap(0)[:-12])        # unterminated


def test_elf_walk_and_refusals():
    import pytest

    from knowledge_extraction_pipeline_spark.sources.elffile import (
        build_elf,
        elf_file_spec,
        parse_elf,
    )
    combos = set()
    for i in range(8):
        sp = elf_file_spec(i)
        r = parse_elf(build_elf(i))
        assert (r["is64"], r["big"]) == (sp["is64"], sp["big"])
        assert r["sizes_ok"] and r["n_loads"] == len(sp["segs"])
        combos.add((r["is64"], r["big"]))
    assert len(combos) == 4            # all class x data combos
    with pytest.raises(ValueError):
        parse_elf(b"NOPE" + b"\x00" * 60)
    raw = bytearray(build_elf(0))
    raw[4] = 3                          # unknown class
    with pytest.raises(NotImplementedError):
        parse_elf(bytes(raw))
    raw = bytearray(build_elf(0))
    raw[5] = 0                          # unknown data encoding
    with pytest.raises(NotImplementedError):
        parse_elf(bytes(raw))
    raw = bytearray(build_elf(0))
    raw[6] = 2                          # bad version
    with pytest.raises(ValueError):
        parse_elf(bytes(raw))
