"""Geometry verification, cpp=2 handling, and refusals for the XPM
walk."""

import pytest

from knowledge_extraction_pipeline_spark.sources.xpmfile import (
    build_xpm,
    parse_xpm,
    pixel_index,
    xpm_file_spec,
)


def test_parse_matches_spec():
    for i in (0, 2, 3, 10, 12):
        sp = xpm_file_spec(i)
        r = parse_xpm(build_xpm(i))
        assert (r["width"], r["height"]) == (sp["width"], sp["height"])
        assert r["cpp"] == sp["cpp"]
        assert r["index_sum"] == sum(
            pixel_index(i, x, y, sp["ncolors"])
            for y in range(sp["height"]) for x in range(sp["width"]))


def test_cpp2_rows_are_not_bytewise():
    # file 3 has cpp=2: a bytewise reader would double-count width
    sp = xpm_file_spec(3)
    assert sp["cpp"] == 2
    r = parse_xpm(build_xpm(3))
    assert r["width"] == sp["width"]
    assert all(len(row) == sp["width"] for row in r["rows"])


def test_refusals():
    with pytest.raises(ValueError):
        parse_xpm(b"static char * x[] = {};")       # no strings
    bad_head = b'static char * x[] = {"1 2 3",};'
    with pytest.raises(ValueError):
        parse_xpm(bad_head)                          # 3-field values
    cpp3 = b'static char * x[] = {"1 1 1 3","aaa c #000000","aaa",};'
    with pytest.raises(NotImplementedError):
        parse_xpm(cpp3)                              # cpp > 2
    short_row = (b'static char * x[] = {"2 1 1 1",'
                 b'"a c #000000","a",};')
    with pytest.raises(ValueError):
        parse_xpm(short_row)                         # row len != w*cpp
    unknown = (b'static char * x[] = {"1 1 1 1",'
               b'"a c #000000","b",};')
    with pytest.raises(ValueError):
        parse_xpm(unknown)                           # unknown key
    dup = (b'static char * x[] = {"1 1 2 1",'
           b'"a c #000000","a c #FFFFFF","a",};')
    with pytest.raises(ValueError):
        parse_xpm(dup)                               # duplicate key
