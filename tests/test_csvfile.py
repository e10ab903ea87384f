"""State-machine transition coverage for the RFC 4180 reader, driven
over hand-written byte strings the stdlib writer never produced."""

import pytest

from knowledge_extraction_pipeline_spark.sources.csvfile import (
    build_csv,
    csv_file_spec,
    parse_csv,
)


def test_quoted_escapes_and_embedded_breaks():
    raw = b'a,"b""x",c\r\n"1,2","l1\nl2",\r\n'
    assert parse_csv(raw) == [['a', 'b"x', 'c'], ['1,2', 'l1\nl2', '']]


def test_bare_lf_and_unterminated_final_record():
    assert parse_csv(b"1,2\n3,4") == [["1", "2"], ["3", "4"]]
    assert parse_csv(b'x,"q"') == [["x", "q"]]


def test_empty_fields():
    assert parse_csv(b",,\r\n") == [["", "", ""]]
    assert parse_csv(b'"",a\r\n') == [["", "a"]]


def test_malformed_is_refused():
    with pytest.raises(ValueError):
        parse_csv(b'ab"c,d\r\n')          # bare quote unquoted
    with pytest.raises(ValueError):
        parse_csv(b'"ab"c,d\r\n')         # data after closing quote
    with pytest.raises(ValueError):
        parse_csv(b'"never closed')       # unterminated quote


def test_roundtrip_against_stdlib_writer():
    import csv
    import io
    for i in (0, 3, 9):
        spec = csv_file_spec(i)
        parsed = parse_csv(build_csv(i))
        assert parsed == [[str(a), b, c] for a, b, c in spec]
        # cross-check with the stdlib READER too (three-way agreement)
        rdr = list(csv.reader(io.StringIO(build_csv(i).decode())))
        assert parsed == rdr
