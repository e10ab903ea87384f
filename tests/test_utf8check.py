"""RFC 3629 table coverage for the UTF-8 validator — accept path
cross-pinned against Python's decoder, defect path pinned per class."""

from knowledge_extraction_pipeline_spark.sources.utf8check import (
    build_utf8_doc,
    check_utf8,
    utf8_doc_spec,
)


def test_accept_path_matches_python_decoder():
    samples = ["plain ascii", "éàü", "€€", "𝄞 music 𝄞", "mixé€𝄞"]
    for s in samples:
        raw = s.encode()
        r = check_utf8(raw)
        assert r["errors"] == []
        assert sum(r["counts"].values()) == len(s)
        raw.decode()   # python agrees it is valid


def test_defect_classes():
    assert [k for _, k in check_utf8(b"\xc0\xaf")["errors"]] == \
        ["overlong", "bare_continuation"]
    assert [k for _, k in check_utf8(b"\xed\xa0\x80")["errors"]] == \
        ["surrogate", "bare_continuation", "bare_continuation"]
    assert [k for _, k in check_utf8(b"\xf5\x80")["errors"]] == \
        ["out_of_range", "bare_continuation"]
    assert [k for _, k in check_utf8(b"\x80")["errors"]] == \
        ["bare_continuation"]
    assert [k for _, k in check_utf8(b"\xe2\x82a")["errors"]] == \
        ["truncated", "bare_continuation"]
    assert [k for _, k in check_utf8(b"ok\xc3")["errors"]] == \
        ["truncated"]
    # E0 overlong floor: E0 80 would encode < U+0800
    assert [k for _, k in check_utf8(b"\xe0\x80\x80")["errors"]][0] == \
        "overlong"
    # F0 overlong floor and F4 ceiling
    assert [k for _, k in check_utf8(b"\xf0\x80\x80\x80")["errors"]][0] \
        == "overlong"
    assert [k for _, k in check_utf8(b"\xf4\x90\x80\x80")["errors"]][0] \
        == "out_of_range"


def test_fixture_counts():
    for i in (0, 1, 2, 3, 7, 14):
        s = utf8_doc_spec(i)
        r = check_utf8(build_utf8_doc(i))
        assert r["counts"][2] == s["n_2byte"]
        assert r["counts"][3] == s["n_3byte"]
        assert r["counts"][4] == s["n_4byte"]
        assert r["counts"][1] == s["n_ascii"] + len(s["defects"])
