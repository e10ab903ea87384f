"""RFC 3492 golden vectors + stdlib cross-checks for the bootstring
decoder."""

import hashlib

from knowledge_extraction_pipeline_spark.functions.punycode import (
    bootstring_decode,
    puny_labels,
)

# RFC 3492 section 7.1 sample strings, via their stdlib encodings
RFC_VECTORS = [
    "egbpdaj6bu4bxfgehfvwxn",                        # (A) Arabic
    "ihqwcrb4cv8a8dqg056pqjye",                      # (B) Chinese
    "4dbcagdahymbxekheh6e0a7fei0b",                  # (D) Hebrew
    "i1baa7eci9glrd9b2ae1bj0hfcgg6iyaf8o0a1dig0cd",  # (E) Hindi
    "b1abfaaepdrnnbgefbadotcwatmq2g4l",              # (H) Russian
    "3e0bk47br7k",                                   # (K) Korean 한국어
]


def test_rfc_vectors_match_stdlib():
    for enc in RFC_VECTORS:
        assert bootstring_decode(enc) == enc.encode().decode("punycode")


def test_fixture_labels_decode_to_pinned_md5():
    for _, enc, n_basic, md5 in puny_labels(24):
        dec = bootstring_decode(enc)
        assert hashlib.md5(dec.encode()).hexdigest() == md5
        cut = enc.rindex("-") if "-" in enc else -1
        assert (cut if cut >= 0 else 0) == n_basic


def test_edge_cases():
    # pure ASCII: trailing bare delimiter, zero extended steps
    assert bootstring_decode("abc-") == "abc"
    # hyphen in the original: LAST delimiter splits
    s = "a-b" + chr(0x3B1)
    assert bootstring_decode(s.encode("punycode").decode()) == s
    # no delimiter at all: everything is extended
    s2 = chr(0x3B1) + chr(0x3B2) + chr(0x3B3)
    assert bootstring_decode(s2.encode("punycode").decode()) == s2


def test_broad_stdlib_cross_check():
    for i in range(300):
        s = ("x" * (i % 3) + chr(0x100 + i * 13)
             + chr(0x900 + (i * 7) % 1000) + "ab-"[:i % 4])
        assert bootstring_decode(s.encode("punycode").decode()) == s
