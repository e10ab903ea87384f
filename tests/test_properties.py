"""Property-based tests (hypothesis) for the deterministic building blocks."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from knowledge_extraction_pipeline_spark.functions.lexicon import (
    extract_mentions_text,
    normalize_term_py,
    trie_regex,
)

words = st.text(alphabet="abcdefghij-", min_size=1, max_size=8).filter(
    lambda w: w.strip("-"))
word_lists = st.lists(words, min_size=1, max_size=12, unique=True)


@settings(max_examples=200, deadline=None)
@given(word_lists, st.lists(words, min_size=1, max_size=20))
def test_trie_regex_equals_flat_alternation(vocab, text_words):
    text = " ".join(text_words)
    flat = re.compile(
        r"\b(" + "|".join(re.escape(s) for s in
                          sorted(vocab, key=len, reverse=True)) + r")\b", re.I)
    trie = re.compile(r"\b(" + trie_regex(sorted(vocab)) + r")\b", re.I)
    assert ([(m.start(), m.group(1)) for m in flat.finditer(text)]
            == [(m.start(), m.group(1)) for m in trie.finditer(text)])


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=80))
def test_normalize_idempotent(s):
    n = normalize_term_py(s)
    assert normalize_term_py(n) == n
    assert n == n.strip().lower() or n == ""


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet="abcXYZ .-", max_size=200))
def test_extract_mentions_quotes_verbatim(text):
    for m in extract_mentions_text(text):
        assert m["quote"] in text
        assert text[m["start"]:m["start"] + len(m["term"])] == m["term"]
        assert normalize_term_py(m["term"]) == m["norm_term"]


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(words, words), min_size=0, max_size=30))
def test_driver_union_find_properties(edges):
    from knowledge_extraction_pipeline_spark.operators.canonicalize import (
        _driver_union_find,
    )
    edges = [(a, b) for a, b in edges if a != b]
    asn = dict(_driver_union_find(edges))
    # every endpoint assigned; root is a member mapping to itself
    for a, b in edges:
        assert asn[a] == asn[b]
        assert asn[asn[a]] == asn[a]
        assert asn[a] <= a and asn[a] <= b
