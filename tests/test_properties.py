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


@settings(max_examples=60, deadline=None)
@given(st.integers(2, 24), st.integers(2, 24), st.integers(1, 30),
       st.booleans(), st.integers(0, 2**31 - 1))
def test_tiff_round_trip_property(h, w, rps, gray, seed):
    """Any 8-bit image, any strip height (including the single-strip inline
    IFD case), encodes to a TIFF that decodes back pixel-exact."""
    import numpy as np

    from knowledge_extraction_pipeline_spark.sources.multimodal import (
        decode_tiff,
        encode_tiff,
    )
    rng = np.random.RandomState(seed % (2**31))
    shape = (h, w) if gray else (h, w, 3)
    px = rng.randint(0, 256, size=shape, dtype=np.uint8)
    ww, hh, back = decode_tiff(encode_tiff(px, rows_per_strip=rps))
    assert (ww, hh) == (w, h)
    expect = np.repeat(px[:, :, None], 3, axis=2) if gray else px
    assert np.array_equal(back, expect)


shingle = st.text(alphabet="abcd", min_size=1, max_size=3)
shingle_sets = st.lists(
    st.frozensets(shingle, min_size=1, max_size=12), min_size=2, max_size=14)


@settings(max_examples=150, deadline=None)
@given(shingle_sets, st.sampled_from([0.1, 0.3, 0.5, 0.6, 0.8, 0.9]))
def test_prefix_filter_theorem_lossless(sets, t):
    """The math behind _prefix_candidates, checked independently of Spark:
    under the (df asc, shingle) global order with prefix length
    p = n − ⌈t·n − 1e-9⌉ + 1 and the slacked length-ratio bound, EVERY pair
    with Jaccard ≥ t shares a prefix token and passes the bound — the
    candidate set can only over-generate, never lose a qualifying pair."""
    import math
    from collections import Counter

    df = Counter(s for ss in sets for s in ss)
    order = {s: (df[s], s) for s in df}

    def prefix(ss):
        n = len(ss)
        p = n - math.ceil(t * n - 1e-9) + 1
        return set(sorted(ss, key=order.__getitem__)[:max(p, 0)])

    prefixes = [prefix(ss) for ss in sets]
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            a, b = sets[i], sets[j]
            jac = len(a & b) / len(a | b)
            if jac >= t:
                assert prefixes[i] & prefixes[j], (a, b, t)
                assert (min(len(a), len(b))
                        >= t * max(len(a), len(b)) - 1e-9)
