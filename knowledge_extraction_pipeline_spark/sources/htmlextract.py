"""HTML main-text extraction — the step that turns a fetched WARC
response into training text: <script>/<style> blocks removed WITH
their contents (the planted trap: script bodies contain literal
'<p>leak</p>' markup that a naive strip-all-tags regex would surface
as text), the <head> block dropped wholesale (titles are metadata,
not body text), remaining tags stripped with a character walker,
the five named entities plus decimal numeric character references
decoded, and whitespace collapsed to single spaces. The extractor is
GENERIC; the builder wraps real document words in deterministic
markup (<b> wraps every 5th paragraph word, every 7th word carries
an '&amp;' entity, an '&#8212;' em-dash reference lands after every
11th) so the oracle can derive the expected extracted text purely
from word arithmetic — a leaked script body, an undecoded entity or
a surviving tag flips the md5.

Extraction runs as mapInPandas over (doc_id, text) — fully
distributed, the 10^9-document shape.

Reference analog: the reference's PDF text extraction
(core/document_processor.py:91-177) — this is the same stage for
web-acquired corpora.
"""

from __future__ import annotations

import hashlib
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

HTML_MANIFEST_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("html_len", T.IntegerType()),
    T.StructField("text_len", T.IntegerType()),
    T.StructField("n_tags_stripped", T.IntegerType()),
    T.StructField("n_entities", T.IntegerType()),
    T.StructField("extracted_md5", T.StringType()),
])

MAX_WORDS = 80


def doc_words(text: str) -> list[str]:
    clean = re.sub(r"[^a-z ]", "", text.lower())
    return [w for w in clean.split(" ") if w][:MAX_WORDS]


def build_html(doc_id: int, words: list[str]) -> str:
    h1 = words[:3]
    rest = words[3:]
    pieces = []
    for j, w in enumerate(rest, start=1):
        t = w
        if j % 7 == 0:
            t = "AT&amp;T-" + t
        if j % 5 == 0:
            t = "<b>" + t + "</b>"
        pieces.append(t)
        if j % 11 == 0:
            pieces.append("&#8212;")
    return ("<html><head><title>doc %d</title>"
            "<script>var x = \"<p>leak</p>\";</script>"
            "<style>.c { color: red } /* <p>leak</p> */</style>"
            "</head><body><h1>%s</h1><p>%s</p></body></html>"
            % (doc_id, " ".join(h1), " ".join(pieces)))


def expected_text(words: list[str]) -> str:
    """Independent derivation of what extraction must produce —
    word arithmetic only, never the extractor."""
    toks = list(words[:3])
    for j, w in enumerate(words[3:], start=1):
        toks.append(("AT&T-" + w) if j % 7 == 0 else w)
        if j % 11 == 0:
            toks.append("—")
    return " ".join(toks)


_ENT = {"amp": "&", "lt": "<", "gt": ">", "quot": '"',
        "apos": "'"}


def extract_html(html: str) -> tuple[str, int, int]:
    """Generic extractor → (text, n_tags_stripped, n_entities)."""
    html = re.sub(r"<script\b.*?</script\s*>", " ", html,
                  flags=re.S | re.I)
    html = re.sub(r"<style\b.*?</style\s*>", " ", html,
                  flags=re.S | re.I)
    html = re.sub(r"<head\b.*?</head\s*>", " ", html,
                  flags=re.S | re.I)
    n_tags = 0
    out = []
    pos = 0
    while pos < len(html):
        c = html[pos]
        if c == "<":
            end = html.find(">", pos)
            if end < 0:
                raise ValueError("unterminated tag")
            n_tags += 1
            out.append(" ")
            pos = end + 1
        else:
            out.append(c)
            pos += 1
    text = "".join(out)
    n_ent = 0

    def sub_ent(m: re.Match) -> str:
        nonlocal n_ent
        n_ent += 1
        name = m.group(1)
        if name.startswith("#"):
            return chr(int(name[1:]))
        if name not in _ENT:
            raise ValueError(f"unknown entity &{name};")
        return _ENT[name]

    text = re.sub(r"&(#?\w+);", sub_ent, text)
    text = re.sub(r"\s+", " ", text).strip()
    return text, n_tags, n_ent


def html_extract_manifest(docs: DataFrame) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                words = doc_words(text)
                html = build_html(int(doc_id), words)
                extracted, n_tags, n_ent = extract_html(html)
                out.append({
                    "doc_id": int(doc_id),
                    "html_len": len(html),
                    "text_len": len(extracted),
                    "n_tags_stripped": n_tags,
                    "n_entities": n_ent,
                    "extracted_md5": hashlib.md5(
                        extracted.encode("utf-8")).hexdigest(),
                })
            yield pd.DataFrame(out, columns=[f.name for f in
                                             HTML_MANIFEST_SCHEMA.fields])

    return docs.mapInPandas(run, HTML_MANIFEST_SCHEMA)
