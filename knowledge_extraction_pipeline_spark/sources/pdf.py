"""Minimal REAL PDF 1.4 writer + metadata parser.

The reference pipeline is PDF-first (its core/document_processor.py reads
PDFs through three extractor fallbacks before chunking); this module gives
the Spark rebuild the same *container* awareness as the other media
formats (BMP/PNG/GIF/JPEG/MP4/WEBP): a deterministic writer that emits a
genuine cross-reference-table PDF, and a parser that reads metadata the
way a conformant reader does — tail `startxref` → xref table → trailer
`/Root` → page tree — never by grepping the byte stream for keywords.

Scope is the classic xref-table subset of PDF 1.4: uncompressed content
streams, a flat page tree, literal-string Info values. Cross-reference
STREAMS (PDF 1.5+ compressed xref) and content-stream filters are
honestly refused with ValueError, exactly like progressive JPEG and MP4
frame decode elsewhere in this package — wrong metadata is worse than a
clean refusal.
"""
from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .multimodal import MEDIA_SCHEMA

PDF_META_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("version", T.StringType()),
    T.StructField("n_objects", T.IntegerType()),
    T.StructField("n_pages", T.IntegerType()),
    T.StructField("width", T.IntegerType()),       # first-page MediaBox
    T.StructField("height", T.IntegerType()),
    T.StructField("content_bytes", T.LongType()),  # sum of stream lengths
    T.StructField("title", T.StringType()),
])


def page_content(doc_id: int, page: int) -> bytes:
    """The deterministic per-page content stream (shared by the writer and
    the fixture-oracle formula)."""
    return (f"BT /F1 12 Tf 72 720 Td (page {page} of doc {doc_id}) Tj ET"
            .encode("ascii"))


def encode_pdf(doc_id: int, n_pages: int, width: int, height: int,
               title: str) -> bytes:
    """Emit a real single-xref PDF 1.4 document: catalog → flat page tree →
    one uncompressed content stream per page → Info dict → xref table whose
    offsets are the actual byte positions → trailer → startxref. Any
    conformant PDF reader opens the result."""
    objects: list[bytes] = []
    # 1: catalog, 2: pages, 3..2+n: page objects, 3+n..2+2n: contents,
    # 3+2n: info
    first_content = 3 + n_pages
    kids = " ".join(f"{3 + p} 0 R" for p in range(n_pages))
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objects.append(f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>"
                   .encode("ascii"))
    for p in range(n_pages):
        objects.append(
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {width} {height}]"
            f" /Contents {first_content + p} 0 R"
            f" /Resources << /Font << /F1 << /Type /Font /Subtype /Type1"
            f" /BaseFont /Helvetica >> >> >> >>".encode("ascii"))
    streams = [page_content(doc_id, p) for p in range(n_pages)]
    info_num = first_content + n_pages
    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]  # object 0 is the free-list head
    for num, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{num} 0 obj\n".encode("ascii") + body + b"\nendobj\n"
    for p, s in enumerate(streams):
        offsets.append(len(out))
        out += (f"{first_content + p} 0 obj\n<< /Length {len(s)} >>\n"
                f"stream\n".encode("ascii") + s + b"\nendstream\nendobj\n")
    offsets.append(len(out))
    out += (f"{info_num} 0 obj\n<< /Title ({title})"
            f" /Producer (kep-spark synth) >>\nendobj\n".encode("ascii"))
    xref_at = len(out)
    n_entries = info_num + 1
    out += f"xref\n0 {n_entries}\n".encode("ascii")
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode("ascii")
    out += (f"trailer\n<< /Size {n_entries} /Root 1 0 R /Info {info_num}"
            f" 0 R >>\nstartxref\n{xref_at}\n%%EOF\n".encode("ascii"))
    return bytes(out)


_REF_RE = re.compile(rb"/(\w+)\s+(\d+)\s+\d+\s+R")
_INT_RE = re.compile(rb"/(\w+)\s+(\d+)(?![\d.])")


def _object_body(payload: bytes, offsets: dict[int, int], num: int) -> bytes:
    """Slice object `num`'s body using its XREF OFFSET (the parse is
    offset-driven: a wrong xref entry fails here, it is not papered over
    by a whole-file scan)."""
    off = offsets[num]
    m = re.match(rb"(\d+)\s+\d+\s+obj\b", payload[off:off + 32])
    if not m or int(m.group(1)) != num:
        raise ValueError(f"xref offset for object {num} does not point at it")
    start = off + m.end()
    end = payload.index(b"endobj", start)
    return payload[start:end]


def parse_pdf(payload: bytes) -> tuple:
    """Real metadata parse, reader-style: header version; `startxref` from
    the tail; the xref table at that offset (20-byte entries); trailer
    /Size /Root /Info; catalog → /Pages → /Kids page walk; first-page
    /MediaBox; per-page /Contents → /Length sum; Info /Title."""
    if not payload.startswith(b"%PDF-"):
        raise ValueError("not a PDF payload")
    version = payload[5:payload.index(b"\n")].decode("ascii").strip()
    tail = payload[-256:]
    m = re.search(rb"startxref\s+(\d+)\s+%%EOF", tail)
    if not m:
        raise ValueError("no startxref/%%EOF tail")
    xref_at = int(m.group(1))
    if payload[xref_at:xref_at + 4] != b"xref":
        raise ValueError("xref offset does not point at an xref table "
                         "(compressed cross-reference streams unsupported)")
    pos = xref_at + 4
    offsets: dict[int, int] = {}
    while True:
        m = re.match(rb"\s*(\d+)\s+(\d+)\s*\n", payload[pos:pos + 64])
        if not m:
            break
        first, count = int(m.group(1)), int(m.group(2))
        pos += m.end()
        for i in range(count):
            entry = payload[pos:pos + 20]
            if len(entry) < 18:
                raise ValueError("truncated xref entry")
            if entry[17:18] == b"n":
                offsets[first + i] = int(entry[:10])
            pos += 20
    tr_at = payload.index(b"trailer", pos - 20 if pos >= 20 else 0)
    trailer = payload[tr_at:tr_at + 512]
    ints = dict((k.decode(), int(v)) for k, v in _INT_RE.findall(trailer))
    refs = dict((k.decode(), int(v)) for k, v in _REF_RE.findall(trailer))
    if "Size" not in ints or "Root" not in refs:
        raise ValueError("trailer missing /Size or /Root")
    n_objects = ints["Size"] - 1  # entry 0 is the free-list head

    catalog = _object_body(payload, offsets, refs["Root"])
    cat_refs = dict((k.decode(), int(v)) for k, v in _REF_RE.findall(catalog))
    pages = _object_body(payload, offsets, cat_refs["Pages"])
    km = re.search(rb"/Kids\s*\[([^\]]*)\]", pages)
    cm = re.search(rb"/Count\s+(\d+)", pages)
    if not km or not cm:
        raise ValueError("page tree missing /Kids or /Count")
    kid_nums = [int(x) for x in re.findall(rb"(\d+)\s+\d+\s+R", km.group(1))]
    n_pages = int(cm.group(1))
    if len(kid_nums) != n_pages:
        raise ValueError("flat page tree expected (/Count != len(/Kids))")

    width = height = 0
    content_bytes = 0
    for j, kid in enumerate(kid_nums):
        page = _object_body(payload, offsets, kid)
        if j == 0:
            mb = re.search(
                rb"/MediaBox\s*\[\s*(\d+)\s+(\d+)\s+(\d+)\s+(\d+)\s*\]", page)
            if not mb:
                raise ValueError("first page has no /MediaBox")
            width = int(mb.group(3)) - int(mb.group(1))
            height = int(mb.group(4)) - int(mb.group(2))
        prefs = dict((k.decode(), int(v)) for k, v in _REF_RE.findall(page))
        if "Contents" in prefs:
            cobj = _object_body(payload, offsets, prefs["Contents"])
            lm = re.search(rb"/Length\s+(\d+)", cobj)
            if not lm:
                raise ValueError("content stream without integer /Length")
            if re.search(rb"/Filter", cobj):
                raise ValueError("filtered content streams unsupported")
            content_bytes += int(lm.group(1))

    title = ""
    if "Info" in refs:
        info = _object_body(payload, offsets, refs["Info"])
        tm = re.search(rb"/Title\s*\(([^)]*)\)", info)
        if tm:
            title = tm.group(1).decode("ascii")
    return version, n_objects, n_pages, width, height, content_bytes, title


def extract_pdf_metadata(media: DataFrame) -> DataFrame:
    """mapInPandas PDF metadata extraction — Arrow-batched like the other
    media paths; one Python pass per batch, no per-row UDF."""
    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                v, nobj, npg, w, h, cb, title = parse_pdf(bytes(payload))
                rows.append((mid, v, nobj, npg, w, h, cb, title))
            yield pd.DataFrame(rows, columns=[
                "media_id", "version", "n_objects", "n_pages", "width",
                "height", "content_bytes", "title"])

    return (media.filter(F.col("mime") == "application/pdf")
            .select("media_id", "payload")
            .mapInPandas(process, schema=PDF_META_SCHEMA))


# (width, height): US Letter, A4, US Legal — cycled by the fixture
PAGE_SIZES = [(612, 792), (595, 842), (612, 1008)]


def synthetic_pdf_media(spark: SparkSession, n: int = 30,
                        seed: int = 42) -> DataFrame:
    """Deterministic REAL PDF table: formula page counts and page sizes;
    every payload round-trips through parse_pdf and any external reader."""
    rows = []
    for i in range(n):
        n_pages = 1 + (i * 7 + seed) % 5
        w, h = PAGE_SIZES[i % len(PAGE_SIZES)]
        payload = encode_pdf(i, n_pages, w, h, title=f"doc-{i}")
        rows.append((i, "document", "application/pdf", bytearray(payload),
                     {"pages": str(n_pages)}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
