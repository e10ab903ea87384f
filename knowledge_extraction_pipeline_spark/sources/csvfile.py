"""RFC 4180 CSV walking — the lowest common denominator of data
interchange, and the format most often parsed WRONG (split-on-comma
breaks on the first quoted field). The writer is the stdlib csv module
(a real, independently-implemented producer — the sqlitefile
discipline); the reader is a hand-rolled byte-level state machine from
the spec (https://www.rfc-editor.org/rfc/rfc4180): four states (field
start, unquoted, quoted, quote-seen), `""` escape pairs inside quoted
fields, embedded commas and line breaks inside quotes, both CRLF and
bare-LF record terminators, and a final record without a terminator.
Malformed input (a bare quote inside an unquoted field, bytes after a
closing quote) is an honest ValueError, not a guess.

Fixture rows deliberately contain commas, double quotes, CRLF and LF
inside fields, and empty fields, so every state transition is genuinely
exercised. The oracle re-derives all manifest columns from the pure
(file_id, seed) spec formulas. Extraction runs as mapInPandas over an
opaque binary column — fully distributed.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CSV_FILE_SCHEMA = T.StructType([
    T.StructField("file_id", T.LongType()),
    T.StructField("payload", T.BinaryType()),
])

CSV_MANIFEST_SCHEMA = T.StructType([
    T.StructField("file_id", T.LongType()),
    T.StructField("n_records", T.LongType()),
    T.StructField("n_fields", T.IntegerType()),
    T.StructField("sum_a", T.LongType()),
    T.StructField("text_md5", T.StringType()),
    T.StructField("n_hostile_fields", T.LongType()),
    T.StructField("n_embedded_newlines", T.LongType()),
    T.StructField("n_empty_fields", T.LongType()),
])


def csv_file_spec(i: int, seed: int = 42) -> list[tuple[int, str, str]]:
    """Deterministic rows (a, b, c). b cycles through hostile shapes:
    embedded comma, embedded double quote, embedded CRLF, embedded bare
    LF, empty — so quoting, escape doubling and in-quote line breaks are
    all exercised in every file."""
    n = 8 + (i * 5 + seed) % 17
    rows = []
    for r in range(n):
        a = (i * 613 + r * 47 + seed) % 10_000 - 5_000
        k = r % 5
        if k == 0:
            b = f"plain_{i}_{r}"
        elif k == 1:
            b = f"comma,{i},{r}"
        elif k == 2:
            b = f'quote"{i}"{r}'
        elif k == 3:
            b = f"crlf\r\nline_{r}"
        else:
            b = f"lf\nline_{r}"
        c = "" if r % 4 == 0 else f"c{i}_{r}"
        rows.append((a, b, c))
    return rows


def build_csv(i: int, seed: int = 42) -> bytes:
    """REAL CSV bytes via the stdlib writer (QUOTE_MINIMAL, CRLF
    terminators — the RFC's canonical form); the reader below never
    imports csv."""
    import csv
    import io
    buf = io.StringIO()
    w = csv.writer(buf, quoting=csv.QUOTE_MINIMAL, lineterminator="\r\n")
    for a, b, c in csv_file_spec(i, seed):
        w.writerow([a, b, c])
    return buf.getvalue().encode()


def synthetic_csv_files(spark: SparkSession, n: int,
                        seed: int = 42) -> DataFrame:
    rows = [(i, build_csv(i, seed)) for i in range(n)]
    return spark.createDataFrame(rows, CSV_FILE_SCHEMA)


# ── reader: the four-state RFC 4180 machine ─────────────────────────────

def parse_csv(raw: bytes) -> list[list[str]]:
    text = raw.decode()
    records: list[list[str]] = []
    field: list[str] = []
    record: list[str] = []
    state = "START"          # START | UNQUOTED | QUOTED | QUOTE_SEEN
    pos = 0
    n = len(text)

    def end_field() -> None:
        record.append("".join(field))
        field.clear()

    def end_record() -> None:
        end_field()
        records.append(list(record))
        record.clear()

    while pos < n:
        ch = text[pos]
        if state == "START":
            if ch == '"':
                state = "QUOTED"
            elif ch == ",":
                end_field()
            elif ch == "\r" and text[pos + 1:pos + 2] == "\n":
                end_record()
                pos += 1
            elif ch == "\n":
                end_record()
            else:
                field.append(ch)
                state = "UNQUOTED"
        elif state == "UNQUOTED":
            if ch == ",":
                end_field()
                state = "START"
            elif ch == "\r" and text[pos + 1:pos + 2] == "\n":
                end_record()
                state = "START"
                pos += 1
            elif ch == "\n":
                end_record()
                state = "START"
            elif ch == '"':
                raise ValueError("bare quote in unquoted field")
            else:
                field.append(ch)
        elif state == "QUOTED":
            if ch == '"':
                state = "QUOTE_SEEN"
            else:
                field.append(ch)
        else:                # QUOTE_SEEN
            if ch == '"':    # escaped "" → literal quote, stay quoted
                field.append('"')
                state = "QUOTED"
            elif ch == ",":
                end_field()
                state = "START"
            elif ch == "\r" and text[pos + 1:pos + 2] == "\n":
                end_record()
                state = "START"
                pos += 1
            elif ch == "\n":
                end_record()
                state = "START"
            else:
                raise ValueError("data after closing quote")
        pos += 1
    if state == "QUOTED":
        raise ValueError("unterminated quoted field")
    if field or record or state in ("UNQUOTED", "QUOTE_SEEN"):
        end_record()     # final record without terminator
    return records


def csv_manifest(blobs: DataFrame) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for file_id, payload in zip(pdf["file_id"], pdf["payload"]):
                recs = parse_csv(bytes(payload))
                widths = {len(r) for r in recs}
                if len(widths) != 1:
                    raise ValueError("ragged csv")
                flat = [f for r in recs for f in r]
                joined = "|".join(f for r in recs for f in r[1:])
                out.append({
                    "file_id": int(file_id),
                    "n_records": len(recs),
                    "n_fields": widths.pop(),
                    "sum_a": sum(int(r[0]) for r in recs),
                    "text_md5": hashlib.md5(joined.encode()).hexdigest(),
                    "n_hostile_fields": sum(
                        1 for f in flat
                        if any(x in f for x in (',', '"', '\r', '\n'))),
                    "n_embedded_newlines": sum(
                        f.count("\n") for f in flat),
                    "n_empty_fields": sum(1 for f in flat if f == ""),
                })
            yield pd.DataFrame(out, columns=[f.name for f in
                                             CSV_MANIFEST_SCHEMA.fields])

    return blobs.mapInPandas(run, CSV_MANIFEST_SCHEMA)
