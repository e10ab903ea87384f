"""SQLite database-file walking — the embedded-database ingestion surface
(app exports, telemetry dumps and scraped .db/.sqlite files are a real
training-data container). The WRITER is the stdlib sqlite3 module
(Connection.serialize(), so the parser faces bytes produced by the real
SQLite engine); the PARSER is hand-rolled from the public file-format spec
(https://www.sqlite.org/fileformat2.html): the 100-byte header, table
b-tree interior (0x05) / leaf (0x0D) page walks, cell pointer arrays,
varint decode, and the record format (header-size varint, serial types,
1/2/3/4/6/8-byte twos-complement ints, the 8/9 zero/one types, TEXT
13+2n) — never sqlite3 for reading. Schema discovery parses the
sqlite_master b-tree rooted at page 1 like any other table, then each
user table's b-tree is walked from its discovered root page.

Only content properties are emitted (row counts, integer sums, text
digests, verbatim CREATE sql) — page numbers and free-space layout are
engine-version artifacts and deliberately excluded. Rows are kept small
so no overflow chains arise (overflow is honestly refused, not guessed).

Extraction runs as mapInPandas over an opaque binary column — one Arrow
batch of database images in, one table manifest out.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DB_SCHEMA = T.StructType([
    T.StructField("db_id", T.LongType()),
    T.StructField("payload", T.BinaryType()),
])

SQLITE_TABLE_SCHEMA = T.StructType([
    T.StructField("db_id", T.LongType()),
    T.StructField("table_name", T.StringType()),
    T.StructField("n_rows", T.LongType()),
    T.StructField("sum_c0", T.LongType()),
    T.StructField("text_md5", T.StringType()),
    T.StructField("sql_md5", T.StringType()),
])


def sqlite_table_spec(db_id: int,
                      seed: int = 42) -> list[tuple[str, str, list[tuple[int, str]]]]:
    """Deterministic schema + rows for one database: (table_name,
    create_sql, [(c0, c1), ...]). Pure (db_id, j, r, seed) formulas so the
    oracle re-derives every manifest column without touching db bytes."""
    tables = []
    for j in range(2 + db_id % 3):
        name = f"t_{db_id:03d}_{j}"
        sql = (f"CREATE TABLE {name} (c0 INTEGER, c1 TEXT)")
        # every 5th db gets one page-spilling table so the interior-page
        # (0x05) walk is genuinely exercised, not just leaf pages
        n_rows = 400 if (db_id % 5 == 0 and j == 0) \
            else 5 + (db_id * 3 + j * 7 + seed) % 12
        rows = []
        for r in range(n_rows):
            c0 = (db_id * 9173 + j * 517 + r * 37 + seed) % 100_000 \
                - 50_000 + (256 ** (r % 4))   # exercises 1..4-byte ints
            rows.append((c0, f"v{db_id}_{j}_{r}_" + "x" * (r % 7)))
        tables.append((name, sql, rows))
    return tables


def build_sqlite(db_id: int, seed: int = 42) -> bytes:
    """Genuine SQLite bytes via the stdlib WRITER (the parser below never
    calls sqlite3): in-memory database serialized with the real engine."""
    import sqlite3
    con = sqlite3.connect(":memory:")
    for name, sql, rows in sqlite_table_spec(db_id, seed):
        con.execute(sql)
        con.executemany(f"INSERT INTO {name} VALUES (?, ?)", rows)
    con.commit()
    blob = con.serialize()
    con.close()
    return bytes(blob)


def _varint(buf: bytes, at: int) -> tuple[int, int]:
    """SQLite big-endian varint: up to 8 7-bit bytes then one full byte."""
    v = 0
    for i in range(8):
        b = buf[at + i]
        v = (v << 7) | (b & 0x7F)
        if not b & 0x80:
            return v, at + i + 1
    return (v << 8) | buf[at + 8], at + 9


def _record(buf: bytes, at: int) -> list:
    """Decode one record (row) payload starting at `at`: header-size
    varint, serial-type varints, then the values."""
    hsz, p = _varint(buf, at)
    hend = at + hsz
    stypes = []
    while p < hend:
        st, p = _varint(buf, p)
        stypes.append(st)
    vals: list = []
    p = hend
    for st in stypes:
        if st == 0:
            vals.append(None)
        elif 1 <= st <= 6:
            n = (1, 2, 3, 4, 6, 8)[st - 1]
            vals.append(int.from_bytes(buf[p:p + n], "big", signed=True))
            p += n
        elif st == 7:
            vals.append(struct.unpack_from(">d", buf, p)[0])
            p += 8
        elif st in (8, 9):
            vals.append(st - 8)
        elif st >= 13 and st % 2 == 1:
            n = (st - 13) // 2
            vals.append(buf[p:p + n].decode("utf-8"))
            p += n
        elif st >= 12:
            n = (st - 12) // 2
            vals.append(buf[p:p + n])
            p += n
        else:
            raise ValueError(f"unsupported serial type {st}")
    return vals


def _walk_table_btree(buf: bytes, page_no: int, page_size: int,
                      usable: int) -> Iterator[tuple[int, list]]:
    """Yield (rowid, record values) from a table b-tree rooted at
    page_no, depth-first in key order. Interior pages are 0x05 (left
    child pointer + key per cell, plus the rightmost pointer), leaves are
    0x0D. Payload overflow (payload > usable-35) is refused — fixture
    rows are small by construction."""
    base = (page_no - 1) * page_size
    hdr = base + (100 if page_no == 1 else 0)
    ptype = buf[hdr]
    ncells = struct.unpack_from(">H", buf, hdr + 3)[0]
    if ptype == 0x05:
        cparr = hdr + 12
        for i in range(ncells):
            coff = base + struct.unpack_from(">H", buf, cparr + 2 * i)[0]
            child = struct.unpack_from(">I", buf, coff)[0]
            yield from _walk_table_btree(buf, child, page_size, usable)
        right = struct.unpack_from(">I", buf, hdr + 8)[0]
        yield from _walk_table_btree(buf, right, page_size, usable)
        return
    if ptype != 0x0D:
        raise ValueError(f"not a table b-tree page: type 0x{ptype:02x}")
    cparr = hdr + 8
    for i in range(ncells):
        coff = base + struct.unpack_from(">H", buf, cparr + 2 * i)[0]
        psz, p = _varint(buf, coff)
        rowid, p = _varint(buf, p)
        if psz > usable - 35:
            raise ValueError("overflow payloads unsupported by design")
        yield rowid, _record(buf, p)


def parse_sqlite_tables(
        payload: bytes) -> list[tuple[str, int, int, str, str]]:
    """Hand-rolled database walk: verify the 16-byte magic, read the page
    size (offset 16, big-endian, 1 means 65536) and reserved-bytes count,
    walk the sqlite_master b-tree from page 1 for CREATE TABLE entries
    (type='table'), then walk each user table's b-tree from its
    discovered root page. Returns (table_name, n_rows, sum_c0,
    md5-of-'|'-joined-c1-in-rowid-order, md5-of-create-sql) sorted by
    table name."""
    if payload[:16] != b"SQLite format 3\x00":
        raise ValueError("bad sqlite magic")
    page_size = struct.unpack_from(">H", payload, 16)[0]
    if page_size == 1:
        page_size = 65536
    usable = page_size - payload[20]
    out = []
    for _rowid, rec in _walk_table_btree(payload, 1, page_size, usable):
        # sqlite_master: (type, name, tbl_name, rootpage, sql)
        if rec[0] != "table":
            continue
        name, root, sql = rec[1], rec[3], rec[4]
        n, s, texts = 0, 0, []
        for _rid, row in _walk_table_btree(payload, root, page_size,
                                           usable):
            n += 1
            s += int(row[0])
            texts.append(row[1])
        out.append((name, n, s,
                    hashlib.md5("|".join(texts).encode()).hexdigest(),
                    hashlib.md5(sql.encode()).hexdigest()))
    return sorted(out)


def synthetic_sqlite_dbs(spark: SparkSession, n: int = 18,
                         seed: int = 42) -> DataFrame:
    rows = [(i, bytearray(build_sqlite(i, seed))) for i in range(n)]
    return spark.createDataFrame(rows, DB_SCHEMA)


def sqlite_table_manifest(dbs: DataFrame) -> DataFrame:
    """Database image → table manifest, one Arrow batch at a time."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["db_id"], pdf["payload"]):
                for name, nr, s, tmd5, smd5 in parse_sqlite_tables(
                        bytes(payload)):
                    rows.append((did, name, nr, s, tmd5, smd5))
            yield pd.DataFrame(rows, columns=[
                "db_id", "table_name", "n_rows", "sum_c0", "text_md5",
                "sql_md5"])

    return (dbs.select("db_id", "payload")
            .mapInPandas(process, schema=SQLITE_TABLE_SCHEMA))
