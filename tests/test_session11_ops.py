"""Operator-level tests for the session-11 additions: the gzip member
walk and MIME multipart walk (corruption / edge paths the happy-path
driver oracle can't exercise), the bowtie decomposition on a handcrafted
graph with every class present, and DBSCAN core/border/noise semantics on
handcrafted vectors."""

import struct
import zlib

import pytest

from knowledge_extraction_pipeline_spark.sources.archives import (
    build_gzip_member,
    gzip_member_spec,
    parse_gzip_members,
)
from knowledge_extraction_pipeline_spark.sources.mime import (
    build_mime,
    mime_part_spec,
    parse_mime_parts,
)


def test_gzip_multimember_roundtrip():
    spec = gzip_member_spec(5)
    blob = b"".join(build_gzip_member(*m) for m in spec)
    rows = parse_gzip_members(blob)
    assert [(r[1], r[5]) for r in rows] == \
        [(n, len(c)) for n, c, _, _ in spec]
    assert all(r[7] == 1 for r in rows)             # crc_ok everywhere


def test_gzip_trailer_corruption_flags_crc():
    spec = gzip_member_spec(2)
    blobs = [bytearray(build_gzip_member(*m)) for m in spec]
    blobs[0][-5] ^= 0xFF                            # flip a CRC byte
    rows = parse_gzip_members(b"".join(bytes(b) for b in blobs))
    assert rows[0][7] == 0                          # first member flagged
    assert all(r[7] == 1 for r in rows[1:])         # later members intact


def test_gzip_header_crc16_verified():
    name, content, mtime, _ = gzip_member_spec(1)[0]
    blob = bytearray(build_gzip_member(name, content, mtime, style=1))
    assert blob[3] & 0x02                           # FHCRC set
    # corrupt the FNAME region (inside the CRC16-covered header)
    at = blob.index(name.encode()) if name.encode() in blob else 20
    blob[at] ^= 0x01
    (row,) = parse_gzip_members(bytes(blob))
    assert row[7] == 0                              # header CRC catches it


def test_gzip_bad_magic_raises():
    blob = bytearray(build_gzip_member(*gzip_member_spec(0)[0]))
    blob[0] = 0x00
    with pytest.raises(ValueError, match="magic"):
        parse_gzip_members(bytes(blob))


def test_mime_roundtrip_against_stdlib_writer():
    for i in (0, 1, 3):
        spec = mime_part_spec(i)
        rows = parse_mime_parts(build_mime(i))
        assert [(r[1], r[2], r[3], r[4]) for r in rows] == \
            [(ct, enc, name, len(c)) for ct, enc, name, c in spec]


def test_mime_qp_soft_breaks_and_escapes():
    msg = (b"Content-Type: multipart/mixed; boundary=\"bb\"\n"
           b"\n--bb\n"
           b"Content-Type: text/plain\n"
           b"Content-Transfer-Encoding: quoted-printable\n"
           b"\nab=3Dcd ef=\ngh=09z\n--bb--\n")
    (row,) = parse_mime_parts(msg)
    import hashlib
    assert row[4] == len(b"ab=cd efgh\tz")
    assert row[5] == hashlib.md5(b"ab=cd efgh\tz").hexdigest()


def test_mime_delimiter_owns_preceding_newline():
    # RFC 2046: the line break before --boundary is part of the delimiter,
    # so a 7bit body must NOT grow a phantom trailing newline
    msg = (b"Content-Type: multipart/mixed; boundary=bb\n"
           b"\n--bb\n"
           b"Content-Type: text/plain\n"
           b"\nexact content\n--bb--\n")
    (row,) = parse_mime_parts(msg)
    assert row[4] == len(b"exact content")


def test_mime_non_multipart_raises():
    with pytest.raises(ValueError, match="multipart"):
        parse_mime_parts(b"Content-Type: text/plain\n\nhello")


def test_bowtie_every_class(spark):
    # core cycle: c1<->c2; in: i1 -> c1; out: c2 -> o1;
    # tube: i1 -> t1 -> o1 (avoids core); tendril-in: i1 -> ti;
    # tendril-out: to -> o1; disconnected: d1 -> d2
    edges = spark.createDataFrame(
        [("c1", "c2"), ("c2", "c1"), ("i1", "c1"), ("c2", "o1"),
         ("i1", "t1"), ("t1", "o1"), ("i1", "ti"), ("to", "o1"),
         ("d1", "d2")], "src string, dst string")
    from knowledge_extraction_pipeline_spark.operators.graph_algos import (
        bowtie_decomposition,
    )
    got = {r["node"]: r["bowtie_class"]
           for r in bowtie_decomposition(edges).collect()}
    assert got == {"c1": "CORE", "c2": "CORE", "i1": "IN", "o1": "OUT",
                   "t1": "TUBE", "ti": "TENDRIL_IN", "to": "TENDRIL_OUT",
                   "d1": "DISCONNECTED", "d2": "DISCONNECTED"}


def test_dbscan_roles_and_clusters(spark):
    # two tight clusters on orthogonal axes + one isolated point + one
    # border point near cluster A but with too few neighbors to be core
    def v(x, y, z):
        return [float(x), float(y), float(z), 0.0]
    rows = [(0, v(10, 0, 0)), (1, v(10, 0.1, 0)), (2, v(10, -0.1, 0)),
            (3, v(10, 0, 0.1)),                      # cluster A (4 cores)
            (10, v(0, 10, 0)), (11, v(0.1, 10, 0)), (12, v(-0.1, 10, 0)),
            (13, v(0, 10, 0.1)),                     # cluster B (4 cores)
            (20, v(7, 7, 0)),                        # border of nothing
            (30, v(0, 0, 10))]                       # noise
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    from knowledge_extraction_pipeline_spark.operators.similarity import (
        dbscan_labels,
    )
    got = {r["vec_id"]: (r["role"], r["cluster_id"])
           for r in dbscan_labels(embs, threshold=0.95, min_pts=4).collect()}
    for i in (0, 1, 2, 3):
        assert got[i] == ("core", 0)
    for i in (10, 11, 12, 13):
        assert got[i] == ("core", 10)
    assert got[30] == ("noise", None)
    # point 20 at (7,7): cos to cluster-A members ≈ 0.7 < 0.95 → noise too
    assert got[20] == ("noise", None)


def test_dbscan_border_attaches_to_min_cluster(spark):
    # chain: 4 mutually-close cores + one point close to exactly one core
    # (1 neighbor < min_pts-1) → border, inherits the cluster id
    base = [1.0, 0.0]
    rows = [(0, [1.0, 0.0]), (1, [0.999, 0.04]), (2, [0.999, -0.04]),
            (3, [0.998, 0.06]),
            (9, [0.90, 0.44])]   # cos to vec 0 ≈ 0.90 … only near core 3?
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    from knowledge_extraction_pipeline_spark.operators.similarity import (
        dbscan_labels,
    )
    got = {r["vec_id"]: (r["role"], r["cluster_id"])
           for r in dbscan_labels(embs, threshold=0.97, min_pts=4).collect()}
    assert {got[i] for i in (0, 1, 2, 3)} == {("core", 0)}
    assert got[9][0] in ("border", "noise")
    if got[9][0] == "border":
        assert got[9][1] == 0
