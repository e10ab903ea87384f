"""Structural checks for the hand-rolled parquet footer walker against
bytes produced by the REAL pyarrow writer (independent-writer honesty:
the reader never imports pyarrow.parquet)."""

import pytest

from knowledge_extraction_pipeline_spark.sources.parquetfooter import (
    ROW_GROUP_SIZE,
    _read_struct,
    _uvarint,
    _zz,
    build_parquet,
    parquet_file_spec,
    parse_footer,
)


def test_zigzag_varint_golden():
    # thrift compact zigzag: 0→0, -1→1, 1→2; varint 300 = AC 02
    assert _zz(0) == 0
    assert _zz(1) == -1
    assert _zz(2) == 1
    assert _uvarint(b"\xac\x02", 0) == (300, 2)


def test_struct_golden():
    # field 1 (delta 1) type i32 (5), zigzag 4 → 2; stop byte 0x00
    assert _read_struct(b"\x15\x04\x00", 0) == ({1: 2}, 3)
    # long-form field header: delta 0, explicit zigzag id 16 (0x20)
    assert _read_struct(b"\x05\x20\x04\x00", 0) == ({16: 2}, 4)


def test_footer_matches_spec():
    for i in (0, 5, 11):
        spec = parquet_file_spec(i)
        p = parse_footer(build_parquet(i))
        assert p["num_rows"] == len(spec)
        assert p["leaf_names"] == ["k", "v"]
        n_rg = (len(spec) + ROW_GROUP_SIZE - 1) // ROW_GROUP_SIZE
        assert len(p["row_groups"]) == n_rg
        for g, rg in enumerate(p["row_groups"]):
            chunk = spec[g * ROW_GROUP_SIZE:(g + 1) * ROW_GROUP_SIZE]
            ks = [k for k, _ in chunk]
            assert rg["num_rows"] == len(chunk)
            assert rg["cols"]["k"]["min"] == min(ks)
            assert rg["cols"]["k"]["max"] == max(ks)
            assert rg["cols"]["k"]["num_values"] == len(chunk)


def test_bad_magic():
    with pytest.raises(ValueError):
        parse_footer(b"PAR1 not really a parquet file tail PARX")
