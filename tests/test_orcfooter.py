"""ORC tail-walk checks: the hand-rolled protobuf walker against real
pyarrow-written ORC files, cross-checked with pyarrow's own reader."""

import io

import pytest

from knowledge_extraction_pipeline_spark.sources.orcfooter import (
    build_orc,
    orc_file_spec,
    parse_orc_footer,
)


def test_footer_matches_spec_and_pyarrow():
    import pyarrow.orc as orc
    for i in (0, 7, 17):
        spec = orc_file_spec(i)
        ks = [k for k, _ in spec]
        vs = [v for _, v in spec]
        raw = build_orc(i)
        p = parse_orc_footer(raw)
        ref = orc.ORCFile(io.BytesIO(raw))
        assert p["n_rows"] == len(spec) == ref.nrows
        assert len(p["stripe_rows"]) == ref.nstripes >= 2
        assert sum(p["stripe_rows"]) == p["n_rows"]
        assert p["field_names"] == ["k", "v"]
        assert p["k_min"] == min(ks)
        assert p["k_max"] == max(ks)
        assert p["k_sum"] == sum(ks)
        assert p["v_min"] == min(vs)
        assert p["v_max"] == max(vs)
        assert p["v_total_len"] == sum(len(v) for v in vs)


def test_bad_magic_and_compressed_refused():
    with pytest.raises(ValueError):
        parse_orc_footer(b"NOT AN ORC FILE AT ALL........\x05")
    import pyarrow as pa
    import pyarrow.orc as orc
    t = pa.table({"k": pa.array([1, 2, 3], pa.int64())})
    buf = io.BytesIO()
    orc.write_table(t, buf, compression="zlib")
    with pytest.raises(NotImplementedError):
        parse_orc_footer(buf.getvalue())
