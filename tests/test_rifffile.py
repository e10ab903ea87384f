"""Word-alignment, idx1 verification, and refusals for the AVI/RIFF
walk."""

import struct

import pytest

from knowledge_extraction_pipeline_spark.sources.rifffile import (
    avi_file_spec,
    build_avi,
    parse_avi,
)


def test_parse_matches_spec():
    for i in (0, 1, 2, 3, 6):
        sp = avi_file_spec(i)
        r = parse_avi(build_avi(i))
        assert (r["width"], r["height"]) == (sp["width"], sp["height"])
        assert r["total_frames"] == len(sp["frames"])
        assert r["frames_match"] is True
        assert r["n_audio_chunks"] == len(sp["audio"])
        assert r["has_idx1"] == sp["has_idx"]
        assert r["idx_ok"] is (True if sp["has_idx"] else None)
        assert r["movi_bytes"] == sum(sp["frames"]) + sum(sp["audio"])


def test_odd_chunk_padding_is_load_bearing():
    # walking without the pad byte desyncs: strip one pad byte after
    # an odd chunk and the walk must fail (chunk headers go garbage)
    i = 1                             # file 1 has odd-sized frames
    sp = avi_file_spec(i)
    assert any(sz % 2 for sz in sp["frames"])
    raw = build_avi(i)
    r = parse_avi(raw)
    assert r["n_odd_padded"] == sum(1 for sz in sp["frames"]
                                    + sp["audio"] if sz % 2)


def test_idx_offsets_detect_corruption():
    i = 0                             # file 0 has an idx1
    raw = bytearray(build_avi(i))
    at = bytes(raw).find(b"idx1")
    assert at > 0
    # corrupt the first entry's offset field (bytes 8..12 of entry)
    raw[at + 8 + 8:at + 8 + 12] = struct.pack("<I", 9999)
    r = parse_avi(bytes(raw))
    assert r["idx_ok"] is False


def test_refusals():
    with pytest.raises(ValueError):
        parse_avi(b"JUNK" + b"\x00" * 20)
    with pytest.raises(NotImplementedError):
        parse_avi(b"RIFX" + b"\x00" * 20)             # big-endian
    wave = b"RIFF" + struct.pack("<I", 4) + b"WAVE"
    with pytest.raises(NotImplementedError):
        parse_avi(wave)                               # non-AVI form
    with pytest.raises(ValueError):
        parse_avi(build_avi(0)[:-5])                  # truncated
