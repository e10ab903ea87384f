"""Parser-level tests for the archive/shard layer (sources/archives):
ustar walk, ZIP central-directory walk, Sun AU decode — including the
corruption paths the happy-path driver oracle can't exercise."""

import struct

import numpy as np
import pytest

from knowledge_extraction_pipeline_spark.sources.archives import (
    AU_PCM16,
    AU_ULAW,
    build_tar,
    build_zip,
    decode_au,
    encode_au,
    parse_tar,
    parse_zip_central_directory,
    tar_member_spec,
    zip_entry_spec,
)


def test_tar_roundtrip_members_and_checksums():
    spec = tar_member_spec(7)
    members = parse_tar(build_tar(spec))
    assert [(m[0], m[1], m[2]) for m in members] == \
        [(n, len(c), t) for n, c, t in spec]
    assert all(m[4] == 1 for m in members)          # checksums clean
    assert all(m[3] == "0" for m in members)        # regular files


def test_tar_corrupt_header_flags_checksum():
    payload = bytearray(build_tar(tar_member_spec(3)))
    payload[0] ^= 0xFF  # flip a byte inside the first header's name field
    members = parse_tar(bytes(payload))
    assert members[0][4] == 0                       # checksum mismatch
    assert all(m[4] == 1 for m in members[1:])      # later members intact


def test_tar_data_never_misaligned():
    # sizes not multiples of 512 force the padded-block advance
    spec = [("a.txt", b"x" * 513, 1_600_000_000),
            ("b.txt", b"y" * 1, 1_600_000_001),
            ("c.txt", b"", 1_600_000_002)]
    members = parse_tar(build_tar(spec))
    assert [(m[0], m[1]) for m in members] == [("a.txt", 513),
                                               ("b.txt", 1), ("c.txt", 0)]


def test_zip_roundtrip_and_crc():
    spec = zip_entry_spec(5)
    entries = parse_zip_central_directory(build_zip(spec))
    assert [(e[0], e[1], e[2]) for e in entries] == \
        [(n, m, len(c)) for n, c, m in spec]
    assert all(e[4] == 1 for e in entries)


def test_zip_corrupt_data_fails_crc():
    payload = bytearray(build_zip(zip_entry_spec(4)))
    # flip a byte in the first STORED entry's data region (after the
    # 30-byte local header + name)
    name_len = len(zip_entry_spec(4)[0][0])
    payload[30 + name_len] ^= 0xFF
    entries = parse_zip_central_directory(bytes(payload))
    assert entries[0][4] == 0
    assert all(e[4] == 1 for e in entries[1:])


def test_zip_no_eocd_returns_empty():
    assert parse_zip_central_directory(b"not a zip at all") == []


def test_au_pcm_and_ulaw_roundtrip():
    x = (np.sin(np.arange(500) * 0.05) * 12000).astype(np.int16)
    rate, y = decode_au(encode_au(8000, x, AU_PCM16))
    assert rate == 8000
    np.testing.assert_array_equal(x, y)             # PCM is lossless
    rate2, z = decode_au(encode_au(8000, x, AU_ULAW))
    assert rate2 == 8000 and len(z) == len(x)
    # companding error bounded by the largest μ-law step (~1/16 of range)
    assert int(np.abs(x.astype(np.int64) - z.astype(np.int64)).max()) < 2048


def test_au_honors_data_offset():
    x = np.arange(-100, 100, dtype=np.int16)
    payload = encode_au(16000, x, AU_PCM16, annotation=b"long note\x00\x00\x00")
    rate, y = decode_au(payload)
    assert rate == 16000
    np.testing.assert_array_equal(x, y)


def test_au_refuses_unknown():
    with pytest.raises(NotImplementedError):
        decode_au(b"RIFF" + b"\x00" * 40)
    bad = struct.pack(">4sIIIII", b".snd", 24, 4, 27, 8000, 1) + b"\x00" * 4
    with pytest.raises(NotImplementedError):
        decode_au(bad)


def test_flac_streaminfo_roundtrip_and_refusals():
    import hashlib
    from knowledge_extraction_pipeline_spark.sources.audio_meta import (
        encode_flac_streaminfo, parse_flac_streaminfo)
    md5 = hashlib.md5(b"sig").digest()
    payload = encode_flac_streaminfo(4096, 4096, 14, 20, 44100, 2, 24,
                                     23_456_789_012, md5, padding=16)
    rate, ch, bps, total, nb, md5hex = parse_flac_streaminfo(payload)
    assert (rate, ch, bps, total, nb) == (44100, 2, 24, 23_456_789_012, 2)
    assert md5hex == md5.hex()
    with pytest.raises(NotImplementedError):
        parse_flac_streaminfo(b"OggS" + b"\x00" * 40)
    with pytest.raises(ValueError):  # 36-bit total_samples overflow
        encode_flac_streaminfo(4096, 4096, 14, 20, 44100, 2, 24,
                               1 << 36, md5)


def test_mp3_walk_desync_refused():
    from knowledge_extraction_pipeline_spark.sources.audio_meta import (
        encode_mp3, parse_mp3_frames, mp3_frame_spec, MP3_RATES)
    payload = encode_mp3(4)
    rate, nf, sum_br, vbr = parse_mp3_frames(payload)
    ridx, frames = mp3_frame_spec(4)
    assert rate == MP3_RATES[ridx] and nf == len(frames) and vbr == 1
    # corrupt the first frame header's bitrate to the forbidden index 15
    tag_end = payload.find(b"\xff\xfb")
    bad = bytearray(payload)
    bad[tag_end + 2] = (15 << 4) | (bad[tag_end + 2] & 0x0F)
    with pytest.raises(NotImplementedError):
        parse_mp3_frames(bytes(bad))


def test_rast_rle_roundtrip_incl_escape_byte():
    from knowledge_extraction_pipeline_spark.sources.multimodal import (
        decode_rast, encode_rast)
    # runs (RLE-friendly), odd widths (16-bit row pad), and a pixel plane
    # full of 0x80 values with a lone non-run 0x80 (the 2-byte escape case)
    px = np.full((5, 7, 3), 128, np.uint8)
    px[2, 3] = (128, 1, 128)
    for rle in (False, True):
        w, h, out = decode_rast(encode_rast(px, rle=rle))
        assert (w, h) == (7, 5)
        np.testing.assert_array_equal(px, out)
    with pytest.raises(NotImplementedError):
        decode_rast(b"\x00" * 40)


def test_sgi_rle_and_bottom_up_roundtrip():
    from knowledge_extraction_pipeline_spark.sources.multimodal import (
        decode_sgi, encode_sgi)
    px = (np.indices((5, 300, 3)).sum(0) % 251).astype(np.uint8)
    for rle in (False, True):  # long literal stretches exercise the 127 cap
        w, h, out = decode_sgi(encode_sgi(px, rle=rle))
        assert (w, h) == (300, 5)
        np.testing.assert_array_equal(px, out)
    with pytest.raises(NotImplementedError):
        decode_sgi(b"\x00\x00" + b"\x00" * 600)


def test_pam_depth1_and_depth3_roundtrip():
    from knowledge_extraction_pipeline_spark.sources.multimodal import (
        decode_pam, encode_pam)
    px = np.arange(60, dtype=np.uint8).reshape(4, 5, 3)
    w, h, out = decode_pam(encode_pam(px))
    assert (w, h) == (5, 4)
    np.testing.assert_array_equal(px, out)
    g = np.arange(20, dtype=np.uint8).reshape(4, 5)
    _, _, out = decode_pam(encode_pam(g))
    np.testing.assert_array_equal(out[:, :, 1], g)
    with pytest.raises(NotImplementedError):
        decode_pam(b"P6 5 4 255\n" + b"\x00" * 60)


def test_ffd_never_beats_capacity_and_beats_next_fit_bins():
    import pandas as pd
    from knowledge_extraction_pipeline_spark.operators.packing import (
        _pack_shard, _pack_shard_ffd)
    pdf = pd.DataFrame({
        "shard": [0] * 8, "doc_id": list(range(8)),
        "n_tokens": [300, 300, 212, 212, 100, 100, 100, 100],
        "_cap": [512] * 8})
    nf = _pack_shard(pdf.copy())
    ffd = _pack_shard_ffd(pdf.copy())
    assert ffd["bin_fill"].max() <= 512 and nf["bin_fill"].max() <= 512
    assert ffd["n_bins"].iloc[-1] <= nf["bin"].max() + 1  # FFD ≤ next-fit


def test_ilbm_byterun1_and_bitplane_roundtrip():
    from knowledge_extraction_pipeline_spark.sources.multimodal import (
        _ilbm_palette, decode_ilbm, encode_ilbm)
    pal = _ilbm_palette()
    idx = (np.indices((6, 33)).sum(0) % 16).astype(np.uint8)
    exp = np.array([[pal[v] for v in row] for row in idx], np.uint8)
    for comp in (False, True):   # width 33 exercises the 16-bit row pad
        w, h, out = decode_ilbm(encode_ilbm(idx, compress=comp))
        assert (w, h) == (33, 6)
        np.testing.assert_array_equal(out, exp)
    with pytest.raises(NotImplementedError):
        decode_ilbm(b"FORM\x00\x00\x00\x04AIFF")


def test_adpcm_roundtrip_and_refusal():
    from knowledge_extraction_pipeline_spark.sources.audio_meta import (
        decode_wav_adpcm, encode_wav_adpcm)
    x = (np.sin(np.arange(700) * 0.07) * 12000).astype(np.int16)
    rate, y = decode_wav_adpcm(encode_wav_adpcm(8000, x))
    assert rate == 8000 and len(y) == 1010        # padded to 2 blocks
    err = np.abs(x.astype(np.int64) - y[:len(x)].astype(np.int64))
    # ADPCM quantization noise is bounded; the adaptation transient at
    # the start is the worst case
    assert int(err[100:].max()) < 2048
    with pytest.raises(NotImplementedError):
        decode_wav_adpcm(b"RIFF\x04\x00\x00\x00WAVE")
