"""Baseline JPEG codec (sources/jpeg.py) — layered correctness pins."""

import numpy as np
import pytest

from knowledge_extraction_pipeline_spark.sources.jpeg import (
    _dct2,
    _idct2,
    decode_jpeg,
    encode_jpeg,
)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    err = a.astype(np.float64) - b.astype(np.float64)
    return 10 * np.log10(255.0 ** 2 / max((err ** 2).mean(), 1e-12))


def test_dct_idct_round_trip():
    b = np.random.RandomState(0).rand(8, 8) * 255
    assert np.allclose(_idct2(_dct2(b)), b, atol=1e-9)


def test_constant_image_is_exact():
    px = np.full((24, 16, 3), 130, np.uint8)
    w, h, back = decode_jpeg(encode_jpeg(px, quality=95))
    assert (w, h) == (16, 24)
    assert int(np.abs(back.astype(int) - 130).max()) == 0


def test_smooth_gradient_psnr_and_subsampling():
    yy, xx = np.mgrid[0:40, 0:56]
    g = (xx * 2 + yy).astype(np.uint8)
    rgb = np.stack([g, (g // 2 + 40).astype(np.uint8), 255 - g], axis=-1)
    w, h, b444 = decode_jpeg(encode_jpeg(rgb, quality=92, subsample="444"))
    assert (w, h) == (56, 40)
    assert _psnr(b444, rgb) > 40
    _, _, b420 = decode_jpeg(encode_jpeg(rgb, quality=92, subsample="420"))
    assert _psnr(b420, rgb) > 32      # chroma halved: lower but sane
    # non-multiple-of-8 (and of 16 for 420) dims exercise edge replication
    crop = rgb[:37, :51]
    _, _, bc = decode_jpeg(encode_jpeg(crop, quality=92, subsample="420"))
    assert bc.shape == crop.shape
    assert _psnr(bc, crop) > 32


def test_grayscale_and_guards():
    yy, xx = np.mgrid[0:24, 0:32]
    g = (xx * 2 + yy).astype(np.uint8)
    w, h, back = decode_jpeg(encode_jpeg(g, quality=92))
    assert (w, h) == (32, 24)
    assert _psnr(back[:, :, 0], g) > 40
    assert np.array_equal(back[:, :, 0], back[:, :, 1])
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG....")
    # progressive SOF2 refused honestly
    good = bytearray(encode_jpeg(g))
    sof = good.find(b"\xff\xc0")
    good[sof + 1] = 0xC2
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(good))


def test_quality_monotonicity():
    rng = np.random.RandomState(2)
    base = rng.randint(60, 196, size=(32, 32, 3), dtype=np.uint8)
    # smooth it so quantization differences dominate, not ringing
    sm = base.astype(float)
    for _ in range(3):
        sm = (sm + np.roll(sm, 1, 0) + np.roll(sm, 1, 1)
              + np.roll(sm, -1, 0) + np.roll(sm, -1, 1)) / 5
    px = sm.astype(np.uint8)
    p50 = _psnr(decode_jpeg(encode_jpeg(px, quality=50))[2], px)
    p95 = _psnr(decode_jpeg(encode_jpeg(px, quality=95))[2], px)
    assert p95 > p50 > 20
