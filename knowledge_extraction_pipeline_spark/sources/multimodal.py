"""Multimodal column plumbing: image/audio/video as opaque binary columns with
typed metadata, processed via Arrow-batched mapInPandas.

Decode status (honest inventory):
  * REAL decoders, no external libraries needed: BMP (24bpp uncompressed),
    PPM/P6, and PNG (8-bit RGB/RGBA, all five scanline filters, via the
    stdlib `zlib` — `decode_png`) images; WAV/PCM audio via the stdlib
    `wave` module (`decode_wav`). These run in
    the engine end to end (synthetic_bmp_media → extract_image_features_real
    is driver-oracled as `multimodal_bmp_features`).
  * REAL baseline JPEG as well (sources/jpeg.py — pure Python+numpy
    Huffman/DCT, 4:4:4 + 4:2:0 + grayscale + restart markers).
  * STUBBED: progressive/arithmetic JPEG and video FRAME decode raise
    NotImplementedError —
    the container has no codec libraries; swap `decode_image`'s dispatch for
    PIL/ffmpeg on a real cluster. `_fake_decode` remains as the deterministic
    stand-in those rows use in tests.

Reference analog: none (the reference ingests PDFs only, and we replace its
PDF scan with the already-tabular transcripts input — SURVEY §2.1); this is
part of the training-data-pipeline tier of operators.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),        # image | audio | video
    T.StructField("mime", T.StringType()),
    T.StructField("payload", T.BinaryType()),     # opaque bytes
    T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
])

IMAGE_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("embedding", T.ArrayType(T.FloatType())),
])


def _fake_decode(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Deterministic stand-in for a real image decode: dimensions and an
    8-dim 'embedding' derived purely from the bytes. Replace with
    PIL.Image.open + a vision model on a real cluster."""
    if payload is None or len(payload) == 0:
        raise NotImplementedError(
            "real media decode is stubbed in this environment")
    h = np.frombuffer(payload[:64].ljust(64, b"\0"), dtype=np.uint8).astype(np.float32)
    w = int(64 + (len(payload) % 1024))
    hh = int(64 + (sum(payload[:16]) % 1024))
    emb = (h.reshape(8, 8).mean(axis=1) / 255.0).astype(np.float32)
    return w, hh, emb


# ── REAL decoders (no external libraries) ────────────────────────────────

def encode_bmp(rgb: np.ndarray) -> bytes:
    """Minimal 24bpp uncompressed BMP writer (BITMAPINFOHEADER, bottom-up,
    4-byte-padded rows) — used by the synthetic generator to produce REAL
    image bytes the decoder round-trips."""
    import struct

    h, w, _ = rgb.shape
    row = w * 3
    pad = (-row) % 4
    body = bytearray()
    for y in range(h - 1, -1, -1):          # bottom-up
        bgr = rgb[y, :, ::-1].astype(np.uint8).tobytes()
        body += bgr + b"\0" * pad
    off = 14 + 40
    size = off + len(body)
    head = struct.pack("<2sIHHI", b"BM", size, 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                       2835, 2835, 0, 0)
    return head + info + bytes(body)


def decode_bmp(payload: bytes) -> tuple[int, int, np.ndarray]:
    """24bpp uncompressed BMP → (width, height, HxWx3 uint8 RGB)."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if bpp == 8 and comp == 1:
        return _decode_bmp_rle8(payload, off, w, h)
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"BMP bpp={bpp} compression={comp} "
                                  "unsupported (24bpp uncompressed or "
                                  "8bpp RLE8 only)")
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8,
                         count=abs(h) * stride, offset=off)
    px = rows.reshape(abs(h), stride)[:, : w * 3].reshape(abs(h), w, 3)
    if h > 0:
        px = px[::-1]                       # bottom-up → top-down
    return w, abs(h), px[:, :, ::-1].copy() # BGR → RGB


def _decode_bmp_rle8(payload: bytes, off: int, w: int,
                     h: int) -> tuple[int, int, np.ndarray]:
    """BI_RLE8 decode: (count,index) runs, 0-escapes (0=EOL, 1=EOB,
    2=delta dx,dy, n≥3 = absolute mode padded to a word boundary),
    bottom-up row order, palette lookup to RGB."""
    import struct

    n_colors = struct.unpack_from("<I", payload, 46)[0] or 256
    pal = np.frombuffer(payload, dtype=np.uint8,
                        count=n_colors * 4, offset=54).reshape(-1, 4)
    idx = np.zeros((abs(h), w), dtype=np.uint8)
    x, y = 0, 0                           # y counts bottom-up rows
    p = off
    while p + 1 < len(payload):
        cnt, val = payload[p], payload[p + 1]
        p += 2
        if cnt > 0:
            idx[y, x:x + cnt] = val
            x += cnt
        elif val == 0:                    # end of line
            x, y = 0, y + 1
        elif val == 1:                    # end of bitmap
            break
        elif val == 2:                    # delta
            x += payload[p]
            y += payload[p + 1]
            p += 2
        else:                             # absolute mode, word-aligned
            idx[y, x:x + val] = np.frombuffer(payload, dtype=np.uint8,
                                              count=val, offset=p)
            x += val
            p += val + (val & 1)
    rgb = pal[idx][:, :, :3][:, :, ::-1]  # BGRX rows → RGB
    if h > 0:
        rgb = rgb[::-1]
    return w, abs(h), np.ascontiguousarray(rgb)


def encode_bmp_rle8(idx: np.ndarray, palette: np.ndarray) -> bytes:
    """Real BI_RLE8 BMP encoder: 8bpp palettized, encoded runs capped at
    255, literal stretches ≥ 3 emitted in absolute mode (padded to word
    boundaries), EOL after every row, EOB terminator, bottom-up rows.
    palette is Kx3 RGB."""
    import struct

    h, w = idx.shape
    pal = bytearray()
    for r, g, b in palette:
        pal += bytes((int(b), int(g), int(r), 0))
    data = bytearray()
    for y in range(h - 1, -1, -1):        # bottom-up
        row = idx[y]
        x = 0
        while x < w:
            run = 1
            while x + run < w and run < 255 and row[x + run] == row[x]:
                run += 1
            if run >= 2:
                data += bytes((run, int(row[x])))
                x += run
            else:
                lit = 1
                while (x + lit < w and lit < 254
                       and (x + lit + 1 >= w
                            or row[x + lit] != row[x + lit + 1])):
                    lit += 1
                if lit >= 3:
                    data += bytes((0, lit)) + bytes(
                        int(v) for v in row[x:x + lit])
                    if lit & 1:
                        data.append(0)
                else:
                    for j in range(lit):
                        data += bytes((1, int(row[x + j])))
                x += lit
        data += bytes((0, 0))             # EOL
    data += bytes((0, 1))                 # EOB
    off = 14 + 40 + len(pal)
    head = (b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
            + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 1, len(data),
                          2835, 2835, len(palette), 0))
    return bytes(head + pal + data)


def goertzel_power(x, k: int, n: int) -> float:
    """Goertzel single-bin DFT power |X_k|² via the standard recurrence —
    a pure sequential float64 loop, so the engine UDF and the oracle
    generator (same CPython, same libm) produce bit-identical doubles."""
    import math

    coef = 2.0 * math.cos(2.0 * math.pi * k / n)
    s1 = s2 = 0.0
    for v in x:
        s0 = float(v) + coef * s1 - s2
        s2, s1 = s1, s0
    return s1 * s1 + s2 * s2 - coef * s1 * s2


def goertzel_peak(x) -> tuple[int, float]:
    """Scan all bins 1..N//2−1 with goertzel_power; first-max argmax."""
    n = len(x)
    best_k, best_p = 0, -1.0
    for k in range(1, n // 2):
        p = goertzel_power(x, k, n)
        if p > best_p:
            best_k, best_p = k, p
    return best_k, best_p


GOERTZEL_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("n_samples", T.LongType()),
    T.StructField("peak_bin", T.LongType()),
    T.StructField("peak_freq_hz", T.DoubleType()),
    T.StructField("peak_power", T.DoubleType()),
])


def extract_goertzel_features(media: DataFrame) -> DataFrame:
    """Dominant-tone detection over WAV payloads, mapInPandas-batched: a
    full Goertzel bin scan (the O(N²) exhaustive single-bin DFT — no FFT
    reordering, so the float stream is strictly sequential and
    deterministic) returning the peak bin, its frequency and power."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rate, x = decode_wav(bytes(payload))
                k, p = goertzel_peak([int(v) for v in x])
                rows.append((mid, len(x), k, k * rate / len(x), p))
            yield pd.DataFrame(rows, columns=[
                "media_id", "n_samples", "peak_bin", "peak_freq_hz",
                "peak_power"])

    return (media.filter(F.col("mime") == "audio/wav")
            .select("media_id", "payload")
            .mapInPandas(process, schema=GOERTZEL_SCHEMA))


def synthetic_bmp_rle_media(spark: SparkSession, n: int = 24,
                            seed: int = 42) -> DataFrame:
    """Deterministic REAL RLE8 BMP table: banded index patterns (long
    runs) interrupted by literal noise stretches (absolute mode), a
    formula palette — genuine BI_RLE8 bytes end to end."""
    rows = []
    palette = np.stack([(np.arange(256) * 7) % 256,
                        (np.arange(256) * 29) % 256,
                        (np.arange(256) * 13) % 256], axis=-1)
    for i in range(n):
        w = 17 + (i * 3 + seed) % 14
        h = 9 + (i * 5 + seed) % 10
        yy, xx = np.mgrid[0:h, 0:w]
        idx = np.where((xx + yy + i) % 7 < 5,
                       ((yy // 2) * 31 + i) % 256,
                       (xx * 11 + yy * 3 + i * 5) % 256).astype(np.uint8)
        rows.append((i, "image", "image/bmp",
                     bytearray(encode_bmp_rle8(idx, palette)),
                     {"compression": "rle8"}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_ppm(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Binary PPM (P6, maxval 255) → (width, height, HxWx3 uint8 RGB)."""
    parts = payload.split(maxsplit=4)
    if parts[0] != b"P6":
        raise ValueError("not a P6 PPM payload")
    w, h, maxval = int(parts[1]), int(parts[2]), int(parts[3])
    if maxval != 255:
        raise NotImplementedError("PPM maxval != 255 unsupported")
    raw = payload[len(payload) - w * h * 3:]
    return w, h, np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3).copy()


_TIFF_TAGS = {256: "width", 257: "height", 258: "bits", 259: "compression",
              262: "photometric", 273: "strip_offsets", 277: "spp",
              278: "rows_per_strip", 279: "strip_counts", 322: "tile_width"}
_TIFF_TYPE_SIZE = {1: 1, 3: 2, 4: 4}  # BYTE, SHORT, LONG


def encode_tiff(px: np.ndarray, rows_per_strip: int = 4) -> bytes:
    """Baseline little-endian TIFF writer: uncompressed, strip-organized,
    8-bit RGB (HxWx3) or grayscale (HxW). Multiple strips on purpose — the
    reader's strip-assembly logic is part of what the round-trip tests."""
    import struct

    h, w = px.shape[:2]
    spp = 3 if px.ndim == 3 else 1
    strips = [px[y:y + rows_per_strip].tobytes()
              for y in range(0, h, rows_per_strip)]
    # layout: header(8) | IFD | bits array (if RGB) | strip tables | strips
    n_entries = 9
    ifd_size = 2 + n_entries * 12 + 4
    pos = 8 + ifd_size
    bits_off = pos
    if spp == 3:
        pos += 6
    so_off, sc_off = pos, pos + 4 * len(strips)
    pos += 8 * len(strips)
    strip_offs = []
    for s in strips:
        strip_offs.append(pos)
        pos += len(s)

    def entry(tag, typ, count, value):
        return struct.pack("<HHII", tag, typ, count, value)

    # TIFF stores a value INLINE when its total size fits the 4-byte value
    # field — a single-strip offset/count table must be inline, not pointed
    one = len(strips) == 1
    entries = [
        entry(256, 4, 1, w), entry(257, 4, 1, h),
        entry(258, 3, 3, bits_off) if spp == 3 else entry(258, 3, 1, 8),
        entry(259, 3, 1, 1),                       # no compression
        entry(262, 3, 1, 2 if spp == 3 else 1),    # RGB / BlackIsZero
        entry(273, 4, 1, strip_offs[0]) if one
        else entry(273, 4, len(strips), so_off),
        entry(277, 3, 1, spp),
        entry(278, 4, 1, rows_per_strip),
        entry(279, 4, 1, len(strips[0])) if one
        else entry(279, 4, len(strips), sc_off),
    ]
    out = [struct.pack("<2sHI", b"II", 42, 8),
           struct.pack("<H", len(entries)), b"".join(entries),
           struct.pack("<I", 0)]
    if spp == 3:
        out.append(struct.pack("<3H", 8, 8, 8))
    out.append(b"".join(struct.pack("<I", o) for o in strip_offs))
    out.append(b"".join(struct.pack("<I", len(s)) for s in strips))
    out.extend(strips)
    return b"".join(out)


def decode_tiff(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Uncompressed strip TIFF → (width, height, HxWx3 uint8 RGB); both
    byte orders; 8-bit RGB and grayscale (gray replicated to 3 channels,
    same convention as the JPEG decoder). Compressed, tiled, deep or
    palette TIFFs raise — an honest refusal beats silently wrong pixels."""
    import struct

    if payload[:4] == b"II*\x00":
        bo = "<"
    elif payload[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise ValueError("not a TIFF payload")
    (ifd_off,) = struct.unpack_from(bo + "I", payload, 4)
    (n,) = struct.unpack_from(bo + "H", payload, ifd_off)
    tags: dict = {}
    for i in range(n):
        tag, typ, count, raw = struct.unpack_from(
            bo + "HHI4s", payload, ifd_off + 2 + i * 12)
        if tag not in _TIFF_TAGS or typ not in _TIFF_TYPE_SIZE:
            continue
        size = _TIFF_TYPE_SIZE[typ] * count
        buf = raw[:size] if size <= 4 else payload[
            struct.unpack(bo + "I", raw)[0]:][:size]
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        tags[_TIFF_TAGS[tag]] = list(
            struct.unpack(bo + fmt * count, buf))
    if "tile_width" in tags:
        raise NotImplementedError("tiled TIFF unsupported (strips only)")
    comp = tags.get("compression", [1])[0]
    if comp != 1:
        raise NotImplementedError(
            f"TIFF compression {comp} unsupported (uncompressed only)")
    photo = tags.get("photometric", [2])[0]
    spp = tags.get("spp", [1])[0]
    bits = tags.get("bits", [8])
    if any(b != 8 for b in bits) or (photo, spp) not in ((2, 3), (1, 1)):
        raise NotImplementedError(
            f"TIFF photometric={photo} spp={spp} bits={bits} unsupported "
            "(8-bit RGB or grayscale)")
    w, h = tags["width"][0], tags["height"][0]
    raw = b"".join(
        payload[o:o + c]
        for o, c in zip(tags["strip_offsets"], tags["strip_counts"]))
    px = np.frombuffer(raw, dtype=np.uint8, count=h * w * spp)
    if spp == 1:
        px = np.repeat(px.reshape(h, w, 1), 3, axis=2)
    else:
        px = px.reshape(h, w, 3)
    return w, h, px.copy()


def decode_image(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Dispatch on magic bytes. BMP and PPM decode for real; compressed
    codecs raise (no codec libraries in this container — PIL on a real
    cluster)."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif(payload)
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        return decode_tiff(payload)
    if payload[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg
        return decode_jpeg(payload)
    if payload[-18:] == b"TRUEVISION-XFILE.\0":   # TGA 2.0 footer signature
        return decode_tga(payload)
    if payload[:4] == b"qoif":
        return decode_qoi(payload)
    if (len(payload) > 128 and payload[0] == 0x0A and payload[1] <= 5
            and payload[2] == 1):
        return decode_pcx(payload)
    if payload[:4] == b"\x59\xa6\x6a\x95":
        return decode_rast(payload)
    if payload[:2] == b"P7":
        return decode_pam(payload)
    if payload[:2] in (b"P1", b"P2", b"P3"):
        return decode_pnm_ascii(payload)
    if payload[:2] == b"\x01\xda":
        return decode_sgi(payload)
    if payload[:4] == b"FORM" and payload[8:12] == b"ILBM":
        return decode_ilbm(payload)
    raise NotImplementedError(
        "unrecognized image format (BMP, PPM, PNG, GIF, strip TIFF and "
        "baseline JPEG decode for real; video frame extraction needs ffmpeg)")


_ULAW_BIAS = 0x84
_ULAW_CLIP = 32635


def ulaw_compress(x: np.ndarray) -> np.ndarray:
    """G.711 μ-law companding, int16 → uint8 (ITU-T G.711 encoder,
    vectorized): clip to 32635, add the 0x84 bias, segment number from the
    top set bit of (v>>7) via integer searchsorted (no float log), 4-bit
    mantissa, ones-complement the packed byte."""
    xi = x.astype(np.int32)
    sign = np.where(xi < 0, 0x80, 0).astype(np.int32)
    v = np.minimum(np.abs(xi), _ULAW_CLIP) + _ULAW_BIAS
    seg = (np.searchsorted(
        np.array([1, 2, 4, 8, 16, 32, 64, 128], dtype=np.int32),
        v >> 7, side="right") - 1).astype(np.int32)
    mant = (v >> (seg + 3)) & 0x0F
    return (~(sign | (seg << 4) | mant) & 0xFF).astype(np.uint8)


def ulaw_expand(u: np.ndarray) -> np.ndarray:
    """G.711 μ-law expansion, uint8 → int16 (exact inverse of the byte
    layout: ulaw_compress(ulaw_expand(u)) == u for all 256 codes)."""
    ui = (~u.astype(np.int32)) & 0xFF
    seg = (ui >> 4) & 0x07
    t = (((ui & 0x0F) << 3) | _ULAW_BIAS) << seg
    t = t - _ULAW_BIAS
    return np.where(ui & 0x80, -t, t).astype(np.int16)


def encode_wav_ulaw(rate: int, x: np.ndarray) -> bytes:
    """Real G.711 μ-law WAV writer: RIFF with an 18-byte fmt chunk
    (wFormatTag=7, 8-bit mono) + the fact chunk G.711 requires + data."""
    import struct

    data = ulaw_compress(x).tobytes()
    fmt = struct.pack("<HHIIHHH", 7, 1, rate, rate, 1, 8, 0)
    fact = struct.pack("<I", len(data))
    chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"fact" + struct.pack("<I", len(fact)) + fact
              + b"data" + struct.pack("<I", len(data)) + data
              + (b"\0" if len(data) % 2 else b""))
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """WAV → (sample_rate, int16 samples): a real RIFF chunk walk (fmt /
    fact / data, even-byte chunk padding) decoding 16-bit PCM (format 1)
    and G.711 μ-law (format 7, expanded through ulaw_expand) — no external
    libraries. PCM bytes parse identically to the stdlib wave module
    (pinned by test_wav_manual_parse_matches_stdlib)."""
    import struct

    if payload[:4] == b"FORM":
        return decode_aiff(payload)
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError("not a RIFF/WAVE payload")
    pos, end = 12, min(len(payload), 8 + struct.unpack(
        "<I", payload[4:8])[0])
    fmt_code = bits = rate = None
    raw = None
    while pos + 8 <= end:
        cid = payload[pos:pos + 4]
        size = struct.unpack("<I", payload[pos + 4:pos + 8])[0]
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt_code, _ch, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
        elif cid == b"data":
            raw = body
        pos += 8 + size + (size % 2)   # chunks pad to even offsets
    if fmt_code is None or raw is None:
        raise NotImplementedError("WAV missing fmt or data chunk")
    if fmt_code == 1 and bits == 16:
        return rate, np.frombuffer(raw, dtype="<i2")
    if fmt_code == 7 and bits == 8:
        return rate, ulaw_expand(np.frombuffer(raw, dtype=np.uint8))
    if fmt_code == 6 and bits == 8:
        return rate, alaw_expand(np.frombuffer(raw, dtype=np.uint8))
    raise NotImplementedError(
        f"WAV format {fmt_code}/{bits}-bit unsupported "
        "(16-bit PCM and 8-bit G.711 u-law/A-law decode for real)")


def _pixel_features(px: np.ndarray) -> tuple[float, float, float, list[float]]:
    """Channel means + a 2x2-block-mean 12-dim embedding. All means are
    EXACT-integer sums divided once (np.mean's pairwise float summation is
    order-dependent; integer sums are not), so an independent pure-Python
    evaluation reproduces them bit-for-bit."""
    h, w, _ = px.shape
    s = px.astype(np.int64)
    n = h * w
    r, g, b = (float(int(s[:, :, c].sum()) / n) for c in range(3))
    emb = []
    hs, ws = h // 2, w // 2
    for y0, y1 in ((0, hs), (hs, h)):
        for x0, x1 in ((0, ws), (ws, w)):
            blk = s[y0:y1, x0:x1]
            bn = blk.shape[0] * blk.shape[1]
            for c in range(3):
                emb.append(float(int(blk[:, :, c].sum()) / bn) / 255.0)
    return r, g, b, emb


IMAGE_DECODE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("r_mean", T.DoubleType()),
    T.StructField("g_mean", T.DoubleType()),
    T.StructField("b_mean", T.DoubleType()),
    T.StructField("embedding", T.ArrayType(T.FloatType())),
])


def extract_image_features_real(media: DataFrame) -> DataFrame:
    """REAL image decode over binary payloads (BMP/PPM), mapInPandas-batched:
    Arrow ships the bytes, numpy decodes, only features come back."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                buf = bytes(payload)
                w, h, px = decode_image(buf)
                r, g, b, emb = _pixel_features(px)
                rows.append((mid, w, h, len(buf), r, g, b, emb))
            yield pd.DataFrame(rows, columns=[
                "media_id", "width", "height", "n_bytes",
                "r_mean", "g_mean", "b_mean", "embedding"])

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(process, schema=IMAGE_DECODE_SCHEMA)
    )


AUDIO_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("n_samples", T.LongType()),
    T.StructField("duration_s", T.DoubleType()),
    T.StructField("rms", T.DoubleType()),
    T.StructField("zero_crossings", T.LongType()),
])


def extract_audio_features(media: DataFrame) -> DataFrame:
    """REAL WAV/PCM decode (stdlib wave): sample rate, duration, RMS,
    zero-crossing count — the standard cheap audio-quality features."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rate, x = decode_wav(bytes(payload))
                xi = x.astype(np.int64)
                rms = float(np.sqrt(float((xi * xi).sum()) / max(len(x), 1)))
                zc = int(((x[:-1] < 0) != (x[1:] < 0)).sum()) if len(x) > 1 else 0
                rows.append((mid, rate, len(x), len(x) / rate, rms, zc))
            yield pd.DataFrame(rows, columns=[
                "media_id", "sample_rate", "n_samples", "duration_s",
                "rms", "zero_crossings"])

    return (
        media.filter(F.col("kind") == "audio")
        .select("media_id", "payload")
        .mapInPandas(process, schema=AUDIO_FEATURES_SCHEMA)
    )


def synthetic_bmp_media(spark: SparkSession, n: int = 48,
                        seed: int = 42) -> DataFrame:
    """Deterministic REAL media table: every 3rd row a real BMP image
    (id-dependent size + pixel pattern), every 3rd+1 a real 16-bit PCM WAV
    (id-dependent tone), rest video stubs. Payloads are genuine file bytes —
    the decoders parse them, nothing is faked."""
    import io
    import wave as wave_mod

    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        if kind == "image":
            w = 16 + (i * 5 + seed) % 17
            h = 16 + (i * 7 + seed) % 13
            yy, xx = np.mgrid[0:h, 0:w]
            px = np.stack([
                (xx * 3 + yy * 5 + i) % 256,
                (xx + yy * 2 + i * 11) % 256,
                (xx * 7 + yy + i * 3) % 256,
            ], axis=-1).astype(np.uint8)
            payload, mime = encode_bmp(px), "image/bmp"
        elif kind == "audio":
            rate = 8000
            t = np.arange(400 + (i % 5) * 80)
            freq = 200.0 + (i * 37 + seed) % 600
            x = (np.sin(2 * np.pi * freq * t / rate) * 12000).astype("<i2")
            buf = io.BytesIO()
            with wave_mod.open(buf, "wb") as wf:
                wf.setnchannels(1)
                wf.setsampwidth(2)
                wf.setframerate(rate)
                wf.writeframes(x.tobytes())
            payload, mime = buf.getvalue(), "audio/wav"
        else:
            payload, mime = b"\0\0\0\x18ftypmp42", "video/mp4"
        rows.append((i, kind, mime, bytearray(payload),
                     {"duration_s": str(10 + i % 60)}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def extract_image_features(media: DataFrame, batch_size: int = 256) -> DataFrame:
    """mapInPandas over binary payloads — the canonical multimodal pattern:
    Arrow ships the bytes column to Python in batches, each batch is decoded
    vectorized, only features come back (never the raw bytes)."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, emb = _fake_decode(bytes(payload))
                rows.append((mid, w, h, len(payload), emb.tolist()))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "n_bytes", "embedding"])

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(process, schema=IMAGE_FEATURES_SCHEMA)
    )


def frame_sample_plan(media: DataFrame, every_n_seconds: int = 5) -> DataFrame:
    """Video frame-sampling *plan*: expands each video row into the frame
    timestamps a decoder would extract — pure column ops (sequence/explode);
    the decode itself is the stubbed step."""
    dur = F.coalesce(F.element_at("meta", "duration_s").cast("int"), F.lit(0))
    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", F.explode(
            F.sequence(F.lit(0), F.greatest(dur - 1, F.lit(0)),
                       F.lit(every_n_seconds))).alias("frame_ts_s"))
    )


def synthetic_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests: payload bytes derived from
    the id, duration metadata for videos."""
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.when(F.col("id") % 3 == 0, "image")
         .when(F.col("id") % 3 == 1, "audio").otherwise("video").alias("kind"),
        F.when(F.col("id") % 3 == 0, "image/png")
         .when(F.col("id") % 3 == 1, "audio/wav").otherwise("video/mp4").alias("mime"),
        F.sha2(F.concat(F.lit(str(seed)), F.col("id").cast("string")), 512)
         .cast("binary").alias("payload"),
        F.create_map(F.lit("duration_s"),
                     (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(60)) + 10)
                     .cast("string")).alias("meta"),
    )


def synthetic_tiff_media(spark: SparkSession, n: int = 30,
                         seed: int = 42) -> DataFrame:
    """Deterministic REAL TIFF table: genuine strip-organized uncompressed
    TIFF bytes — RGB rows with varying strip heights, every 5th row an
    8-bit grayscale image (gray replicates to 3 channels on decode). Pixels
    are pure formulas of (x, y, id) so the oracle recomputes expected
    channel means without touching TIFF bytes."""
    rows = []
    for i in range(n):
        w = 13 + (i * 3 + seed) % 10
        h = 11 + (i * 5 + seed) % 8
        yy, xx = np.mgrid[0:h, 0:w]
        if i % 5 == 4:
            px = ((xx * 9 + yy * 4 + i * 5) % 256).astype(np.uint8)
        else:
            px = np.stack([
                (xx * 2 + yy * 3 + i) % 256,
                (xx * 5 + yy + i * 7) % 256,
                (xx + yy * 7 + i * 13) % 256,
            ], axis=-1).astype(np.uint8)
        payload = encode_tiff(px, rows_per_strip=2 + i % 5)
        rows.append((i, "image", "image/tiff", bytearray(payload), {}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(px: np.ndarray) -> bytes:
    """Real PNG writer (stdlib struct+zlib): 8-bit RGB (HxWx3) or RGBA
    (HxWx4), no interlace. Scanline filters cycle 0-4 per row — a valid,
    deliberately filter-diverse encoding so decode_png's whole filter
    battery is exercised by every image."""
    import struct
    import zlib

    h, w, ch = px.shape
    ctype = {3: 2, 4: 6}[ch]
    stride = w * ch
    flat = px.astype(np.uint8).tobytes()
    raw = bytearray()
    prev = bytes(stride)
    for y in range(h):
        line = flat[y * stride:(y + 1) * stride]
        f = y % 5
        raw.append(f)
        if f == 0:
            enc = line
        elif f == 1:
            enc = bytes((line[i] - (line[i - ch] if i >= ch else 0)) & 255
                        for i in range(stride))
        elif f == 2:
            enc = bytes((line[i] - prev[i]) & 255 for i in range(stride))
        elif f == 3:
            enc = bytes((line[i] - (((line[i - ch] if i >= ch else 0)
                                     + prev[i]) >> 1)) & 255
                        for i in range(stride))
        else:
            enc = bytes((line[i] - _paeth(line[i - ch] if i >= ch else 0,
                                          prev[i],
                                          prev[i - ch] if i >= ch else 0))
                        & 255 for i in range(stride))
        raw += enc
        prev = line

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
            + chunk(b"IEND", b""))


def decode_png(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Real PNG decoder (stdlib struct+zlib — the 'compressed codec needs
    external libs' stub no longer applies to PNG): 8-bit RGB/RGBA,
    non-interlaced, all five scanline filters (None/Sub/Up/Average/Paeth).
    Returns (width, height, HxWx3 RGB) — alpha is parsed then dropped."""
    import struct
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, idat = 8, b""
    w = h = depth = ctype = interlace = None
    while pos + 8 <= len(payload):
        ln = struct.unpack_from(">I", payload, pos)[0]
        typ = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            w, h, depth, ctype, _c, _f, interlace = struct.unpack(
                ">IIBBBBB", data)
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    if depth != 8 or ctype not in (2, 6) or interlace != 0:
        raise NotImplementedError(
            f"PNG depth={depth} ctype={ctype} interlace={interlace} "
            "unsupported (8-bit RGB/RGBA, non-interlaced only)")
    ch = 3 if ctype == 2 else 4
    stride = w * ch
    raw = zlib.decompress(idat)
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline data length mismatch")
    out = bytearray()
    prev = bytearray(stride)
    p = 0
    for _y in range(h):
        f = raw[p]
        p += 1
        line = bytearray(raw[p:p + stride])
        p += stride
        if f == 1:
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 255
        elif f == 2:
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 255
        elif f == 3:
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 255
        elif f == 4:
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                c = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 255
        elif f != 0:
            raise NotImplementedError(f"PNG filter {f}")
        out += line
        prev = line
    px = np.frombuffer(bytes(out), np.uint8).reshape(h, w, ch)
    return w, h, px[:, :, :3].copy()


def synthetic_png_media(spark: SparkSession, n: int = 36,
                        seed: int = 42) -> DataFrame:
    """Deterministic REAL PNG media table: every row a genuine PNG file
    (RGB and RGBA alternating, filter types cycling per scanline) whose
    pixels are pure formulas of (x, y, id) — so an independent fixture can
    recompute the expected channel means without touching PNG bytes."""
    rows = []
    for i in range(n):
        w = 12 + (i * 3 + seed) % 9
        h = 12 + (i * 5 + seed) % 7
        yy, xx = np.mgrid[0:h, 0:w]
        chans = [
            (xx * 2 + yy * 3 + i) % 256,
            (xx * 5 + yy + i * 7) % 256,
            (xx + yy * 7 + i * 13) % 256,
        ]
        if i % 2 == 1:
            chans.append((xx + yy + i) % 256)  # alpha (dropped on decode)
        px = np.stack(chans, axis=-1).astype(np.uint8)
        rows.append((i, "image", "image/png", bytearray(encode_png(px)),
                     {"filters": "cycled"}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _lzw_decode(data: bytes, mcs: int) -> list[int]:
    """General GIF LZW: variable code width mcs+1..12, clear/end codes,
    table growth with the canonical width-bump rule (reader widens when the
    table reaches 2^width)."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    base = [[i] for i in range(1 << mcs)] + [None, None]
    table = list(base)
    width = mcs + 1
    out: list[int] = []
    prev: list[int] | None = None
    acc = nbits = pos = 0
    while True:
        while nbits < width and pos < len(data):
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        if nbits < width:
            break
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = mcs + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(base) - 2:
                raise ValueError("LZW: first code after clear not literal")
            entry = table[code]
        elif code < len(table) and table[code] is not None:
            entry = table[code]
        elif code == len(table):
            entry = prev + [prev[0]]
        else:
            raise ValueError(f"LZW: code {code} beyond table")
        if prev is not None and len(table) < 4096:
            table.append(prev + [entry[0]])
            if len(table) == (1 << width) and width < 12:
                width += 1
        out.extend(entry)
        prev = entry
    return out


def _lzw_encode(indices: list[int], mcs: int) -> bytes:
    """Real LZW compressor, two-pass: pass 1 builds the code sequence
    (emitting CLEAR before the table could fill); pass 2 assigns each
    code's bit width by simulating the DECODER's table growth exactly —
    the reader's width lags the writer's add by one code, and simulating
    the reader is the one pairing that can't desync."""
    clear, end = 1 << mcs, (1 << mcs) + 1

    def fresh():
        return {bytes([i]): i for i in range(1 << mcs)}, (1 << mcs) + 2

    table, next_code = fresh()
    codes: list[int] = [clear]
    cur = b""
    for idx in indices:
        nxt = cur + bytes([idx])
        if nxt in table:
            cur = nxt
            continue
        codes.append(table[cur])
        table[nxt] = next_code
        next_code += 1
        if next_code >= 4095:
            codes.append(clear)
            table, next_code = fresh()
        cur = bytes([idx])
    if cur:
        codes.append(table[cur])
    codes.append(end)

    acc = nbits = 0
    out = bytearray()
    width, size, first = mcs + 1, (1 << mcs) + 2, True
    for code in codes:
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 255)
            acc >>= 8
            nbits -= 8
        if code == clear:
            width, size, first = mcs + 1, (1 << mcs) + 2, True
        elif code != end:
            if first:
                first = False
            else:
                size += 1
                if size == (1 << width) and width < 12:
                    width += 1
    if nbits:
        out.append(acc & 255)
    return bytes(out)


def _gif_palette() -> list[tuple[int, int, int]]:
    """Fixed formula palette: entry p → (p, (p*7+31)%256, (p*13+77)%256)."""
    return [(p, (p * 7 + 31) % 256, (p * 13 + 77) % 256)
            for p in range(256)]


def encode_gif(idx: np.ndarray) -> bytes:
    """Real GIF89a writer: HxW uint8 palette indices against the fixed
    formula palette, LZW-compressed (mcs=8), non-interlaced."""
    import struct

    h, w = idx.shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # GCT, 256 entries
    for r, g, b in _gif_palette():
        out += bytes((r, g, b))
    out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out.append(8)  # LZW min code size
    comp = _lzw_encode([int(v) for v in idx.reshape(-1)], 8)
    for i in range(0, len(comp), 255):
        block = comp[i:i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3B"
    return bytes(out)


def decode_gif(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Real GIF decoder (stdlib only): GIF87a/89a, global or local color
    table, skips extension blocks, full LZW, non-interlaced first frame →
    (width, height, HxWx3 RGB)."""
    import struct

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = [tuple(payload[pos + 3 * i:pos + 3 * i + 3]) for i in range(n)]
        pos += 3 * n
    while pos < len(payload):
        b0 = payload[pos]
        if b0 == 0x21:          # extension: skip sub-blocks
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif b0 == 0x2C:        # image descriptor
            _l, _t, w, h, iflags = struct.unpack_from("<HHHHB", payload,
                                                      pos + 1)
            pos += 10
            pal = gct
            if iflags & 0x80:
                n = 2 << (iflags & 7)
                pal = [tuple(payload[pos + 3 * i:pos + 3 * i + 3])
                       for i in range(n)]
                pos += 3 * n
            if iflags & 0x40:
                raise NotImplementedError("interlaced GIF unsupported")
            if pal is None:
                raise ValueError("GIF image with no color table")
            mcs = payload[pos]
            pos += 1
            comp = bytearray()
            while payload[pos] != 0:
                ln = payload[pos]
                comp += payload[pos + 1:pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            indices = _lzw_decode(bytes(comp), mcs)
            if len(indices) < w * h:
                raise ValueError("GIF pixel data truncated")
            arr = np.array(indices[: w * h], dtype=np.int32).reshape(h, w)
            pal_arr = np.array(pal, dtype=np.uint8)
            return w, h, pal_arr[arr]
        elif b0 == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b0:02x}")
    raise ValueError("GIF contains no image data")


def synthetic_gif_media(spark: SparkSession, n: int = 30,
                        seed: int = 42) -> DataFrame:
    """Deterministic REAL GIF media table: palette indices are pure
    formulas of (x, y, id), so a fixture recomputes expected channel means
    (through the fixed palette formulas) without touching GIF bytes."""
    rows = []
    for i in range(n):
        w = 14 + (i * 3 + seed) % 11
        h = 14 + (i * 5 + seed) % 9
        yy, xx = np.mgrid[0:h, 0:w]
        idx = ((xx * 11 + yy * 17 + i * 29) % 256).astype(np.uint8)
        rows.append((i, "image", "image/gif",
                     bytearray(encode_gif(idx)), {"codec": "lzw"}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def encode_mp4_skeleton(duration_s: int, timescale: int,
                        track_codecs: list[str]) -> bytes:
    """Minimal valid ISO-BMFF box tree (ftyp + moov[mvhd + trak[tkhd +
    mdia[hdlr + minf[stbl[stsd(codec entry)]]]] ...]) — genuine box
    structure with real sizes/versions, no media data. Enough for any
    container parser to read duration, timescale, track count and codec
    fourccs."""
    import struct

    def box(typ: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + typ + payload

    ftyp = box(b"ftyp", b"mp42" + struct.pack(">I", 0) + b"mp42isom")
    mvhd = box(b"mvhd", struct.pack(
        ">B3x", 0) + struct.pack(">IIII", 0, 0, timescale,
                                 duration_s * timescale)
        + b"\0" * 80)
    traks = b""
    for i, codec in enumerate(track_codecs, start=1):
        tkhd = box(b"tkhd", struct.pack(">B3x", 0)
                   + struct.pack(">IIII", 0, 0, i, 0) + b"\0" * 60)
        entry = box(codec.encode("ascii")[:4].ljust(4, b" "), b"\0" * 16)
        stsd = box(b"stsd", struct.pack(">B3xI", 0, 1) + entry)
        stbl = box(b"stbl", stsd)
        minf = box(b"minf", stbl)
        hdlr = box(b"hdlr", struct.pack(">B3xI4s", 0, 0, b"vide")
                   + b"\0" * 12 + b"h\0")
        mdia = box(b"mdia", hdlr + minf)
        traks += box(b"trak", tkhd + mdia)
    return ftyp + box(b"moov", mvhd + traks)


def parse_mp4(payload: bytes) -> tuple[float, int, int, list[str]]:
    """Real ISO-BMFF container parse (stdlib struct): walks the box tree
    and returns (duration_s, timescale, n_tracks, codec fourccs from each
    track's stsd). This is the video-curation metadata a 100 TB pipeline
    filters on; FRAME decode genuinely needs ffmpeg and stays stubbed."""
    import struct

    def walk(buf: bytes, start: int, end: int):
        pos = start
        while pos + 8 <= end:
            size = struct.unpack_from(">I", buf, pos)[0]
            typ = buf[pos + 4:pos + 8]
            if size == 1:   # 64-bit largesize
                size = struct.unpack_from(">Q", buf, pos + 8)[0]
                body = pos + 16
            elif size == 0:  # to end of enclosing box
                size = end - pos
                body = pos + 8
            else:
                body = pos + 8
            if size < 8 or pos + size > end:
                raise ValueError("malformed MP4 box")
            yield typ, body, pos + size
            pos += size

    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF payload")
    duration = timescale = None
    n_tracks = 0
    codecs: list[str] = []
    CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}

    def visit(buf: bytes, start: int, end: int):
        nonlocal duration, timescale, n_tracks
        for typ, body, bend in walk(buf, start, end):
            if typ == b"mvhd":
                ver = buf[body]
                if ver == 1:
                    timescale = struct.unpack_from(">I", buf, body + 20)[0]
                    duration = struct.unpack_from(">Q", buf, body + 24)[0]
                else:
                    timescale, duration = struct.unpack_from(
                        ">II", buf, body + 12)
            elif typ == b"trak":
                n_tracks += 1
                visit(buf, body, bend)
            elif typ == b"stsd":
                n_entries = struct.unpack_from(">I", buf, body + 4)[0]
                p = body + 8
                for _ in range(n_entries):
                    esz = struct.unpack_from(">I", buf, p)[0]
                    codecs.append(buf[p + 4:p + 8].decode(
                        "ascii", "replace").strip())
                    p += max(esz, 8)
            elif typ in CONTAINERS:
                visit(buf, body, bend)

    visit(payload, 0, len(payload))
    if timescale in (None, 0):
        raise ValueError("MP4 without mvhd timescale")
    return duration / timescale, timescale, n_tracks, codecs


VIDEO_META_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("duration_s", T.DoubleType()),
    T.StructField("timescale", T.IntegerType()),
    T.StructField("n_tracks", T.IntegerType()),
    T.StructField("codecs", T.StringType()),
])


def extract_video_metadata(media: DataFrame) -> DataFrame:
    """mapInPandas container-metadata extraction over video payloads —
    the real half of video handling (curation filters on duration/codec);
    frame decode stays behind the ffmpeg stub."""
    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                dur, ts, nt, codecs = parse_mp4(bytes(payload))
                rows.append((mid, dur, ts, nt, ",".join(codecs)))
            yield pd.DataFrame(rows, columns=[
                "media_id", "duration_s", "timescale", "n_tracks", "codecs"])

    return (media.filter(F.col("kind") == "video")
            .select("media_id", "payload")
            .mapInPandas(process, schema=VIDEO_META_SCHEMA))


def synthetic_mp4_media(spark: SparkSession, n: int = 24,
                        seed: int = 42) -> DataFrame:
    """Deterministic REAL MP4 container table: box trees with
    formula-derived duration/timescale/track layout."""
    rows = []
    for i in range(n):
        dur = 30 + (i * 7 + seed) % 300
        ts = (600, 1000, 90000)[i % 3]
        codecs = [("avc1", "hev1", "av01")[(i + j) % 3]
                  for j in range(1 + i % 2)]
        rows.append((i, "video", "video/mp4",
                     bytearray(encode_mp4_skeleton(dur, ts, codecs)),
                     {"codec": codecs[0]}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synthetic_jpeg_media(spark: SparkSession, n: int = 24,
                         seed: int = 42) -> DataFrame:
    """Deterministic REAL JPEG media table (sources/jpeg.encode_jpeg):
    gradient images, alternating 4:4:4 / 4:2:0 subsampling, a grayscale
    every 4th row, quality varying — genuine baseline JFIF bytes with
    Annex-K tables, byte stuffing and Huffman entropy data."""
    from .jpeg import encode_jpeg

    rows = []
    for i in range(n):
        w = 24 + (i * 3 + seed) % 17
        h = 24 + (i * 5 + seed) % 13
        yy, xx = np.mgrid[0:h, 0:w]
        q = 85 + (i * 7) % 13
        if i % 4 == 3:
            px = ((xx * 2 + yy * 3 + i * 5) % 200 + 20).astype(np.uint8)
            payload = encode_jpeg(px, quality=q)
        else:
            px = np.stack([
                ((xx * 2 + i * 3) % 200 + 20),
                ((yy * 3 + i * 7) % 200 + 20),
                ((xx + yy + i * 11) % 200 + 20),
            ], axis=-1).astype(np.uint8)
            payload = encode_jpeg(
                px, quality=q, subsample="420" if i % 2 else "444")
        rows.append((i, "image", "image/jpeg", bytearray(payload),
                     {"quality": str(q)}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# ── WEBP container (RIFF) metadata — real chunk walk, stdlib only ────────

WEBP_META_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("format", T.StringType()),      # lossy | lossless
    T.StructField("has_alpha", T.BooleanType()),
    T.StructField("chunks", T.StringType()),
])


def _vp8l_header(width: int, height: int, alpha: bool) -> bytes:
    """VP8L bitstream header: signature 0x2F then LSB-first packed
    width-1 (14b), height-1 (14b), alpha_is_used (1b), version (3b)."""
    import struct

    v = (width - 1) | ((height - 1) << 14) | (int(alpha) << 28)
    return b"\x2f" + struct.pack("<I", v)


def _vp8_keyframe_header(width: int, height: int) -> bytes:
    """VP8 lossy keyframe prefix: 3-byte frame tag (keyframe, version 0,
    show_frame, bogus partition size), 0x9D012A start code, then
    14-bit width/height in LE u16s (scale bits 0)."""
    import struct

    tag = (0) | (0 << 1) | (1 << 4) | (64 << 5)   # key, ver0, show, size
    return (struct.pack("<I", tag)[:3] + b"\x9d\x01\x2a"
            + struct.pack("<HH", width & 0x3FFF, height & 0x3FFF))


def encode_webp_skeleton(width: int, height: int, lossless: bool,
                         alpha: bool = False, exif: bool = False) -> bytes:
    """Minimal REAL RIFF/WEBP container: simple-lossless (bare VP8L),
    simple-lossy (bare VP8), or extended (VP8X + optional ALPH/EXIF +
    VP8) — headers are genuine per the public WebP container spec;
    pixel data beyond the headers is deterministic filler (the entropy
    decode is honestly out of scope, like MP4 frame decode)."""
    import struct

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    if lossless:
        body = chunk(b"VP8L", _vp8l_header(width, height, alpha) + b"\x00" * 11)
    else:
        extended = alpha or exif
        parts = b""
        if extended:
            flags = (0x10 if alpha else 0) | (0x08 if exif else 0)
            vp8x = (bytes([flags]) + b"\x00\x00\x00"
                    + struct.pack("<I", width - 1)[:3]
                    + struct.pack("<I", height - 1)[:3])
            parts += chunk(b"VP8X", vp8x)
            if alpha:
                parts += chunk(b"ALPH", b"\x00" + b"\x42" * 9)
            if exif:
                parts += chunk(b"EXIF", b"II*\x00" + b"\x00" * 8)
        parts += chunk(b"VP8 ", _vp8_keyframe_header(width, height)
                       + b"\x00" * 10)
        body = parts
    riff = b"WEBP" + body
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def parse_webp(payload: bytes) -> tuple[int, int, str, bool, list[str]]:
    """Real RIFF/WEBP container parse: walks the chunk list (u32-LE sizes,
    even-byte padding) and reads dimensions from VP8X canvas fields, the
    VP8L packed header, or the VP8 keyframe start code — the metadata a
    curation pipeline filters on before spending a codec decode."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a RIFF/WEBP payload")
    pos, end = 12, 8 + struct.unpack_from("<I", payload, 4)[0]
    end = min(end, len(payload))
    width = height = None
    fmt, alpha, chunks = "lossy", False, []
    while pos + 8 <= end:
        fourcc = payload[pos:pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = pos + 8
        if body + size > end:
            raise ValueError("malformed WEBP chunk")
        chunks.append(fourcc.decode("ascii"))
        if fourcc == b"VP8X":
            flags = payload[body]
            alpha = alpha or bool(flags & 0x10)
            width = 1 + int.from_bytes(payload[body + 4:body + 7], "little")
            height = 1 + int.from_bytes(payload[body + 7:body + 10], "little")
        elif fourcc == b"VP8L":
            v = struct.unpack_from("<I", payload, body + 1)[0]
            if payload[body] != 0x2F:
                raise ValueError("bad VP8L signature")
            fmt = "lossless"
            alpha = alpha or bool((v >> 28) & 1)
            if width is None:
                width, height = (v & 0x3FFF) + 1, ((v >> 14) & 0x3FFF) + 1
        elif fourcc == b"VP8 ":
            if payload[body + 3:body + 6] != b"\x9d\x01\x2a":
                raise ValueError("bad VP8 start code")
            w16, h16 = struct.unpack_from("<HH", payload, body + 6)
            if width is None:
                width, height = w16 & 0x3FFF, h16 & 0x3FFF
        pos = body + size + (size % 2)
    if width is None:
        raise ValueError("no image chunk in WEBP container")
    return width, height, fmt, alpha, chunks


def extract_webp_metadata(media: DataFrame) -> DataFrame:
    """mapInPandas WEBP metadata extraction — Arrow-batched like the other
    media paths; one Python pass per batch, no per-row UDF."""
    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, fmt, alpha, chunks = parse_webp(bytes(payload))
                rows.append((mid, w, h, fmt, alpha, ",".join(chunks)))
            yield pd.DataFrame(rows, columns=[
                "media_id", "width", "height", "format", "has_alpha",
                "chunks"])

    return (media.filter(F.col("mime") == "image/webp")
            .select("media_id", "payload")
            .mapInPandas(process, schema=WEBP_META_SCHEMA))


def synthetic_webp_media(spark: SparkSession, n: int = 30,
                         seed: int = 42) -> DataFrame:
    """Deterministic REAL WEBP container table: cycles simple-lossless /
    simple-lossy / extended (alpha, EXIF) layouts with formula dims."""
    rows = []
    for i in range(n):
        w = 16 + (i * 13 + seed) % 1000
        h = 16 + (i * 29 + seed) % 800
        mode = i % 3
        if mode == 0:
            payload = encode_webp_skeleton(w, h, lossless=True,
                                           alpha=bool(i % 2))
        elif mode == 1:
            payload = encode_webp_skeleton(w, h, lossless=False)
        else:
            payload = encode_webp_skeleton(w, h, lossless=False,
                                           alpha=bool((i // 3) % 2),
                                           exif=bool(i % 2))
        rows.append((i, "image", "image/webp", bytearray(payload),
                     {"mode": ("lossless", "lossy", "extended")[mode]}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# ── ICO container (favicon / icon bundles) — real directory walk ─────────

ICO_META_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("entry", T.IntegerType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("bpp", T.IntegerType()),
    T.StructField("kind", T.StringType()),        # png | bmp
    T.StructField("bytes_in_res", T.LongType()),
])


def _ico_png_image(width: int, height: int) -> bytes:
    """Minimal REAL PNG prefix for an ICO entry: 8-byte signature + a
    well-formed IHDR chunk (u32-BE dims, 8-bit RGBA) + deterministic
    filler — the parser reads dims from IHDR exactly like a real
    favicon sniffer; full zlib pixel decode lives in sources' PNG codec
    and is out of scope for a directory walk."""
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 6, 0, 0, 0)
    chunk = (struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
             + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF))
    return b"\x89PNG\r\n\x1a\n" + chunk + b"\x00" * 8


def _ico_bmp_image(width: int, height: int, bpp: int) -> bytes:
    """ICO-convention BMP payload: a BITMAPINFOHEADER with biHeight
    DOUBLED (XOR mask + AND mask, per the Windows icon format) and no
    BITMAPFILEHEADER — exactly what real .ico files embed."""
    import struct

    return struct.pack("<IiiHHIIiiII", 40, width, 2 * height, 1, bpp,
                       0, 0, 0, 0, 0, 0) + b"\x00" * 8


def encode_ico(entries: list[tuple[int, int, int, str]]) -> bytes:
    """Minimal REAL ICO container: ICONDIR (reserved=0, type=1, count) +
    one 16-byte ICONDIRENTRY per image (width/height bytes with the
    256→0 convention, bit depth, size, offset) + the PNG or
    ICO-convention-BMP payloads at their recorded offsets."""
    import struct

    images = [(_ico_png_image(w, h) if kind == "png"
               else _ico_bmp_image(w, h, bpp))
              for (w, h, bpp, kind) in entries]
    header = struct.pack("<HHH", 0, 1, len(entries))
    offset = len(header) + 16 * len(entries)
    dir_entries = b""
    for (w, h, bpp, _kind), img in zip(entries, images):
        dir_entries += struct.pack(
            "<BBBBHHII", w % 256, h % 256, 0, 0, 1, bpp, len(img), offset)
        offset += len(img)
    return header + dir_entries + b"".join(images)


def parse_ico(payload: bytes) -> list[tuple[int, int, int, int, str, int]]:
    """Real ICO directory parse: validates the ICONDIR (reserved 0,
    type 1), walks every ICONDIRENTRY, dereferences each image offset
    and sniffs the payload — PNG (signature + IHDR dims, which OVERRIDE
    the 1-byte directory dims; that is how >255px icons are stored) or
    ICO-convention BMP (BITMAPINFOHEADER, biHeight halved back). Rows:
    (entry, width, height, bpp, kind, bytes_in_res)."""
    import struct

    if len(payload) < 6:
        raise ValueError("truncated ICO header")
    reserved, typ, count = struct.unpack_from("<HHH", payload, 0)
    if reserved != 0 or typ != 1:
        raise ValueError("not an ICO container")
    out = []
    for i in range(count):
        off = 6 + 16 * i
        if off + 16 > len(payload):
            raise ValueError("truncated ICONDIRENTRY")
        bw, bh, _cc, _res, _planes, bpp, size, img_off = struct.unpack_from(
            "<BBBBHHII", payload, off)
        if img_off + size > len(payload):
            raise ValueError("ICO image out of range")
        img = payload[img_off:img_off + size]
        if img[:8] == b"\x89PNG\r\n\x1a\n":
            w, h = struct.unpack_from(">II", img, 16)
            kind = "png"
        elif len(img) >= 40 and struct.unpack_from("<I", img, 0)[0] == 40:
            _, w, h2 = struct.unpack_from("<Iii", img, 0)
            w, h = w, h2 // 2
            kind = "bmp"
        else:
            raise ValueError("unknown ICO image payload")
        out.append((i, int(w), int(h), int(bpp), kind, int(size)))
    return out


def extract_ico_entries(media: DataFrame) -> DataFrame:
    """mapInPandas ICO directory extraction — one output row per icon
    entry, Arrow-batched like the other media paths."""
    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for (e, w, h, bpp, kind, size) in parse_ico(bytes(payload)):
                    rows.append((mid, e, w, h, bpp, kind, size))
            yield pd.DataFrame(rows, columns=[
                "media_id", "entry", "width", "height", "bpp", "kind",
                "bytes_in_res"])

    return (media.filter(F.col("mime") == "image/x-icon")
            .select("media_id", "payload")
            .mapInPandas(process, schema=ICO_META_SCHEMA))


def ico_fixture_entries(i: int, seed: int = 42) \
        -> list[tuple[int, int, int, str]]:
    """Formula entry list for media_id i — shared by the fixture encoder
    and the oracle so both sides derive identical expected rows."""
    n_entries = 1 + (i + seed) % 3
    out = []
    for e in range(n_entries):
        w = 16 * (1 + (i * 7 + e * 3) % 20)        # 16..320 → exercises >255
        h = 16 * (1 + (i * 5 + e * 11) % 16)
        kind = "png" if (i + e) % 2 == 0 else "bmp"
        bpp = 32 if kind == "png" else (8, 24, 32)[(i + e) % 3]
        out.append((w, h, bpp, kind))
    return out


def synthetic_ico_media(spark: SparkSession, n: int = 18,
                        seed: int = 42) -> DataFrame:
    """Deterministic REAL ICO container table: 1-3 entries per icon,
    mixed PNG/BMP payloads, widths beyond the 255 directory-byte limit
    (PNG IHDR dims override, per the format)."""
    rows = []
    for i in range(n):
        payload = encode_ico(ico_fixture_entries(i, seed))
        rows.append((i, "image", "image/x-icon", bytearray(payload),
                     {"n_entries": str(1 + (i + seed) % 3)}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


_TGA_FOOTER = b"\0\0\0\0\0\0\0\0TRUEVISION-XFILE.\0"


def encode_tga(px: np.ndarray, rle: bool = False,
               top_down: bool = True) -> bytes:
    """Real Truevision TGA writer: 18-byte header, 24-bit BGR pixel data
    (type 2 uncompressed or type 10 run-length encoded, RLE packets never
    crossing scanlines per the spec), TGA 2.0 footer. top_down=False stores
    rows bottom-up (descriptor bit 5 clear), the format's legacy default."""
    import struct

    h, w, _ = px.shape
    bgr = px[:, :, ::-1]
    if not top_down:
        bgr = bgr[::-1]
    desc = 0x20 if top_down else 0x00
    head = struct.pack("<BBBHHBHHHHBB", 0, 0, 10 if rle else 2,
                       0, 0, 0, 0, 0, w, h, 24, desc)
    if not rle:
        return head + bgr.tobytes() + _TGA_FOOTER
    out = bytearray()
    for y in range(h):
        row = bgr[y]
        x = 0
        while x < w:
            run = 1
            while (x + run < w and run < 128
                   and (row[x + run] == row[x]).all()):
                run += 1
            if run >= 2:
                out.append(0x80 | (run - 1))
                out += row[x].tobytes()
                x += run
            else:
                lit = x
                while (lit < w and lit - x < 128
                       and not (lit + 1 < w
                                and (row[lit + 1] == row[lit]).all())):
                    lit += 1
                cnt = max(1, lit - x)
                out.append(cnt - 1)
                out += row[x:x + cnt].tobytes()
                x += cnt
    return head + bytes(out) + _TGA_FOOTER


def decode_tga(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Real TGA decode: types 2 (raw) and 10 (RLE) at 24 bpp, honoring the
    id field, bottom-up/top-down origin bit and the optional 2.0 footer.
    Colormapped / grayscale / 16- and 32-bit variants raise (honest
    refusal beats silently wrong pixels)."""
    import struct

    idlen, cmap_type, img_type = payload[0], payload[1], payload[2]
    w, h = struct.unpack("<HH", payload[12:16])
    bpp, desc = payload[16], payload[17]
    if cmap_type != 0 or img_type not in (2, 10) or bpp != 24:
        raise NotImplementedError(
            f"TGA type={img_type} cmap={cmap_type} bpp={bpp} unsupported "
            "(24-bit raw/RLE truecolor decode for real)")
    pos = 18 + idlen
    npx = w * h
    if img_type == 2:
        flat = np.frombuffer(payload[pos:pos + npx * 3],
                             dtype=np.uint8).reshape(npx, 3)
    else:
        flat = np.empty((npx, 3), dtype=np.uint8)
        filled = 0
        while filled < npx:
            pk = payload[pos]
            cnt = (pk & 0x7F) + 1
            pos += 1
            if pk & 0x80:
                flat[filled:filled + cnt] = np.frombuffer(
                    payload[pos:pos + 3], dtype=np.uint8)
                pos += 3
            else:
                flat[filled:filled + cnt] = np.frombuffer(
                    payload[pos:pos + cnt * 3],
                    dtype=np.uint8).reshape(cnt, 3)
                pos += cnt * 3
            filled += cnt
    px = flat.reshape(h, w, 3)[:, :, ::-1]
    if not desc & 0x20:
        px = px[::-1]
    return w, h, px.copy()


def synthetic_tga_media(spark: SparkSession, n: int = 30,
                        seed: int = 42) -> DataFrame:
    """Deterministic REAL TGA table: genuine 24-bit Targa bytes — run-heavy
    pixel formulas of (x, y, id) so RLE packets are exercised, alternating
    raw/RLE and top-down/bottom-up rows. Pixels are pure formulas, so the
    oracle recomputes expected channel means without touching TGA bytes."""
    rows = []
    for i in range(n):
        w = 12 + (i * 5 + seed) % 15
        h = 10 + (i * 7 + seed) % 11
        yy, xx = np.mgrid[0:h, 0:w]
        px = np.stack([
            ((xx // 5) * 7 + yy * 3 + i) % 256,
            ((xx // 3) + yy * 2 + i * 11) % 256,
            (xx + (yy // 2) * 5 + i * 3) % 256,
        ], axis=-1).astype(np.uint8)
        payload = encode_tga(px, rle=(i % 2 == 1), top_down=(i % 3 != 0))
        rows.append((i, "image", "image/x-tga", bytearray(payload),
                     {"rle": str(i % 2)}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synthetic_g711_media(spark: SparkSession, n: int = 24,
                         seed: int = 42) -> DataFrame:
    """Deterministic REAL G.711 μ-law WAV table: id-dependent tones
    companded through ulaw_compress into genuine format-7 RIFF bytes."""
    rows = []
    for i in range(n):
        rate = 8000
        t = np.arange(320 + (i % 4) * 60)
        freq = 180.0 + (i * 53 + seed) % 500
        x = (np.sin(2 * np.pi * freq * t / rate) * 15000).astype("<i2")
        rows.append((i, "audio", "audio/basic",
                     bytearray(encode_wav_ulaw(rate, x)),
                     {"codec": "g711u"}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def encode_qoi(px: np.ndarray) -> bytes:
    """Real QOI (Quite OK Image, qoiformat.org spec 1.0) encoder for RGB /
    RGBA pixel arrays: 64-slot color hash index, 2-bit DIFF, LUMA, RUN
    (max 62) and literal RGB/RGBA ops, 14-byte big-endian header and the
    7×00+01 end marker — the whole public wire format, stdlib only."""
    import struct

    h, w, ch = px.shape
    out = bytearray(b"qoif" + struct.pack(">IIBB", w, h, ch, 0))
    index = [(0, 0, 0, 0)] * 64
    pr, pg, pb, pa = 0, 0, 0, 255
    run = 0
    flat = px.reshape(-1, ch)
    for row in flat:
        r, g, b = int(row[0]), int(row[1]), int(row[2])
        a = int(row[3]) if ch == 4 else 255
        if (r, g, b, a) == (pr, pg, pb, pa):
            run += 1
            if run == 62:
                out.append(0xC0 | (run - 1))
                run = 0
        else:
            if run:
                out.append(0xC0 | (run - 1))
                run = 0
            ix = (r * 3 + g * 5 + b * 7 + a * 11) % 64
            if index[ix] == (r, g, b, a):
                out.append(ix)
            else:
                index[ix] = (r, g, b, a)
                if a == pa:
                    dr = (r - pr + 128) % 256 - 128
                    dg = (g - pg + 128) % 256 - 128
                    db = (b - pb + 128) % 256 - 128
                    if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                        out.append(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2)
                                   | (db + 2))
                    elif (-32 <= dg <= 31 and -8 <= dr - dg <= 7
                          and -8 <= db - dg <= 7):
                        out.append(0x80 | (dg + 32))
                        out.append(((dr - dg + 8) << 4) | (db - dg + 8))
                    else:
                        out += bytes((0xFE, r, g, b))
                elif ch == 4:
                    out += bytes((0xFF, r, g, b, a))
                else:  # pragma: no cover - a==pa always holds for RGB
                    out += bytes((0xFE, r, g, b))
            pr, pg, pb, pa = r, g, b, a
    if run:
        out.append(0xC0 | (run - 1))
    out += b"\x00" * 7 + b"\x01"
    return bytes(out)


def decode_qoi(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Real QOI decoder (qoiformat.org spec 1.0): INDEX / DIFF / LUMA /
    RUN / RGB / RGBA ops, wrap-around u8 arithmetic, the shared 64-slot
    index. Returns (w, h, RGB pixels); alpha is decoded then dropped to
    match the extract_image_features_real contract."""
    import struct

    if payload[:4] != b"qoif":
        raise NotImplementedError("not a QOI payload")
    w, h, ch, _cs = struct.unpack(">IIBB", payload[4:14])
    if ch not in (3, 4):
        raise NotImplementedError(f"QOI channels={ch} unsupported")
    npx = w * h
    flat = np.empty((npx, 4), dtype=np.uint8)
    index = [(0, 0, 0, 0)] * 64
    r, g, b, a = 0, 0, 0, 255
    pos, i = 14, 0
    while i < npx:
        op = payload[pos]
        pos += 1
        if op == 0xFE:
            r, g, b = payload[pos], payload[pos + 1], payload[pos + 2]
            pos += 3
        elif op == 0xFF:
            r, g, b, a = (payload[pos], payload[pos + 1],
                          payload[pos + 2], payload[pos + 3])
            pos += 4
        elif op >> 6 == 0:
            r, g, b, a = index[op]
            flat[i] = (r, g, b, a)
            i += 1
            continue
        elif op >> 6 == 1:
            r = (r + ((op >> 4) & 3) - 2) % 256
            g = (g + ((op >> 2) & 3) - 2) % 256
            b = (b + (op & 3) - 2) % 256
        elif op >> 6 == 2:
            dg = (op & 0x3F) - 32
            nx = payload[pos]
            pos += 1
            r = (r + dg + ((nx >> 4) & 0x0F) - 8) % 256
            g = (g + dg) % 256
            b = (b + dg + (nx & 0x0F) - 8) % 256
        else:  # RUN
            run = (op & 0x3F) + 1
            flat[i:i + run] = (r, g, b, a)
            i += run
            continue
        index[(r * 3 + g * 5 + b * 7 + a * 11) % 64] = (r, g, b, a)
        flat[i] = (r, g, b, a)
        i += 1
    return w, h, flat[:, :3].reshape(h, w, 3).copy()


def synthetic_qoi_media(spark: SparkSession, n: int = 30,
                        seed: int = 42) -> DataFrame:
    """Deterministic REAL QOI table: genuine spec-1.0 QOI bytes over pixel
    formulas of (x, y, id) shaped to exercise every op class — smooth
    gradients (DIFF/LUMA), flat patches (RUN), repeated colors (INDEX) and
    hard jumps (literal RGB); every third image is RGBA."""
    rows = []
    for i in range(n):
        w = 13 + (i * 5 + seed) % 12
        h = 11 + (i * 7 + seed) % 10
        yy, xx = np.mgrid[0:h, 0:w]
        base = [
            (xx + yy + i) % 256,                       # smooth → DIFF
            ((xx // 6) * 40 + i * 11) % 256,           # flat runs → RUN
            ((xx % 4) * 61 + (yy % 3) * 97 + i) % 256,  # few colors → INDEX
        ]
        if i % 3 == 0:
            base.append(((xx * 29 + yy * 53 + i * 7) % 256))  # alpha
        px = np.stack(base, axis=-1).astype(np.uint8)
        rows.append((i, "image", "image/qoi", bytearray(encode_qoi(px)),
                     {"channels": str(px.shape[2])}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _pcx_rle(plane_bytes: bytes) -> bytearray:
    """PCX RLE for one scanline-plane: runs of 1..63 equal bytes become
    (0xC0|count, value); a lone byte < 0xC0 is emitted literally, but any
    value ≥ 0xC0 MUST be run-encoded even for count 1 (it would otherwise
    read as a run marker)."""
    out = bytearray()
    i, n = 0, len(plane_bytes)
    while i < n:
        v = plane_bytes[i]
        run = 1
        while i + run < n and run < 63 and plane_bytes[i + run] == v:
            run += 1
        if run > 1 or v >= 0xC0:
            out.append(0xC0 | run)
            out.append(v)
        else:
            out.append(v)
        i += run
    return out


def encode_pcx(px: np.ndarray) -> bytes:
    """Real PCX (ZSoft PC Paintbrush) encoder for 24-bit RGB: version-5
    header, encoding=1 RLE, 8 bits/pixel × 3 color planes, even
    bytes-per-line padding, each scanline stored as its R, G, B planes
    RLE-compressed (runs never cross a scanline — the safe classic
    layout). Stdlib only."""
    import struct

    h, w, ch = px.shape
    assert ch == 3
    bpl = w + (w & 1)  # bytes per line per plane, padded even
    head = struct.pack(
        "<BBBBHHHHHH48sBBHH58s",
        0x0A, 5, 1, 8,            # manufacturer, version, RLE, bpp
        0, 0, w - 1, h - 1,       # xmin ymin xmax ymax
        72, 72,                   # dpi
        b"\x00" * 48, 0, 3,       # EGA palette, reserved, nplanes
        bpl, 1, b"\x00" * 58)     # bytes/line, palette info, filler
    out = bytearray(head)
    pad = b"\x00" * (bpl - w)
    for y in range(h):
        for c in range(3):
            out += _pcx_rle(px[y, :, c].astype(np.uint8).tobytes() + pad)
    return bytes(out)


def decode_pcx(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Real PCX decoder: 128-byte header walk, continuous RLE decode of
    h × nplanes × bytes-per-line bytes (runs may cross plane boundaries —
    the spec allows encoders that do), planar → interleaved RGB with the
    even-byte line padding stripped."""
    import struct

    (man, ver, enc, bpp, xmin, ymin, xmax, ymax) = struct.unpack(
        "<BBBBHHHH", payload[:12])
    if man != 0x0A or enc != 1:
        raise NotImplementedError("not an RLE PCX payload")
    nplanes = payload[65]
    bpl = struct.unpack("<H", payload[66:68])[0]
    if bpp != 8 or nplanes != 3:
        raise NotImplementedError(
            f"PCX bpp={bpp} nplanes={nplanes} unsupported (24-bit only)")
    w, h = xmax - xmin + 1, ymax - ymin + 1
    total = h * nplanes * bpl
    raw = bytearray(total)
    pos, i = 128, 0
    while i < total:
        b = payload[pos]
        pos += 1
        if b & 0xC0 == 0xC0:
            run = b & 0x3F
            v = payload[pos]
            pos += 1
            raw[i:i + run] = bytes([v]) * run
            i += run
        else:
            raw[i] = b
            i += 1
    arr = np.frombuffer(bytes(raw), dtype=np.uint8).reshape(h, nplanes, bpl)
    return w, h, np.ascontiguousarray(
        arr[:, :, :w].transpose(0, 2, 1))


def synthetic_pcx_media(spark: SparkSession, n: int = 30,
                        seed: int = 42) -> DataFrame:
    """Deterministic REAL PCX table: genuine version-5 RLE bytes over pixel
    formulas of (x, y, id) — horizontal bands (long runs), diagonal
    gradients (literal-heavy) and values ≥ 0xC0 (forced 1-runs); odd
    widths exercise the even bytes-per-line padding."""
    rows = []
    for i in range(n):
        w = 15 + (i * 3 + seed) % 11          # odd widths common
        h = 9 + (i * 5 + seed) % 12
        yy, xx = np.mgrid[0:h, 0:w]
        px = np.stack([
            ((yy // 3) * 50 + i * 13) % 256,          # bands → runs
            (xx * 11 + yy * 17 + i) % 256,            # gradient → literals
            np.where((xx + i) % 5 == 0, 0xC8, (xx * 2 + i) % 0xC0),
        ], axis=-1).astype(np.uint8)
        rows.append((i, "image", "image/pcx", bytearray(encode_pcx(px)),
                     {"planes": "3"}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _vlq(n: int) -> bytes:
    """MIDI variable-length quantity: 7 bits per byte, high bit set on all
    but the last."""
    out = [n & 0x7F]
    n >>= 7
    while n:
        out.append(0x80 | (n & 0x7F))
        n >>= 7
    return bytes(reversed(out))


def encode_midi(notes: list[tuple[int, int, int, int]],
                tempo_us: int = 500000, division: int = 480) -> bytes:
    """Real Standard MIDI File (format 1) encoder: an MThd header, a tempo
    track (Set Tempo + Time Signature meta events) and a note track using
    RUNNING STATUS — the 0x90 status byte is emitted once and subsequent
    note-on / note-off-via-velocity-0 events omit it, the layout real
    sequencers write. notes = [(delta_on, duration, pitch, velocity)].
    Stdlib only."""
    import struct

    t0 = bytearray()
    t0 += _vlq(0) + bytes((0xFF, 0x58, 0x04, 4, 2, 24, 8))
    t0 += _vlq(0) + bytes((0xFF, 0x51, 0x03)) + tempo_us.to_bytes(3, "big")
    t0 += _vlq(0) + bytes((0xFF, 0x2F, 0x00))
    t1 = bytearray()
    first = True
    for delta_on, dur, pitch, vel in notes:
        t1 += _vlq(delta_on)
        if first:
            t1 += bytes((0x90,))
            first = False
        t1 += bytes((pitch, vel))                 # running status note-on
        t1 += _vlq(dur) + bytes((pitch, 0))       # note-off via velocity 0
    t1 += _vlq(0) + bytes((0xFF, 0x2F, 0x00))
    out = bytearray(b"MThd" + struct.pack(">IHHH", 6, 1, 2, division))
    for tr in (t0, t1):
        out += b"MTrk" + struct.pack(">I", len(tr)) + tr
    return bytes(out)


def parse_midi(payload: bytes) -> dict:
    """Real SMF parser: MThd/MTrk chunk walk, variable-length deltas,
    RUNNING STATUS, meta (tempo, end-of-track) and sysex skipping, and the
    1-vs-2 data-byte rule for channel messages (0xC0/0xD0 take one).
    Returns integer features: track count, division, first tempo, note-on
    count (velocity > 0), pitch/velocity sums, and the max cumulative tick
    length across tracks."""
    import struct

    if payload[:4] != b"MThd":
        raise NotImplementedError("not an SMF payload")
    hlen, fmt, ntrks, division = struct.unpack(">IHHH", payload[4:14])
    pos = 8 + hlen
    tempo_us = 0
    n_notes = pitch_sum = vel_sum = total_ticks = 0
    for _ in range(ntrks):
        if payload[pos:pos + 4] != b"MTrk":
            raise NotImplementedError("bad track chunk")
        tlen = struct.unpack(">I", payload[pos + 4:pos + 8])[0]
        p, end = pos + 8, pos + 8 + tlen
        ticks = 0
        status = 0
        while p < end:
            delta = 0
            while True:
                b = payload[p]
                p += 1
                delta = (delta << 7) | (b & 0x7F)
                if not b & 0x80:
                    break
            ticks += delta
            b = payload[p]
            if b >= 0x80:
                status = b
                p += 1
            if status == 0xFF:                    # meta
                mtype = payload[p]
                mlen = payload[p + 1]
                if mtype == 0x51:
                    t = int.from_bytes(payload[p + 2:p + 2 + mlen], "big")
                    if tempo_us == 0:
                        tempo_us = t
                p += 2 + mlen
                if mtype == 0x2F:
                    break
            elif status in (0xF0, 0xF7):          # sysex
                slen = 0
                while True:
                    b2 = payload[p]
                    p += 1
                    slen = (slen << 7) | (b2 & 0x7F)
                    if not b2 & 0x80:
                        break
                p += slen
            else:                                  # channel message
                hi = status & 0xF0
                if hi in (0xC0, 0xD0):
                    p += 1
                else:
                    d1, d2 = payload[p], payload[p + 1]
                    p += 2
                    if hi == 0x90 and d2 > 0:
                        n_notes += 1
                        pitch_sum += d1
                        vel_sum += d2
        total_ticks = max(total_ticks, ticks)
        pos += 8 + tlen
    return {"n_tracks": ntrks, "division": division, "tempo_us": tempo_us,
            "n_notes": n_notes, "total_ticks": total_ticks,
            "pitch_sum": pitch_sum, "vel_sum": vel_sum}


def midi_note_formula(i: int) -> tuple[list[tuple[int, int, int, int]], int]:
    """The deterministic note/tempo recipe for synthetic MIDI id=i — shared
    by the generator and the oracle so expected features are closed-form."""
    k = 8 + i % 8
    notes = [((i + j) % 64 + 1, 24 + (j % 4) * 12,
              40 + (i * 7 + j * 5) % 48, 32 + (i * 3 + j * 11) % 96)
             for j in range(k)]
    return notes, 500000 - i * 1000


def synthetic_midi_media(spark: SparkSession, n: int = 30) -> DataFrame:
    """Deterministic REAL MIDI table: genuine format-1 SMF bytes (tempo
    track + running-status note track) from midi_note_formula."""
    rows = []
    for i in range(n):
        notes, tempo = midi_note_formula(i)
        rows.append((i, "audio", "audio/midi",
                     bytearray(encode_midi(notes, tempo_us=tempo)),
                     {"notes": str(len(notes))}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


MIDI_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("n_tracks", T.LongType()),
    T.StructField("division", T.LongType()),
    T.StructField("tempo_us", T.LongType()),
    T.StructField("n_notes", T.LongType()),
    T.StructField("total_ticks", T.LongType()),
    T.StructField("pitch_sum", T.LongType()),
    T.StructField("vel_sum", T.LongType()),
])


def extract_midi_features(media: DataFrame) -> DataFrame:
    """REAL SMF parse over binary payloads, mapInPandas-batched: Arrow
    ships the bytes, parse_midi walks chunks/VLQs/running status, only
    integer features come back."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                f = parse_midi(bytes(payload))
                rows.append((mid, f["n_tracks"], f["division"],
                             f["tempo_us"], f["n_notes"], f["total_ticks"],
                             f["pitch_sum"], f["vel_sum"]))
            yield pd.DataFrame(rows, columns=[
                "media_id", "n_tracks", "division", "tempo_us", "n_notes",
                "total_ticks", "pitch_sum", "vel_sum"])

    return (media.filter(F.col("mime") == "audio/midi")
            .select("media_id", "payload")
            .mapInPandas(process, schema=MIDI_FEATURES_SCHEMA))


def alaw_compress(x: np.ndarray) -> np.ndarray:
    """G.711 A-law companding, int16 → uint8 (ITU-T G.711 encoder,
    vectorized): 12-bit magnitude segments, 4-bit mantissa, even-bit
    inversion via XOR 0x55, sign bit set for NON-NEGATIVE samples (the
    A-law convention, opposite of μ-law)."""
    xi = x.astype(np.int32)
    mask = np.where(xi >= 0, 0xD5, 0x55).astype(np.int32)
    v = np.minimum(np.abs(xi), 0x7FFF)
    seg = (np.searchsorted(
        np.array([1, 2, 4, 8, 16, 32, 64], dtype=np.int32),
        v >> 8, side="right")).astype(np.int32)
    code = np.where(
        v < 256, v >> 4,
        (seg << 4) | ((v >> (seg + 3)) & 0x0F))
    return ((code ^ mask) & 0xFF).astype(np.uint8)


def alaw_expand(u: np.ndarray) -> np.ndarray:
    """G.711 A-law expansion, uint8 → int16 — the exact inverse of the
    byte layout: alaw_compress(alaw_expand(u)) == u for ALL 256 codes
    (A-law has no negative-zero collapse, unlike μ-law)."""
    ui = (u.astype(np.int32) ^ 0x55)
    seg = (ui >> 4) & 0x07
    mant = ui & 0x0F
    t = np.where(seg == 0, (mant << 4) + 8,
                 ((mant << 4) + 0x108) << np.maximum(seg - 1, 0))
    return np.where(ui & 0x80, t, -t).astype(np.int16)


def encode_wav_alaw(rate: int, x: np.ndarray) -> bytes:
    """Real G.711 A-law WAV writer: RIFF, 18-byte fmt (wFormatTag=6,
    8-bit mono), fact chunk, data."""
    import struct

    data = alaw_compress(x).tobytes()
    fmt = struct.pack("<HHIIHHH", 6, 1, rate, rate, 1, 8, 0)
    fact = struct.pack("<I", len(data))
    chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"fact" + struct.pack("<I", len(fact)) + fact
              + b"data" + struct.pack("<I", len(data)) + data
              + (b"\0" if len(data) % 2 else b""))
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _f80_encode(rate: int) -> bytes:
    """Encode a positive integer as the 80-bit IEEE 754 extended float
    AIFF's COMM chunk requires: 1 sign + 15 exponent (bias 16383) + 64
    mantissa with an EXPLICIT integer bit."""
    import struct

    if rate <= 0:
        raise ValueError("rate must be positive")
    e = rate.bit_length() - 1
    mant = rate << (63 - e)
    return struct.pack(">HQ", 16383 + e, mant)


def _f80_decode(b: bytes) -> int:
    """Decode AIFF's 80-bit extended float to an integer sample rate."""
    import struct

    se, mant = struct.unpack(">HQ", b[:10])
    e = (se & 0x7FFF) - 16383
    val = mant * 2.0 ** (e - 63)
    return int(val + 0.5) if not se >> 15 else -int(-val + 0.5)


def encode_aiff(rate: int, x: np.ndarray) -> bytes:
    """Real AIFF writer (Apple/EA IFF-85): big-endian FORM/AIFF container,
    COMM chunk with the 80-bit extended-float sample rate, SSND chunk with
    big-endian 16-bit PCM."""
    import struct

    comm = struct.pack(">hIh", 1, len(x), 16) + _f80_encode(rate)
    ssnd = struct.pack(">II", 0, 0) + x.astype(">i2").tobytes()
    body = (b"AIFF"
            + b"COMM" + struct.pack(">I", len(comm)) + comm
            + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
            + (b"\0" if len(ssnd) % 2 else b""))
    return b"FORM" + struct.pack(">I", len(body)) + body


def decode_aiff(payload: bytes) -> tuple[int, np.ndarray]:
    """Real AIFF decode: big-endian IFF chunk walk (even padding), COMM's
    80-bit extended-float sample rate, SSND offset honored, 16-bit PCM
    mono. Compressed AIFC and other widths refuse honestly."""
    import struct

    if payload[:4] != b"FORM" or payload[8:12] != b"AIFF":
        if payload[8:12] == b"AIFC":
            raise NotImplementedError("compressed AIFC unsupported")
        raise NotImplementedError("not a FORM/AIFF payload")
    pos = 12
    end = min(len(payload), 8 + struct.unpack(">I", payload[4:8])[0])
    rate = bits = nch = None
    raw = None
    while pos + 8 <= end:
        cid = payload[pos:pos + 4]
        size = struct.unpack(">I", payload[pos + 4:pos + 8])[0]
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"COMM":
            nch, _nfr, bits = struct.unpack(">hIh", body[:8])
            rate = _f80_decode(body[8:18])
        elif cid == b"SSND":
            off, _blk = struct.unpack(">II", body[:8])
            raw = body[8 + off:]
        pos += 8 + size + (size % 2)
    if rate is None or raw is None:
        raise NotImplementedError("AIFF missing COMM or SSND chunk")
    if nch != 1 or bits != 16:
        raise NotImplementedError(
            f"AIFF {nch}ch/{bits}-bit unsupported (16-bit mono decodes)")
    return rate, np.frombuffer(raw, dtype=">i2").astype("<i2")


def synthetic_aiff_media(spark: SparkSession, n: int = 24,
                         seed: int = 42) -> DataFrame:
    """Deterministic REAL AIFF table: id-dependent tones written as
    genuine big-endian FORM/AIFF bytes, odd sample rates exercising the
    80-bit extended-float encode."""
    rows = []
    for i in range(n):
        rate = (8000, 11025, 22050, 44100)[i % 4]
        t = np.arange(280 + (i % 5) * 64)
        freq = 160.0 + (i * 47 + seed) % 520
        x = (np.sin(2 * np.pi * freq * t / rate) * 13000).astype("<i2")
        rows.append((i, "audio", "audio/aiff",
                     bytearray(encode_aiff(rate, x)),
                     {"rate": str(rate)}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synthetic_alaw_media(spark: SparkSession, n: int = 24,
                         seed: int = 42) -> DataFrame:
    """Deterministic REAL G.711 A-law WAV table (format-6 RIFF bytes)."""
    rows = []
    for i in range(n):
        rate = 8000
        t = np.arange(300 + (i % 4) * 70)
        freq = 190.0 + (i * 59 + seed) % 480
        x = (np.sin(2 * np.pi * freq * t / rate) * 14000).astype("<i2")
        rows.append((i, "audio", "audio/basic",
                     bytearray(encode_wav_alaw(rate, x)),
                     {"codec": "g711a"}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# ───────────────────── Sun Raster (.ras / rast) ─────────────────────

_RAS_MAGIC = 0x59A66A95
_RAS_STANDARD = 1       # uncompressed, rows padded to 16 bits, BGR order
_RAS_BYTE_ENCODED = 2   # Sun RLE over the same byte stream


def _rast_rle_encode(data: bytes) -> bytes:
    """Sun byte-encoded RLE: 0x80,count,value -> value repeated count+1;
    0x80,0x00 -> one literal 0x80; anything else is a literal byte."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        b0 = data[i]
        j = i
        while j < n and data[j] == b0 and j - i < 256:
            j += 1
        run = j - i
        if b0 == 0x80 and run == 1:
            out += bytes([0x80, 0x00])      # the two-byte literal escape
        elif run >= 3 or b0 == 0x80:
            out += bytes([0x80, run - 1, b0])
        else:
            out += bytes([b0] * run)
        i = j
    return bytes(out)


def _rast_rle_decode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        b0 = data[i]
        if b0 == 0x80:
            cnt = data[i + 1]
            if cnt == 0:
                out.append(0x80)
                i += 2
            else:
                out += bytes([data[i + 2]]) * (cnt + 1)
                i += 3
        else:
            out.append(b0)
            i += 1
    return bytes(out)


def encode_rast(px: np.ndarray, rle: bool = False) -> bytes:
    """Genuine Sun Raster bytes: 8 big-endian u32 header words (magic,
    width, height, depth, data length, type, maptype, maplength), 24-bit
    BGR rows padded to 16-bit boundaries, optionally byte-encoded (RLE)."""
    h, w, _ = px.shape
    rows = []
    for y in range(h):
        row = px[y, :, ::-1].astype(np.uint8).tobytes()  # RGB -> BGR
        if len(row) % 2:
            row += b"\x00"
        rows.append(row)
    data = b"".join(rows)
    rtype = _RAS_BYTE_ENCODED if rle else _RAS_STANDARD
    if rle:
        data = _rast_rle_encode(data)
    hdr = struct.pack(">8I", _RAS_MAGIC, w, h, 24, len(data), rtype, 0, 0)
    return hdr + data


def decode_rast(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Hand-rolled Sun Raster parse: header walk, optional RLE expansion,
    16-bit row-pad strip, BGR -> RGB."""
    magic, w, h, depth, length, rtype, maptype, maplen = \
        struct.unpack(">8I", payload[:32])
    if magic != _RAS_MAGIC:
        raise NotImplementedError("not a Sun Raster payload")
    if depth != 24 or maptype != 0:
        raise NotImplementedError("only 24-bit unmapped Sun Raster supported")
    data = payload[32 + maplen:32 + maplen + length]
    if rtype == _RAS_BYTE_ENCODED:
        data = _rast_rle_decode(data)
    elif rtype != _RAS_STANDARD:
        raise NotImplementedError(f"Sun Raster type {rtype} not supported")
    stride = (w * 3 + 1) & ~1
    px = (np.frombuffer(data, np.uint8)[:h * stride]
          .reshape(h, stride)[:, :w * 3]
          .reshape(h, w, 3)[:, :, ::-1])
    return w, h, px.copy()


def synthetic_rast_media(spark: SparkSession, n: int = 30,
                         seed: int = 42) -> DataFrame:
    """Deterministic REAL Sun Raster table: even ids RT_STANDARD, odd ids
    RT_BYTE_ENCODED (the RLE stream genuinely compresses — rows carry
    horizontal runs). Pixels are pure formulas of (x, y, id)."""
    rows = []
    for i in range(n):
        w = 14 + (i * 3 + seed) % 11
        h = 12 + (i * 5 + seed) % 9
        yy, xx = np.mgrid[0:h, 0:w]
        px = np.stack([
            ((xx // 4) * 9 + yy * 7 + i) % 256,   # runs of 4 -> RLE bites
            ((xx // 3) * 5 + yy * 11 + i * 2) % 256,
            ((xx // 5) * 3 + yy + i * 13) % 256,
        ], axis=-1).astype(np.uint8)
        rows.append((i, "image", "image/x-sun-raster",
                     bytearray(encode_rast(px, rle=bool(i % 2))), {}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# ───────────────────── NetPBM PAM (P7) ─────────────────────

def encode_pam(px: np.ndarray) -> bytes:
    """Genuine PAM (P7) bytes: the token header (WIDTH/HEIGHT/DEPTH/
    MAXVAL/TUPLTYPE/ENDHDR) followed by raw unpadded samples. 3-channel
    RGB or single-channel GRAYSCALE."""
    h, w = px.shape[:2]
    depth = 1 if px.ndim == 2 else px.shape[2]
    tup = "RGB" if depth == 3 else "GRAYSCALE"
    hdr = (f"P7\nWIDTH {w}\nHEIGHT {h}\nDEPTH {depth}\nMAXVAL 255\n"
           f"TUPLTYPE {tup}\nENDHDR\n").encode("ascii")
    return hdr + px.astype(np.uint8).tobytes()


def decode_pam(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Hand-rolled P7 parse: token header until ENDHDR (comments allowed),
    raw sample block; grayscale replicates to 3 channels like the TIFF
    path so every image feature sees RGB."""
    if payload[:2] != b"P7":
        raise NotImplementedError("not a PAM payload")
    end = payload.index(b"ENDHDR\n") + len(b"ENDHDR\n")
    fields: dict[str, str] = {}
    for line in payload[:end].decode("ascii").splitlines()[1:]:
        line = line.strip()
        if not line or line.startswith("#") or line == "ENDHDR":
            continue
        k, _, v = line.partition(" ")
        fields[k] = v.strip()
    w, h = int(fields["WIDTH"]), int(fields["HEIGHT"])
    depth, maxval = int(fields["DEPTH"]), int(fields["MAXVAL"])
    if maxval != 255 or depth not in (1, 3):
        raise NotImplementedError("only 8-bit depth-1/3 PAM supported")
    data = np.frombuffer(payload[end:end + h * w * depth], np.uint8)
    if depth == 1:
        g = data.reshape(h, w)
        return w, h, np.stack([g, g, g], axis=-1).copy()
    return w, h, data.reshape(h, w, 3).copy()


def synthetic_pam_media(spark: SparkSession, n: int = 28,
                        seed: int = 42) -> DataFrame:
    """Deterministic REAL PAM table: every 4th row GRAYSCALE (depth 1),
    the rest RGB; pixels are pure formulas of (x, y, id)."""
    rows = []
    for i in range(n):
        w = 11 + (i * 7 + seed) % 13
        h = 9 + (i * 3 + seed) % 11
        yy, xx = np.mgrid[0:h, 0:w]
        if i % 4 == 0:
            px = ((xx * 5 + yy * 9 + i * 3) % 256).astype(np.uint8)
        else:
            px = np.stack([
                (xx * 2 + yy * 13 + i) % 256,
                (xx * 11 + yy * 3 + i * 5) % 256,
                (xx + yy * 7 + i * 9) % 256,
            ], axis=-1).astype(np.uint8)
        rows.append((i, "image", "image/x-portable-arbitrarymap",
                     bytearray(encode_pam(px)), {}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# ───────────────────── SGI image (.rgb / .sgi) ─────────────────────

_SGI_MAGIC = 474


def _sgi_rle_encode_row(row: bytes) -> bytes:
    """SGI per-row RLE: count byte c&0x7f, high bit set = literal copy of
    c bytes, clear = repeat next byte c times, c=0 terminates the row."""
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        b0 = row[i]
        j = i
        while j < n and row[j] == b0 and j - i < 127:
            j += 1
        run = j - i
        if run >= 3:
            out += bytes([run, b0])
            i = j
        else:
            k = i
            # literal stretch: stop before the next >=3 run
            while k < n and k - i < 127:
                if (k + 2 < n and row[k] == row[k + 1] == row[k + 2]):
                    break
                k += 1
            out += bytes([0x80 | (k - i)]) + row[i:k]
            i = k
    out.append(0)
    return bytes(out)


def _sgi_rle_decode_row(data: bytes, off: int, w: int) -> bytes:
    out = bytearray()
    while True:
        pixel = data[off]
        off += 1
        count = pixel & 0x7F
        if count == 0:
            break
        if pixel & 0x80:
            out += data[off:off + count]
            off += count
        else:
            out += bytes([data[off]]) * count
            off += 1
    return bytes(out[:w])


def encode_sgi(px: np.ndarray, rle: bool = False) -> bytes:
    """Genuine SGI image bytes: 512-byte big-endian header (magic 474),
    channel-planar BOTTOM-UP rows, verbatim or per-row RLE with
    start/length tables."""
    h, w, ch = px.shape
    hdr = struct.pack(">HBBHHHHiiI", _SGI_MAGIC, 1 if rle else 0, 1, 3,
                      w, h, ch, 0, 255, 0)
    hdr += b"kep".ljust(80, b"\x00") + struct.pack(">I", 0)
    hdr = hdr.ljust(512, b"\x00")
    rows = []
    for z in range(ch):
        for y in range(h - 1, -1, -1):          # bottom-up storage
            rows.append(px[y, :, z].astype(np.uint8).tobytes())
    if not rle:
        return hdr + b"".join(rows)
    enc = [_sgi_rle_encode_row(r) for r in rows]
    tab_len = 4 * h * ch
    start = 512 + 2 * tab_len
    starts, lengths = [], []
    for e in enc:
        starts.append(start)
        lengths.append(len(e))
        start += len(e)
    return (hdr + struct.pack(f">{h * ch}I", *starts)
            + struct.pack(f">{h * ch}I", *lengths) + b"".join(enc))


def decode_sgi(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Hand-rolled SGI parse: header walk, bottom-up row unflip,
    channel-planar → interleaved, verbatim + RLE (offset/length tables)."""
    magic, storage, bpc, dim, w, h, ch = struct.unpack(">HBBHHHH",
                                                       payload[:12])
    if magic != _SGI_MAGIC:
        raise NotImplementedError("not an SGI image payload")
    if bpc != 1 or ch not in (1, 3):
        raise NotImplementedError("only 8-bit 1/3-channel SGI supported")
    px = np.zeros((h, w, ch), np.uint8)
    if storage == 0:
        off = 512
        for z in range(ch):
            for yy in range(h):
                y = h - 1 - yy                  # stored bottom-up
                px[y, :, z] = np.frombuffer(
                    payload[off:off + w], np.uint8)
                off += w
    elif storage == 1:
        ntab = h * ch
        starts = struct.unpack(f">{ntab}I", payload[512:512 + 4 * ntab])
        for z in range(ch):
            for yy in range(h):
                y = h - 1 - yy
                row = _sgi_rle_decode_row(payload, starts[yy + z * h], w)
                px[y, :, z] = np.frombuffer(row, np.uint8)
    else:
        raise NotImplementedError(f"SGI storage {storage} not supported")
    if ch == 1:
        px = np.repeat(px, 3, axis=2)
    return w, h, px.copy()


def synthetic_sgi_media(spark: SparkSession, n: int = 26,
                        seed: int = 42) -> DataFrame:
    """Deterministic REAL SGI table: even ids verbatim, odd ids RLE
    (pixel formulas carry horizontal runs so the RLE genuinely bites)."""
    rows = []
    for i in range(n):
        w = 13 + (i * 5 + seed) % 12
        h = 10 + (i * 7 + seed) % 9
        yy, xx = np.mgrid[0:h, 0:w]
        px = np.stack([
            ((xx // 5) * 11 + yy * 3 + i) % 256,
            ((xx // 4) * 7 + yy * 5 + i * 3) % 256,
            ((xx // 6) * 13 + yy + i * 7) % 256,
        ], axis=-1).astype(np.uint8)
        rows.append((i, "image", "image/x-sgi",
                     bytearray(encode_sgi(px, rle=bool(i % 2))), {}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# ───────────────────── Amiga IFF ILBM ─────────────────────

def _byterun1_encode(row: bytes) -> bytes:
    """EA IFF-85 ByteRun1 (PackBits): n in 0..127 -> copy n+1 literals;
    n in -1..-127 -> replicate next byte 1-n times; -128 is a no-op."""
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        b0 = row[i]
        j = i
        while j < n and row[j] == b0 and j - i < 128:
            j += 1
        run = j - i
        if run >= 3:
            out += bytes([(257 - run) & 0xFF, b0])
            i = j
        else:
            k = i
            while k < n and k - i < 128:
                if k + 2 < n and row[k] == row[k + 1] == row[k + 2]:
                    break
                k += 1
            out += bytes([k - i - 1]) + row[i:k]
            i = k
    return bytes(out)


def _byterun1_decode(data: bytes, off: int, want: int) -> tuple[bytes, int]:
    out = bytearray()
    while len(out) < want:
        n = data[off]
        off += 1
        if n < 128:
            out += data[off:off + n + 1]
            off += n + 1
        elif n > 128:
            out += bytes([data[off]]) * (257 - n)
            off += 1
        # n == 128: no-op
    return bytes(out[:want]), off


def _ilbm_palette() -> list[tuple[int, int, int]]:
    return [((i * 37) % 256, (i * 81) % 256, (i * 151) % 256)
            for i in range(16)]


def encode_ilbm(idx: np.ndarray, compress: bool = True) -> bytes:
    """Genuine IFF ILBM bytes: FORM/BMHD/CMAP/BODY chunks, 4 interleaved
    bitplanes (MSB-first within each byte), rows padded to 16 bits,
    optional per-scanline ByteRun1 compression."""
    h, w = idx.shape
    planes = 4
    rowbytes = ((w + 15) // 16) * 2
    body = bytearray()
    for y in range(h):
        for p in range(planes):
            row = bytearray(rowbytes)
            for x in range(w):
                if (int(idx[y, x]) >> p) & 1:
                    row[x // 8] |= 0x80 >> (x % 8)
            body += _byterun1_encode(bytes(row)) if compress else row
    bmhd = struct.pack(">HHhhBBBBHBBhh", w, h, 0, 0, planes, 0,
                       1 if compress else 0, 0, 0, 10, 11, w, h)
    cmap = b"".join(bytes(c) for c in _ilbm_palette())

    def chunk(cid: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) % 2 else b""
        return cid + struct.pack(">I", len(data)) + data + pad

    inner = b"ILBM" + chunk(b"BMHD", bmhd) + chunk(b"CMAP", cmap) \
        + chunk(b"BODY", bytes(body))
    return b"FORM" + struct.pack(">I", len(inner)) + inner


def decode_ilbm(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Hand-rolled IFF walk: FORM/ILBM container, BMHD/CMAP/BODY chunks
    (even-padded), per-scanline ByteRun1 expansion, planar→chunky bit
    gather, palette lookup."""
    if payload[:4] != b"FORM" or payload[8:12] != b"ILBM":
        raise NotImplementedError("not an IFF ILBM payload")
    off = 12
    bmhd = cmap = body = None
    end = 8 + struct.unpack(">I", payload[4:8])[0]
    while off + 8 <= end:
        cid = payload[off:off + 4]
        ln = struct.unpack(">I", payload[off + 4:off + 8])[0]
        data = payload[off + 8:off + 8 + ln]
        if cid == b"BMHD":
            bmhd = data
        elif cid == b"CMAP":
            cmap = data
        elif cid == b"BODY":
            body = data
        off += 8 + ln + (ln % 2)
    if bmhd is None or body is None or cmap is None:
        raise NotImplementedError("missing BMHD/CMAP/BODY")
    w, h, _, _, planes, masking, comp = struct.unpack(">HHhhBBB", bmhd[:11])
    if masking != 0 or planes > 8:
        raise NotImplementedError("masked/deep ILBM not supported")
    rowbytes = ((w + 15) // 16) * 2
    pal = [tuple(cmap[i * 3:i * 3 + 3]) for i in range(len(cmap) // 3)]
    px = np.zeros((h, w, 3), np.uint8)
    off = 0
    for y in range(h):
        planes_rows = []
        for _p in range(planes):
            if comp == 1:
                row, off = _byterun1_decode(body, off, rowbytes)
            elif comp == 0:
                row = body[off:off + rowbytes]
                off += rowbytes
            else:
                raise NotImplementedError(f"ILBM compression {comp}")
            planes_rows.append(row)
        for x in range(w):
            v = 0
            for p in range(planes):
                if planes_rows[p][x // 8] & (0x80 >> (x % 8)):
                    v |= 1 << p
            px[y, x] = pal[v]
    return w, h, px


def synthetic_ilbm_media(spark: SparkSession, n: int = 24,
                         seed: int = 42) -> DataFrame:
    """Deterministic REAL ILBM table: 16-color index patterns with
    horizontal runs (ByteRun1 bites); even ids uncompressed, odd ids
    compressed."""
    rows = []
    for i in range(n):
        w = 17 + (i * 5 + seed) % 14
        h = 9 + (i * 7 + seed) % 8
        yy, xx = np.mgrid[0:h, 0:w]
        idx = (((xx // 4) * 3 + yy * 5 + i) % 16).astype(np.uint8)
        rows.append((i, "image", "image/x-ilbm",
                     bytearray(encode_ilbm(idx, compress=bool(i % 2))),
                     {}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# ───────────────── NetPBM ASCII (P1 / P2 / P3) ─────────────────

def encode_pnm_ascii(px: np.ndarray, kind: int, maxval: int = 255,
                     note: str = "synthetic") -> bytes:
    """Genuine ASCII netpbm bytes: P1 bitmap (no maxval, 1 = black),
    P2 graymap, P3 pixmap — with an embedded comment line and tokens
    wrapped at irregular widths so parsers can't rely on one-row-per-line
    layout."""
    h, w = px.shape[:2]
    toks = [str(int(v)) for v in px.reshape(-1)]
    lines, cur = [], []
    for t in toks:
        cur.append(t)
        if sum(len(x) + 1 for x in cur) > 35 + (kind * 7) % 17:
            lines.append(" ".join(cur))
            cur = []
    if cur:
        lines.append(" ".join(cur))
    hdr = f"P{kind}\n# {note}\n{w} {h}\n"
    if kind != 1:
        hdr += f"{maxval}\n"
    return (hdr + "\n".join(lines) + "\n").encode("ascii")


def decode_pnm_ascii(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Hand-rolled ASCII netpbm parse: a whitespace tokenizer that drops
    '#' comments to end-of-line ANYWHERE in the stream (the spec allows
    comments between any tokens), then P1 bits (1 = black → 0,
    0 = white → 255), or P2/P3 samples scaled v·255//maxval. Returns
    RGB like every other decoder."""
    kind = payload[:2]
    if kind not in (b"P1", b"P2", b"P3"):
        raise NotImplementedError("not an ASCII netpbm payload")
    toks: list[str] = []
    i, n = 2, len(payload)
    cur = bytearray()
    while i < n:
        b = payload[i]
        if b == 0x23:                                   # '#'
            while i < n and payload[i] != 0x0A:
                i += 1
            continue
        if b in (0x20, 0x09, 0x0A, 0x0D):
            if cur:
                toks.append(cur.decode("ascii"))
                cur = bytearray()
        else:
            cur.append(b)
        i += 1
    if cur:
        toks.append(cur.decode("ascii"))
    w, h = int(toks[0]), int(toks[1])
    if kind == b"P1":
        vals = np.array([int(t) for t in toks[2:2 + w * h]], np.int64)
        g = ((1 - vals) * 255).astype(np.uint8).reshape(h, w)
        return w, h, np.stack([g, g, g], axis=-1).copy()
    maxval = int(toks[2])
    depth = 1 if kind == b"P2" else 3
    vals = np.array([int(t) for t in toks[3:3 + w * h * depth]], np.int64)
    vals = (vals * 255 // maxval).astype(np.uint8)
    if depth == 1:
        g = vals.reshape(h, w)
        return w, h, np.stack([g, g, g], axis=-1).copy()
    return w, h, vals.reshape(h, w, 3).copy()


def synthetic_pnm_ascii_media(spark: SparkSession, n: int = 27,
                              seed: int = 42) -> DataFrame:
    """Deterministic ASCII netpbm table cycling P1/P2/P3; P2/P3 rows
    alternate maxval 255 and 15 (so the scaling path is exercised);
    pixels are pure formulas of (x, y, id)."""
    rows = []
    for i in range(n):
        w = 9 + (i * 5 + seed) % 11
        h = 7 + (i * 3 + seed) % 9
        yy, xx = np.mgrid[0:h, 0:w]
        kind = 1 + i % 3
        maxval = 15 if i % 2 == 0 else 255
        if kind == 1:
            px = ((xx + yy + i) % 2).astype(np.uint8)
        elif kind == 2:
            px = ((xx * 5 + yy * 9 + i * 3) % (maxval + 1)).astype(np.uint8)
        else:
            px = np.stack([
                (xx * 2 + yy * 13 + i) % (maxval + 1),
                (xx * 11 + yy * 3 + i * 5) % (maxval + 1),
                (xx + yy * 7 + i * 9) % (maxval + 1),
            ], axis=-1).astype(np.uint8)
        rows.append((i, "image", "image/x-portable-anymap-ascii",
                     bytearray(encode_pnm_ascii(px, kind, maxval)), {}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
