"""Baseline JPEG codec in pure Python + numpy — no libjpeg. Supports the
format that dominates real training corpora: baseline sequential DCT
(SOF0), 8-bit, 1 or 3 components, 4:4:4 and 4:2:0 chroma subsampling,
restart markers, byte stuffing. Progressive (SOF2), arithmetic coding and
12-bit stay NotImplementedError.

Decode pipeline: marker parse (DQT/DHT/SOF0/SOS) → Huffman entropy decode
per MCU (DC predictor + run/size AC with EOB/ZRL) → dequantize → de-zigzag
→ 8×8 IDCT (numpy, orthonormal DCT-III) → level shift/clamp → chroma
upsample (replication) → BT.601 YCbCr→RGB.

The encoder exists to fabricate genuine test bytes (Annex-K quantization
tables scaled by quality, Annex-K Huffman tables): JPEG is lossy, so the
correctness contract is round-trip PSNR plus an exact constant-block case,
not bit equality.
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# ITU-T T.81 Annex K reference tables
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

DC_LUMA_BITS = [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _build_huff(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) using T.81's canonical code assignment."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_huff_decode(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol for the decoder."""
    enc = _build_huff(bits, vals)
    return {(ln, code): sym for sym, (code, ln) in enc.items()}


# orthonormal 8x8 DCT-II basis; IDCT is its transpose
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16) * \
            (np.sqrt(0.125) if _k == 0 else 0.5)


def _dct2(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


def _idct2(coef: np.ndarray) -> np.ndarray:
    return _C.T @ coef @ _C


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    quality = max(1, min(100, quality))
    s = 5000 // quality if quality < 50 else 200 - quality * 2
    t = np.clip((q * s + 50) // 100, 1, 255)
    return t.astype(np.int32)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                b = self.acc & 255
                self.out.append(b)
                if b == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.write(1, 1)  # pad with 1-bits per spec


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy stream exhausted")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise ValueError("unexpected marker in entropy data")
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map t raw bits to a signed coefficient."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _enc_coeff(v: int) -> tuple[int, int]:
    """signed value → (category, raw bits) inverse of EXTEND."""
    t = _category(v)
    return t, (v if v >= 0 else v + (1 << t) - 1)


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y, cb, cr) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)),
                   0, 255).astype(np.uint8)


def _block_at(plane: np.ndarray, by: int, bx: int) -> np.ndarray:
    """8x8 block at block coords with edge replication past the border."""
    h, w = plane.shape
    ys = np.clip(np.arange(by * 8, by * 8 + 8), 0, h - 1)
    xs = np.clip(np.arange(bx * 8, bx * 8 + 8), 0, w - 1)
    return plane[np.ix_(ys, xs)]


def encode_jpeg(rgb: np.ndarray, quality: int = 90,
                subsample: str = "444") -> bytes:
    """Baseline JFIF writer: 8-bit RGB (HxWx3) or grayscale (HxW),
    Annex-K tables scaled by `quality`, 4:4:4 or 4:2:0."""
    gray = rgb.ndim == 2
    h, w = rgb.shape[:2]
    qy = _quality_scale(QUANT_LUMA, quality)
    qc = _quality_scale(QUANT_CHROMA, quality)
    if gray:
        planes = [rgb.astype(np.float64)]
        samp = [(1, 1)]
        qmap, dcmap, acmap = [0], [0], [0]
    else:
        ycc = _rgb_to_ycbcr(rgb)
        y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
        if subsample == "420":
            ph, pw = (h + 1) // 2 * 2, (w + 1) // 2 * 2
            pad = np.zeros((ph, pw))

            def ds(p):
                full = np.empty((ph, pw))
                full[:h, :w] = p
                full[h:, :w] = p[h - 1:, :]
                full[:h, w:] = p[:, w - 1:]
                full[h:, w:] = p[h - 1, w - 1]
                return (full[0::2, 0::2] + full[0::2, 1::2]
                        + full[1::2, 0::2] + full[1::2, 1::2]) / 4.0
            del pad
            planes = [y, ds(cb), ds(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        elif subsample == "444":
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]
        else:
            raise ValueError(f"subsample {subsample!r} not in (444, 420)")
        qmap, dcmap, acmap = [0, 1, 1], [0, 1, 1], [0, 1, 1]
    qtabs = [qy, qc]
    dct_enc = [_build_huff(DC_LUMA_BITS, DC_LUMA_VALS),
               _build_huff(DC_CHROMA_BITS, DC_CHROMA_VALS)]
    act_enc = [_build_huff(AC_LUMA_BITS, AC_LUMA_VALS),
               _build_huff(AC_CHROMA_BITS, AC_CHROMA_VALS)]

    maxh = max(s[0] for s in samp)
    maxv = max(s[1] for s in samp)
    mcux = (w + 8 * maxh - 1) // (8 * maxh)
    mcuy = (h + 8 * maxv - 1) // (8 * maxv)

    bw = _BitWriter()
    pred = [0] * len(planes)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, plane in enumerate(planes):
                sh, sv = samp[ci]
                q = qtabs[qmap[ci]].reshape(8, 8)
                for v in range(sv):
                    for hh in range(sh):
                        blk = _block_at(plane, my * sv + v, mx * sh + hh)
                        coef = _dct2(blk - 128.0) / q
                        zz = np.where(coef >= 0, np.floor(coef + 0.5),
                                      -np.floor(-coef + 0.5)) \
                            .astype(np.int32).reshape(-1)[ZIGZAG]
                        dc = int(zz[0])
                        diff = dc - pred[ci]
                        pred[ci] = dc
                        t, bits_ = _enc_coeff(diff)
                        code, ln = dct_enc[dcmap[ci]][t]
                        bw.write(code, ln)
                        if t:
                            bw.write(bits_, t)
                        run = 0
                        last_nz = max(
                            (k for k in range(1, 64) if zz[k]), default=0)
                        for k in range(1, last_nz + 1):
                            if zz[k] == 0:
                                run += 1
                                continue
                            while run >= 16:
                                code, ln = act_enc[acmap[ci]][0xF0]
                                bw.write(code, ln)
                                run -= 16
                            t, bits_ = _enc_coeff(int(zz[k]))
                            code, ln = act_enc[acmap[ci]][(run << 4) | t]
                            bw.write(code, ln)
                            bw.write(bits_, t)
                            run = 0
                        if last_nz < 63:
                            code, ln = act_enc[acmap[ci]][0x00]
                            bw.write(code, ln)
    bw.flush()

    out = bytearray(b"\xFF\xD8")

    def seg(marker: int, payload: bytes):
        out.extend(struct.pack(">BBH", 0xFF, marker, len(payload) + 2))
        out.extend(payload)

    for tid, q in enumerate(qtabs[: 1 if gray else 2]):
        seg(0xDB, bytes([tid]) + bytes(int(x) for x in q))
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], qmap[ci]])
    seg(0xC0, sof)
    huffs = [(0x00, DC_LUMA_BITS, DC_LUMA_VALS),
             (0x10, AC_LUMA_BITS, AC_LUMA_VALS)]
    if not gray:
        huffs += [(0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
                  (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS)]
    for tc, bits_, vals in huffs:
        seg(0xC4, bytes([tc]) + bytes(bits_[1:]) + bytes(vals))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, (dcmap[ci] << 4) | acmap[ci]])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)
    out.extend(bw.out)
    out.extend(b"\xFF\xD9")
    return bytes(out)


def decode_jpeg(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Baseline JFIF reader → (width, height, HxWx3 RGB). Grayscale
    replicates Y into three channels. Restart markers supported;
    progressive/arithmetic/12-bit raise NotImplementedError."""
    if payload[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    comps = None
    h = w = None
    restart_interval = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = payload[pos + 1]
        if marker in (0xC2, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                      0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF 0x{marker:02X} unsupported (baseline SOF0 only)")
        ln = struct.unpack_from(">H", payload, pos + 2)[0]
        body = payload[pos + 4:pos + 2 + ln]
        if marker == 0xDB:
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 15
                if pq:
                    raise NotImplementedError("16-bit quant tables")
                qtabs[tq] = np.frombuffer(
                    body, np.uint8, 64, p + 1).astype(np.int32)
                p += 65
        elif marker == 0xC4:
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 15
                bits_ = [0] + list(body[p + 1:p + 17])
                n = sum(bits_)
                vals = list(body[p + 17:p + 17 + n])
                tab = _build_huff_decode(bits_, vals)
                (ac_tabs if tc else dc_tabs)[th] = tab
                p += 17 + n
        elif marker == 0xC0:
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError("12-bit JPEG")
            comps = []
            for ci in range(nc):
                cid, sf, tq = body[6 + 3 * ci:9 + 3 * ci]
                comps.append({"id": cid, "h": sf >> 4, "v": sf & 15,
                              "tq": tq})
        elif marker == 0xDD:
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:
            ns = body[0]
            sel = {}
            for k in range(ns):
                cid, tt = body[1 + 2 * k], body[2 + 2 * k]
                sel[cid] = (tt >> 4, tt & 15)
            data_start = pos + 2 + ln
            return _decode_scan(payload, data_start, comps, sel, qtabs,
                                dc_tabs, ac_tabs, h, w, restart_interval)
        pos += 2 + ln
    raise ValueError("JPEG without SOS")


def _decode_scan(payload, start, comps, sel, qtabs, dc_tabs, ac_tabs,
                 h, w, restart_interval):
    # entropy data runs to EOI; split out restart markers
    segs = []
    cur = bytearray()
    p = start
    while p < len(payload):
        b = payload[p]
        if b == 0xFF and p + 1 < len(payload):
            m = payload[p + 1]
            if m == 0x00:
                cur += b"\xFF\x00"
                p += 2
                continue
            if 0xD0 <= m <= 0xD7:
                segs.append(bytes(cur))
                cur = bytearray()
                p += 2
                continue
            if m == 0xD9:
                break
            raise ValueError(f"unexpected marker 0xFF{m:02X} in scan")
        cur.append(b)
        p += 1
    segs.append(bytes(cur))

    maxh = max(c["h"] for c in comps)
    maxv = max(c["v"] for c in comps)
    mcux = (w + 8 * maxh - 1) // (8 * maxh)
    mcuy = (h + 8 * maxv - 1) // (8 * maxv)
    planes = [np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8))
              for c in comps]
    pred = [0] * len(comps)
    seg_i = 0
    rd = _BitReader(segs[0])
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if (restart_interval and n_mcu
                    and n_mcu % restart_interval == 0):
                seg_i += 1
                rd = _BitReader(segs[seg_i])
                pred = [0] * len(comps)
            n_mcu += 1
            for ci, c in enumerate(comps):
                dtab = dc_tabs[sel[c["id"]][0]]
                atab = ac_tabs[sel[c["id"]][1]]
                q = qtabs[c["tq"]]
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        t = rd.huff(dtab)
                        diff = _extend(rd.bits(t), t) if t else 0
                        pred[ci] += diff
                        zz = np.zeros(64, np.int32)
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = rd.huff(atab)
                            if rs == 0x00:
                                break
                            if rs == 0xF0:
                                k += 16
                                continue
                            k += rs >> 4
                            t = rs & 15
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(rd.bits(t), t)
                            k += 1
                        coef = np.zeros(64, np.float64)
                        coef[ZIGZAG] = zz * q
                        blk = _idct2(coef.reshape(8, 8)) + 128.0
                        by, bx = my * c["v"] + v, mx * c["h"] + hh
                        planes[ci][by * 8:by * 8 + 8,
                                   bx * 8:bx * 8 + 8] = blk
    if len(comps) == 1:
        y = np.clip(np.round(planes[0][:h, :w]), 0, 255).astype(np.uint8)
        return w, h, np.stack([y, y, y], axis=-1)
    up = []
    for ci, c in enumerate(comps):
        fy, fx = maxv // c["v"], maxh // c["h"]
        pl = np.repeat(np.repeat(planes[ci], fy, axis=0), fx, axis=1)
        up.append(pl[:h, :w])
    return w, h, _ycbcr_to_rgb(up[0], up[1], up[2])
