"""Punycode / Bootstring decoding (RFC 3492) — the IDNA wire format
that smuggles full Unicode through the DNS's a-z0-9 alphabet. The
decoder here is HAND-ROLLED from the RFC's state machine (generalized
variable-length integers in a bias-adapted base-36, one Unicode code
point materializing per delimiter digit, inserted at a position the
accumulated delta encodes): basic code points ride before the LAST
hyphen-minus, every extended char updates (i, w, k) and a code point
completes when its digit undershoots the bias-clamped threshold
t = max(1, min(26, k - bias)); the bias then re-adapts via the RFC's
damped division cascade. Python's stdlib `punycode` codec serves as
the independent golden oracle in fixtures and tests — the engines
never call it on the decode path.

Fixture labels mix Greek, Cyrillic and CJK code points with plain
ASCII (including pure-ASCII labels, whose encodings end in the bare
delimiter and decode with ZERO extended steps, and delimiter-bearing
originals, which exercise the last-hyphen rule).
"""

from __future__ import annotations

import hashlib

BASE, TMIN, TMAX, SKEW, DAMP = 36, 1, 26, 38, 700
INITIAL_BIAS, INITIAL_N = 72, 128


def _adapt(delta: int, numpoints: int, firsttime: bool) -> int:
    delta = delta // DAMP if firsttime else delta // 2
    delta += delta // numpoints
    k = 0
    while delta > ((BASE - TMIN) * TMAX) // 2:      # 455
        delta //= BASE - TMIN                        # // 35
        k += BASE
    return k + (BASE - TMIN + 1) * delta // (delta + SKEW)


def bootstring_decode(enc: str) -> str:
    """RFC 3492 section 6.2, verbatim state machine."""
    if "-" in enc:
        cut = enc.rindex("-")
        out = list(enc[:cut])
        ext = enc[cut + 1:]
    else:
        out, ext = [], enc
    n, i, bias = INITIAL_N, 0, INITIAL_BIAS
    p = 0
    while p < len(ext):
        oldi, w, k = i, 1, BASE
        while True:
            c = ext[p]
            p += 1
            digit = ord(c) - 97 if c >= "a" else ord(c) - 22
            i += digit * w
            t = max(TMIN, min(TMAX, k - bias))
            if digit < t:
                break
            w *= BASE - t
            k += BASE
        length = len(out) + 1
        bias = _adapt(i - oldi, length, oldi == 0)
        n += i // length
        i %= length
        out.insert(i, chr(n))
        i += 1
    return "".join(out)


def puny_labels(n: int = 24, seed: int = 42) -> list[tuple]:
    """Deterministic fixture: (label_id, encoded, n_basic, stdlib_md5)
    where `encoded` comes from Python's stdlib punycode codec and
    stdlib_md5 pins the ORIGINAL string the decoders must recover."""
    rows = []
    for i in range(n):
        if i % 6 == 0:
            s = "plain%d" % i                        # pure ASCII
        elif i % 6 == 1:
            s = "a-b%d" % i + chr(0x3B1 + i % 24)    # hyphen original
        else:
            s = ("kg%d" % (i % 7)
                 + chr(0x3B1 + (i * 5) % 24)         # Greek
                 + chr(0x430 + (i * 7) % 30)         # Cyrillic
                 + (chr(0x4E00 + (i * 37) % 500)     # CJK
                    if i % 3 == 0 else "")
                 + "x" * (i % 3))
        enc = s.encode("punycode").decode("ascii")
        cut = enc.rindex("-") if "-" in enc else -1
        rows.append((i, enc, cut if cut >= 0 else 0,
                     hashlib.md5(s.encode("utf-8")).hexdigest()))
    return rows
