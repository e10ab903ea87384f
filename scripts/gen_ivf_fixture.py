#!/usr/bin/env python
"""Generate knowledge_extraction_pipeline_spark/ivf_fixture.py: the expected
output of ann_ivf_topk (operators/similarity.ivf_topk, k=10, n_centroids=8,
n_probe=2) over the driver's embeddings tables, evaluated SINGLE-PROCESS in
plain Python — no Spark, no numpy vector ops — as an independent oracle for
the distributed plan (the same fixture technique as the semantic-chunk and
reference-graph oracles in gen_ref_fixture.py).

Value-exactness rests on the operator's reproducible-by-construction spec:
  * seeding: the n_centroids ids with smallest int.from_bytes(
    md5(f"{seed}:{id}")[:8], 'big') — engine-portable;
  * centroid updates: fixed-point scaled longs floor(x*1e6+0.5), exact
    integer sums, new coordinate (sum // count)/1e6 — exact integer floor division;
  * assignment / final scoring: sequential left-to-right double dot (the
    same order F.aggregate(zip_with(...)) evaluates), cosine rounded to
    6 dp with Java's BigDecimal.valueOf HALF_UP semantics — mirrored here
    via Decimal(repr(x)) (both use shortest round-trip decimal repr).

Regenerate with:  python scripts/gen_ivf_fixture.py
(only needed if the testdata embeddings or the registered query params change)
"""

from __future__ import annotations

import hashlib
import math
from decimal import ROUND_HALF_UP, Decimal
from pathlib import Path

FXP = 1_000_000.0
SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
           "/root/testdata/sf0.1"]


def r6(x: float) -> float:
    """Spark F.round(double, 6): BigDecimal.valueOf(x).setScale(6, HALF_UP).
    BigDecimal.valueOf uses Double.toString (shortest round-trip), which is
    exactly Python's repr."""
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"),
                                           rounding=ROUND_HALF_UP))


def dotp(a: list[float], b: list[float]) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def nrm(a: list[float]) -> float:
    acc = 0.0
    for x in a:
        acc += x * x
    return math.sqrt(acc)


def cos_raw(a: list[float], b: list[float]) -> float:
    # mirrors ivf_topk's python-side probe scorer (na/nb zero guard included)
    na, nb = nrm(a), nrm(b)
    return dotp(a, b) / (na * nb) if na and nb else 0.0


def ivf_topk_single_process(ids, vecs, query_ids, k=10, n_centroids=8,
                            n_probe=2, n_iters=2, seed=42):
    byid = dict(zip(ids, vecs))

    def h(i):
        return int.from_bytes(
            hashlib.md5(f"{seed}:{i}".encode()).digest()[:8], "big")

    seed_ids = [i for _, i in sorted((h(i), i) for i in ids)[:n_centroids]]
    cbook = {c: [int(math.floor(x * FXP + 0.5)) for x in byid[i]]
             for c, i in enumerate(seed_ids)}

    def assign(cb):
        cdub = {c: [x / FXP for x in coords] for c, coords in cb.items()}
        out = {}
        for i in ids:
            out[i] = min(cdub, key=lambda c: (-r6(dotp(byid[i], cdub[c])
                                                  / (nrm(byid[i]) * nrm(cdub[c]))), c))
        return out

    for _ in range(n_iters):
        asn = assign(cbook)
        sums, cnts = {}, {}
        for i, c in asn.items():
            cnts[c] = cnts.get(c, 0) + 1
            s = sums.setdefault(c, [0] * len(byid[i]))
            for p, x in enumerate(byid[i]):
                s[p] += int(math.floor(x * FXP + 0.5))
        cbook = {c: ([s // cnts[c] for s in sums[c]]
                     if c in sums else coords)
                 for c, coords in cbook.items()}

    asn = assign(cbook)
    centroids = [(c, [x / FXP for x in coords])
                 for c, coords in sorted(cbook.items())]

    rows = []
    for q in query_ids:
        qv = byid[q]
        probed = [c for c, _ in sorted(
            centroids, key=lambda t: (-cos_raw(qv, t[1]), t[0]))[:n_probe]]
        cands = [i for i in ids if asn[i] in probed and i != q]
        scored = sorted(((r6(dotp(byid[i], qv) / (nrm(byid[i]) * nrm(qv))), i)
                         for i in cands), key=lambda t: (-t[0], t[1]))
        for rank, (cos, i) in enumerate(scored[:k], start=1):
            rows.append((int(q), int(i), cos, rank))
    return rows


def pq_topk_single_process(ids, vecs, query_ids, k=10, m=8, n_codes=16,
                           shortlist=100, n_iters=2, seed=42):
    """Single-process mirror of operators/similarity.pq_topk: normalize →
    md5-seeded per-subspace k-means (fixed-point means, 6-dp-rounded argmin)
    → codes → per-query ADC tables (python round, same as the operator's
    driver-side tables) → shortlist by (adc r6, id) → exact cosine re-rank
    on the RAW vectors."""
    dim = len(vecs[0])
    sub = dim // m
    byid_raw = dict(zip(ids, vecs))

    def l2n(v):
        n = nrm(v)
        return [x / n for x in v] if n else list(v)

    byid = {i: l2n(v) for i, v in byid_raw.items()}

    def h(i):
        return int.from_bytes(
            hashlib.md5(f"{seed}:{i}".encode()).digest()[:8], "big")

    seed_ids = [i for _, i in sorted((h(i), i) for i in ids)[:n_codes]]
    books = {(j, c): [int(math.floor(x * FXP + 0.5))
                      for x in byid[si][j * sub:(j + 1) * sub]]
             for j in range(m) for c, si in enumerate(seed_ids)}

    def d2_r6(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += (x - y) * (x - y)
        return r6(acc)

    def assign(bk):
        bd = {key: [x / FXP for x in coords] for key, coords in bk.items()}
        out = {}
        for i in ids:
            for j in range(m):
                sv = byid[i][j * sub:(j + 1) * sub]
                out[(i, j)] = min(range(n_codes),
                                  key=lambda c: (d2_r6(sv, bd[(j, c)]), c))
        return out

    for _ in range(n_iters):
        asn = assign(books)
        sums, cnts = {}, {}
        for (i, j), c in asn.items():
            key = (j, c)
            cnts[key] = cnts.get(key, 0) + 1
            s = sums.setdefault(key, [0] * sub)
            for p, x in enumerate(byid[i][j * sub:(j + 1) * sub]):
                s[p] += int(math.floor(x * FXP + 0.5))
        books = {key: ([s // cnts[key] for s in sums[key]]
                       if key in sums else coords)
                 for key, coords in books.items()}

    asn = assign(books)
    bd = {key: [x / FXP for x in coords] for key, coords in books.items()}

    rows = []
    for q in query_ids:
        qn = byid[q]
        # the operator's driver-side table uses python round(d, 6) on the
        # raw sum — mirror that exactly (not r6):
        # fixed-point long table entries (×10⁶), matching the operator's
        # _adc_tables: the engine sums the m entries with F.sum whose order
        # depends on partitioning, so both sides sum INTEGERS and divide once
        tables = {}
        for j in range(m):
            qs = qn[j * sub:(j + 1) * sub]
            for c in range(n_codes):
                acc = 0.0
                for x, y in zip(qs, bd[(j, c)]):
                    acc += (x - y) * (x - y)
                tables[(j, c)] = int(round(round(acc, 6) * 1e6))
        adc = {}
        for i in ids:
            if i == q:
                continue
            acc = 0
            for j in range(m):
                acc += tables[(j, asn[(i, j)])]
            adc[i] = r6(acc / 1e6)
        short = sorted(adc, key=lambda i: (adc[i], i))[:shortlist]
        scored = sorted(
            ((r6(dotp(byid_raw[i], byid_raw[q])
                 / (nrm(byid_raw[i]) * nrm(byid_raw[q]))), i) for i in short),
            key=lambda t: (-t[0], t[1]))
        for rank, (cos, i) in enumerate(scored[:k], start=1):
            rows.append((int(q), int(i), cos, rank))
    return rows


def pq_distortion_single_process(ids, vecs, m=8, n_codes=16, n_iters=2,
                                 seed=42):
    """Single-process mirror of operators/similarity.pq_distortion: train
    the SAME codebooks as pq_topk_single_process, then per (vector,
    subspace) take the 6-dp-rounded assignment distance and aggregate per
    subspace as exact floor(d2·1e6+0.5) integers."""
    dim = len(vecs[0])
    sub = dim // m
    byid_raw = dict(zip(ids, vecs))

    def l2n(v):
        n = nrm(v)
        return [x / n for x in v] if n else list(v)

    byid = {i: l2n(v) for i, v in byid_raw.items()}

    def h(i):
        return int.from_bytes(
            hashlib.md5(f"{seed}:{i}".encode()).digest()[:8], "big")

    seed_ids = [i for _, i in sorted((h(i), i) for i in ids)[:n_codes]]
    books = {(j, c): [int(math.floor(x * FXP + 0.5))
                      for x in byid[si][j * sub:(j + 1) * sub]]
             for j in range(m) for c, si in enumerate(seed_ids)}

    def d2_r6(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += (x - y) * (x - y)
        return r6(acc)

    def assign(bk, with_dist=False):
        bd = {key: [x / FXP for x in coords] for key, coords in bk.items()}
        out = {}
        for i in ids:
            for j in range(m):
                sv = byid[i][j * sub:(j + 1) * sub]
                c = min(range(n_codes),
                        key=lambda c: (d2_r6(sv, bd[(j, c)]), c))
                out[(i, j)] = ((c, d2_r6(sv, bd[(j, c)]))
                               if with_dist else c)
        return out

    for _ in range(n_iters):
        asn = assign(books)
        sums, cnts = {}, {}
        for (i, j), c in asn.items():
            key = (j, c)
            cnts[key] = cnts.get(key, 0) + 1
            s = sums.setdefault(key, [0] * sub)
            for p, x in enumerate(byid[i][j * sub:(j + 1) * sub]):
                s[p] += int(math.floor(x * FXP + 0.5))
        books = {key: ([s // cnts[key] for s in sums[key]]
                       if key in sums else coords)
                 for key, coords in books.items()}

    asn = assign(books, with_dist=True)
    agg = {}
    for (i, j), (_c, d2) in asn.items():
        n, s = agg.get(j, (0, 0))
        agg[j] = (n + 1, s + int(math.floor(d2 * 1e6 + 0.5)))
    return [(j, n, s, s // n) for j, (n, s) in sorted(agg.items())]


def ivfpq_residual_single_process(ids, vecs, query_ids, k=10, n_centroids=8,
                                  n_probe=2, m=8, n_codes=16, shortlist=100,
                                  n_iters=2, seed=42):
    """Single-process mirror of operators/similarity.ivf_pq_residual_topk
    (true IVFADC): coarse k-means on raw-cosine (identical to
    ivf_topk_single_process) → residuals r = l2n(v) − centroid → PQ trained
    on residuals WITHOUT re-normalization → per-(query, probed-list) ADC
    tables over the query residual (fixed-point longs) → shortlist by
    (adc r6, id) → exact cosine re-rank on the RAW vectors."""
    byid_raw = dict(zip(ids, vecs))

    def h(i):
        return int.from_bytes(
            hashlib.md5(f"{seed}:{i}".encode()).digest()[:8], "big")

    # ── coarse quantizer: byte-identical to ivf_topk_single_process ──
    seed_ids = [i for _, i in sorted((h(i), i) for i in ids)[:n_centroids]]
    cbook = {c: [int(math.floor(x * FXP + 0.5)) for x in byid_raw[i]]
             for c, i in enumerate(seed_ids)}

    def cassign(cb):
        cdub = {c: [x / FXP for x in coords] for c, coords in cb.items()}
        out = {}
        for i in ids:
            out[i] = min(cdub, key=lambda c: (
                -r6(dotp(byid_raw[i], cdub[c])
                    / (nrm(byid_raw[i]) * nrm(cdub[c]))), c))
        return out

    for _ in range(n_iters):
        asn_c = cassign(cbook)
        sums, cnts = {}, {}
        for i, c in asn_c.items():
            cnts[c] = cnts.get(c, 0) + 1
            s = sums.setdefault(c, [0] * len(byid_raw[i]))
            for p, x in enumerate(byid_raw[i]):
                s[p] += int(math.floor(x * FXP + 0.5))
        cbook = {c: ([s // cnts[c] for s in sums[c]] if c in sums else coords)
                 for c, coords in cbook.items()}
    asn_c = cassign(cbook)
    cdub = {c: [x / FXP for x in coords] for c, coords in sorted(cbook.items())}

    # ── residuals (NOT re-normalized) ──
    def l2n(v):
        n = nrm(v)
        return [x / n for x in v] if n else list(v)

    byid = {i: [a - b for a, b in zip(l2n(v), cdub[asn_c[i]])]
            for i, v in byid_raw.items()}

    dim = len(vecs[0])
    sub = dim // m

    # ── PQ on residuals: same machinery as pq_topk_single_process ──
    pq_seed_ids = [i for _, i in sorted((h(i), i) for i in ids)[:n_codes]]
    books = {(j, c): [int(math.floor(x * FXP + 0.5))
                      for x in byid[si][j * sub:(j + 1) * sub]]
             for j in range(m) for c, si in enumerate(pq_seed_ids)}

    def d2_r6(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += (x - y) * (x - y)
        return r6(acc)

    def assign(bk):
        bd = {key: [x / FXP for x in coords] for key, coords in bk.items()}
        out = {}
        for i in ids:
            for j in range(m):
                sv = byid[i][j * sub:(j + 1) * sub]
                out[(i, j)] = min(range(n_codes),
                                  key=lambda c: (d2_r6(sv, bd[(j, c)]), c))
        return out

    for _ in range(n_iters):
        asn = assign(books)
        sums, cnts = {}, {}
        for (i, j), c in asn.items():
            key = (j, c)
            cnts[key] = cnts.get(key, 0) + 1
            s = sums.setdefault(key, [0] * sub)
            for p, x in enumerate(byid[i][j * sub:(j + 1) * sub]):
                s[p] += int(math.floor(x * FXP + 0.5))
        books = {key: ([s // cnts[key] for s in sums[key]]
                       if key in sums else coords)
                 for key, coords in books.items()}
    asn = assign(books)
    bd = {key: [x / FXP for x in coords] for key, coords in books.items()}

    rows = []
    for qid in query_ids:
        qv = byid_raw[qid]
        qn = l2n(qv)
        probed = [c for c, _ in sorted(
            ((c, v) for c, v in cdub.items()),
            key=lambda t: (-cos_raw(qv, t[1]), t[0]))[:n_probe]]
        # per-(probed list) ADC tables over the query residual, fixed-point
        tables = {}
        for c in probed:
            qr = [a - b for a, b in zip(qn, cdub[c])]
            for j in range(m):
                qs = qr[j * sub:(j + 1) * sub]
                for code in range(n_codes):
                    acc = 0.0
                    for x, y in zip(qs, bd[(j, code)]):
                        acc += (x - y) * (x - y)
                    # HALF_UP at the shortest repr — mirrors the operator's
                    # driver table build AND F.round in its DataFrame build
                    tables[(c, j, code)] = int(
                        Decimal(repr(acc)).quantize(
                            Decimal("0.000001"),
                            rounding=ROUND_HALF_UP) * 1_000_000)
        adc = {}
        for i in ids:
            if i == qid or asn_c[i] not in probed:
                continue
            acc = 0
            for j in range(m):
                acc += tables[(asn_c[i], j, asn[(i, j)])]
            adc[i] = r6(acc / 1e6)
        short = sorted(adc, key=lambda i: (adc[i], i))[:shortlist]
        scored = sorted(
            ((r6(dotp(byid_raw[i], qv) / (nrm(byid_raw[i]) * nrm(qv))), i)
             for i in short), key=lambda t: (-t[0], t[1]))
        for rank, (cos, i) in enumerate(scored[:k], start=1):
            rows.append((int(qid), int(i), cos, rank))
    return rows


def main():
    import pyarrow.parquet as pq

    out_rows = {}
    pq_rows = {}
    res_rows = {}
    dist_rows = {}
    for d in SF_DIRS:
        tbl = pq.read_table(f"{d}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
        ids = tbl.column("vec_id").to_pylist()
        vecs = tbl.column("embedding").to_pylist()  # float32 → exact doubles
        sf = d.rstrip("/").rsplit("sf", 1)[-1]
        out_rows[sf] = ivf_topk_single_process(ids, vecs, [0, 1, 2])
        pq_rows[sf] = pq_topk_single_process(ids, vecs, [0, 1, 2],
                                             m=16, n_codes=16, shortlist=100)
        res_rows[sf] = ivfpq_residual_single_process(
            ids, vecs, [0, 1, 2], n_centroids=8, n_probe=2,
            m=16, n_codes=16, shortlist=100)
        dist_rows[sf] = pq_distortion_single_process(ids, vecs,
                                                     m=16, n_codes=16)
        print(f"sf{sf}: {len(out_rows[sf])} ivf rows, {len(pq_rows[sf])} pq "
              f"rows, {len(res_rows[sf])} ivfpq-residual rows, "
              f"{len(dist_rows[sf])} pq-distortion rows")

    out = Path(__file__).resolve().parents[1] / \
        "knowledge_extraction_pipeline_spark" / "ivf_fixture.py"
    with out.open("w") as f:
        f.write('"""GENERATED by scripts/gen_ivf_fixture.py — do not edit.\n\n')
        f.write("Expected ann_ivf_topk output (k=10, n_centroids=8, n_probe=2,\n")
        f.write("queries vec_id 0/1/2) and ann_pq_topk output (k=10, m=16,\n")
        f.write("n_codes=16, shortlist=100, same queries) per testdata scale\n")
        f.write("factor, evaluated single-process in plain Python (see\n")
        f.write("generator docstring).\n")
        f.write('"""\n\n')
        f.write("# sf -> [(query_id, id, cos, rank), ...]\n")
        f.write(f"IVF_TOPK = {out_rows!r}\n\n")
        f.write("# sf -> [(query_id, id, cos, rank), ...]\n")
        f.write(f"PQ_TOPK = {pq_rows!r}\n\n")
        f.write("# sf -> [(query_id, id, cos, rank), ...] — true IVFADC\n")
        f.write("# (residual-quantized IVF-PQ, n_centroids=8, n_probe=2,\n")
        f.write("# m=16, n_codes=16, shortlist=100)\n")
        f.write(f"IVFPQ_RESIDUAL_TOPK = {res_rows!r}\n\n")
        f.write("# sf -> [(subspace, n_vectors, sum_d2_e6, avg_d2_e6), ...]\n")
        f.write("# per-subspace PQ assignment distortion (m=16, n_codes=16)\n")
        f.write(f"PQ_DISTORTION = {dist_rows!r}\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
