"""Vector scalar functions over array<float|double> columns — all JVM-side
higher-order functions (F.zip_with / F.aggregate), no Python in the hot path.

Reference analog: dense-pair cosine at entity_resolver.py:180-217 and the
blocked matrix cosine at entity_resolver.py:401-419.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def l2_normalize(a: Column) -> Column:
    n = norm(a)
    return F.transform(a, lambda x: x / n)


def lsh_planes(num_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: component (p, d) derives from
    md5(f"{seed}:{p}:{d}") — md5 is universal, so ANY engine (the DuckDB
    oracle included) can recompute the identical planes; here they are
    embedded as literals, so bucketing costs one dot product per plane with
    zero per-row hashing."""
    import hashlib

    return [
        [((int.from_bytes(hashlib.md5(f"{seed}:{p}:{d}".encode()).digest()[:8],
                          "big") % 2001) - 1000) / 1000.0
         for d in range(dim)]
        for p in range(num_planes)
    ]


def lsh_bucket(a: Column, num_planes: int = 8, seed: int = 42,
               dim: int | None = None) -> Column:
    """Sign-random-projection (SimHash-for-vectors) bucket id: one bit per
    pseudo-random hyperplane. Deterministic, no stored model, reproducible
    across executors.

    With `dim` given, planes are md5-derived literal arrays (lsh_planes) —
    constant-folded, SQL-mirrorable, no per-row hash calls. Without it, the
    planes are computed per row from xxhash64(seed, p, d) (dimension-agnostic
    fallback for callers that cannot know the vector width statically).

    Used to bucket embeddings so ANN joins become per-bucket instead of a full
    cross join (the scale path; brute force is the correctness baseline)."""
    bits = []
    if dim is not None:
        for p, plane in enumerate(lsh_planes(num_planes, dim, seed)):
            lit = F.array(*[F.lit(x) for x in plane])
            proj = F.aggregate(F.zip_with(a, lit, lambda x, y: x * y),
                               F.lit(0.0), lambda acc, x: acc + x)
            bits.append(F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
    else:
        # plane p component d = (xxhash64(seed,p,d) % 2001)/1000 ∈ (-2, 2)
        # (signed mod) — a cheap deterministic pseudo-gaussian, per row.
        dims = F.sequence(F.lit(1), F.size(a))
        for p in range(num_planes):
            comp = F.zip_with(
                a, dims,
                lambda x, d: x * ((F.xxhash64(F.lit(seed), F.lit(p), d) % 2001)
                                  .cast("double") / 1000.0),
            )
            proj = F.aggregate(comp, F.lit(0.0), lambda acc, x: acc + x)
            bits.append(F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    if dim is not None:
        # guard: zip_with null-pads on a length mismatch, which would turn
        # every projection null → every bit 0 → ALL vectors in bucket 0 and
        # the bucketed join silently degrades to O(n²). Fail loudly instead.
        out = (F.when(F.size(a) == F.lit(dim), out)
               .otherwise(F.raise_error(F.concat(
                   F.lit(f"lsh_bucket: vector length != dim={dim} (got "),
                   F.size(a).cast("string"), F.lit(")")))))
    # a NULL vector maps to a NULL bucket on BOTH paths (dropped by the
    # bucketed equi-join) — without this, the dim=None path sent every null
    # row to bucket 0 (null projections → every bit 0), recreating the
    # O(n_null²)·bands flood the dim guard exists to prevent, and the
    # dim-given path aborted the whole job over one bad row
    return F.when(a.isNull(), F.lit(None).cast("long")).otherwise(out)
