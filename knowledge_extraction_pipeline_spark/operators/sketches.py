"""Deterministic cardinality sketches — HyperLogLog registers and KMV
(k-minimum-values), both built on the engine-portable md5-u64 hash so the
whole sketch (registers, estimates) is value-identical in Spark and DuckDB.

Reference analog: the reference keeps exact running distinct counters in its
metrics stage; at 100 TB an exact distinct over a high-cardinality key is a
full shuffle of the key column, while these sketches are a single map-side
pass + a 2^p-row (HLL) or k-row (KMV) aggregate per group — the standard
trade (Flajolet et al., AofA 2007; Bar-Yossef et al., RANDOM 2002).

Cross-engine determinism (the repo-wide recipe):
- bucket   = first p/4 hex chars of md5(key)          (integer, exact)
- rank     = leading-zeros(remaining 56 bits) + 1 via length(bin(w))
  (both engines' bin() prints without leading zeros)
- harmonic sum Σ 2^(−M_j) is computed SCALED by 2^Rmax as an exact
  DECIMAL(38,0) integer sum (order-free), one float division at the end
- KMV estimate uses the k-th smallest hash as DECIMAL(20,0); the single
  double division is IEEE-identical in both engines.

The raw HLL estimator is used as-is (no small-range linear-counting branch
in the ORACLE path — ln() last-ulp parity across libm implementations is
not guaranteed); `hll_estimate_corrected` applies the correction for
engine users and is pytest-verified instead.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HLL_P = 8                 # 2^8 = 256 registers; raw-regime floor 2.5·m = 640
KMV_K = 64

# alpha_256 = 0.7213 / (1 + 1.079/256), embedded as an exact repr literal in
# both engines (the BM25-oracle technique).
def _alpha(m: int) -> float:
    return 0.7213 / (1.0 + 1.079 / m)


def _hash_cols(key: F.Column, p: int) -> tuple[F.Column, F.Column]:
    """(bucket, rank) from md5(key): bucket = first p bits (p ≡ 0 mod 4 so
    it is a hex-prefix slice), rank = leading zeros of the next 56 bits + 1."""
    if p % 4 != 0:
        raise ValueError(f"p must be a multiple of 4 (hex-prefix slicing), got {p}")
    h = F.md5(key.cast("string"))
    bucket = F.conv(F.substring(h, 1, p // 4), 16, 10).cast("int")
    w = F.conv(F.substring(h, p // 4 + 1, 14), 16, 10).cast("long")
    rank = F.when(w == 0, F.lit(57)).otherwise(F.lit(57) - F.length(F.bin(w)))
    return bucket, rank.cast("int")


def hll_kmv_distinct(df: DataFrame, key_col: str,
                     group_cols: list[str] | None = None,
                     p: int = HLL_P, kmv_k: int = KMV_K) -> DataFrame:
    """Per-group distinct-count estimates: exact, HLL raw, and KMV.

    Output: group_cols + (n_exact, hll_est, kmv_est, nonzero_registers,
    max_rank). One distinct + two tiny aggregates; no row-level state.

    Scale shape: the distinct is the only key-cardinality shuffle (and at
    scale the caller would skip `n_exact` and feed the raw stream — max() per
    register and min-k are both map-side combinable); the register table is
    2^p rows per group and the KMV frontier k rows per group, so the final
    aggregate is O(groups · 2^p) regardless of input size."""
    group_cols = list(group_cols or [])
    m = 1 << p
    keys = df.select(*group_cols, F.col(key_col).alias("_k")).distinct()
    bucket, rank = _hash_cols(F.col("_k"), p)
    hashed = keys.select(
        *group_cols,
        F.col("_k").cast("string").alias("_ks"),
        F.conv(F.substring(F.md5(F.col("_k").cast("string")), 1, 16), 16, 10)
         .cast("decimal(20,0)").alias("_h"),
        bucket.alias("_b"), rank.alias("_r"))

    # HLL: register table -> group rollup with exact scaled harmonic sum.
    regs = hashed.groupBy(*group_cols, "_b").agg(F.max("_r").alias("_m"))
    gmax = regs.groupBy(*group_cols).agg(F.max("_m").alias("_rmax"))
    joined = regs.join(gmax, group_cols) if group_cols else regs.crossJoin(gmax)
    # term = 2^(rmax - M) exactly: pow() is a double but powers of two are
    # exact, and the DECIMAL(38,0) sum is order-free.
    term = F.pow(F.lit(2.0), F.col("_rmax") - F.col("_m")).cast("decimal(38,0)")
    hll = (
        joined.groupBy(*group_cols, "_rmax")
        .agg(F.sum(term).alias("_s_nz"),
             F.count(F.lit(1)).cast("long").alias("nonzero_registers"))
        .withColumn("_s", F.col("_s_nz")
                    + (F.lit(m) - F.col("nonzero_registers"))
                    * F.pow(F.lit(2.0), F.col("_rmax")).cast("decimal(38,0)"))
        .select(
            *group_cols,
            F.round(F.lit(_alpha(m)) * (F.lit(float(m * m))
                                        * F.pow(F.lit(2.0), F.col("_rmax")))
                    / F.col("_s").cast("double"), 4).alias("hll_est"),
            "nonzero_registers",
            F.col("_rmax").cast("long").alias("max_rank"))
    )

    # KMV: k-th smallest 64-bit hash; (k-1)·2^64 / h_k. Two-phase min-k
    # (the materialize._salted_topk discipline): a per-(group, salt) window
    # keeps only k candidates per salt bucket, so the final per-group window
    # sorts <= n_salt·k rows — never the full key set in one task (a bare
    # per-group window would funnel every distinct key of a hot group into
    # a single sort; ungrouped, the whole dataset).
    n_salt = 32
    salted = hashed.withColumn("_salt", F.crc32(F.col("_ks")) % n_salt)
    w1 = Window.partitionBy(*group_cols, "_salt").orderBy(
        F.asc("_h"), F.asc("_ks"))
    frontier = (salted.withColumn("_rn1", F.row_number().over(w1))
                .filter(F.col("_rn1") <= kmv_k))
    wk = (Window.partitionBy(*group_cols).orderBy(F.asc("_h"), F.asc("_ks"))
          if group_cols else Window.orderBy(F.asc("_h"), F.asc("_ks")))
    kth = (frontier.withColumn("_rn", F.row_number().over(wk))
           .filter(F.col("_rn") == kmv_k))
    kmv_expr = F.round(F.lit(float(kmv_k - 1)) * F.lit(2.0 ** 64)
                       / F.col("_h").cast("double"), 4).alias("kmv_est")

    exact = keys.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_exact"))
    if group_cols:
        kmv = kth.select(*group_cols, kmv_expr)
        out = exact.join(hll, group_cols).join(kmv, group_cols, "left")
    else:
        # agg (not select) so a <k-key input yields one NULL row, not zero
        # rows — a crossJoin against empty would erase the whole result.
        kmv = kth.agg(F.min("_h").alias("_h")).select(kmv_expr)
        out = exact.crossJoin(hll).crossJoin(kmv)
    return out.select(*group_cols, "n_exact", "hll_est", "kmv_est",
                      "nonzero_registers", "max_rank")


def hll_estimate_corrected(raw_est: float, nonzero_registers: int,
                           p: int = HLL_P) -> float:
    """Flajolet small-range correction (linear counting when raw ≤ 2.5·m and
    empty registers exist). Driver-side float math — engine users get the
    corrected number; the cross-engine oracle compares the raw components."""
    m = 1 << p
    zeros = m - nonzero_registers
    if raw_est <= 2.5 * m and zeros > 0:
        return m * math.log(m / zeros)
    return raw_est


def hll_sql(table: str, key_col: str, group_cols: list[str] | None = None,
            p: int = HLL_P, kmv_k: int = KMV_K) -> str:
    """The DuckDB mirror of hll_kmv_distinct — identical hash slices,
    identical scaled-integer harmonic sum (HUGEINT), identical single float
    divisions with the same literals and parenthesization."""
    group_cols = list(group_cols or [])
    m = 1 << p
    g = ", ".join(group_cols)
    gsel = (g + ", ") if g else ""
    gby = f"GROUP BY {g}" if g else ""
    part = f"PARTITION BY {g}" if g else ""
    on = f"USING ({g})" if g else "ON 1=1"
    alpha = repr(_alpha(m))
    return f"""
WITH keys AS (
  SELECT DISTINCT {gsel}CAST({key_col} AS VARCHAR) AS ks FROM {table}
), hashed AS (
  SELECT {gsel}ks,
         CAST(concat('0x', substr(md5(ks), 1, 16)) AS UBIGINT) AS h,
         CAST(concat('0x', substr(md5(ks), 1, {p // 4})) AS INT) AS b,
         CAST(CASE WHEN CAST(concat('0x', substr(md5(ks), {p // 4 + 1}, 14)) AS UBIGINT) = 0
              THEN 57 ELSE 57 - length(bin(CAST(concat('0x', substr(md5(ks), {p // 4 + 1}, 14)) AS UBIGINT)))
              END AS INT) AS r
  FROM keys
), regs AS (
  SELECT {gsel}b, max(r) AS mr FROM hashed GROUP BY {gsel.rstrip(', ') + ', ' if g else ''}b
), gmax AS (
  SELECT {gsel}max(mr) AS rmax FROM regs {gby}
), hll AS (
  SELECT {gsel}rmax,
         round({alpha} * (CAST({m * m} AS DOUBLE) * pow(2, rmax))
               / CAST(sum(CAST(pow(2, rmax - mr) AS HUGEINT))
                      + (CAST({m} AS HUGEINT) - count(*)) * CAST(pow(2, rmax) AS HUGEINT)
                      AS DOUBLE), 4) AS hll_est,
         CAST(count(*) AS BIGINT) AS nonzero_registers,
         CAST(rmax AS BIGINT) AS max_rank
  FROM regs JOIN gmax {on} GROUP BY {gsel}rmax
), kmv AS (
  SELECT {gsel}round(CAST({float(kmv_k - 1)!r} AS DOUBLE) * CAST({repr(2.0 ** 64)} AS DOUBLE)
               / CAST(h AS DOUBLE), 4) AS kmv_est
  FROM (SELECT *, row_number() OVER ({part} ORDER BY h ASC, ks ASC) AS rn FROM hashed)
  WHERE rn = {kmv_k}
), exact AS (
  SELECT {gsel}CAST(count(*) AS BIGINT) AS n_exact FROM keys {gby}
)
SELECT {gsel}n_exact, hll_est, kmv_est, nonzero_registers, max_rank
FROM exact JOIN hll {on} LEFT JOIN kmv {on}
"""


def cms_estimate(df: DataFrame, key_col: str, probes: list[str],
                 d: int = 4, width_hex: int = 2) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan, J.Alg 2005) frequency
    estimates for `probes`: d independent md5-salted hash rows of
    w = 16^width_hex buckets; estimate(key) = min over rows of its bucket's
    count. Overestimates only (collisions add), never under.

    Everything is integer (bucket ids from hex prefixes, exact long counts,
    an integer min across d rows), so the sketch is value-identical in any
    engine — cms_sql() is the DuckDB mirror.

    Scale shape: the sketch table is d·w rows TOTAL regardless of input
    (map-side combinable counts); probes join against it broadcast. The
    ride-along exact count is the only key-cardinality shuffle — drop it at
    100 TB and union-merge sketch tables by (row, bucket) sum (CMS is
    linear)."""
    w = 16 ** width_hex

    def _bucket(key: F.Column, r: int) -> F.Column:
        return F.conv(F.substring(
            F.md5(F.concat(F.lit(f"cms:{r}:"), key)), 1, width_hex),
            16, 10).cast("int")

    # ONE input scan: all d (row, bucket) pairs come from a posexplode of a
    # d-element array per input row (a unionAll of d branches would re-read
    # and re-tokenize the corpus d times).
    ks = F.col(key_col).cast("string")
    rows = df.select(F.posexplode(
        F.array(*[_bucket(ks, r) for r in range(d)])).alias("_row", "_b"))
    sketch = rows.groupBy("_row", "_b").agg(F.count(F.lit(1)).alias("_c"))

    p = df.sparkSession.createDataFrame([(t,) for t in probes], "key string")
    probe_rows = p.select("key", F.posexplode(
        F.array(*[_bucket(F.col("key"), r) for r in range(d)]))
        .alias("_row", "_b"))
    est = (
        probe_rows.join(sketch, ["_row", "_b"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce("_c", F.lit(0))).cast("long").alias("cms_count"))
    )
    exact = (df.select(F.col(key_col).cast("string").alias("key"))
             .filter(F.col("key").isin(probes))
             .groupBy("key").agg(F.count(F.lit(1)).cast("long")
                                 .alias("exact_count")))
    return (est.join(exact, "key", "left")
            .select("key", F.coalesce("exact_count", F.lit(0)).cast("long")
                    .alias("exact_count"), "cms_count",
                    F.lit(d).cast("long").alias("d"),
                    F.lit(w).cast("long").alias("w")))


def cms_sql(table: str, key_col: str, probes: list[str],
            d: int = 4, width_hex: int = 2) -> str:
    """DuckDB mirror of cms_estimate — identical salts, hex slices and
    integer mins."""
    w = 16 ** width_hex
    probe_vals = ", ".join(f"('{t}')" for t in probes)
    stream = " UNION ALL ".join(
        f"SELECT {r} AS _row, CAST(concat('0x', substr(md5(concat('cms:{r}:', "
        f"CAST({key_col} AS VARCHAR))), 1, {width_hex})) AS INT) AS _b "
        f"FROM {table}" for r in range(d))
    probe_stream = " UNION ALL ".join(
        f"SELECT key, {r} AS _row, CAST(concat('0x', substr(md5(concat("
        f"'cms:{r}:', key)), 1, {width_hex})) AS INT) AS _b FROM p"
        for r in range(d))
    return f"""
WITH p AS (SELECT key FROM (VALUES {probe_vals}) t(key)),
sk AS MATERIALIZED (
  SELECT _row, _b, CAST(count(*) AS BIGINT) AS _c
  FROM ({stream}) GROUP BY _row, _b
), pr AS ({probe_stream}),
est AS (
  SELECT pr.key, CAST(min(coalesce(sk._c, 0)) AS BIGINT) AS cms_count
  FROM pr LEFT JOIN sk ON sk._row = pr._row AND sk._b = pr._b
  GROUP BY pr.key
), ex AS (
  SELECT CAST({key_col} AS VARCHAR) AS key, CAST(count(*) AS BIGINT) AS exact_count
  FROM {table} WHERE CAST({key_col} AS VARCHAR) IN (SELECT key FROM p)
  GROUP BY 1
)
SELECT est.key, CAST(coalesce(ex.exact_count, 0) AS BIGINT) AS exact_count,
       est.cms_count, CAST({d} AS BIGINT) AS d, CAST({w} AS BIGINT) AS w
FROM est LEFT JOIN ex ON ex.key = est.key
"""


def countsketch_estimate(df: DataFrame, key_col: str, probes: list[str],
                         d: int = 3, width_hex: int = 2) -> DataFrame:
    """Count-Sketch (Charikar, Chen & Farach-Colton, ICALP'02) frequency
    estimates for `probes`: d hash rows of w = 16^width_hex buckets, each
    stream item adding a ±1 sign g_r(key) to its bucket, so collisions
    CANCEL in expectation instead of always adding (the unbiased sibling of
    Count-Min; two-sided error, variance ‖f‖₂²/w per row).
    estimate(key) = median over rows of g_r(key)·C[r, h_r(key)] — with d=3
    the median is the exact integer sum−max−min, no sorting float ever
    forms.

    Buckets come from md5 hex prefixes and signs from an independent
    md5-salted nibble's parity, all counters are exact signed longs, so the
    sketch is value-identical in any engine — countsketch_sql() is the
    DuckDB mirror.

    Scale shape: the sketch table is d·w rows TOTAL regardless of input
    (map-side combinable signed counts); probes join against it broadcast.
    Count-Sketch is linear — union-merge shards by (row, bucket) sum. The
    ride-along exact count is the only key-cardinality shuffle; drop it at
    100 TB."""
    w = 16 ** width_hex

    def _bucket(key: F.Column, r: int) -> F.Column:
        return F.conv(F.substring(
            F.md5(F.concat(F.lit(f"cs:{r}:"), key)), 1, width_hex),
            16, 10).cast("int")

    def _sign(key: F.Column, r: int) -> F.Column:
        # parity of an independent salted nibble → ±1
        return (F.conv(F.substring(
            F.md5(F.concat(F.lit(f"css:{r}:"), key)), 1, 1),
            16, 10).cast("int") % 2 * 2 - 1)

    # ONE input scan: all d (row, bucket, sign) triples from one posexplode.
    ks = F.col(key_col).cast("string")
    rows = df.select(F.posexplode(F.array(*[
        F.struct(_bucket(ks, r).alias("b"), _sign(ks, r).alias("g"))
        for r in range(d)])).alias("_row", "_bg"))
    sketch = (rows.groupBy("_row", F.col("_bg.b").alias("_b"))
              .agg(F.sum("_bg.g").cast("long").alias("_c")))

    p = df.sparkSession.createDataFrame([(t,) for t in probes], "key string")
    probe_rows = (p.select("key", F.posexplode(F.array(*[
        F.struct(_bucket(F.col("key"), r).alias("b"),
                 _sign(F.col("key"), r).alias("g")) for r in range(d)]))
        .alias("_row", "_bg"))
        .select("key", "_row", F.col("_bg.b").alias("_b"),
                F.col("_bg.g").alias("_g")))
    # left join zero-fills empty probe buckets, so every key has exactly d
    # estimates and the d=3 median is the exact integer sum−max−min
    ests = (probe_rows.join(sketch, ["_row", "_b"], "left")
            .select("key", (F.col("_g") * F.coalesce("_c", F.lit(0)))
                    .alias("_e")))
    est = (ests.groupBy("key")
           .agg((F.sum("_e") - F.max("_e") - F.min("_e"))
                .cast("long").alias("cs_count")))

    exact = (df.select(F.col(key_col).cast("string").alias("key"))
             .filter(F.col("key").isin(probes))
             .groupBy("key").agg(F.count(F.lit(1)).cast("long")
                                 .alias("exact_count")))
    return (est.join(exact, "key", "left")
            .select("key", F.coalesce("exact_count", F.lit(0)).cast("long")
                    .alias("exact_count"), "cs_count",
                    F.lit(d).cast("long").alias("d"),
                    F.lit(w).cast("long").alias("w")))


def countsketch_sql(table: str, key_col: str, probes: list[str],
                    d: int = 3, width_hex: int = 2) -> str:
    """DuckDB mirror of countsketch_estimate — identical salts, hex slices,
    signs, and the same median-of-3 (sum−max−min over zero-filled rows)."""
    w = 16 ** width_hex
    probe_vals = ", ".join(f"('{t}')" for t in probes)

    def bucket(expr: str, r: int) -> str:
        return (f"CAST(concat('0x', substr(md5(concat('cs:{r}:', {expr})),"
                f" 1, {width_hex})) AS INT)")

    def sign(expr: str, r: int) -> str:
        return (f"(CAST(concat('0x', substr(md5(concat('css:{r}:', {expr})),"
                f" 1, 1)) AS INT) % 2 * 2 - 1)")

    stream = " UNION ALL ".join(
        f"SELECT {r} AS _row, {bucket(f'CAST({key_col} AS VARCHAR)', r)} AS _b,"
        f" {sign(f'CAST({key_col} AS VARCHAR)', r)} AS _g FROM {table}"
        for r in range(d))
    probe_stream = " UNION ALL ".join(
        f"SELECT key, {r} AS _row, {bucket('key', r)} AS _b,"
        f" {sign('key', r)} AS _g FROM p" for r in range(d))
    return f"""
WITH p AS (SELECT key FROM (VALUES {probe_vals}) t(key)),
sk AS MATERIALIZED (
  SELECT _row, _b, CAST(sum(_g) AS BIGINT) AS _c
  FROM ({stream}) GROUP BY _row, _b
), pr AS ({probe_stream}),
ev AS (
  SELECT pr.key, pr._g * coalesce(sk._c, 0) AS _e
  FROM pr LEFT JOIN sk ON sk._row = pr._row AND sk._b = pr._b
), est AS (
  SELECT key, CAST(sum(_e) - max(_e) - min(_e) AS BIGINT) AS cs_count
  FROM ev GROUP BY key
), ex AS (
  SELECT CAST({key_col} AS VARCHAR) AS key,
         CAST(count(*) AS BIGINT) AS exact_count
  FROM {table} WHERE CAST({key_col} AS VARCHAR) IN (SELECT key FROM p)
  GROUP BY 1
)
SELECT est.key, CAST(coalesce(ex.exact_count, 0) AS BIGINT) AS exact_count,
       est.cs_count, CAST({d} AS BIGINT) AS d, CAST({w} AS BIGINT) AS w
FROM est LEFT JOIN ex ON ex.key = est.key
"""


def kmv_jaccard(df: DataFrame, key_col: str, group_col: str,
                k: int = KMV_K) -> DataFrame:
    """Pairwise set similarity between groups from KMV synopses (Beyer et
    al., SIGMOD'07): each group keeps its k smallest key hashes; for a pair,
    J ≈ |M ∩ A ∩ B| / |M| where M is the k smallest of the merged synopses.
    The exact Jaccard rides along for the error report (at 100 TB the caller
    drops it — the exact path is a full |key| shuffle per pair, the sketch
    path is k rows per group).

    Determinism: hashes are 16-hex-char md5 prefixes (fixed length, so ASCII
    order == numeric order), deduped per group BEFORE ranking so ties cannot
    exist; every similarity is an integer e6 ratio — no float anywhere.

    Scale shape: the min-k is two-phase (per-salt window caps candidates at
    k before the per-group window — the _salted_topk discipline), synopses
    are k-element arrays, and the pair frame is |groups|² rows of bounded
    arrays. Only the optional exact branch touches full key cardinality,
    via one map-side-combinable distinct + an equi-join on the key."""
    keys = (df.select(F.col(group_col).alias("grp"),
                      F.col(key_col).cast("string").alias("_ks"))
              .distinct())
    hashed = keys.select(
        "grp", F.substring(F.md5("_ks"), 1, 16).alias("_h")).distinct()
    n_salt = 32
    salted = hashed.withColumn("_salt", F.crc32(F.col("_h")) % n_salt)
    w1 = Window.partitionBy("grp", "_salt").orderBy(F.asc("_h"))
    frontier = (salted.withColumn("_rn1", F.row_number().over(w1))
                .filter(F.col("_rn1") <= k))
    wk = Window.partitionBy("grp").orderBy(F.asc("_h"))
    top = (frontier.withColumn("_rn", F.row_number().over(wk))
           .filter(F.col("_rn") <= k))
    syn = top.groupBy("grp").agg(F.sort_array(F.collect_list("_h")).alias("_hs"))
    sizes = keys.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"))

    inter = (keys.alias("a").join(keys.alias("b"),
                                  (F.col("a._ks") == F.col("b._ks"))
                                  & (F.col("a.grp") < F.col("b.grp")))
             .groupBy(F.col("a.grp").alias("ga"), F.col("b.grp").alias("gb"))
             .agg(F.count(F.lit(1)).cast("long").alias("n_inter")))

    a, b = syn.alias("a"), syn.alias("b")
    pairs = (a.join(b, F.col("a.grp") < F.col("b.grp"))
             .select(F.col("a.grp").alias("ga"), F.col("b.grp").alias("gb"),
                     F.col("a._hs").alias("_ha"), F.col("b._hs").alias("_hb")))
    merged = F.slice(F.array_sort(F.array_union("_ha", "_hb")), 1, k)
    c = F.size(F.array_intersect(merged, F.array_intersect("_ha", "_hb")))
    est = pairs.select(
        "ga", "gb",
        c.cast("long").alias("_c"),
        F.size(merged).cast("long").alias("_m"))
    out = (est
           .join(sizes.select(F.col("grp").alias("ga"),
                              F.col("n").alias("n_a")), "ga")
           .join(sizes.select(F.col("grp").alias("gb"),
                              F.col("n").alias("n_b")), "gb")
           .join(inter, ["ga", "gb"], "left")
           .withColumn("n_inter", F.coalesce(F.col("n_inter"), F.lit(0))))
    return out.select(
        F.col("ga").alias("type_a"), F.col("gb").alias("type_b"),
        "n_a", "n_b", F.col("n_inter").cast("long").alias("n_inter"),
        F.expr("(n_inter * 1000000L) div (n_a + n_b - n_inter)")
        .alias("jacc_exact_e6"),
        F.expr("(_c * 1000000L) div _m").alias("jacc_kmv_e6"))


def kmv_jaccard_sql(table: str, key_col: str, group_col: str,
                    k: int = KMV_K) -> str:
    """DuckDB mirror of kmv_jaccard: identical hash prefix, identical dedup-
    before-rank, identical merged-slice estimator, identical integer e6
    divisions."""
    return f"""
WITH keys AS (
  SELECT DISTINCT {group_col} AS grp, CAST({key_col} AS VARCHAR) AS ks
  FROM {table}
), hashed AS (
  SELECT DISTINCT grp, substr(md5(ks), 1, 16) AS h FROM keys
), top AS (
  SELECT grp, h FROM (
    SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h ASC) AS rn
    FROM hashed) WHERE rn <= {k}
), syn AS (
  SELECT grp, list_sort(list(h)) AS hs FROM top GROUP BY grp
), sizes AS (
  SELECT grp, CAST(count(*) AS BIGINT) AS n FROM keys GROUP BY grp
), inter AS (
  SELECT a.grp AS ga, b.grp AS gb, CAST(count(*) AS BIGINT) AS n_inter
  FROM keys a JOIN keys b ON a.ks = b.ks AND a.grp < b.grp
  GROUP BY a.grp, b.grp
), pairs AS (
  SELECT a.grp AS ga, b.grp AS gb,
         (list_sort(list_distinct(list_concat(a.hs, b.hs))))[1:{k}] AS m,
         list_intersect(a.hs, b.hs) AS ab
  FROM syn a JOIN syn b ON a.grp < b.grp
)
SELECT p.ga AS type_a, p.gb AS type_b, sa.n AS n_a, sb.n AS n_b,
       coalesce(i.n_inter, 0) AS n_inter,
       (coalesce(i.n_inter, 0) * 1000000) // (sa.n + sb.n - coalesce(i.n_inter, 0))
         AS jacc_exact_e6,
       (CAST(len(list_intersect(p.m, p.ab)) AS BIGINT) * 1000000)
         // CAST(len(p.m) AS BIGINT) AS jacc_kmv_e6
FROM pairs p
JOIN sizes sa ON sa.grp = p.ga
JOIN sizes sb ON sb.grp = p.gb
LEFT JOIN inter i ON i.ga = p.ga AND i.gb = p.gb
"""


_THETA_SPACE = 18446744073709551616  # 2^64, the md5-prefix hash space


def kmv_difference(df: DataFrame, key_col: str, group_col: str,
                   k: int = KMV_K) -> DataFrame:
    """Directed set-DIFFERENCE estimation between groups from the same
    k-min-values synopses kmv_jaccard builds — the theta-sketch A∖B
    operation (Dasgupta et al., the DataSketches set algebra): with
    θ = min(θ_A, θ_B) (θ_X = the group's k-th smallest hash, or the full
    space when the group is exhaustively sketched), every A-hash below θ
    has EXACT membership knowledge in B's synopsis, so
    |A∖B| ≈ |{h ∈ S_A : h < θ, h ∉ S_B}| · 2⁶⁴/θ. Both directions are
    emitted per unordered pair, with the exact differences riding along
    for the error report (the kmv_jaccard posture — at 100 TB the exact
    branch is dropped; the sketch branch is k rows per group).

    Determinism: fixed-length hex md5 prefixes (ASCII order == numeric
    order) compared as strings; θ converted to an integer once; the
    estimate is one integer cnt·2⁶⁴ // θ — no float anywhere."""
    keys = (df.select(F.col(group_col).alias("grp"),
                      F.col(key_col).cast("string").alias("_ks"))
            .distinct())
    hashed = keys.select(
        "grp", F.substring(F.md5("_ks"), 1, 16).alias("_h")).distinct()
    wk = Window.partitionBy("grp").orderBy(F.asc("_h"))
    top = (hashed.withColumn("_rn", F.row_number().over(wk))
           .filter(F.col("_rn") <= k))
    sizes = keys.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"))
    syn = (top.groupBy("grp")
           .agg(F.sort_array(F.collect_list("_h")).alias("_hs"))
           .join(sizes, "grp")
           .select("grp", "_hs", "n",
                   F.when(F.col("n") < k, F.lit("g" * 16))  # > any hex
                   .otherwise(F.element_at("_hs", k)).alias("_th")))
    inter = (keys.alias("a").join(keys.alias("b"),
                                  (F.col("a._ks") == F.col("b._ks"))
                                  & (F.col("a.grp") < F.col("b.grp")))
             .groupBy(F.col("a.grp").alias("ga"),
                      F.col("b.grp").alias("gb"))
             .agg(F.count(F.lit(1)).cast("long").alias("n_inter")))
    a, b = syn.alias("a"), syn.alias("b")
    pairs = (a.join(b, F.col("a.grp") < F.col("b.grp"))
             .select(F.col("a.grp").alias("ga"), F.col("b.grp").alias("gb"),
                     F.col("a._hs").alias("_ha"), F.col("b._hs").alias("_hb"),
                     F.col("a.n").alias("n_a"), F.col("b.n").alias("n_b"),
                     F.least("a._th", "b._th").alias("_th")))

    def below_not_in(mine, other):
        return F.size(F.filter(
            F.col(mine),
            lambda h: (h < F.col("_th")) & ~F.array_contains(F.col(other), h)
        )).cast("decimal(38,0)")

    cnts = pairs.select(
        "ga", "gb", "n_a", "n_b", "_th",
        below_not_in("_ha", "_hb").alias("cab"),
        below_not_in("_hb", "_ha").alias("cba"))
    est_tpl = (f"CAST(CASE WHEN _th = '{'g' * 16}' THEN {{c}}"
               f" ELSE ({{c}} * CAST({_THETA_SPACE} AS DECIMAL(38,0)))"
               f" div CAST(conv(_th, 16, 10) AS DECIMAL(38,0)) END"
               f" AS BIGINT)")
    out = (cnts.join(inter, ["ga", "gb"], "left")
           .withColumn("n_inter", F.coalesce(F.col("n_inter"), F.lit(0))))
    return out.select(
        F.col("ga").alias("type_a"), F.col("gb").alias("type_b"),
        "n_a", "n_b",
        (F.col("n_a") - F.col("n_inter")).cast("long")
        .alias("diff_ab_exact"),
        F.expr(est_tpl.format(c="cab")).alias("diff_ab_kmv"),
        (F.col("n_b") - F.col("n_inter")).cast("long")
        .alias("diff_ba_exact"),
        F.expr(est_tpl.format(c="cba")).alias("diff_ba_kmv"))
