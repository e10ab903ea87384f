"""Deterministic, fully-distributed synthetic transcripts generator.

Produces the input table required by the engine contract:
    (conv_id:string, turn_idx:int32, role:string, text:string,
     tool:string, ts:timestamp)

Everything is a pure Column expression seeded through xxhash64 — NO driver
loop, NO Python UDF — so the same generator scales from 100 turns (tests) to
10^9+ turns (bench) with perfect determinism at any parallelism: every value
is a function of (conv_id, turn_idx, seed) only, never of partitioning.

Planted structure (FIXTURES.md §1 requirements):
  * Zipf-ish entity frequency (log-uniform index → hot-key skew);
  * case variants (merged by the exact phase), abbreviations (merged by the
    alias phase), hyphen/typo variants (caught only by the MinHash-LSH fuzzy
    stage);
  * co-occurring pairs recur across turns so the min_cooccurrences=2 edge
    threshold (reference graph_tools.py:158) is exercised;
  * categories from the reference's 7-way set drive category-pair edge typing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.lexicon import ABBREVIATIONS, base_terms, hyphen_variant, typo_variant

_TOOLS = ["search", "python", "browser", "calculator"]

_OPENERS = [
    "the user asks how", "we then discussed why", "a follow-up question on whether",
    "the assistant explains that", "tool output indicates that", "notes from the session say",
]
_CONNECTORS = [
    "relates to", "differs from", "builds on", "interacts with", "is evaluated against",
]
_CLOSERS = [
    "in large scale systems.", "under distribution shift.", "for the benchmark suite.",
    "according to the survey.", "as seen in production.",
]


def _surface_arrays() -> dict[str, list[str]]:
    """Per-variant surface form for each base term, index-aligned."""
    bases = [b for b, _, _ in base_terms()]
    inv_abbrev = {v: k for k, v in ABBREVIATIONS.items()}
    return {
        "title": [b.title() for b in bases],
        "lower": bases,
        "upper": [b.upper() for b in bases],
        "abbrev": [inv_abbrev.get(b, b.title()) for b in bases],
        "hyphen": [hyphen_variant(b) for b in bases],
        "typo": [typo_variant(b) for b in bases],
    }


def generate_transcripts(
    spark: SparkSession,
    n_convs: int,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Build the transcripts DataFrame. Turn count per conv is 4..12, so
    expected rows ≈ 8 * n_convs."""
    surf = _surface_arrays()
    bases = surf["lower"]
    v = len(bases)

    arr = {k: F.array(*[F.lit(s) for s in lst]) for k, lst in surf.items()}
    openers = F.array(*[F.lit(s) for s in _OPENERS])
    connectors = F.array(*[F.lit(s) for s in _CONNECTORS])
    closers = F.array(*[F.lit(s) for s in _CLOSERS])
    tools = F.array(*[F.lit(s) for s in _TOOLS])

    def h(*cols):
        return F.xxhash64(F.lit(seed), *cols)

    # default: ~512 convs per partition, capped so tiny inputs don't fan out
    # into hundreds of near-empty tasks
    if partitions is None:
        partitions = max(1, min(256, n_convs // 512 + 1))
    convs = spark.range(0, n_convs, 1, partitions)
    cid = F.col("id")
    n_turns = (F.pmod(h(cid, F.lit("nt")), F.lit(9)) + 4).cast("int")
    turns = convs.select(
        F.format_string("conv%09d", cid).alias("conv_id"),
        cid.alias("_cid"),
        F.explode(F.sequence(F.lit(0), n_turns - 1)).alias("turn_idx"),
    ).withColumn("turn_idx", F.col("turn_idx").cast("int"))

    cid, tix = F.col("_cid"), F.col("turn_idx")
    th = h(cid, tix)

    def zipf_idx(tag: str) -> F.Column:
        # log-uniform index in [1, v]: floor(v**u) — a Zipf-like head-heavy
        # skew so hot entities stress the salted co-occurrence join.
        u = (F.pmod(h(cid, tix, F.lit(tag)), F.lit(1_000_000)).cast("double")
             / 1_000_000.0)
        return F.least(F.lit(v), F.floor(F.pow(F.lit(float(v)), u)) + 1).cast("int")

    def surface(tag: str) -> F.Column:
        idx = zipf_idx(tag)
        roll = F.pmod(h(cid, tix, F.lit(tag), F.lit("var")), F.lit(100))
        return (
            F.when(roll < 40, F.element_at(arr["title"], idx))
            .when(roll < 70, F.element_at(arr["lower"], idx))
            .when(roll < 85, F.element_at(arr["upper"], idx))
            .when(roll < 93, F.element_at(arr["abbrev"], idx))
            .when(roll < 97, F.element_at(arr["hyphen"], idx))
            .otherwise(F.element_at(arr["typo"], idx))
        )

    pick = lambda a, n, tag: F.element_at(a, (F.pmod(h(cid, tix, F.lit(tag)), F.lit(n)) + 1).cast("int"))

    k = F.pmod(th, F.lit(3)) + 2  # 2..4 mentions per turn
    text = F.concat_ws(
        " ",
        pick(openers, len(_OPENERS), "op"),
        surface("m1"),
        pick(connectors, len(_CONNECTORS), "cx"),
        surface("m2"),
        F.when(k >= 3, F.concat(F.lit("and also "), surface("m3"))).otherwise(F.lit("")),
        F.when(k >= 4, F.concat(F.lit("plus "), surface("m4"))).otherwise(F.lit("")),
        pick(closers, len(_CLOSERS), "cl"),
    )
    text = F.regexp_replace(text, r"\s+", " ")

    role = (
        F.when(tix % 2 == 0, F.lit("user"))
        .when(F.pmod(th, F.lit(7)) == 0, F.lit("tool"))
        .otherwise(F.lit("assistant"))
    )
    tool = F.when(role == "tool", pick(tools, len(_TOOLS), "tool")).otherwise(F.lit(""))
    ts = F.timestamp_seconds(F.lit(1_700_000_000) + cid * 3600 + tix.cast("long") * 60)

    return turns.select(
        "conv_id", "turn_idx",
        role.alias("role"), text.alias("text"), tool.alias("tool"), ts.alias("ts"),
    )
