"""robots.txt (RFC 9309, the Robots Exclusion Protocol) parsing and
URL-decision walking — the crawl-politeness primitive that sits
between frontier and fetcher in any web-scale acquisition pipeline.
Hand-rolled from the RFC: user-agent GROUPS (consecutive user-agent
lines share one rule block; product tokens match case-insensitively;
'*' is the fallback group and a specific group SUPPRESSES it
entirely — rules never merge across groups), allow/disallow rules
with '*' wildcards and the '$' end anchor, and the precedence rule
readers get wrong: the LONGEST matching pattern wins regardless of
order, with ALLOW winning exact ties; empty disallow means
allow-everything; unmatched probes default to allowed. Crawl-delay
and Sitemap lines are collected (sitemaps are group-independent per
the RFC). Comments and unknown directives are tolerated per spec.

The oracle re-derives every decision from the pure robots_file_spec
formulas through the same matcher. Extraction runs as mapInPandas
over an opaque binary column — fully distributed.

Reference analog: none; completes the acquisition trio with the WARC
walk and the URL canonicalizer.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

ROBOTS_FILE_SCHEMA = T.StructType([
    T.StructField("file_id", T.LongType()),
    T.StructField("payload", T.BinaryType()),
])

ROBOTS_DECISION_SCHEMA = T.StructType([
    T.StructField("file_id", T.LongType()),
    T.StructField("probe", T.StringType()),
    T.StructField("group_used", T.StringType()),
    T.StructField("matched_rule", T.StringType()),
    T.StructField("rule_len", T.IntegerType()),
    T.StructField("allowed", T.BooleanType()),
    T.StructField("crawl_delay", T.IntegerType()),
    T.StructField("n_sitemaps", T.IntegerType()),
])

PROBE_PATHS = ["/", "/private/data.html", "/public/a.html",
               "/tmp/x.php", "/cgi-bin/run?q=1"]
AGENT = "kep-bot"


def robots_file_spec(i: int, seed: int = 42) -> str:
    """Deterministic robots.txt text for file i: fallback and
    specific groups, wildcard and $-anchored rules, tie cases where
    allow-wins matters, comments, crawl-delay and sitemaps."""
    lines = ["# synthetic robots %d" % i, ""]
    if i % 3 == 0:
        lines += ["User-agent: kep-bot",
                  "Disallow: /private/",
                  "Allow: /private/data.html"
                  if i % 2 == 0 else "Disallow: /*.php$",
                  "Crawl-delay: %d" % (1 + i % 9), ""]
    lines += ["User-agent: *",
              "Disallow: /cgi-bin/",
              "Disallow: /tmp/*",
              "Allow: /tmp/x.php" if i % 4 == 0 else
              "Disallow: /*.php$",
              "Allow: /public/", ""]
    if i % 2 == 0:
        lines += ["Sitemap: http://example-%d.test/sitemap.xml"
                  % (i % 7)]
    if i % 5 == 0:
        lines += ["Sitemap: http://example-%d.test/sitemap2.xml"
                  % (i % 7)]
    return "\n".join(lines) + "\n"


def build_robots(i: int, seed: int = 42) -> bytes:
    return robots_file_spec(i, seed).encode()


def synthetic_robots(spark: SparkSession, n: int,
                     seed: int = 42) -> DataFrame:
    rows = [(i, build_robots(i, seed)) for i in range(n)]
    return spark.createDataFrame(rows, ROBOTS_FILE_SCHEMA)


# ── parser + matcher ────────────────────────────────────────────────────

def _pattern_matches(pattern: str, path: str) -> bool:
    """RFC 9309 matching: '*' spans any chars, '$' (final only)
    anchors the end; otherwise prefix match."""
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    parts = pattern.split("*")

    pos = 0
    for k, part in enumerate(parts):
        if k == 0:
            if not path.startswith(part):
                return False
            pos = len(part)
        else:
            at = path.find(part, pos)
            if at < 0:
                return False
            pos = at + len(part)
    if anchored:
        return pos == len(path) if parts[-1] != "" else True
    return True


def parse_robots(raw: bytes) -> dict:
    groups: dict[str, list] = {}
    delays: dict[str, int] = {}
    sitemaps: list[str] = []
    current: list[str] = []
    rules_open = False
    for ln in raw.decode("utf-8").splitlines():
        ln = ln.split("#", 1)[0].strip()
        if not ln:
            continue
        key, _, val = ln.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if rules_open:
                current = []
                rules_open = False
            current.append(val.lower())
            for a in current:
                groups.setdefault(a, [])
        elif key in ("allow", "disallow"):
            rules_open = True
            for a in current:
                if val != "" or key == "allow":
                    groups.setdefault(a, []).append(
                        (key == "allow", val))
                # empty Disallow: allow everything — no rule needed
        elif key == "crawl-delay":
            rules_open = True
            for a in current:
                delays[a] = int(val)
        elif key == "sitemap":
            sitemaps.append(val)
        # unknown directives tolerated
    return {"groups": groups, "delays": delays, "sitemaps": sitemaps}


def decide(parsed: dict, agent: str, path: str) -> dict:
    agent = agent.lower()
    if agent in parsed["groups"]:
        gname, rules = agent, parsed["groups"][agent]
    elif "*" in parsed["groups"]:
        gname, rules = "*", parsed["groups"]["*"]
    else:
        gname, rules = None, []
    best = None             # (len, allow, pattern)
    for allow, pat in rules:
        if pat and _pattern_matches(pat, path):
            key = (len(pat), allow)
            if best is None or key > (best[0], best[1]):
                best = (len(pat), allow, pat)
    if best is None:
        return {"group": gname, "rule": None, "rule_len": 0,
                "allowed": True,
                "delay": parsed["delays"].get(gname)}
    return {"group": gname, "rule": best[2], "rule_len": best[0],
            "allowed": best[1],
            "delay": parsed["delays"].get(gname)}


def robots_decisions(blobs: DataFrame) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for file_id, payload in zip(pdf["file_id"], pdf["payload"]):
                parsed = parse_robots(bytes(payload))
                for probe in PROBE_PATHS:
                    d = decide(parsed, AGENT, probe)
                    out.append({
                        "file_id": int(file_id), "probe": probe,
                        "group_used": d["group"],
                        "matched_rule": d["rule"],
                        "rule_len": d["rule_len"],
                        "allowed": d["allowed"],
                        "crawl_delay": d["delay"],
                        "n_sitemaps": len(parsed["sitemaps"]),
                    })
            yield pd.DataFrame(out, columns=[f.name for f in
                                             ROBOTS_DECISION_SCHEMA.fields])

    return blobs.mapInPandas(run, ROBOTS_DECISION_SCHEMA)
