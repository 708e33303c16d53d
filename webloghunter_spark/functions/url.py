"""URL analytics expressions: host extraction and URI canonicalization.

Web-corpus pipelines dedup and filter by canonical URL (scheme/host
lowercased, query+fragment stripped, duplicate slashes collapsed,
trailing slash dropped) — the reference's closest analogue is its
display-side `method_path` concat (WebLogTriage/dataframe.py:408),
which does no normalization.

Every expression here is a chain of built-in string/regexp functions —
whole-stage-codegen'd, scan-speed at 100 TB, and each pattern is both
RE2- and java.util.regex-compatible so an external SQL oracle
replicates results bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def host_expr(url: Column | str) -> Column:
    """Host part of an http(s) URL; '' when the value is not a URL."""
    c = F.col(url) if isinstance(url, str) else url
    return F.regexp_extract(c, r"^https?://([^/]+)", 1)


def canonical_uri_expr(uri: Column | str) -> Column:
    """Canonical form of a request path:

    1. drop query string and fragment (everything from the first ? or #)
    2. collapse runs of '/' to one
    3. drop the trailing slash (but keep a bare '/')
    4. lowercase

    Deliberately does NOT percent-decode: decoding can merge distinct
    resources ('%2F' inside a segment) and the risk scorer
    (functions/risk.py) already handles decoded-form analysis.
    """
    c = F.col(uri) if isinstance(uri, str) else uri
    path = F.regexp_replace(c, r"[?#].*$", "")
    collapsed = F.regexp_replace(path, r"/{2,}", "/")
    trimmed = F.regexp_replace(collapsed, r"(.)/$", "$1")
    return F.lower(trimmed)


def blocked_by_expr(host: Column | str, domains: list[str]) -> Column:
    """The blocklist domain a host matches, else NULL. A host matches
    a domain on exact equality or as a subdomain (host ends with
    '.' || domain) — the registered-domain suffix rule every URL
    filter list (UT1, DNS RPZ exports, ad-block hosts files) uses.
    The MOST SPECIFIC (longest) matching domain wins, so a list with
    both 'example.org' and 'ads.example.org' attributes
    'x.ads.example.org' to the latter. Equal-length distinct domains
    can never both match one host (same-length suffix = same suffix),
    so the order is total.

    The list is compiled into a codegen'd CASE chain — for the
    tens-to-hundreds-entry lists this targets, that beats a broadcast
    join (no build side, no hashing; the match runs inside the scan's
    whole-stage codegen). For 100k+-entry lists, broadcast-join a
    (domain) frame on the same suffix predicate instead."""
    h = F.lower(F.col(host) if isinstance(host, str) else host)
    expr = F.lit(None).cast("string")
    # ascending length, each new branch wraps the previous as its
    # otherwise -> the longest match ends up outermost and wins
    for d in sorted(set(domains), key=lambda x: (len(x), x)):
        dl = d.lower()
        cond = (h == dl) | h.endswith("." + dl)
        expr = F.when(cond, F.lit(dl)).otherwise(expr)
    return expr


def url_blocklist_gate(
    df,
    domains: list[str],
    url_col: str = "url",
):
    """Per-domain URL blocklist gate riding host_expr: adds
    (host, blocked_by, blocked) to the frame — host '' when the value
    is not an http(s) URL (never blocked: the gate is a DOMAIN rule;
    pair with uri_risk for path-shaped threats). Row-local codegen'd
    projection — scan speed at any scale, no shuffle, no state."""
    # materialize host FIRST and match on the column reference — the
    # CASE chain carries two comparisons per domain, and inlining the
    # regexp_extract subtree would duplicate it ~2N+1 times per row
    return (
        df.withColumn("host", host_expr(url_col))
        .withColumn("blocked_by", blocked_by_expr(F.col("host"), domains))
        .withColumn("blocked", F.col("blocked_by").isNotNull())
    )
