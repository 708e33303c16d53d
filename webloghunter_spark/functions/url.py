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
