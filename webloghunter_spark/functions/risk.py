"""Per-row risk scoring.

Parity targets (constants cited from the reference):
- method risk table: /root/reference/WebLogTriage/risk.py:275-287
- status risk table + range buckets: risk.py:289-312
- URI risk (nested decode, sensitive paths, traversal, webshell names,
  double extension, risky extension, cap 100): risk.py:196-332

`method_risk` and `status_risk` are pure CASE expressions — JVM-side,
whole-stage-codegen'd, zero Python in the hot path. `uri_risk` needs
urllib-exact percent-decoding and a set lookup against the webshell
name list, so it is a vectorized pandas UDF with the (small) shell set
shipped in the closure (broadcast once per executor, not per row).
"""

from __future__ import annotations

import os
import re
from collections.abc import Sequence
from urllib.parse import unquote, urlparse

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

METHOD_RISK = {
    "GET": 10,
    "HEAD": 20,
    "OPTIONS": 25,
    "POST": 45,
    "PUT": 80,
    "DELETE": 80,
    "TRACE": 80,
    "CONNECT": 80,
}
METHOD_RISK_DEFAULT = 60

STATUS_RISK = {
    100: 20, 101: 20,
    200: 30, 201: 90, 202: 35, 204: 25, 207: 70,
    301: 10, 302: 10, 304: 20,
    400: 15, 401: 30, 403: 40, 404: 10, 429: 35,
    500: 90, 502: 70, 503: 70, 504: 70,
}
STATUS_RISK_BUCKETS = [(100, 200, 25), (200, 300, 35), (300, 400, 15), (400, 500, 25), (500, 600, 80)]
STATUS_RISK_DEFAULT = 90

DEFAULT_SENSITIVE_PATHS = ("/admin", "/login", "/config", "/setup", "/upload")
DEFAULT_RISKY_EXTENSIONS = (r"\.exe", r"\.sql", r"\.cgi", r"\.pl")

_TRAVERSAL_PATTERNS = [r"\.\./", r"\.\.\\", r"/\.\.", r"\\\.\.", r"%00", "�"]


def method_risk_expr(col: Column | str = "method") -> Column:
    c = F.upper(F.col(col) if isinstance(col, str) else col)
    expr = F.lit(METHOD_RISK_DEFAULT)
    case = None
    for meth, score in METHOD_RISK.items():
        cond = c == meth
        case = F.when(cond, score) if case is None else case.when(cond, score)
    return case.otherwise(expr).cast("int")


def status_risk_expr(col: Column | str = "status") -> Column:
    c = (F.col(col) if isinstance(col, str) else col).cast("int")
    case = None
    for code, score in STATUS_RISK.items():
        cond = c == code
        case = F.when(cond, score) if case is None else case.when(cond, score)
    for lo, hi, score in STATUS_RISK_BUCKETS:
        case = case.when((c >= lo) & (c < hi), score)
    return case.otherwise(F.lit(STATUS_RISK_DEFAULT)).cast("int")


def _decode_nested(url: str, max_depth: int = 3) -> tuple[str, int]:
    # Iterative unquote, stop at fixpoint or depth cap (risk.py:230-242).
    depth = 0
    for _ in range(max_depth):
        try:
            decoded = unquote(url)
        except Exception:
            break
        if decoded == url:
            break
        depth += 1
        url = decoded
    return url, depth


def _uri_risk_one(
    uri: str,
    shells: frozenset[str],
    sensitive_paths: tuple[str, ...],
    risky_ext: tuple[re.Pattern, ...],
) -> int:
    decoded, depth = _decode_nested(uri)
    score = 20 if depth >= 2 else 10 if depth == 1 else 0
    low = decoded.lower()
    if any(p in low for p in sensitive_paths):
        score += 25
    parsed = urlparse(decoded)
    path, query = parsed.path or "", parsed.query or ""
    in_path = any(re.search(p, path, re.IGNORECASE) for p in _TRAVERSAL_PATTERNS if path)
    in_query = any(re.search(p, query, re.IGNORECASE) for p in _TRAVERSAL_PATTERNS if query)
    if in_path:
        score += 80
    elif in_query:
        score += 15
    # Known webshell basename (decoded again, query stripped — risk.py:328-332).
    fname = os.path.basename(unquote(decoded).split("?", 1)[0])
    if fname in shells:
        score += 50
    if re.search(r"\.php\.[a-zA-Z0-9]+$", decoded, re.IGNORECASE):
        score += 80
    if any(p.search(low) for p in risky_ext):
        score += 10
    return min(score, 100)


def load_shells(path: str | None) -> frozenset[str]:
    """Load a webshell-filename list (one per line, '#' comments)."""
    if not path or not os.path.exists(path):
        return frozenset()
    with open(path) as fp:
        return frozenset(
            line.strip() for line in fp if line.strip() and not line.startswith("#")
        )


def uri_risk_udf(
    shells: frozenset[str] | None = None,
    sensitive_paths: Sequence[str] = DEFAULT_SENSITIVE_PATHS,
    risky_extensions: Sequence[str] = DEFAULT_RISKY_EXTENSIONS,
):
    """Vectorized Arrow UDF computing the 0-100 URI risk score.

    NULL rows score 0 without entering the per-row scorer (same result
    as the old fillna('') path — the empty URI scores 0 on every
    signal — but vectorized, so `uri_risk_col`'s masked routing pays
    ~nothing in Python for the rows the native path already covered).
    """
    shells = frozenset(shells or ())
    paths = tuple(p.lower() for p in sensitive_paths)
    exts = tuple(re.compile(p) for p in risky_extensions)

    @F.pandas_udf(T.IntegerType())
    def _udf(uris: pd.Series) -> pd.Series:
        nn = uris.notna()
        out = pd.Series(0, index=uris.index, dtype="int32")
        if nn.any():
            out[nn] = (
                uris[nn]
                .map(lambda u: _uri_risk_one(u, shells, paths, exts))
                .astype("int32")
            )
        return out

    return _udf


def uri_risk_col(
    col: Column | str,
    shells: frozenset[str] | None = None,
    sensitive_paths: Sequence[str] = DEFAULT_SENSITIVE_PATHS,
    risky_extensions: Sequence[str] = DEFAULT_RISKY_EXTENSIONS,
) -> Column:
    """URI risk with a whole-stage-codegen fast path for plain URIs.

    A URI with no '%' cannot percent-decode (depth 0, +0) or contain
    the '%00' pattern, so for such rows every remaining signal
    (sensitive-path substring, traversal in path vs query, webshell
    basename, double extension, risky extension) is computable with
    native string expressions — no Python, no Arrow transfer cost
    beyond a NULL column. Rows that the native path cannot replicate
    bit-for-bit are routed to the Arrow UDF unchanged:

      '%'        percent-decoding (the UDF's reason to exist)
      '#' ';'    urlparse splits fragment / path-params off `path`
      ':' '//'-prefix  scheme / netloc parsing
      tab/newline/CR   urlparse strips WHATWG control chars

    Access-log request URIs are overwhelmingly plain ('/path?query'),
    so at scale the Python cost collapses to the rare encoded rows —
    the UDF input is NULL-masked for native rows and `uri_risk_udf`
    scores NULLs vectorized. `risky_extensions` patterns must be
    Python+Java-regex-compatible (the defaults are), same shared-regex
    contract as the rest of the engine.

    Reference semantics: /root/reference/WebLogTriage/risk.py:196-332.
    """
    shells = frozenset(shells or ())
    raw = F.col(col) if isinstance(col, str) else col
    c = F.coalesce(raw, F.lit(""))
    needs_udf = (
        c.contains("%")
        | c.contains("#")
        | c.contains(";")
        | c.contains(":")
        | c.contains("\t")
        | c.contains("\n")
        | c.contains("\r")
        | c.startswith("//")
    )

    low = F.lower(c)
    qpos = F.instr(c, "?")
    path = F.when(qpos > 0, c.substr(F.lit(1), qpos - 1)).otherwise(c)
    query = F.when(qpos > 0, c.substr(qpos + 1, F.length(c))).otherwise(F.lit(""))

    def _trav(s: Column) -> Column:
        return (
            s.contains("../")
            | s.contains("..\\")
            | s.contains("/..")
            | s.contains("\\..")
            | s.contains("�")
        )

    sensitive = None
    for p in sensitive_paths:
        cond = low.contains(p.lower())
        sensitive = cond if sensitive is None else (sensitive | cond)
    score = F.when(sensitive if sensitive is not None else F.lit(False), 25).otherwise(0)
    score = score + F.when(_trav(path), 80).when(_trav(query), 15).otherwise(0)
    if shells:
        fname = F.substring_index(path, "/", -1)
        score = score + F.when(fname.isin(*sorted(shells)), 50).otherwise(0)
    score = score + F.when(c.rlike(r"(?i)\.php\.[a-zA-Z0-9]+$"), 80).otherwise(0)
    risky = None
    for p in risky_extensions:
        cond = low.rlike(p)
        risky = cond if risky is None else (risky | cond)
    score = score + F.when(risky if risky is not None else F.lit(False), 10).otherwise(0)
    native = F.least(score, F.lit(100))

    udf = uri_risk_udf(shells, sensitive_paths, risky_extensions)
    masked = udf(F.when(needs_udf, raw))
    return F.when(needs_udf, masked).otherwise(native).cast("int")
