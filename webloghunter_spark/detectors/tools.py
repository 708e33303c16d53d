"""Scanning-tool signature detector (reference `tool_scanner`).

Semantics (/root/reference/WebLogTriage/risk.py:384-513): for each tool
signature {tool, name, description, keyword[], time_window}:
- candidate rows are those whose lowercased request_uri contains any
  keyword (substring, keywords lowercased/trimmed);
- within each (source, ip, cluster) group, scanning candidates in time
  order: starting from each not-yet-claimed candidate, extend forward
  through subsequent candidates while within `time_window` seconds of
  the start (window==0 means unbounded), accumulating which keywords
  were seen, stopping early once ALL of the tool's keywords are seen;
- if the accumulated span saw every keyword within the window, every
  CANDIDATE row in the span is stamped (tool, name, description) and
  claimed (non-candidate rows between them are never stamped,
  risk.py:493-501);
- on overlapping assignments the LAST one wins (risk.py:498-501).

The greedy set-cover scan is stateful and not expressible as relational
windows, but it only ever *reads* candidate rows — so the Python kernel
runs over candidates ONLY:

  1. keyword membership is computed JVM-side (codegen `contains`) on a
     slim projection (group keys, row key, epoch seconds, keyword
     booleans) and non-candidates are filtered out BEFORE the shuffle;
  2. `applyInPandas` over (source, ip, cluster) runs the greedy scan on
     the (typically tiny) per-group candidate arrays and emits one stamp
     row per claimed candidate;
  3. the stamp table — detections only, sparse by construction — is
     broadcast-joined back onto the untouched full frame.

At 100 TB the full table is never Arrow-serialized into Python: only
candidates (usually <0.1% of rows, a handful of narrow columns) shuffle,
and the wide frame takes one broadcast hash join, no exchange.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GROUP_COLS = ["source", "ip", "cluster"]

DEFAULT_TOOL_SIGNATURES = [
    {
        "tool": "DS01",
        "name": "DirSearch",
        "description": "DirSearch using default dictionary (dicc.txt).",
        "keyword": ["/.access", ".bak_0.log", ".chef/config.rb", ".isort.cfg", ".spacemacs", "/~xfs"],
        "time_window": 7200,
    }
]

_STAMP_COLS = ["tool", "tool_name", "tool_desc"]


def _scan_candidates(pdf: pd.DataFrame, signatures, kw_cols) -> pd.DataFrame:
    """Greedy scan over ONE group's candidate rows; returns stamp rows
    (group keys + _rk + tool/tool_name/tool_desc) for claimed candidates
    only. (_unix_ts, _rk) gives a deterministic time order under
    shuffles (the reference relies on stable input order for
    tie-breaks)."""
    pdf = pdf.sort_values(["_unix_ts", "_rk"], kind="mergesort").reset_index(drop=True)
    n = len(pdf)
    tool = [""] * n
    tname = [""] * n
    tdesc = [""] * n
    times = pdf["_unix_ts"].to_numpy()
    for sig in signatures:
        req_kw = kw_cols[sig["tool"]]
        if not req_kw:
            continue
        window = sig["time_window"]
        kw_mat = {k: pdf[c].to_numpy() for k, c in req_kw}
        any_mask = None
        for _, c in req_kw:
            m = pdf[c].to_numpy()
            any_mask = m if any_mask is None else (any_mask | m)
        cand = [i for i in range(n) if any_mask[i]]
        if not cand:
            continue
        claimed: set[int] = set()
        keys = [k for k, _ in req_kw]
        for i0, start in enumerate(cand):
            if start in claimed:
                continue
            start_time = times[start]
            span = [start]
            found = {k for k, c in req_kw if kw_mat[k][start]}
            for j in range(i0 + 1, len(cand)):
                nxt = cand[j]
                if window > 0 and (times[nxt] - start_time) > window:
                    break
                span.append(nxt)
                for k in keys:
                    if kw_mat[k][nxt]:
                        found.add(k)
                if found.issuperset(keys):
                    break
            span_times = times[span]
            time_span = (span_times.max() - span_times.min()) if len(span) > 1 else 0
            if found.issuperset(keys) and (window == 0 or time_span <= window):
                for idx in span:
                    tool[idx] = sig["tool"]
                    tname[idx] = sig["name"]
                    tdesc[idx] = sig["description"]
                    claimed.add(idx)
    pdf["tool"] = tool
    pdf["tool_name"] = tname
    pdf["tool_desc"] = tdesc
    stamped = pdf[pdf["tool"] != ""]
    return stamped[GROUP_COLS + ["_rk"] + _STAMP_COLS]


def tool_scanner(
    df: DataFrame,
    signatures: list[dict] | None = None,
    ts_col: str = "utc_timestamp",
) -> DataFrame:
    signatures = signatures if signatures is not None else DEFAULT_TOOL_SIGNATURES
    uri_lower = F.lower(F.col("request_uri").cast("string"))

    # Native, codegen'd keyword membership expressions (the Python path
    # only ever sees booleans, and only for candidate rows).
    kw_cols: dict[str, list[tuple[str, str]]] = {}
    kw_exprs: dict[str, Column] = {}
    i = 0
    for sig in signatures:
        pairs = []
        seen = set()
        for kw in sig.get("keyword", []):
            if not isinstance(kw, str) or not kw.strip():
                continue
            k = kw.lower().strip()
            if k in seen:
                continue
            seen.add(k)
            cname = f"_kw_{i}"
            i += 1
            kw_exprs[cname] = uri_lower.contains(k)
            pairs.append((k, cname))
        kw_cols[sig["tool"]] = pairs

    if not kw_exprs:
        out = df
        for c in _STAMP_COLS:
            out = out.withColumn(c, F.lit(""))
        return out

    # Row identity for the stamp join-back: `ordinal` when the caller
    # provides one (globally unique in parsed-log frames), else a
    # synthetic id — deterministic for a given scan partitioning, which
    # both plan branches below share.
    if "ordinal" in df.columns:
        keyed, key = df, "ordinal"
    else:
        keyed, key = df.withColumn("_row_key", F.monotonically_increasing_id()), "_row_key"

    any_kw = None
    for cname in kw_exprs:
        any_kw = F.col(cname) if any_kw is None else (any_kw | F.col(cname))
    slim = (
        keyed.select(
            *GROUP_COLS,
            F.col(key).alias("_rk"),
            F.unix_timestamp(F.col(ts_col)).alias("_unix_ts"),
            *[expr.alias(cname) for cname, expr in kw_exprs.items()],
        )
        .filter(any_kw)
    )

    stamp_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in slim.schema.fields
        if f.name in GROUP_COLS or f.name == "_rk"
    ) + ", tool string, tool_name string, tool_desc string"
    stamps = slim.groupBy(*GROUP_COLS).applyInPandas(
        lambda pdf: _scan_candidates(pdf, signatures, kw_cols), schema=stamp_schema
    ).withColumnRenamed("_rk", key)

    joined = keyed.join(F.broadcast(stamps), on=GROUP_COLS + [key], how="left")
    for c in _STAMP_COLS:
        joined = joined.withColumn(c, F.coalesce(F.col(c), F.lit("")))
    return joined.drop("_row_key") if key == "_row_key" else joined
