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
  row in the span is stamped (tool, name, description) and claimed;
- on overlapping assignments the LAST one wins (risk.py:498-501).

This is a greedy set-cover over a sliding window — not expressible as
relational windows — so the per-group kernel runs in `applyInPandas`
over (source, ip, cluster). Keyword membership is precomputed as native
`contains` columns BEFORE the shuffle (mirroring the reference's
vectorized precompute, risk.py:414-420), so the Python kernel only does
the greedy scan on small per-group arrays. Groups are bounded by
sessionization, so per-group pandas is safe at scale; the shuffle is on
the same (source, ip) family of keys the rest of the pipeline uses.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
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


def _scan_group(pdf: pd.DataFrame, signatures, kw_cols) -> pd.DataFrame:
    # (_unix_ts, ordinal) gives a deterministic time order under shuffles
    # (the reference relies on stable input order for tie-breaks).
    sort_cols = ["_unix_ts"] + (["ordinal"] if "ordinal" in pdf.columns else [])
    pdf = pdf.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
    n = len(pdf)
    tool = [""] * n
    tname = [""] * n
    tdesc = [""] * n
    for sig in signatures:
        req_kw = [k for k in kw_cols[sig["tool"]]]
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
        times = pdf["_unix_ts"].to_numpy()
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
    return pdf


def tool_scanner(
    df: DataFrame,
    signatures: list[dict] | None = None,
    ts_col: str = "utc_timestamp",
) -> DataFrame:
    signatures = signatures if signatures is not None else DEFAULT_TOOL_SIGNATURES
    uri_lower = F.lower(F.col("request_uri").cast("string"))

    # Native, codegen'd keyword membership columns (the slow path only
    # sees booleans).
    kw_cols: dict[str, list[tuple[str, str]]] = {}
    tmp = df.withColumn("_unix_ts", F.unix_timestamp(F.col(ts_col)))
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
            tmp = tmp.withColumn(cname, uri_lower.contains(k))
            pairs.append((k, cname))
        kw_cols[sig["tool"]] = pairs

    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in tmp.schema.fields
    ) + ", tool string, tool_name string, tool_desc string"

    result = tmp.groupBy(*GROUP_COLS).applyInPandas(
        lambda pdf: _scan_group(pdf, signatures, kw_cols), schema=out_schema
    )
    drop = ["_unix_ts"] + [c for pairs in kw_cols.values() for _, c in pairs]
    return result.drop(*drop)
