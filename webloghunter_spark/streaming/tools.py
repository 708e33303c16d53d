"""Streaming tool detection — stateful analogue of the batch tool
scanner (reference risk.py:384-513, D2 in SURVEY §2.10).

Batch semantics stamp every row of a completed keyword span; a stream
cannot retro-stamp rows already emitted, so the streaming contract is a
DETECTION RECORD per completed signature: (ip, tool, first_ts, last_ts,
n_hits), emitted the moment the last missing keyword arrives within the
signature's time window. Detection timing matches the batch scanner
exactly: candidates older than one window can neither extend nor start
a viable span (their window is closed), so pruning state to the window
is lossless, and the batch greedy forward scan reduces to "emit when
the retained candidates' keyword union completes, then claim them".

Scale design:
- keyword→row matching runs JVM-side: each row is annotated with a
  per-signature keyword BITMASK (contains() chain, whole-stage
  codegen), rows matching no signature are filtered before the shuffle
  — the stateful operator sees only candidate rows, and per-key state
  is the candidate (epoch, bitmask) pairs of the LAST WINDOW only
  (window=0: a running union + two counters, O(1));
- state is keyed (ip, tool); an idle-state processing-time timeout
  bounds total state by the active (ip, tool) set.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence
from typing import Any, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

TOOL_OUT_SCHEMA = (
    "ip string, tool string, first_ts_epoch double, last_ts_epoch double, "
    "n_hits long"
)
TOOL_STATE_SCHEMA = "eps array<double>, bits array<long>"


def _norm_keywords(sig: dict) -> list[str]:
    """Lowercased/trimmed, de-duplicated keyword list — the SAME
    normalization the batch scanner applies (and reference
    risk.py:412-420), so the bitmask width matches full_mask."""
    out: list[str] = []
    for kw in sig.get("keyword", []):
        if not isinstance(kw, str) or not kw.strip():
            continue
        k = kw.lower().strip()
        if k not in out:
            out.append(k)
    return out


def _candidate_rows(events: DataFrame, signatures: Sequence[dict], ts_col: str) -> DataFrame:
    """(ip, tool, epoch, bits): one output row per (event, signature)
    whose URI contains any of the signature's keywords (case-
    insensitive, batch-scanner parity); `bits` is the bitmask of which
    keywords matched. All JVM-side."""
    uri_lower = F.lower(F.col("request_uri"))
    per_sig = []
    for sig in signatures:
        bits = F.lit(0).cast("long")
        for i, kw in enumerate(_norm_keywords(sig)):
            bits = bits + F.when(
                uri_lower.contains(kw), F.lit(1 << i).cast("long")
            ).otherwise(F.lit(0))
        per_sig.append(
            F.struct(F.lit(sig["tool"]).alias("tool"), bits.alias("bits"))
        )
    exploded = events.select(
        "ip",
        F.unix_timestamp(F.col(ts_col)).cast("double").alias("epoch"),
        F.explode(F.array(*per_sig)).alias("_s"),
    ).select("ip", "epoch", F.col("_s.tool").alias("tool"), F.col("_s.bits").alias("bits"))
    return exploded.filter(F.col("bits") != 0)


def _tool_fn(sig_by_tool: dict, idle_timeout_ms: int):
    """Per-key kernel, exact batch-detection semantics with bounded
    state: keep the candidate (epoch, bits) pairs of the last
    `time_window` seconds. A candidate older than window-from-now can
    neither extend a future span nor START one (its window is already
    closed), so pruning to the window is lossless — and after pruning,
    the batch scanner's greedy forward scan reduces to "emit the moment
    the buffer's keyword union completes, then claim (clear) the
    buffer". The old (mask, start) two-integer state dropped
    accumulated keywords on a window restart and missed spans the batch
    kernel finds from later candidates. State is bounded by the
    candidate rate within one window (window=0 keeps only the running
    union — one synthetic entry per keyword)."""

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        cols = "ip tool first_ts_epoch last_ts_epoch n_hits".split()
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(columns=cols)
            return
        ip, tool = key
        full_mask, time_window = sig_by_tool[tool]
        rows = []
        for pdf in pdfs:
            rows.extend(zip((float(e) for e in pdf["epoch"]), (int(b) for b in pdf["bits"])))
        rows.sort()
        out = []
        if time_window > 0:
            # windowed: candidate buffer pruned to the window
            if state.exists:
                eps, bits_buf = state.get
                buf = [(float(e), int(b)) for e, b in zip(eps, bits_buf)]
            else:
                buf = []
            for ep, bits in rows:
                # batch break condition is gap > window (== allowed)
                buf = [(e, b) for e, b in buf if ep - e <= time_window]
                buf.append((ep, bits))
                mask = 0
                for _, b in buf:
                    mask |= b
                if mask == full_mask:
                    out.append((ip, tool, buf[0][0], ep, len(buf)))
                    buf = []  # claimed, like the batch span
            state.update(([e for e, _ in buf], [b for _, b in buf]))
        else:
            # unbounded window: the span never breaks, so O(1) state
            # (running union, span start, hit count) is exact; encoded
            # as eps=[start, hits], bits=[mask]
            if state.exists:
                eps, bits_buf = state.get
                start, hits, mask = float(eps[0]), int(eps[1]), int(bits_buf[0])
            else:
                start, hits, mask = 0.0, 0, 0
            for ep, bits in rows:
                if hits == 0:
                    start = ep
                mask |= bits
                hits += 1
                if mask == full_mask:
                    out.append((ip, tool, start, ep, hits))
                    start, hits, mask = 0.0, 0, 0
            state.update(([start, float(hits)], [mask]))
        state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(out, columns=cols)

    return fn


def tool_stream(
    events: DataFrame,
    signatures: Sequence[dict],
    ts_col: str = "utc_timestamp",
    idle_timeout_ms: int = 3_600_000,
) -> DataFrame:
    """Tool-signature detections from a stream of parsed log events.

    `signatures` entries follow the batch scanner's shape:
    {"tool": id, "keyword": [..], "time_window": seconds (0 = unbounded)}.
    """
    sig_by_tool = {
        s["tool"]: ((1 << len(_norm_keywords(s))) - 1, float(s.get("time_window", 0)))
        for s in signatures
    }
    cands = _candidate_rows(events, signatures, ts_col)
    return cands.groupBy("ip", "tool").applyInPandasWithState(
        _tool_fn(sig_by_tool, idle_timeout_ms),
        outputStructType=TOOL_OUT_SCHEMA,
        stateStructType=TOOL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
