"""Structured Streaming variants of the engine's sequence operators.

The reference is strictly batch (SURVEY §2.12); these re-express its
sessionization (D3/W1-W5) and repeat-count (A1) over an unbounded
stream, with watermarks for late data:

- `sessionize_stream`: `session_window(ts, gap)` aggregation. Note the
  boundary semantics differ from the batch sessionizer by design:
  Spark's session_window closes a session when the NEXT event is >= gap
  after the PREVIOUS EVENT's window end, while the batch path
  (dataframe.py:630-636 parity) starts a new session at gap >= threshold
  from the previous event — identical grouping for gap != threshold
  edge cases except the exact-equal boundary, which session_window
  treats as same-session. Documented, not hidden.
- `sessionize_stream_exact`: stateful (`applyInPandasWithState`)
  variant with the batch sessionizer's EXACT boundary rule (a gap of
  exactly `threshold` starts a new session). Emits one record per
  CLOSED session; the trailing open session flushes on idle timeout.
  Per-key state is four numbers, so state tracks the active-key set.
- `windowed_counts_stream`: tumbling-window per-key request counts.

Both run against any streaming source; tests drive them with a file
source + memory sink + processAllAvailable().
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def sessionize_stream(
    events: DataFrame,
    group_cols: tuple[str, ...] = ("user_id",),
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-(group, session) aggregate rows: start/end/n_events."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), f"{gap_seconds} seconds"),
            *group_cols,
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("first_ts"),
            F.max(ts_col).alias("last_ts"),
        )
        .select(
            *group_cols,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "first_ts",
            "last_ts",
        )
    )


def windowed_counts_stream(
    events: DataFrame,
    group_cols: tuple[str, ...] = ("user_id", "event_type"),
    ts_col: str = "ts",
    window: str = "5 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), *group_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            *group_cols,
            F.col("window.start").alias("window_start"),
            "n",
        )
    )


SESSION_OUT_SCHEMA = (
    "source string, ip string, local_session long, "
    "start_epoch double, end_epoch double, n_events long"
)
SESSION_STATE_SCHEMA = "local long, start double, last double, n long"


def _session_fn(threshold: float, idle_timeout_ms: int):
    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        cols = "source ip local_session start_epoch end_epoch n_events".split()
        source, ip = key
        if state.hasTimedOut:
            # Flush the trailing open session but KEEP the per-key
            # session counter: state.remove() here would restart
            # local_session at 0 on the key's next event, emitting a
            # duplicate (source, ip, local_session) identity and
            # breaking batch parity for long-lived keys. Retained state
            # is four numbers per key; the re-armed timeout keeps
            # firing (emitting nothing once n == 0), which is the price
            # of a monotone counter without a key-death oracle.
            local, start, last, n = state.get
            out = [(source, ip, int(local), float(start), float(last), int(n))] if n else []
            if n:
                state.update((local + 1, 0.0, 0.0, 0))
            state.setTimeoutDuration(idle_timeout_ms)
            yield pd.DataFrame(out, columns=cols)
            return
        if state.exists:
            local, start, last, n = state.get
        else:
            local, start, last, n = 0, 0.0, 0.0, 0
        epochs = []
        for pdf in pdfs:
            epochs.extend(float(e) for e in pdf["epoch"])
        epochs.sort()
        out = []
        for ep in epochs:
            # batch rule (dataframe.py:630-636): gap >= threshold starts
            # a NEW session; the closed one is emitted
            if n and ep - last >= threshold:
                out.append((source, ip, int(local), float(start), float(last), int(n)))
                local, start, n = local + 1, ep, 0
            elif not n:
                start = ep
            n += 1
            last = ep
        state.update((local, start, last, n))
        state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(out, columns=cols)

    return fn


def sessionize_stream_exact(
    events: DataFrame,
    ts_col: str = "utc_timestamp",
    threshold: int = 60,
    idle_timeout_ms: int = 3_600_000,
) -> DataFrame:
    """Batch-boundary-exact streaming sessionization keyed
    (source, ip): one record per closed session, local ids counted per
    key in arrival order (the batch GLOBAL dense id is a cross-key
    renumbering that requires the full key set — derive it downstream
    if needed; (source, ip, local_session) is the stable identity).

    idle_timeout_ms must cover the session threshold: a timeout shorter
    than the gap would flush-and-split sessions the batch sessionizer
    merges."""
    if idle_timeout_ms < threshold * 1000:
        raise ValueError(
            f"idle_timeout_ms ({idle_timeout_ms}) must be >= threshold*1000 "
            f"({threshold * 1000}); a shorter idle timeout flushes open "
            "sessions the batch rule would continue"
        )
    keyed = events.select(
        "source",
        "ip",
        F.unix_timestamp(F.col(ts_col)).cast("double").alias("epoch"),
    )
    return keyed.groupBy("source", "ip").applyInPandasWithState(
        _session_fn(float(threshold), idle_timeout_ms),
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
