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
- `windowed_counts_stream`: tumbling-window per-key request counts.

Both run against any streaming source; tests drive them with a file
source + memory sink + processAllAvailable().
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
