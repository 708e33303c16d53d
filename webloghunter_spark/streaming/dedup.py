"""Streaming exact deduplication — the online twin of
pipelines/dedup.exact_dedup.

A training-data ingest stream dedups on a content fingerprint (e.g.
`fingerprint_expr`'s md5 of normalized text). State shape matters:

- `dropDuplicatesWithinWatermark` (default here) keeps one state row
  per key only until the watermark passes it — BOUNDED state, the
  correct choice when duplicates arrive close together (re-crawls,
  retry storms). A duplicate arriving after the horizon is re-emitted.
- `dropDuplicates` keeps every key forever — exact over the whole
  stream, unbounded state; only for key spaces known to be small.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def dedup_stream(
    events: DataFrame,
    key_cols: Sequence[str] = ("fingerprint",),
    ts_col: str = "ts",
    watermark: str = "1 hour",
    within_watermark: bool = True,
) -> DataFrame:
    """First occurrence per key; see module docstring for the state
    trade-off behind `within_watermark`."""
    wm = events.withWatermark(ts_col, watermark)
    if within_watermark:
        return wm.dropDuplicatesWithinWatermark(list(key_cols))
    return wm.dropDuplicates(list(key_cols))
