"""Streaming burst detection — the stateful-streaming re-expression of
the batch burst detector (reference risk.py:335-382, D1 in SURVEY §2.10).

Batch semantics: within a key group, a "burst" is a run of error
(status 500) events whose inter-arrival gap is <= max_gap_seconds and
whose length reaches min_requests. The batch path finds completed runs
with lag/cumsum windows; here the run is carried as PER-KEY STATE across
micro-batches with `applyInPandasWithState`, so a burst spanning many
batches is still detected and each burst is emitted exactly once (when
it first reaches min_requests).

State per key (ip, request_uri, method):
    run_count, run_start_epoch, last_epoch, emitted(0/1)

Event-time ordering within a batch is restored by sorting the group's
rows (micro-batches deliver unordered); cross-batch disorder is bounded
by the upstream watermark. A processing-time timeout clears idle keys
so state size tracks the active-key set, not history — the property
that makes this run indefinitely on an unbounded stream.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

BURST_OUT_SCHEMA = (
    "ip string, request_uri string, method string, "
    "burst_count long, min_time_epoch double, max_time_epoch double"
)
STATE_SCHEMA = "count long, start double, last double, emitted int"


def _burst_fn(min_requests: int, max_gap_seconds: float, idle_timeout_ms: int):
    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(
                columns="ip request_uri method burst_count min_time_epoch max_time_epoch".split()
            )
            return
        if state.exists:
            count, start, last, emitted = state.get
        else:
            count, start, last, emitted = 0, 0.0, 0.0, 0
        out = []
        ip, uri, method = key
        epochs: list[float] = []
        for pdf in pdfs:
            epochs.extend(float(e) for e in pdf["epoch"])
        epochs.sort()
        for ep in epochs:
            if count > 0 and ep - last <= max_gap_seconds:
                count += 1
                last = ep
            else:
                count, start, last, emitted = 1, ep, ep, 0
            if count >= min_requests and not emitted:
                out.append((ip, uri, method, count, start, last))
                emitted = 1
        state.update((count, start, last, emitted))
        state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            out,
            columns="ip request_uri method burst_count min_time_epoch max_time_epoch".split(),
        )

    return fn


def burst_stream(
    events: DataFrame,
    min_requests: int = 100,
    max_gap_seconds: float = 1.0,
    ts_col: str = "utc_timestamp",
    error_status: int = 500,
    idle_timeout_ms: int = 3_600_000,
) -> DataFrame:
    """Error-burst records from a stream of parsed log events.

    Input needs: ip, request_uri, method, status, `ts_col`. Emits one
    row per detected burst, keyed (ip, request_uri, method), when the
    run first reaches `min_requests`."""
    errors = events.filter(F.col("status") == error_status).select(
        "ip",
        "request_uri",
        "method",
        F.unix_timestamp(F.col(ts_col)).cast("double").alias("epoch"),
    )
    return errors.groupBy("ip", "request_uri", "method").applyInPandasWithState(
        _burst_fn(min_requests, max_gap_seconds, idle_timeout_ms),
        outputStructType=BURST_OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
