"""Streaming frequency-sketch twin of functions/sketches.cms_counters.

Count-Min counters merge by SUM — commutative and associative — so
like the hll twin (max-merge) and the mix twin (sum-merge), streaming
parity is free: the merged counter table after any sequence of
micro-batches is EXACTLY the batch sketch over the union of the
batches, regardless of arrival order or batch slicing. Per micro-batch
the batch-side `cms_counters` runs (map-side combinable, <=
depth*width cells), the counter rows merge into a driver-held dict
(the sketch is fixed-size by construction — that is its 100 TB
point), and the sink gets the current estimates for a frozen query
set, so a heavy-hitter dashboard updates per batch without ever
re-scanning history.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webloghunter_spark.functions.sketches import (
    CMS_DEPTH,
    CMS_WIDTH,
    cms_counters,
)
from webloghunter_spark.functions.text import tokens_expr


def cms_bucket_py(value: str, row: int, width: int = CMS_WIDTH) -> int:
    """Python mirror of cms_bucket_expr (md5('row|value') first 12 hex
    digits mod width) for driver-side estimate lookups."""
    import hashlib

    h = hashlib.md5(f"{row}|{value}".encode()).hexdigest()
    return int(h[:12], 16) % width


def cms_token_stream_writer(
    sink: Callable[[list[tuple], int], None],
    query_tokens: list[str],
    text_col: str = "text",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> Callable[[DataFrame, int], None]:
    """Build the foreachBatch function: each micro-batch's token
    stream is sketched with the batch kernel and summed into the
    running counter table; `sink(rows, batch_id)` receives the
    CURRENT [(token, est_cnt)] estimates for the frozen
    `query_tokens` (sorted by token). Exposes `.counters` (the merged
    (row, bucket) -> cnt state — the parity surface) and
    `.estimates()`."""
    state: dict[tuple[int, int], int] = {}

    def estimates() -> list[tuple]:
        out = []
        for tok in sorted(query_tokens):
            est = min(
                state.get((i, cms_bucket_py(tok, i, width)), 0)
                for i in range(depth)
            )
            out.append((tok, est))
        return out

    def process(batch_df: DataFrame, batch_id: int) -> None:
        toks = batch_df.select(
            F.explode(tokens_expr(text_col)).alias("_tok")
        )
        rows = cms_counters(toks, "_tok", depth=depth, width=width).collect()
        for r in rows:
            k = (int(r["row"]), int(r["bucket"]))
            state[k] = state.get(k, 0) + int(r["cnt"])
        sink(estimates(), batch_id)

    process.counters = state
    process.estimates = estimates
    return process
