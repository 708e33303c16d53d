"""Streaming twin of pipelines/split.mix_temperature — continuously
updated sampling-temperature weights over an unbounded corpus feed.

Per-source (n_docs, n_tokens) totals merge by SUM — commutative and
associative, so like streaming/hll.py (max-merge) the final state is
EXACTLY the batch aggregate regardless of arrival order or batch
slicing: parity is free, no frozen reference corpus needed (contrast
the frozen-model twins gate/resample, which pin a reference to keep
batch/stream results comparable). Each micro-batch contributes one
map-side-combinable aggregate (|sources-in-batch| rows to the
driver); the p^alpha normalization re-derives from the running totals
with the SAME basis-point quantization as the batch operator, so
`weights()` after the last batch is row-identical to
mix_temperature() over the union of all batches.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mix_temperature_stream_writer(
    sink: Callable[[list[tuple], int], None],
    group_col: str = "source",
    text_col: str = "text",
    alpha: float = 0.7,
) -> Callable[[DataFrame, int], None]:
    """Build the foreachBatch function. After each micro-batch,
    `sink(rows, batch_id)` receives the CURRENT
    [(group, n_docs, n_tokens, raw_bp, temp_bp, boost_bp)] list over
    everything seen so far. Exposes `.totals` (the merged state) and
    `.weights()` for parity checks."""
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    from webloghunter_spark.functions.text import token_count_expr

    state: dict[str, list[int]] = {}  # group -> [n_docs, n_tokens]

    def weights() -> list[tuple]:
        import math

        tot = float(sum(v[1] for v in state.values()))
        # zero-token guards MATCH the batch operator exactly (a group
        # of all-empty docs, or a whole corpus of them, must not
        # ZeroDivisionError the stream NOR break row parity): raw
        # pins to 0 when tot = 0, temp pins to 0 when z = 0, boost
        # pins to 0 when the group has no tokens.
        raws = {
            g: (v[1] / tot if tot > 0 else 0.0)
            for g, v in state.items()
        }
        # normalizer contributions quantized to the 1e-9 integer grid
        # before summing (matching the batch operator and the DuckDB
        # oracle exactly): the integer sum is order-free, so parity no
        # longer leans on float summation order at bp boundaries
        z = (
            sum(
                int(math.floor(raws[g] ** alpha * 1e9 + 0.5))
                for g in raws
            )
            / 1e9
        )

        def bp(x: float) -> int:
            return int(math.floor(x * 10000.0 + 0.5))

        out = []
        for g in sorted(state):
            n_docs, n_tokens = state[g]
            raw = raws[g]
            temp = raw ** alpha / z if z > 0 else 0.0
            boost = bp(temp / raw) if n_tokens > 0 else 0
            out.append(
                (g, n_docs, n_tokens, bp(raw), bp(temp), boost)
            )
        return out

    # bounded replay guard: batch_ids are monotone within a query, so
    # one high-water int gives identical at-least-once protection
    # without accumulating a set entry per micro-batch forever
    last_seen = [-1]

    def process(batch_df: DataFrame, batch_id: int) -> None:
        # foreachBatch is at-least-once: a replayed micro-batch arrives
        # with the SAME batch_id — re-adding its doc/token totals would
        # double-count, so replays only re-emit the current weights.
        if batch_id > last_seen[0]:
            last_seen[0] = batch_id
            rows = (
                batch_df.groupBy(group_col)
                .agg(
                    F.count(F.lit(1)).alias("_d"),
                    F.sum(
                        token_count_expr(text_col).cast("long")
                    ).alias("_t"),
                )
                .collect()
            )
            for r in rows:
                cur = state.setdefault(r[group_col], [0, 0])
                cur[0] += int(r["_d"])
                cur[1] += int(r["_t"] or 0)
        sink(weights(), batch_id)

    process.totals = state
    process.weights = weights
    return process


def upsample_epochs_stream_writer(
    plan: dict,
    sink: Callable[[list[tuple], int], None],
    group_col: str = "source",
    id_col: str = "doc_id",
    max_epochs: int = 4,
) -> Callable[[DataFrame, int], None]:
    """Streaming twin of pipelines/split.upsample_epochs under a
    FROZEN repetition plan: `plan` maps group -> boost_bp (take it
    from a batch mix_temperature over the reference corpus, or from
    this module's mix_temperature_stream_writer.weights()); each
    arriving document expands row-locally to its group's
    clamp(ceil(boost/10000), 1, max_epochs) epochs — the same
    integer-`div` arithmetic as the batch operator. STATELESS: each
    `sink(rows, batch_id)` call carries only THAT micro-batch's
    (id, group, epoch, n_epochs) rows (sorted), and the union of all
    calls equals the batch result over the same documents — parity
    by statelessness, replay-idempotent when the sink keys on
    (batch_id) or (id, epoch). No driver-side accumulation: a
    10M-doc stream costs O(batch) per trigger, never O(stream)
    (the frozen-model discipline: a repetition plan is pinned per
    training run, not re-fit per micro-batch)."""
    if max_epochs <= 0:
        raise ValueError(f"max_epochs must be > 0, got {max_epochs}")
    epochs = {
        g: min(max_epochs, max(1, (int(b) + 9999) // 10000))
        for g, b in plan.items()
    }

    def process(batch_df: DataFrame, batch_id: int) -> None:
        rows = []
        for r in batch_df.select(id_col, group_col).collect():
            g = r[group_col]
            if g not in epochs:
                raise ValueError(
                    f"upsample_epochs_stream_writer: group {g!r} not in"
                    f" the frozen plan — re-fit the plan batch-side."
                )
            n = epochs[g]
            rows.extend((r[id_col], g, e, n) for e in range(n))
        rows.sort()
        sink(rows, batch_id)

    return process
