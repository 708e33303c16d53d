"""Sequence packing for LLM pretraining: concatenate-and-chunk.

GPT-style pretraining packs documents by concatenating them in a fixed
order and slicing the token stream into fixed-size training chunks; a
document then occupies a contiguous chunk span. This module computes
that mapping declaratively: with `prefix` = tokens preceding the doc
in its shard's order,

    first_chunk = floor(prefix / budget)
    last_chunk  = floor((prefix + ntok - 1) / budget)   (empty docs: first)

Packing runs PER SHARD (`shard_col`, default `source`): each shard is
an independent token stream, so the prefix sum is a window partitioned
by shard — parallel across shards, no global single-partition stage
(the global variant is sessionize's two-level prefix-sum problem; use
a composite shard key to keep shards bounded).

Deterministic: a pure function of (shard, order-key, token counts) —
repartition-stable, and appends to the END of a shard's order never
remap existing docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from webloghunter_spark.functions.text import token_count_expr


def pack_chunks(
    df: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    shard_col: str = "source",
    ntok_col: str | None = None,
) -> DataFrame:
    """Adds `ntok`, `first_chunk`, `last_chunk`, `n_chunks` per doc.

    `ntok_col` supplies precomputed token counts (e.g. a real
    tokenizer's); default derives whitespace counts from `text_col`."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    ntok = F.col(ntok_col) if ntok_col else token_count_expr(text_col)
    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df.withColumn("ntok", ntok.cast("long"))
    prefix = F.sum("ntok").over(w) - F.col("ntok")
    first = F.floor(prefix / budget)
    last = F.when(
        F.col("ntok") > 0, F.floor((prefix + F.col("ntok") - 1) / budget)
    ).otherwise(first)
    return (
        out.withColumn("first_chunk", first.cast("long"))
        .withColumn("last_chunk", last.cast("long"))
        .withColumn("n_chunks", (F.col("last_chunk") - F.col("first_chunk") + 1))
    )
