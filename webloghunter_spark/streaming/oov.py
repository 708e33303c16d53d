"""Streaming twin of pipelines/select.oov_rate — per-document OOV
rates over an unbounded feed, against a FROZEN vocabulary.

The batch operator derives the vocab from the corpus itself; a stream
has no "the corpus", so the twin follows the frozen-model discipline
(gate's frozen LM, decontam's frozen gram set, incdedup's frozen
index): the top-k vocabulary is computed ONCE from a reference corpus
and persisted in the closure for the stream's life. Per batch the
scoring is stateless (explode + broadcast anti-join + per-doc
aggregate), so the union of per-batch outputs equals the batch
operator run with the same frozen vocab EXACTLY — parity by
statelessness. This is also the production semantics: a tokenizer's
vocab IS fixed at training time; scoring drift against a moving vocab
would be a bug, not a feature.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webloghunter_spark.functions.text import token_count_expr, tokens_expr


def frozen_vocab(
    ref_corpus: DataFrame, vocab_size: int = 1000, text_col: str = "text"
) -> DataFrame:
    """Top-`vocab_size` token vocabulary of the reference corpus
    (count DESC, token ASC — the batch operator's tie rule),
    persisted; caller releases via .unpersist()."""
    v = (
        ref_corpus.select(F.explode(tokens_expr(text_col)).alias("_tok"))
        .groupBy("_tok")
        .agg(F.count(F.lit(1)).alias("_n"))
        .orderBy(F.col("_n").desc(), F.col("_tok"))
        .limit(vocab_size)
        .select("_tok")
        .persist()
    )
    v.count()  # settle
    return v


def oov_rate_stream_writer(
    sink: Callable[[list[tuple], int], None],
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> Callable[[DataFrame, int], None]:
    """Build the foreachBatch function: per micro-batch, `sink(rows,
    batch_id)` receives [(id, ntok, n_oov, oov_bp)] for the batch's
    documents, scored against the frozen `vocab` (from
    `frozen_vocab`, or any persisted single-column `_tok` frame)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        toks = batch_df.select(
            F.col(id_col), F.explode(tokens_expr(text_col)).alias("_tok")
        )
        oov = (
            toks.join(F.broadcast(vocab), "_tok", "left_anti")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_oov"))
        )
        rows = (
            batch_df.select(
                F.col(id_col),
                token_count_expr(text_col).cast("long").alias("ntok"),
            )
            .join(oov, id_col, "left")
            .select(
                id_col,
                "ntok",
                F.coalesce(F.col("n_oov"), F.lit(0)).alias("n_oov"),
                F.when(
                    F.col("ntok") > 0,
                    F.floor(
                        F.coalesce(F.col("n_oov"), F.lit(0))
                        * 10000.0
                        / F.col("ntok")
                        + F.lit(0.5)
                    ),
                )
                .otherwise(F.lit(0))
                .cast("long")
                .alias("oov_bp"),
            )
            .collect()
        )
        sink([tuple(r) for r in rows], batch_id)

    return process
