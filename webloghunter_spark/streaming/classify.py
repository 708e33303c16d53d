"""Streaming twin of pipelines/classify.quality_classifier_scores —
score an unbounded document feed under FROZEN classifier weights.

The frozen-model discipline (gate's LM, decontam's gram set, oov's
vocab, drift's reference histogram): training happens once, batch-side
(`train_quality_classifier`); the stream only SCORES. Scoring is
row-local — a document's logit depends on its own tokens and the
static weight vector — so each micro-batch runs the exact batch scorer
and the union of per-batch outputs equals the batch result: parity by
statelessness, no cross-batch state, replay-idempotent by keyed
overwrite. This is also the production semantics: a quality filter's
weights are pinned for a crawl snapshot; re-training mid-stream would
make acceptance time-dependent.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

from webloghunter_spark.pipelines.classify import (
    CLS_BUCKETS,
    quality_classifier_scores,
)


def quality_scores_stream_writer(
    weights: list[tuple[int, int]],
    sink: Callable[[list[tuple], int], None],
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = CLS_BUCKETS,
) -> Callable[[DataFrame, int], None]:
    """Build the foreachBatch function: per micro-batch, `sink(rows,
    batch_id)` receives the CURRENT accumulated
    [(id, ntok, logit_micro, prob_bp)] list, sorted by id. Exposes
    `.state` (id -> row, the parity surface)."""
    state: dict = {}

    def process(batch_df: DataFrame, batch_id: int) -> None:
        rows = quality_classifier_scores(
            batch_df, weights, text_col=text_col, id_col=id_col,
            n_buckets=n_buckets,
        ).collect()
        for r in rows:
            state[r[id_col]] = (
                int(r["ntok"]), int(r["logit_micro"]), int(r["prob_bp"])
            )
        sink(
            [(i, *v) for i, v in sorted(state.items())], batch_id
        )

    process.state = state
    return process
