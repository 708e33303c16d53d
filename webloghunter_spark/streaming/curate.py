"""Streaming twin of pipelines/curate.curate_against — the INCREMENTAL
curate funnel as ONE foreachBatch composition over the per-stage
frozen artifacts.

Every stage compares batch docs against FROZEN state only (the
*_against / frozen-model discipline), so the composition inherits
slicing-independence from its stages: the union of per-batch survivor
sets over ANY micro-batch slicing equals the one-shot
pipelines/curate.curate_against run on the concatenated batches — and
therefore matches the registry `curate_incremental` query exactly when
fed its split (asserted every-prefix in
tests/test_batch_stream_parity.py).

Frozen artifacts, built ONCE per stream start and persisted in the
closure (never session.materialize(), whose registry is drained by
batch callers — the stream twins' convention):

    1. quality gate        none (row-local, stateless)
    2. exact-against       corpus normalized-key md5 digests
    3. near-against        the incremental_dedup_stream_writer closure
                           (corpus LSH band signatures + shingle sets)
    4. containment-against the containment_drop_stream_writer closure
                           (corpus 60-bit hashed-posting sets +
                           df-capped inverted index)
    5. decontamination     the frozen eval n-gram set

At-least-once replay is safe with zero cross-batch state: every
stage's decisions are deterministic against the frozen artifacts, so
a replayed batch re-emits identical rows (the at-least-once-correct
behavior; an early-return guard would LOSE rows when Spark replays a
batch whose sink failed mid-write).

Index freshness is the caller's policy, exactly as for the per-stage
twins: fold accepted survivors back into the corpus offline and
restart the stream with the new artifacts; folding in-stream would
break the asymmetric contract and the parity property both.

PRECONDITION (curate_against's, restated): ids must be globally
unique across batches and corpus — an id collision corrupts the
against-stage joins with no error.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def curate_against_stream_writer(
    sink: Callable[[list[tuple], int], None],
    corpus: DataFrame,
    eval_df: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality_bp: int | None = 5000,
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    near_dedup_threshold: float | None = 0.8,
    dedup_num_hashes: int = 8,
    dedup_band_size: int = 2,
    dedup_shingle_k: int = 3,
    containment_threshold_bp: int | None = 8000,
    containment_size_ratio_bp: int = 10000,
    containment_max_df: int = 20,
    decontam_n: int = 8,
) -> Callable[[DataFrame, int], None]:
    """Build the foreachBatch function. Per micro-batch, `sink(rows,
    batch_id)` receives the batch's SURVIVING (id,) rows (sorted,
    null-first — the twins' sink convention). Stage-skip semantics are
    curate_against's verbatim, including the documented coupling:
    `near_dedup_threshold=None` skips BOTH exact-against and
    near-against. Exposes `.release` to free every frozen artifact
    after stream stop.

    Stage chaining is id-list based: each stateful stage's verdicts
    are collected (micro-batch-bounded — the per-stage twins already
    collect to sink) and the survivor ids re-enter as a left-semi
    join frame, so batch text never round-trips through the driver.

    DISTRIBUTED-SINK DESIGN NOTE (round-14, the production-batch-size
    path — no code change here because the twins' sink CONTRACT is a
    driver callback and the registry twin is pinned to it): the id
    round-trip exists only because each stage's verdict frame funnels
    through `sink(rows, batch_id)`. At production micro-batch sizes
    the same composition chains WITHOUT any driver materialization:
    have each stateful stage write its survivor-id FRAME to durable
    storage partitioned by batch_id (or foreachBatch-local
    `batch.persist()` the verdict frame), left-semi join the NEXT
    stage against that frame directly, and let the terminal stage
    write surviving rows to the output table — ids then flow
    executor-to-executor and the driver holds only batch_id metadata.
    The per-stage twins already expose frame-level machinery
    (`*_stream_writer` internals compute verdicts as DataFrames before
    collecting), so the swap is a sink-contract variant (sink receives
    a DataFrame, not rows), not an algorithm change; parity and
    at-least-once replay arguments carry over unchanged because stage
    decisions stay deterministic against the frozen artifacts.
    """
    from webloghunter_spark.functions.text import normalized_text_expr
    from webloghunter_spark.pipelines.decontam import eval_shingle_set
    from webloghunter_spark.streaming.incdedup import (
        containment_drop_stream_writer,
        incremental_dedup_stream_writer,
    )

    ckeys = None
    near_fn = None
    near_cap: list = [None]
    if near_dedup_threshold is not None:
        ckeys = (
            corpus.select(
                F.md5(normalized_text_expr(text_col)).alias("_k")
            )
            .distinct()
            .persist()
        )
        ckeys.count()  # settle the frozen digest set
        near_fn = incremental_dedup_stream_writer(
            lambda rows, bid: near_cap.__setitem__(0, rows),
            corpus,
            text_col=text_col,
            id_col=id_col,
            threshold=near_dedup_threshold,
            num_hashes=dedup_num_hashes,
            band_size=dedup_band_size,
            shingle_k=dedup_shingle_k,
        )

    cont_fn = None
    cont_cap: list = [None]
    if containment_threshold_bp is not None:
        cont_fn = containment_drop_stream_writer(
            lambda rows, bid: cont_cap.__setitem__(0, rows),
            corpus,
            text_col=text_col,
            id_col=id_col,
            shingle_k=dedup_shingle_k,
            threshold_bp=containment_threshold_bp,
            size_ratio_bp=containment_size_ratio_bp,
            max_df=containment_max_df,
        )

    grams = None
    if eval_df is not None:
        grams = eval_shingle_set(eval_df, text_col, decontam_n).persist()
        grams.count()  # settle the frozen eval gram set

    def _ids_frame(src: DataFrame, ids: list) -> DataFrame:
        sch = StructType([src.schema[id_col]])
        return src.sparkSession.createDataFrame(
            [(i,) for i in ids], sch
        )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        cur = batch_df

        if min_quality_bp is not None:
            from webloghunter_spark.pipelines.gate import gate_keep_expr

            # row-local gate filter — the batch twin's form (§2.4)
            cur = cur.filter(
                gate_keep_expr(
                    text_col,
                    min_tokens=min_tokens,
                    max_tokens=max_tokens,
                    min_quality_bp=min_quality_bp,
                )
            )

        if near_dedup_threshold is not None:
            keyed = cur.select(
                F.col(id_col),
                F.md5(normalized_text_expr(text_col)).alias("_k"),
            )
            hit = keyed.join(ckeys, "_k", "left_semi").select(id_col)
            cur = cur.join(hit, id_col, "left_anti")

            near_cap[0] = None
            near_fn(cur, batch_id)
            surv = [r[0] for r in (near_cap[0] or [])]
            cur = cur.join(_ids_frame(cur, surv), id_col, "left_semi")

        if containment_threshold_bp is not None:
            cont_cap[0] = None
            cont_fn(cur, batch_id)
            surv = [r[0] for r in (cont_cap[0] or []) if r[3] == 0]
            cur = cur.join(_ids_frame(cur, surv), id_col, "left_semi")

        if eval_df is not None:
            from webloghunter_spark.pipelines.decontam import decontaminate

            cur = decontaminate(
                cur,
                id_col=id_col,
                text_col=text_col,
                n=decontam_n,
                eval_grams=grams,
            )

        rows = cur.select(id_col).collect()
        rows.sort(key=lambda r: (r[0] is not None, r[0]))
        sink([tuple(r) for r in rows], batch_id)

    def release() -> None:
        if ckeys is not None:
            ckeys.unpersist()
        if near_fn is not None:
            near_fn.release()
        if cont_fn is not None:
            cont_fn.release()
        if grams is not None:
            grams.unpersist()

    process.release = release
    return process
