"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark set.

Standard training-data hygiene (GPT-3 appendix C, Llama 2 §A.6 use
8–13-gram overlap): any train document containing an n-gram that also
appears in the eval set is "contaminated" and dropped (or audited)
before training.

Scale shape (the only one that survives 100 TB of train text):
- The eval side is SMALL (benchmarks are thousands of documents).
  Shingle it, `distinct` it, and BROADCAST the distinct shingle set.
- The train side is the 100 TB: tokenize + shingle in a single
  projection (no shuffle), then a broadcast-hash SEMI join against the
  eval shingles — map-side, no train-side shuffle at all.
- The per-doc hit count is one groupBy(doc_id) — map-side combinable,
  and the join's output (only matching shingles) is tiny relative to
  the corpus, so the shuffle is bounded by contamination volume, not
  corpus volume.

The eval shingle set can exceed broadcast limits for giant eval suites;
`broadcast_eval=False` falls back to a shuffle semi-join (AQE still
promotes it back to broadcast if the stats allow).

No counterpart in the reference repo (it has no corpus tooling);
tokenization matches functions/text.py:tokens_expr so fingerprints,
jaccard and decontamination all agree on token boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webloghunter_spark.functions.text import shingles_expr


def _doc_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(id, shingle) pairs, distinct per document."""
    return (
        df.select(
            F.col(id_col),
            F.explode(
                F.array_distinct(shingles_expr(text_col, n))
            ).alias("_gram"),
        )
    )


def eval_shingle_set(
    eval_df: DataFrame, text_col: str = "text", n: int = 8
) -> DataFrame:
    """Distinct n-gram shingles of the eval/benchmark corpus — the
    (small) side that gets broadcast."""
    return (
        eval_df.select(
            F.explode(shingles_expr(text_col, n)).alias("_gram")
        ).distinct()
    )


def contaminated_docs(
    train: DataFrame,
    eval_df: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    broadcast_eval: bool = True,
    eval_grams: DataFrame | None = None,
) -> DataFrame:
    """(id_col, n_hits) for every train document sharing >=1 n-gram
    with the eval set; n_hits = number of DISTINCT overlapping grams.

    Documents with no overlap do not appear (join is inner) — compose
    with `decontaminate` for the filtered corpus.

    `eval_grams` supplies a precomputed `eval_shingle_set` result (the
    streaming twin persists it once and reuses it across micro-batches
    instead of re-shingling the eval corpus per batch).
    """
    if eval_grams is None:
        if eval_df is None:
            raise ValueError("need eval_df or eval_grams")
        eval_grams = eval_shingle_set(eval_df, text_col, n)
    grams = eval_grams
    if broadcast_eval:
        grams = F.broadcast(grams)
    hits = _doc_shingles(train, id_col, text_col, n).join(
        grams, "_gram", "inner"
    )
    return hits.groupBy(id_col).agg(F.count("*").alias("n_hits"))


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    broadcast_eval: bool = True,
    eval_grams: DataFrame | None = None,
) -> DataFrame:
    """Train corpus with contaminated documents removed (left-anti join
    against the contaminated id list — the same bounded-shuffle shape
    as near_dedup's drop list)."""
    bad = contaminated_docs(
        train, eval_df, id_col, text_col, n, broadcast_eval, eval_grams
    ).select(id_col)
    return train.join(bad, id_col, "left_anti")
