"""Deterministic fixed-iteration PageRank on an edge DataFrame.

Third of the repo's oracle-checkable iterative algorithms (with
connected-components dedup and Lloyd's k-means), built on the same
discipline: fixed iteration count instead of a convergence test, and
the per-round state QUANTIZED (scores rounded to a 1e-6 grid each
iteration) so two engines cannot drift apart through float summation
order — an unquantized power iteration compounds 1e-16 noise into
rank-order flips.

Semantics: multigraph power iteration with damping d —
  pr_0(v)   = round(1/N, 6)
  pr_t+1(v) = round((1-d)/N + d * sum_{u->v} pr_t(u) / outdeg(u), 6)
where outdeg counts edge ROWS (parallel edges weight a transition the
way they occurred). Dangling-node mass is dropped, not redistributed
— the raw textbook iteration; callers comparing scores across graphs
should note totals sum below 1 when dangling nodes exist.

Scale: per iteration, one join of the edge table with the N-row score
table on src (broadcastable while scores fit, shuffle-join beyond)
and one map-side-combinable sum on dst. Lineage grows two narrow
stages per round; for deep iteration counts re-seed with
localCheckpoint as pipelines/dedup.near_dedup_cc does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from webloghunter_spark.functions.similarity import grid_round_expr


def pagerank(
    edges: DataFrame,
    iters: int = 2,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    round_digits: int = 6,
) -> DataFrame:
    """(node, pr) after `iters` damped power-iteration rounds."""
    from webloghunter_spark.session import materialize

    # edges feed the node set, the degree table, and every iteration's
    # contribution join — 3 + iters scans of what is often a windowed
    # derivation. materialize() once (registered for the caller's
    # release_materialized()/materialized_scope, the library-operator
    # convention from functions/lm.py).
    edges = materialize(edges.select(src_col, dst_col))
    nodes = materialize(
        edges.select(F.col(src_col).alias("node"))
        .union(edges.select(F.col(dst_col).alias("node")))
        .distinct()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("pr", F.lit(0.0))
    deg = edges.groupBy(src_col).agg(F.count(F.lit(1)).alias("_deg"))
    pr = nodes.withColumn(
        "pr", F.lit(round(1.0 / n, round_digits))
    )
    base = (1.0 - damping) / n
    for _ in range(max(iters, 0)):
        contrib = (
            edges.join(deg, on=src_col)
            .join(pr, edges[src_col] == pr["node"])
            .select(
                F.col(dst_col).alias("node"),
                (F.col("pr") / F.col("_deg")).alias("_c"),
            )
        )
        sums = contrib.groupBy("node").agg(F.sum("_c").alias("_s"))
        pr = (
            nodes.join(sums, on="node", how="left")
            .select(
                "node",
                # stored-value half-up grid, not F.round — pr >= 0 and
                # ITERATES (a boundary flip would compound through
                # every later round); grid == DuckDB round() exactly
                # (similarity.py:45)
                grid_round_expr(
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("_s"), F.lit(0.0)),
                    round_digits,
                ).alias("pr"),
            )
        )
    return pr
