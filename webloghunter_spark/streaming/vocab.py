"""Streaming vocabulary counting via a count-min sketch.

`vocab_topk` (functions/text.py) is a batch heavy-hitters aggregate;
its naive streaming twin — groupBy(token).count() in update mode —
keeps one state row PER DISTINCT TOKEN, which over an unbounded stream
is unbounded state. The count-min sketch (Cormode & Muthukrishnan,
2005) bounds state at depth x width counters total, for a one-sided
error: estimate(token) >= true_count, and with width w the
overestimate is <= stream_length * e / w with probability
1 - e^-depth.

The sketch is expressed as a NATIVE streaming aggregation, not custom
state: each token occurrence emits `depth` (row, pos) cells —
pos = xxhash64(row, token) mod width — and the query is
groupBy(row, pos).count(). State is capped at depth*width rows
regardless of vocabulary size, the aggregate is map-side combinable,
and the same expressions run identically on a batch frame
(`cms_counts` works on either).

Point estimates read the sketch with the same hash family:
estimate(token) = min over rows of count[row][pos_row(token)].
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webloghunter_spark.functions.text import tokens_expr

CMS_DEPTH = 4
CMS_WIDTH = 1024


def _cms_cells(token_col, depth: int, width: int):
    """array<struct<row,pos>> — the sketch cells one token increments."""
    return F.array(*[
        F.struct(
            F.lit(r).alias("row"),
            F.pmod(F.xxhash64(F.lit(r), token_col), F.lit(width)).alias("pos"),
        )
        for r in range(depth)
    ])


def cms_counts(
    df: DataFrame,
    text_col: str = "text",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """(row, pos, n) sketch cells from a batch OR streaming frame.

    Streaming: aggregate in update/complete output mode — state is at
    most depth*width rows, independent of vocabulary size."""
    toks = df.select(
        F.explode(tokens_expr(text_col)).alias("_tok")
    ).select(F.lower("_tok").alias("_tok"))
    cells = toks.select(
        F.explode(_cms_cells(F.col("_tok"), depth, width)).alias("c")
    )
    return cells.groupBy(
        F.col("c.row").alias("row"), F.col("c.pos").alias("pos")
    ).agg(F.count(F.lit(1)).alias("n"))


def cms_vocab_stream(
    events: DataFrame,
    text_col: str = "text",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Streaming twin of vocab_topk's counting stage: run with
    .writeStream.outputMode("complete"|"update"). Returns the sketch
    cell aggregate (bounded state)."""
    return cms_counts(events, text_col=text_col, depth=depth, width=width)


def cms_estimate(
    sketch: DataFrame,
    tokens: list[str],
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-estimate counts for `tokens` from a materialized sketch:
    (token, est) with est = min over sketch rows (missing cell = 0).
    One broadcast join of a |tokens| x depth probe table against the
    depth*width-row sketch."""
    spark = sketch.sparkSession
    probe = spark.createDataFrame(
        [(t.lower(),) for t in tokens], "token string"
    ).select(
        "token",
        F.explode(_cms_cells(F.col("token"), depth, width)).alias("c"),
    ).select("token", F.col("c.row").alias("row"), F.col("c.pos").alias("pos"))
    joined = probe.join(F.broadcast(sketch), on=["row", "pos"], how="left")
    return joined.groupBy("token").agg(
        F.min(F.coalesce(F.col("n"), F.lit(0))).alias("est")
    )


def _cms_cells_md5(token_col, depth: int, width: int):
    """md5-family sketch cells — same shape as `_cms_cells`, but the
    position hash is the first 8 hex digits of md5(row|token), so ANY
    engine with md5 (every SQL dialect, the DuckDB oracle) rebuilds a
    bit-identical sketch. xxhash64 stays the streaming default (faster,
    one JVM intrinsic); this family exists to make the sketch itself
    oracle-checkable."""
    return F.array(*[
        F.struct(
            F.lit(r).alias("row"),
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(f"{r}|"), token_col)), 1, 8
                    ),
                    16,
                    10,
                ).cast("long"),
                F.lit(width),
            ).alias("pos"),
        )
        for r in range(depth)
    ])


def cms_heavy_hitters(
    df: DataFrame,
    text_col: str = "text",
    threshold: int = 100,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Batch heavy-hitters THROUGH the sketch (md5 family): build the
    depth x width cell aggregate, probe it with the corpus's distinct
    tokens, and return (token, est) for est >= threshold.

    est = min over rows of the cell count is the classic CMS one-sided
    estimate: est >= true count always, and the overestimate is bounded
    by collisions — so this returns a SUPERSET of the true
    >=threshold heavy hitters, which is exactly the guarantee the
    streaming twin (`cms_vocab_stream`) gives with bounded state. The
    whole computation is two map-side-combinable aggregates + one
    broadcast join of the (depth*width)-row sketch; the token stream is
    never collected, and the distinct-token probe is itself a hash
    aggregate (bounded by vocabulary, not corpus size).
    """
    # explode cannot be nested inside lower(): generate first, then map
    toks = df.select(F.explode(tokens_expr(text_col)).alias("_t")).select(
        F.lower(F.col("_t")).alias("_tok")
    )
    cells = toks.select(
        F.explode(_cms_cells_md5(F.col("_tok"), depth, width)).alias("c")
    )
    sketch = cells.groupBy(
        F.col("c.row").alias("row"), F.col("c.pos").alias("pos")
    ).agg(F.count(F.lit(1)).alias("n"))
    probe = toks.distinct().select(
        F.col("_tok").alias("token"),
        F.explode(_cms_cells_md5(F.col("_tok"), depth, width)).alias("c"),
    ).select("token", F.col("c.row").alias("row"), F.col("c.pos").alias("pos"))
    est = (
        probe.join(F.broadcast(sketch), on=["row", "pos"], how="left")
        .groupBy("token")
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias("est"))
    )
    return est.filter(F.col("est") >= threshold)


def cms_overestimate_audit(
    df: DataFrame,
    text_col: str = "text",
    k: int = 20,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Price the sketch against ground truth: (token, true_cnt,
    est_cnt, over_bp) for the k TRUE-top tokens (count DESC, token
    ASC), est through the md5-family sketch, over_bp = the collision
    mass in basis points of the true count. est >= true always (the
    CMS one-sided guarantee cms_heavy_hitters leans on); a fleet
    tunes depth/width by watching this number, not by re-deriving
    Cormode-Muthukrishnan bounds. The token stream is scanned ONCE
    into a vocabulary-scale (token, count) aggregate — the only
    persisted intermediate; the sketch rebuilds from it as a
    count-weighted cell sum (identical totals: the sketch counts
    occurrences), and the true top-k reads it directly. Never a
    corpus-scale persist."""
    from webloghunter_spark.session import materialize

    counts = materialize(
        df.select(F.explode(tokens_expr(text_col)).alias("_t"))
        .select(F.lower(F.col("_t")).alias("_tok"))
        .groupBy("_tok")
        .agg(F.count(F.lit(1)).alias("true_cnt"))
    )
    cells = counts.select(
        "true_cnt",
        F.explode(_cms_cells_md5(F.col("_tok"), depth, width)).alias("c"),
    )
    sketch = cells.groupBy(
        F.col("c.row").alias("row"), F.col("c.pos").alias("pos")
    ).agg(F.sum("true_cnt").alias("n"))
    top = (
        counts.orderBy(F.col("true_cnt").desc(), F.col("_tok"))
        .limit(k)
        .select(F.col("_tok").alias("token"), "true_cnt")
    )
    probe = top.select(
        "token",
        "true_cnt",
        F.explode(_cms_cells_md5(F.col("token"), depth, width)).alias("c"),
    ).select(
        "token",
        "true_cnt",
        F.col("c.row").alias("row"),
        F.col("c.pos").alias("pos"),
    )
    est = (
        probe.join(F.broadcast(sketch), on=["row", "pos"], how="left")
        .groupBy("token", "true_cnt")
        .agg(
            F.min(F.coalesce(F.col("n"), F.lit(0)))
            .cast("long")
            .alias("est_cnt")
        )
    )
    return est.select(
        "token",
        "true_cnt",
        "est_cnt",
        F.floor(
            (F.col("est_cnt") - F.col("true_cnt"))
            * 10000.0
            / F.col("true_cnt")
            + F.lit(0.5)
        )
        .cast("long")
        .alias("over_bp"),
    )
