"""Deterministic distinct-count sketches (HyperLogLog on md5).

Spark's `approx_count_distinct` is HLL++ behind an opaque hash — fine
in production, impossible to oracle-check. This HLL derives everything
from md5, the repo's engine-portable hash family: any engine computes
the SAME registers, so the sketch itself (not just its estimate) is
exactly reproducible — and registers from disjoint partitions/engines
merge by max, which is what makes HLL the right sketch for federated
100 TB counting in the first place.

Register derivation per value (m = 64 registers):
  h      = first 14 md5 hex digits -> 56-bit integer
  bucket = h mod 64
  v      = h div 64 (50-bit field)
  rho    = leading zeros of v in 50 bits + 1
           (strpos(lpad(bin(v), 50, '0'), '1'); v = 0 -> 51)
All string/integer ops — bit-identical in Spark and DuckDB.

The estimate uses the raw HLL harmonic mean (alpha_m * m^2 /
sum 2^-M_j, absent buckets contributing 2^0) without the small/large
range corrections — callers comparing to exact counts should treat it
as the textbook raw estimator (documented +-1.04/sqrt(64) ~ 13%).

Plan shape: one map-side-combinable max per (group, bucket) — <=
64 cells per group per partition before the exchange regardless of
row count — then a 64-row-per-group fold. Never a distinct shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HLL_M = 64
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)


def _h56(value: Column) -> Column:
    return F.conv(
        F.substring(F.md5(value.cast("string")), 1, 14), 16, 10
    ).cast("long")


def hll_rho_expr(value: Column) -> Column:
    """(bucket, rho) struct for one value — see module doc."""
    h = _h56(value)
    v = F.floor(h / HLL_M).cast("long")
    rho = F.when(v == 0, F.lit(51)).otherwise(
        F.instr(F.lpad(F.bin(v), 50, "0"), "1")
    )
    return F.struct(
        (h % HLL_M).cast("int").alias("bucket"), rho.alias("rho")
    )


def hll_registers(
    df: DataFrame, value_col: str, group_cols: list[str]
) -> DataFrame:
    """(group..., bucket, reg) max-rho registers — the mergeable
    sketch state (union of corpora = max of registers)."""
    br = hll_rho_expr(F.col(value_col))
    return (
        df.select(*group_cols, br.alias("_br"))
        .groupBy(*group_cols, F.col("_br.bucket").alias("bucket"))
        .agg(F.max("_br.rho").alias("reg"))
    )


def hll_distinct(
    df: DataFrame, value_col: str, group_cols: list[str]
) -> DataFrame:
    """(group..., n_exact, hll_est): the raw HLL estimate next to the
    exact distinct count — the accuracy audit row. Exact count is for
    the audit only; the sketch path never shuffles distinct values."""
    regs = hll_registers(df, value_col, group_cols)
    est = (
        regs.groupBy(*group_cols)
        .agg(
            F.sum(F.pow(F.lit(2.0), -F.col("reg"))).alias("_s"),
            F.count(F.lit(1)).alias("_nb"),
        )
        .select(
            *group_cols,
            F.round(
                F.lit(HLL_ALPHA * HLL_M * HLL_M)
                / (F.col("_s") + (F.lit(HLL_M) - F.col("_nb"))),
                2,
            ).alias("hll_est"),
        )
    )
    exact = df.groupBy(*group_cols).agg(
        F.count_distinct(value_col).alias("n_exact")
    )
    return exact.join(est, on=group_cols).select(
        *group_cols, "n_exact", "hll_est"
    )


# --- Count-Min Sketch (md5-derived, engine-portable) -----------------

CMS_WIDTH = 2048
CMS_DEPTH = 3


def cms_bucket_expr(value: Column, row: int, width: int = CMS_WIDTH) -> Column:
    """Row-`row`'s counter bucket for a value: md5('row|value') first
    12 hex digits mod width — the same seeded-hash convention as the
    bloom filter's k positions, so any engine re-derives the sketch."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{row}|"), value.cast("string"))),
                1,
                12,
            ),
            16,
            10,
        ).cast("long")
        % width
    )


def cms_counters(
    items: DataFrame,
    value_col: str = "_tok",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """(row, bucket, cnt) counter table of a Count-Min sketch over the
    rows of `items` (one sketch increment per input row — explode
    upstream for token streams). The state is depth x width cells
    REGARDLESS of input size — the whole point of the sketch at
    100 TB: counters are one map-side-combinable sum per (row,
    bucket), <= depth*width cells per partition before the exchange,
    and two sketches (partitions, engines, days) merge by adding
    counters. Depth/width trade error for space: overestimate is
    bounded by e*N/width with probability 1 - (1/2)^depth (Cormode &
    Muthukrishnan 2005)."""
    buckets = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                cms_bucket_expr(F.col(value_col), i, width).alias("bucket"),
            )
            for i in range(depth)
        ]
    )
    return (
        items.select(F.explode(buckets).alias("_rb"))
        .groupBy(
            F.col("_rb.row").alias("row"),
            F.col("_rb.bucket").alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    counters: DataFrame,
    queries: DataFrame,
    value_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-frequency estimates: queries' columns + `est_cnt` =
    min over sketch rows of the value's counter (the CMS estimator —
    never underestimates, overestimates by collision mass). The
    counter table is depth x width rows, broadcast; the probe is
    depth rows per query value, no shuffle of the query side beyond
    the final per-value min."""
    probes = queries.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        cms_bucket_expr(
                            F.col(value_col), i, width
                        ).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("_rb"),
    ).select("*", F.col("_rb.row").alias("row"), F.col("_rb.bucket").alias("bucket"))
    joined = probes.join(F.broadcast(counters), ["row", "bucket"], "left")
    return (
        joined.groupBy(*queries.columns)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("long")
            .alias("est_cnt")
        )
    )
