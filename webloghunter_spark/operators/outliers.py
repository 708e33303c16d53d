"""Robust per-group outlier detection (median / MAD).

Mean/stddev outlier rules break on the heavy-tailed columns log
analytics actually has (resp_size, request rates): the outliers drag
the mean. The robust form — flag x where |x - median| > k * MAD, with
MAD = median(|x - median|) — is insensitive to the tail.

Plan shape: two grouped exact-percentile aggregates (group cardinality
is orders of magnitude below row count, so these are cheap map-side-
combinable aggs) and two joins of the tiny group tables back onto the
rows — broadcastable, AQE's call. At very large group counts swap
`percentile` for `approx_percentile` (sketch, one pass) with the same
topology. MAD == 0 (over half the group identical) flags any
deviation, matching the standard definition.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    k: float = 3.0,
) -> DataFrame:
    """Adds `med`, `mad`, and `is_outlier` per row."""
    group_cols = list(group_cols)
    v = F.col(value_col).cast("double")
    med = df.groupBy(*group_cols).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("med")
    )
    with_med = df.join(med, on=group_cols)
    mad = (
        with_med.withColumn("_adev", F.abs(v - F.col("med")))
        .groupBy(*group_cols)
        .agg(F.expr("percentile(_adev, 0.5)").alias("mad"))
    )
    out = with_med.join(mad, on=group_cols)
    return out.withColumn(
        "is_outlier", F.abs(v - F.col("med")) > F.lit(float(k)) * F.col("mad")
    )


def ecdf_bp(
    df: DataFrame,
    value_col: str,
    out_col: str = "pctile_bp",
) -> DataFrame:
    """Exact empirical-CDF percentile (basis points) of an INTEGER
    score column — global rank calibration WITHOUT a global sort.

    percent_rank() over an unpartitioned window funnels the whole
    table through one reducer; for a bounded integer score (quality
    basis points, risk scores) the same answer comes from the score
    HISTOGRAM: count per distinct value (map-side combinable, <=
    |score domain| cells), a running sum over that tiny table (the
    only windowed stage — |domain| rows regardless of corpus size),
    and a broadcast join back. pctile_bp = floor(n_below * 10000 / N)
    where n_below counts STRICTLY smaller scores — pure integer
    arithmetic end to end, so any engine agrees bit-for-bit and ties
    share a percentile by construction.
    """
    from pyspark.sql import Window

    hist = df.groupBy(value_col).agg(F.count(F.lit(1)).alias("_c"))
    w = (
        Window.orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select(
        value_col,
        (F.sum("_c").over(w) - F.col("_c")).alias("_below"),
    )
    total = df.count()
    return df.join(F.broadcast(cum), on=value_col).withColumn(
        out_col,
        # _below * 10000 stays far inside the double-exact integer
        # range, so floor(x / N) matches integer division everywhere
        F.floor(F.col("_below") * F.lit(10_000) / F.lit(total)).cast(
            "long"
        ),
    ).drop("_below")
