"""Gap-threshold sessionization (the reference's `_cluster`).

Semantics reproduced from /root/reference/WebLogTriage/dataframe.py:604-658:

- rows are grouped per (source, ip); a new session starts when the gap in
  epoch *seconds* since the previous row is >= `threshold` (the reference
  computes ``same_cluster = diff().fillna(0) < threshold``, so the FIRST
  row of each group has gap 0 => it *continues* session 0, and an exact
  ``threshold`` gap starts a NEW session — dataframe.py:630-636).
- local session ids are the running sum of new-session flags per group.
- global ids renumber (source, ip, local) triples densely **in order of
  first appearance** after sorting by (source, ip, epoch)
  (``pd.factorize``, dataframe.py:638-639), i.e. ordered by
  (source, ip, local).

Scale design: the global renumbering is NOT done with a global window over
the event table (that would serialize 100 TB through one partition).
Instead we aggregate to one row per group (orders of magnitude smaller),
assign dense offsets on the group-level table with a TWO-LEVEL
range-bucketed prefix sum — intra-bucket running sums in parallel, a
single-partition pass only over the per-bucket totals — and
broadcast-join back. No table at any level funnels through one task.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    group_cols: Sequence[str] = ("source", "ip"),
    ts_col: str = "utc_timestamp",
    threshold: int = 60,
    cluster_col: str = "cluster",
    epoch_expr: Column | None = None,
) -> DataFrame:
    """Add a dense global session id column (`cluster_col`).

    `epoch_expr` may override how epoch seconds are derived from `ts_col`
    (the reference truncates ns -> s via integer division, i.e. floor).
    """
    gcols = list(group_cols)
    epoch = epoch_expr if epoch_expr is not None else F.unix_timestamp(F.col(ts_col))
    df = df.withColumn("_epoch", epoch.cast("long"))

    w = Window.partitionBy(*gcols).orderBy("_epoch")
    # diff().fillna(0) < threshold: null gap (first row) => same session.
    gap = F.col("_epoch") - F.lag("_epoch").over(w)
    new_flag = F.when(gap.isNull(), F.lit(0)).when(
        gap >= threshold, F.lit(1)
    ).otherwise(F.lit(0))
    df = df.withColumn("_new", new_flag).withColumn(
        "_local",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )

    # Global dense ids without funneling sessions through one partition:
    # cluster = offset(group) + local, where offset is the running total
    # of session counts over groups ordered by group key — identical to
    # factorize-order dense ids because sessions are contiguous per
    # group and locally ordered. The per-group session count reuses the
    # window exchange (no extra shuffle); only the GROUP-level table
    # (users/ips, orders of magnitude smaller than sessions or events)
    # passes through the single-partition running sum, then broadcasts.
    df = df.withColumn("_nsess", F.max("_local").over(Window.partitionBy(*gcols)) + 1)
    groups = df.select(*gcols, "_nsess").distinct()
    # Two-level exclusive prefix sum over groups in key order: range-
    # bucket the group table, run intra-bucket running sums in parallel,
    # and push only the per-bucket TOTALS (one row per bucket) through a
    # single-partition pass — so even at 1e8 (source, ip) groups nothing
    # group-sized serializes through one task. Range boundaries come
    # from sampling, but offsets depend only on global key ORDER, which
    # range partitioning preserves, so ids are deterministic.
    groups = (
        groups.repartitionByRange(*gcols)
        .sortWithinPartitions(*gcols)
        .withColumn("_bkt", F.spark_partition_id())
    )
    wi = (
        Window.partitionBy("_bkt")
        .orderBy(*gcols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    groups = groups.withColumn("_intra", F.coalesce(F.sum("_nsess").over(wi), F.lit(0)))
    wb = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    totals = (
        groups.groupBy("_bkt")
        .agg(F.sum("_nsess").alias("_tot"))
        .select("_bkt", F.coalesce(F.sum("_tot").over(wb), F.lit(0)).alias("_boff"))
    )
    groups = groups.join(F.broadcast(totals), "_bkt").select(
        *gcols, (F.col("_boff") + F.col("_intra")).alias("_offset")
    )
    out = df.join(F.broadcast(groups), on=gcols, how="left")
    out = out.withColumn(cluster_col, (F.col("_offset") + F.col("_local")).cast("long"))
    return out.drop("_epoch", "_new", "_local", "_nsess", "_offset")
