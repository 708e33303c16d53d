"""Burst -> later-success detector (reference `burp_intruder`).

Semantics (/root/reference/WebLogTriage/risk.py:335-382):
- consider only status==500 rows; within each (source, ip, cluster,
  request_uri, method) group ordered by utc_timestamp, a new burst
  starts when the inter-arrival gap is > `max_gap_seconds` (the first
  row's null gap does NOT start a new burst id — cumsum of False);
- bursts with >= `min_requests` rows qualify;
- any status==200 row matching the burst on (source, ip, request_uri,
  cluster) — note: method is NOT part of the success match — with
  utc_timestamp >= the burst's min_time gets risk_score = `risk_score`
  and rule_applied = 'Attack Success After High-Frequency Server
  Failures'.

Spark plan: windows over the 500-subset (partition pruned by the
status filter, pushed to the scan), a tiny burst-stats aggregate, then
a broadcast equi+range semi-join back onto the 200 rows. The burst
table is orders of magnitude smaller than the event table, so the join
side is broadcast — no shuffle of the big table beyond the window's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from webloghunter_spark.operators.timeutil import epoch_seconds

BURST_RULE_TITLE = "Attack Success After High-Frequency Server Failures"
BURST_GROUP = ["source", "ip", "cluster", "request_uri", "method"]
SUCCESS_MATCH = ["source", "ip", "cluster", "request_uri"]


def find_bursts(
    df: DataFrame,
    min_requests: int = 100,
    max_gap_seconds: float = 1.0,
    ts_col: str = "utc_timestamp",
) -> DataFrame:
    """Qualifying 500-bursts: group keys + burst_id, count, min/max time."""
    s500 = df.filter(F.col("status") == 500)
    w = Window.partitionBy(*BURST_GROUP).orderBy(ts_col)
    # NTZ-safe fractional epoch (ts.cast("double") is illegal on
    # TIMESTAMP_NTZ; unix_timestamp would floor sub-second gaps away).
    ep = epoch_seconds(F.col(ts_col))
    gap = ep - F.lag(ep).over(w)
    new_burst = F.when(gap > max_gap_seconds, 1).otherwise(0)
    run = (
        s500.withColumn("_nb", new_burst)
        .withColumn(
            "burst_id",
            F.sum("_nb").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
        )
    )
    stats = run.groupBy(*BURST_GROUP, "burst_id").agg(
        F.count(F.lit(1)).alias("burst_count"),
        F.min(ts_col).alias("min_time"),
        F.max(ts_col).alias("max_time"),
    )
    return stats.filter(F.col("burst_count") >= min_requests)


def burst_success_detector(
    df: DataFrame,
    risk_score: float = 95.0,
    min_requests: int = 100,
    max_gap_seconds: float = 1.0,
    ts_col: str = "utc_timestamp",
) -> DataFrame:
    """Stamp post-burst 200 rows with the burst rule score/title."""
    bursts = find_bursts(df, min_requests, max_gap_seconds, ts_col)
    earliest = bursts.groupBy(*SUCCESS_MATCH).agg(F.min("min_time").alias("_burst_min"))
    joined = df.join(F.broadcast(earliest), on=SUCCESS_MATCH, how="left")
    hit = (
        (F.col("status") == 200)
        & F.col("_burst_min").isNotNull()
        & (F.col(ts_col) >= F.col("_burst_min"))
    )
    return (
        joined.withColumn(
            "risk_score", F.when(hit, F.lit(float(risk_score))).otherwise(F.col("risk_score"))
        )
        .withColumn(
            "rule_applied",
            F.when(hit, F.lit(BURST_RULE_TITLE)).otherwise(F.col("rule_applied")),
        )
        .drop("_burst_min")
    )
