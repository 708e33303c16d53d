"""EWMA control chart over gap-filled hourly event counts.

The rate-anomaly detector an operations pipeline runs on its event
stream: per event_type, hourly counts are smoothed with an
exponentially-weighted moving average and an hour is flagged when its
count exceeds `threshold_num`x the smoothed history. Missing
(hour, type) cells are zero-filled first (a GROUP BY silently drops
empty buckets, which would make the EWMA skip quiet hours and
under-react to a burst after silence).

All EWMA arithmetic is EXACT INTEGER in 1e-6 "micro" units with floor
division:

    ewma_0 = cnt_0 * 1_000_000
    ewma_t = (cnt_t * 1_000_000 * lam_num
              + (lam_denom - lam_num) * ewma_{t-1}) // lam_denom

so a SQL oracle's recursive CTE reproduces every value bit-for-bit —
no float fold-order or libm exposure at all (the lesson of the cosine
family, similarity.py:45, applied at the design stage instead of
patched after).

Scale shape: the only corpus-sized exchange is the combinable
(hour, type) count aggregate. The spine is |hours| x |types|
dimension rows (generated, broadcast), and the recursion — inherently
sequential in t — runs per-type in applyInPandas over the AGGREGATED
frame: |hours| rows per group (~10^4/year at hourly grain), bounded by
the time range, never by corpus size. Types parallelize across
executors.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def ewma_fold(
    cnts: list[int],
    lam_num: int = 1,
    lam_denom: int = 4,
    threshold_num: int = 2,
) -> list[tuple[int, int, int]]:
    """The exact integer EWMA recursion over an hour-ordered count
    series: [(ewma_micro, prev_micro, alert)] per position. Pure
    function shared by the batch operator and the streaming twin —
    one algorithm, no drift."""
    keep = lam_denom - lam_num
    out: list[tuple[int, int, int]] = []
    prev = 0
    for i, c in enumerate(cnts):
        if i == 0:
            cur = c * MICRO
            out.append((cur, 0, 0))
        else:
            cur = (c * MICRO * lam_num + keep * prev) // lam_denom
            out.append(
                (cur, prev, 1 if c * MICRO > threshold_num * prev else 0)
            )
        prev = cur
    return out


def hourly_counts_spine(events: DataFrame, ts_col: str = "ts",
                        type_col: str = "event_type") -> DataFrame:
    """Zero-filled (hour_epoch, type, cnt) over the full hour spine."""
    counts = (
        events.select(F.date_trunc("hour", ts_col).alias("h"), type_col)
        .groupBy("h", type_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    bounds = events.agg(
        F.date_trunc("hour", F.min(ts_col)).alias("mn"),
        F.date_trunc("hour", F.max(ts_col)).alias("mx"),
    )
    spine = bounds.select(
        F.explode(F.expr("sequence(mn, mx, interval 1 hour)")).alias("h")
    )
    types = events.select(type_col).distinct()
    return (
        spine.crossJoin(F.broadcast(types))
        .join(counts, ["h", type_col], "left")
        .select(
            F.unix_timestamp("h").alias("hour_epoch"),
            F.col(type_col).alias("event_type"),
            F.coalesce("cnt", F.lit(0)).cast("long").alias("cnt"),
        )
    )


def ewma_alerts(
    events: DataFrame,
    lam_num: int = 1,
    lam_denom: int = 4,
    threshold_num: int = 2,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(event_type, hour_epoch, cnt, ewma_micro, prev_micro, alert).

    alert = 1 when t > 0 and cnt * 1e6 > threshold_num * ewma_{t-1}
    (strict integer comparison; the first hour never alerts — there is
    no history to deviate from). ewma_micro is the POST-update value.
    """
    if not (0 < lam_num < lam_denom):
        raise ValueError("need 0 < lam_num < lam_denom")
    base = hourly_counts_spine(events, ts_col, type_col)

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("hour_epoch").reset_index(drop=True)
        cnts = pdf["cnt"].astype("int64").tolist()
        trip = ewma_fold(cnts, lam_num, lam_denom, threshold_num)
        pdf["ewma_micro"] = pd.Series([t[0] for t in trip], dtype="int64")
        pdf["prev_micro"] = pd.Series([t[1] for t in trip], dtype="int64")
        pdf["alert"] = pd.Series([t[2] for t in trip], dtype="int64")
        return pdf[["event_type", "hour_epoch", "cnt",
                    "ewma_micro", "prev_micro", "alert"]]

    return base.groupBy("event_type").applyInPandas(
        fold,
        "event_type string, hour_epoch long, cnt long, "
        "ewma_micro long, prev_micro long, alert long",
    )
