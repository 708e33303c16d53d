"""Bucketized interval (range) join.

Spark has no native point-in-interval join: the naive form is a
cross join with an inequality filter (BroadcastNestedLoopJoin when
one side is small, undriveable when both are big). The scalable
shape buckets TIME: every interval explodes to the fixed-width
buckets it overlaps, every point row computes its single bucket, and
the join becomes an EQUI-join on bucket (plus any entity keys) that
hash-partitions both sides — followed by the exact predicate as a
post-filter. Cost: interval expansion is ceil(length/bucket)+1 rows,
so pick `bucket_seconds` near the median interval length; point rows
never expand.

This generalizes the keyed burst->success range join
(detectors/burst.py) to the keyless / big-big case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
    keys: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join point rows to interval rows where
    start <= ts < end (and equi on `keys` if given). Returns
    points' columns + intervals' columns (minus duplicated keys).

    Both inputs may be arbitrarily large: the only exchange is the
    hash partition on (bucket, *keys)."""
    if how != "inner":
        raise ValueError("only inner interval joins are implemented")
    keys = list(keys or [])
    ep = lambda c: F.col(c).cast("timestamp").cast("long")  # noqa: E731
    b = F.lit(int(bucket_seconds))
    p = points.withColumn("_bucket", F.floor(ep(ts_col) / b))
    # end is exclusive: an interval [s, e) touches buckets
    # floor(s/b) .. floor((e-1)/b). Degenerate intervals (e <= s)
    # match no point and MUST be dropped BEFORE the explode:
    # F.sequence auto-steps -1 when stop < start, so one bad interval
    # would silently fan out to (s-e)/b rows that only the post-filter
    # removes — the zero-length-sequence gotcha, enforced here rather
    # than documented.
    iv = intervals.filter(ep(end_col) > ep(start_col)).withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(ep(start_col) / b),
                F.floor((ep(end_col) - 1) / b),
            )
        ),
    )
    joined = p.join(iv, [*keys, "_bucket"]).filter(
        (ep(ts_col) >= ep(start_col)) & (ep(ts_col) < ep(end_col))
    )
    return joined.drop("_bucket")
