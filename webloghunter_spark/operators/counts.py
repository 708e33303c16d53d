"""Repeat-request counting (reference dataframe.py:69-89).

The reference computes ``groupby([source, ip, cluster, method,
request_uri]).size()`` then left-joins it back onto every row. A window
``count(*) over (partition by keys)`` expresses the same thing without
the self-join: one shuffle on the grouping keys instead of two scans +
a join. Map-side partial aggregation applies to the window's hash
exchange, and AQE handles skewed (source, ip) hot keys.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_COUNT_KEYS = ("source", "ip", "cluster", "method", "request_uri")


def with_request_count(
    df: DataFrame,
    keys: Sequence[str] = DEFAULT_COUNT_KEYS,
    out_col: str = "request_count",
) -> DataFrame:
    w = Window.partitionBy(*keys)
    return df.withColumn(out_col, F.count(F.lit(1)).over(w))
