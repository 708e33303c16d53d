"""Columnar store layout for the normalized event table (SURVEY §4.2).

Two physical layouts, both aimed at the 100 TB read path:

- `write_partitioned`: directory-partitioned by (source, date) so
  time/source predicates become partition pruning — the scan never
  opens irrelevant files. This is the default landing zone after
  ingest.
- `write_bucketed` / `read_bucketed`: hash-bucketed by a join/group key
  (default `ip`) via the table catalog. Two tables bucketed the same
  way join WITHOUT an exchange on either side — the shuffle is paid
  once at write time and amortized over every subsequent join/groupBy
  on that key (sessionization, per-IP counts, burst detection all key
  on the ip family). `assert_no_shuffle_join` is the test hook proving
  the property from the physical plan.

Bucketing uses the session catalog (saveAsTable) because bucket
metadata lives in the metastore; plain parquet paths cannot carry it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str = "utc_timestamp",
    partition_cols: tuple[str, ...] = ("source", "event_date"),
) -> None:
    """Land normalized events partitioned by (source, date)."""
    out = df
    if "event_date" in partition_cols and "event_date" not in df.columns:
        out = out.withColumn("event_date", F.to_date(F.col(ts_col)))
    out.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str = "ip",
    num_buckets: int = 32,
    sort_col: str | None = "utc_timestamp",
) -> None:
    """Persist hash-bucketed (+ optionally sorted) by the join key."""
    w = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def assert_no_shuffle_join(joined: DataFrame) -> None:
    """Raise if the executed join plan contains a hash-partitioning
    exchange — i.e. the bucketed co-location failed to kick in."""
    plan = joined._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    if "Exchange hashpartitioning" in plan:
        raise AssertionError(
            "bucketed join still shuffles:\n" + plan[:2000]
        )
