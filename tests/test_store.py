"""Physical-layout tests: partition pruning and bucketed co-located joins."""

import pyspark.sql.functions as F

from webloghunter_spark.sources.store import (
    assert_no_shuffle_join,
    read_bucketed,
    write_bucketed,
    write_partitioned,
)


def test_partitioned_store_prunes(spark, tmp_path):
    rows = [
        ("a.log", "2024-01-01 10:00:00", "1.1.1.1"),
        ("a.log", "2024-01-02 10:00:00", "1.1.1.1"),
        ("b.log", "2024-01-01 10:00:00", "2.2.2.2"),
    ]
    df = spark.createDataFrame(rows, "source string, ts string, ip string").select(
        "source", F.to_timestamp("ts").alias("utc_timestamp"), "ip"
    )
    path = str(tmp_path / "store")
    write_partitioned(df, path)
    got = spark.read.parquet(path).filter(
        (F.col("source") == "a.log") & (F.col("event_date") == "2024-01-01")
    )
    assert got.count() == 1
    # pruning is visible in the scan: only one partition directory read
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_bucketed_join_no_exchange(spark, tmp_path):
    # warehouse dir is a static conf; use the session default and clean
    # the tables up after.
    spark.sql("DROP TABLE IF EXISTS ev_b")
    spark.sql("DROP TABLE IF EXISTS score_b")
    ev = spark.createDataFrame(
        [(f"10.0.0.{i % 16}", i, f"2024-01-01 10:00:{i % 60:02d}") for i in range(200)],
        "ip string, event_id long, ts string",
    ).select("ip", "event_id", F.to_timestamp("ts").alias("utc_timestamp"))
    score = spark.createDataFrame(
        [(f"10.0.0.{i}", float(i)) for i in range(16)], "ip string, score double"
    )
    write_bucketed(ev, "ev_b", bucket_col="ip", num_buckets=8)
    write_bucketed(score, "score_b", bucket_col="ip", num_buckets=8,
                   sort_col=None)
    # disable broadcast so the join would otherwise shuffle both sides
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = read_bucketed(spark, "ev_b").join(read_bucketed(spark, "score_b"), "ip")
        assert j.count() == 200
        assert_no_shuffle_join(j)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS ev_b")
        spark.sql("DROP TABLE IF EXISTS score_b")
