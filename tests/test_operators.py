"""Sessionize / dedup / request_count / UTC-normalize semantics."""

from datetime import datetime, timezone

from pyspark.sql import functions as F

from webloghunter_spark.operators.counts import with_request_count
from webloghunter_spark.operators.dedup import remove_cross_source_dups
from webloghunter_spark.operators.sessionize import sessionize
from webloghunter_spark.operators.timeutil import with_utc_timestamp


def _ts(s):
    return datetime.strptime(s, "%Y-%m-%d %H:%M:%S").replace(tzinfo=timezone.utc)


def test_sessionize_gap_semantics(spark):
    # gaps: 0, 30, 59 -> same session; 60 -> NEW session (>= threshold);
    # first row of a group continues session 0 (diff().fillna(0) < 60).
    rows = [
        ("a.log", "1.1.1.1", _ts("2024-01-01 00:00:00")),
        ("a.log", "1.1.1.1", _ts("2024-01-01 00:00:30")),
        ("a.log", "1.1.1.1", _ts("2024-01-01 00:01:29")),  # +59 -> same
        ("a.log", "1.1.1.1", _ts("2024-01-01 00:02:29")),  # +60 -> new
        ("a.log", "2.2.2.2", _ts("2024-01-01 00:05:00")),  # other ip
        ("b.log", "1.1.1.1", _ts("2024-01-01 00:00:10")),  # other source
    ]
    df = spark.createDataFrame(rows, "source string, ip string, utc_timestamp timestamp")
    out = sessionize(df, threshold=60).orderBy("source", "ip", "utc_timestamp").collect()
    clusters = [r.cluster for r in out]
    # factorize order: (a.log,1.1.1.1,local0)=0, (a.log,1.1.1.1,local1)=1,
    # (a.log,2.2.2.2,0)=2, (b.log,1.1.1.1,0)=3
    assert clusters == [0, 0, 0, 1, 2, 3]


def test_dedup_cross_source_only(spark):
    base = dict(
        timestamp="10/Oct/2024:13:55:36 +0000", ip="1.1.1.1", method="GET",
        request_uri="/x", status=200, resp_size=10, user_agent="ua", referrer="-",
    )
    rows = [
        # key group spans two sources -> every non-first occurrence in the
        # group is dropped, including the intra-file repeat (reference
        # duplicated(keep='first') & multi-source-group, dataframe.py:188-195)
        {**base, "source": "a.log", "ordinal": 0},
        {**base, "source": "a.log", "ordinal": 1},
        {**base, "source": "b.log", "ordinal": 2, "method": "get",
         "user_agent": '"UA"'},
        # distinct row: kept
        {**base, "source": "b.log", "ordinal": 3, "request_uri": "/y"},
        # intra-file-only repeat group: BOTH kept (single source)
        {**base, "source": "c.log", "ordinal": 4, "request_uri": "/z"},
        {**base, "source": "c.log", "ordinal": 5, "request_uri": "/z"},
    ]
    df = spark.createDataFrame(rows)
    out = remove_cross_source_dups(df)
    kept = {(r.source, r.ordinal) for r in out.collect()}
    assert kept == {("a.log", 0), ("b.log", 3), ("c.log", 4), ("c.log", 5)}


def test_request_count(spark):
    rows = [
        ("a", "1.1.1.1", 0, "GET", "/x"),
        ("a", "1.1.1.1", 0, "GET", "/x"),
        ("a", "1.1.1.1", 0, "GET", "/y"),
        ("a", "1.1.1.1", 1, "GET", "/x"),
    ]
    df = spark.createDataFrame(rows, "source string, ip string, cluster long, method string, request_uri string")
    out = with_request_count(df)
    counts = {(r.request_uri, r.cluster): r.request_count for r in out.collect()}
    assert counts[("/x", 0)] == 2
    assert counts[("/y", 0)] == 1
    assert counts[("/x", 1)] == 1


def test_utc_timestamp_formats(spark):
    rows = [
        ("10/Oct/2024:13:55:36 +0200",),
        ("2024-10-10 13:55:36",),
        ("10/Oct/2024:13:55:36 +0000",),
    ]
    df = spark.createDataFrame(rows, "timestamp string")
    out = with_utc_timestamp(df).collect()
    assert out[0].utc_timestamp == _ts("2024-10-10 11:55:36").replace(tzinfo=None) or \
        out[0].utc_timestamp.hour == 11
    assert out[1].utc_timestamp.hour == 13
    assert out[2].utc_timestamp.hour == 13


def test_time_offset(spark):
    df = spark.createDataFrame([("2024-10-10 13:55:36",)], "timestamp string")
    out = with_utc_timestamp(df, time_offset=300).collect()
    assert out[0].utc_timestamp.minute == 0 and out[0].utc_timestamp.hour == 14
