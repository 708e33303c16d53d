"""TIMESTAMP_NTZ regression coverage.

Parquet written with isAdjustedToUTC=false surfaces as TIMESTAMP_NTZ in
Spark 4; ``ts.cast("double")`` on such a column throws
DATATYPE_MISMATCH.  Round 3's driver exposed this through
detectors/burst.py.  These tests push an NTZ parquet through every
timestamp-arithmetic path (burst, sessionize, request counts, the
epoch_seconds helper itself) so the cast can never regress silently.
"""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType

from webloghunter_spark.detectors.burst import burst_success_detector, find_bursts
from webloghunter_spark.operators.counts import with_request_count
from webloghunter_spark.operators.sessionize import sessionize
from webloghunter_spark.operators.timeutil import epoch_seconds

BASE = datetime(2024, 1, 1)  # naive -> NTZ-friendly

NTZ_SCHEMA = (
    "source string, ip string, cluster long, request_uri string, "
    "method string, status int, utc_timestamp timestamp_ntz"
)


def _rows(n, status=500, start=0.0, gap=0.5, uri="/attack", ip="1.1.1.1"):
    return [
        ("a.log", ip, 0, uri, "POST", status,
         BASE + timedelta(seconds=start + i * gap))
        for i in range(n)
    ]


@pytest.fixture(scope="module")
def ntz_df(spark, tmp_path_factory):
    """Burst fixture round-tripped through parquet as TIMESTAMP_NTZ."""
    rows = _rows(120) + [
        ("a.log", "1.1.1.1", 0, "/attack", "GET", 200,
         BASE + timedelta(seconds=100))
    ]
    path = str(tmp_path_factory.mktemp("ntz") / "events.parquet")
    spark.createDataFrame(rows, NTZ_SCHEMA).write.parquet(path)
    df = spark.read.parquet(path)
    assert isinstance(df.schema["utc_timestamp"].dataType, TimestampNTZType)
    return df.withColumn("risk_score", F.lit(0.0)).withColumn(
        "rule_applied", F.lit("")
    )


def test_epoch_seconds_keeps_subsecond_precision(spark):
    df = spark.createDataFrame(
        [(BASE,), (BASE + timedelta(milliseconds=250),)], "ts timestamp_ntz"
    )
    vals = sorted(r[0] for r in df.select(epoch_seconds(F.col("ts"))).collect())
    assert vals[1] - vals[0] == pytest.approx(0.25)


def test_find_bursts_on_ntz(ntz_df):
    bursts = find_bursts(ntz_df).collect()
    assert len(bursts) == 1 and bursts[0].burst_count == 120


def test_burst_success_on_ntz(ntz_df):
    out = burst_success_detector(ntz_df).filter(F.col("status") == 200).collect()
    assert len(out) == 1 and out[0].risk_score == 95.0


def test_subsecond_gap_split_on_ntz(spark):
    # 3 rows 0.4s apart, then 3 more after a 2s jump: max_gap=1.0 must
    # see the fractional gaps (unix_timestamp flooring would merge or
    # split them arbitrarily depending on the second boundary).
    rows = _rows(3, gap=0.4) + _rows(3, start=10.0, gap=0.4)
    df = spark.createDataFrame(rows, NTZ_SCHEMA)
    bursts = find_bursts(df, min_requests=3, max_gap_seconds=1.0).collect()
    assert sorted(b.burst_count for b in bursts) == [3, 3]


def test_sessionize_on_ntz(ntz_df):
    out = sessionize(ntz_df, group_cols=("source", "ip"), threshold=60)
    assert out.select("cluster").distinct().count() == 1


def test_request_count_on_ntz(ntz_df):
    out = with_request_count(ntz_df.withColumn("cluster", F.lit(0)))
    assert out.count() == ntz_df.count()
