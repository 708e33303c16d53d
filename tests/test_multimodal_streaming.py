"""Multimodal plumbing (binary columns + mapInPandas) and Structured
Streaming variants."""

from pyspark.sql import functions as F

from webloghunter_spark.functions.multimodal import (
    decode_media,
    media_embedding_udf,
    sample_frames,
    with_media_metadata,
)
from webloghunter_spark.streaming.sessions import sessionize_stream


def _media(spark):
    rows = [(i, bytes(f"payload-{i}".encode()) * 50) for i in range(8)]
    return spark.createDataFrame(rows, "media_id long, payload binary")


def test_media_metadata_native(spark):
    out = with_media_metadata(_media(spark), mime="image/png").collect()
    assert all(r.media_meta.mime == "image/png" for r in out)
    assert all(r.media_meta.n_bytes == len(r.payload) for r in out)
    assert all(len(r.media_meta.sha1) == 40 for r in out)


def test_decode_media_deterministic(spark):
    df = _media(spark)
    a = {r.media_id: (r.width, r.height, r.channels) for r in decode_media(df).collect()}
    b = {r.media_id: (r.width, r.height, r.channels) for r in decode_media(df).collect()}
    assert a == b
    assert all(64 <= w <= 255 and 1 <= c <= 3 for (w, h, c) in a.values())


def test_real_codecs_stubbed(spark):
    import pytest

    with pytest.raises(NotImplementedError):
        decode_media(_media(spark), use_real_codecs=True)


def test_media_embedding_shape(spark):
    udf = media_embedding_udf(dim=16)
    out = _media(spark).select("media_id", udf("payload").alias("emb")).collect()
    assert all(len(r.emb) == 16 for r in out)
    assert all(-1.0 <= v <= 1.0 for r in out for v in r.emb)


def test_frame_sampling_fanout(spark):
    out = sample_frames(_media(spark), num_frames=4).collect()
    assert len(out) == 8 * 4
    by_media = {}
    for r in out:
        by_media.setdefault(r.media_id, []).append(r.frame_idx)
    assert all(sorted(v) == [0, 1, 2, 3] for v in by_media.values())


def test_sessionize_stream_memory_sink(spark, tmp_path):
    # Write a small event batch, drive it through session_window via the
    # file source, and check the aggregate against a batch groupBy.
    src = str(tmp_path / "stream_src")
    rows = [
        (1, "2024-01-01 00:00:00"), (1, "2024-01-01 00:10:00"),
        (1, "2024-01-01 02:00:00"),                      # > 30 min gap -> new session
        (2, "2024-01-01 00:00:00"),
    ]
    batch = spark.createDataFrame(rows, "user_id long, ts_s string").select(
        "user_id", F.to_timestamp("ts_s").alias("ts")
    )
    batch.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(batch.schema).parquet(src)
    agg = sessionize_stream(stream, gap_seconds=1800, watermark="10 seconds")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("sess_out")
        .start()
    )
    try:
        q.processAllAvailable()
        out = spark.sql("SELECT * FROM sess_out").collect()
    finally:
        q.stop()
    per_user = {}
    for r in out:
        per_user.setdefault(r.user_id, []).append(r.n_events)
    assert sorted(per_user[1]) == [1, 2]
    assert per_user[2] == [1]


def test_resize_media_stub(spark):
    from webloghunter_spark.functions.multimodal import resize_media

    out = resize_media(_media(spark), target_w=8, target_h=4).collect()
    assert len(out) == 8
    assert all(len(r.payload) == 8 * 4 for r in out)
    assert all((r.width, r.height) == (8, 4) for r in out)
    # deterministic
    again = resize_media(_media(spark), target_w=8, target_h=4).collect()
    assert {r.media_id: bytes(r.payload) for r in out} == {
        r.media_id: bytes(r.payload) for r in again
    }


def test_burst_stream_stateful(spark, tmp_path):
    """Streaming burst detector: a 5-error run with <= 2 s gaps fires
    once at min_requests; a slow drip and a 200-status run never do."""
    from webloghunter_spark.streaming.bursts import burst_stream

    src = str(tmp_path / "burst_src")
    rows = []
    # qualifying burst: 5 errors 1s apart on (a, /x, GET)
    for i in range(5):
        rows.append(("a", "/x", "GET", 500, f"2024-01-01 00:00:0{i}"))
    # non-qualifying: 3 errors 10s apart (gap too big)
    for i in range(3):
        rows.append(("b", "/y", "GET", 500, f"2024-01-01 00:{i}0:00"))
    # non-errors never count
    for i in range(6):
        rows.append(("c", "/z", "GET", 200, f"2024-01-01 00:00:0{i}"))
    batch = spark.createDataFrame(
        rows, "ip string, request_uri string, method string, status int, ts_s string"
    ).select("ip", "request_uri", "method", "status",
             F.to_timestamp("ts_s").alias("utc_timestamp"))
    batch.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(batch.schema).parquet(src)
    bursts = burst_stream(stream, min_requests=5, max_gap_seconds=2.0)
    q = (
        bursts.writeStream.outputMode("append")
        .format("memory")
        .queryName("burst_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    # NOTE: processAllAvailable() livelocks here — ProcessingTimeTimeout
    # keeps scheduling timeout-evaluation batches, so "all available"
    # never drains. Poll the sink with a deadline instead.
    import time

    try:
        got = []
        deadline = time.time() + 120
        while time.time() < deadline:
            if q.exception():
                raise AssertionError(str(q.exception()))
            got = spark.sql("SELECT * FROM burst_out").collect()
            if got:
                break
            time.sleep(2)
    finally:
        q.stop()
    assert len(got) == 1
    r = got[0]
    assert (r.ip, r.request_uri, r.method, r.burst_count) == ("a", "/x", "GET", 5)
    assert r.max_time_epoch - r.min_time_epoch == 4.0


def test_tool_stream_stateful(spark, tmp_path):
    """Streaming tool detection: signature completes within its window
    -> one record; keywords spread past the window -> none."""
    from webloghunter_spark.streaming.tools import tool_stream

    src = str(tmp_path / "tool_src")
    rows = [
        # ip=a completes {admin, login, dump} within 60s
        ("a", "/admin/x",  "2024-01-01 00:00:00"),
        ("a", "/login",    "2024-01-01 00:00:10"),
        ("a", "/nothing",  "2024-01-01 00:00:15"),   # non-candidate row
        ("a", "/dump.sql", "2024-01-01 00:00:20"),
        # ip=b never completes inside the 60s window
        ("b", "/admin/x",  "2024-01-01 00:00:00"),
        ("b", "/login",    "2024-01-01 00:05:00"),
        ("b", "/dump.sql", "2024-01-01 00:10:00"),
    ]
    batch = spark.createDataFrame(
        rows, "ip string, request_uri string, ts_s string"
    ).select("ip", "request_uri", F.to_timestamp("ts_s").alias("utc_timestamp"))
    batch.write.mode("overwrite").parquet(src)

    sigs = [{"tool": "SC01", "keyword": ["/admin", "/login", "/dump.sql"],
             "time_window": 60}]
    stream = spark.readStream.schema(batch.schema).parquet(src)
    det = tool_stream(stream, sigs)
    q = (
        det.writeStream.outputMode("append")
        .format("memory")
        .queryName("tool_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    import time

    try:
        got = []
        deadline = time.time() + 120
        while time.time() < deadline:
            if q.exception():
                raise AssertionError(str(q.exception()))
            got = spark.sql("SELECT * FROM tool_out").collect()
            if got:
                break
            time.sleep(2)
    finally:
        q.stop()
    assert len(got) == 1
    r = got[0]
    assert (r.ip, r.tool, r.n_hits) == ("a", "SC01", 3)
    assert r.last_ts_epoch - r.first_ts_epoch == 20.0
