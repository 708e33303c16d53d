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
