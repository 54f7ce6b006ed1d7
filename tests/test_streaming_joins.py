"""Stream-stream join + streaming dedup: drained streaming result must equal
the batch equivalent (the engine's streaming/batch unification contract)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_streaming_etl_spark.catalog import load_tables
from flink_streaming_etl_spark.streaming import joins
from tests.conftest import SF_SMOKE


def _event_stream(spark, events, tmp_path, n=2000):
    src_dir = tmp_path / "events_json"
    events.limit(n).select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        "user_id",
        "event_type",
        "value",
    ).coalesce(1).write.json(str(src_dir))
    schema = "event_id long, ts string, user_id long, event_type string, value double"
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src_dir))
        .withColumn("ts", F.to_timestamp("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"))
    )


def _drain(stream_df, tmp_path, name):
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", str(tmp_path / f"{name}_out"))
        .option("checkpointLocation", str(tmp_path / f"{name}_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_stream_stream_join_equals_batch(spark, tmp_path):
    events = load_tables(spark, SF_SMOKE, register=False)["events"].limit(2000).cache()
    stream = _event_stream(spark, events, tmp_path)

    joined = joins.purchase_click_join_stream(stream)
    _drain(joined, tmp_path, "join")
    got = {
        (r["purchase_id"], r["cts"])
        for r in spark.read.parquet(str(tmp_path / "join_out")).collect()
    }

    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("user_id").alias("u"), F.col("ts").alias("pts")
    )
    c = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("cts")
    )
    want = {
        (r["purchase_id"], r["cts"])
        for r in p.join(
            c,
            (p.u == c.cu)
            & (c.cts >= p.pts - F.expr("INTERVAL 1 HOUR"))
            & (c.cts < p.pts),
        ).collect()
    }
    assert got, "stream-stream join emitted nothing"
    # Inner watermarked join may hold back pairs near the stream tail.
    assert got <= want
    assert len(got) >= int(0.8 * len(want))


def test_streaming_dedup_bounded_state(spark, tmp_path):
    events = load_tables(spark, SF_SMOKE, register=False)["events"].limit(500).cache()
    # Duplicate every event (same event_id, same ts) — at-least-once replay.
    doubled = events.union(events)
    stream = _event_stream(spark, doubled.orderBy("ts"), tmp_path, n=1000)

    deduped = joins.dedup_stream(stream).select("event_id")
    _drain(deduped, tmp_path, "dedup")
    out = spark.read.parquet(str(tmp_path / "dedup_out"))
    ids = [r["event_id"] for r in out.collect()]
    assert len(ids) == len(set(ids)), "duplicates survived streaming dedup"
    # Every unique id that entered must come out exactly once.
    want = {r["event_id"] for r in events.select("event_id").collect()}
    assert set(ids) == want


def test_streaming_session_windows_equal_batch(spark, tmp_path):
    from flink_streaming_etl_spark.operators import windows

    events = load_tables(spark, SF_SMOKE, register=False)["events"].limit(2000).cache()
    stream = _event_stream(spark, events, tmp_path)
    _drain(windows.session_windows_stream(stream), tmp_path, "sess")
    got = {
        (r["user_id"], r["session_start"]): r["n_events"]
        for r in spark.read.parquet(str(tmp_path / "sess_out")).collect()
    }
    want = {
        (r["user_id"], r["session_start"]): r["n_events"]
        for r in windows.session_windows(events).collect()
    }
    assert got, "streaming sessionization emitted nothing"
    # Sessions still open at end-of-stream are held back by the watermark.
    assert set(got) <= set(want)
    assert len(got) >= int(0.8 * len(want))
    for k, v in got.items():
        assert v == want[k], k
