"""Watermark semantics: late data beyond the watermark is dropped from
windowed aggregation state (append mode only finalizes windows the
watermark has passed)."""

import os

from pyspark.sql import functions as F


def test_watermark_drops_late_data(spark, tmp_path):
    from quadtree_block_compression_spark.streaming.windows import streaming_event_counts

    src = str(tmp_path / "late_in")
    ckpt = str(tmp_path / "late_ckpt")
    os.makedirs(src)
    schema = "ts timestamp, event_type string, value double"

    def write_batch(rows):
        (spark.createDataFrame(rows, "ts_s string, event_type string, value double")
         .withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
         .select("ts", "event_type", "value")
         .coalesce(1).write.mode("append").parquet(src))

    # batch 1: events in hour 00 and hour 06 (the hour-06 event advances the
    # watermark to 06:00 - 1h = 05:00, far past hour 00's window end)
    write_batch([("2024-01-01 00:10:00", "a", 1.0),
                 ("2024-01-01 00:20:00", "a", 1.0),
                 ("2024-01-01 06:00:00", "b", 1.0)])

    stream = spark.readStream.schema(schema).parquet(src)
    agg = streaming_event_counts(spark, stream, minutes=60, watermark="1 hour")
    q = (agg.writeStream.format("memory").queryName("late_counts")
         .option("checkpointLocation", ckpt).outputMode("append").start())
    q.processAllAvailable()

    # batch 2: a LATE event for hour 00 (watermark is already at 05:00) and
    # an on-time event for hour 06
    write_batch([("2024-01-01 00:30:00", "a", 1.0),      # late → dropped
                 ("2024-01-01 06:30:00", "b", 1.0)])
    q.processAllAvailable()
    # advance the watermark past hour 06 so its window finalizes
    write_batch([("2024-01-01 09:00:00", "c", 1.0)])
    q.processAllAvailable()
    q.stop()

    rows = {(str(r.win_start), r.event_type): r.n_events
            for r in spark.sql("select * from late_counts").collect()}
    # hour-00 window finalized with only the 2 on-time events; the late
    # third event was discarded by the watermark
    assert rows[("2024-01-01 00:00:00", "a")] == 2
    # hour-06 window counts both of its on-time events
    assert rows[("2024-01-01 06:00:00", "b")] == 2


def test_native_session_window_matches_batch(spark, tmp_path):
    """The native session_window streaming aggregation must produce the same
    per-user sessions as the batch lag/cumsum sessionizer (no exact-gap
    spacing in the fixture, where their boundary semantics differ)."""
    from quadtree_block_compression_spark.streaming.windows import (
        session_windows, streaming_session_counts)

    src = str(tmp_path / "sess_in")
    ckpt = str(tmp_path / "sess_ckpt")
    os.makedirs(src)
    rows = [
        # user 1: two sessions (65-minute gap between them)
        ("2024-01-01 00:00:00", 1, 1.5), ("2024-01-01 00:10:00", 1, 2.5),
        ("2024-01-01 00:29:00", 1, 1.0),
        ("2024-01-01 01:34:00", 1, 4.0), ("2024-01-01 01:40:00", 1, 0.5),
        # user 2: one session
        ("2024-01-01 00:05:00", 2, 3.0), ("2024-01-01 00:20:00", 2, 1.0),
    ]
    ev = (spark.createDataFrame(rows, "ts_s string, user_id long, value double")
          .withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
          .select("user_id", "ts", "value"))
    ev.coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema("user_id long, ts timestamp, value double") \
        .parquet(src)
    agg = streaming_session_counts(stream, gap_minutes=30, watermark="0 seconds")
    q = (agg.writeStream.format("memory").queryName("native_sessions")
         .option("checkpointLocation", ckpt).outputMode("complete").start())
    q.processAllAvailable()
    q.stop()

    got = {(r.user_id, str(r.session_start), r.n_events, r.sum_value_micros)
           for r in spark.sql("select * from native_sessions").collect()}
    want = {(r.user_id, str(r.session_start), r.n_events, r.sum_value_micros)
            for r in session_windows(ev, gap_minutes=30).collect()}
    assert got == want and len(got) == 3
