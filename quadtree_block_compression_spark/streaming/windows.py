"""Windowed event aggregation — batch and Structured Streaming forms.

``tumbling_event_counts`` / ``session_windows`` are deterministic batch
DataFrame plans over the ``events`` table (oracle-checkable SQL). The
``streaming_event_counts`` variant is the same logical plan expressed as a
readStream→watermark→window→writeStream pipeline for live ingest; tests run
it with the rate/memory sinks to prove the wiring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _micro_sum(col: str = "value"):
    """Exact integer sum of a double column in micro-units.

    ``floor(value * 1e6)`` is the same IEEE op on every engine, and BIGINT
    summation is associative — unlike ``round(sum(double), 6)``, whose value
    depends on partition/summation order and can flip the 6th decimal between
    engines (the round-1 ``events_sessionize`` driver hash failure)."""
    return F.sum(F.floor(F.col(col) * 1000000.0).cast("long"))


def tumbling_event_counts(events: DataFrame, minutes: int = 60) -> DataFrame:
    """Per event_type counts/sums over tumbling windows."""
    return (events
            .groupBy(F.window("ts", f"{minutes} minutes").alias("win"), "event_type")
            .agg(F.count("*").alias("n_events"),
                 _micro_sum("value").alias("sum_value_micros"))
            .select(F.col("win.start").alias("win_start"), "event_type",
                    "n_events", "sum_value_micros"))


def session_windows(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-user sessionization via the lag/gap/cumsum pattern (windows, no
    UDF): a new session starts when the gap to the previous event exceeds
    ``gap_minutes``. Returns one row per (user, session)."""
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy("ts")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    marked = events.withColumn(
        "_new", F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0))
    sess = marked.withColumn("session_id", F.sum("_new").over(
        Window.partitionBy("user_id").orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, 0)))
    return (sess.groupBy("user_id", "session_id")
            .agg(F.min("ts").alias("session_start"),
                 F.max("ts").alias("session_end"),
                 F.count("*").alias("n_events"),
                 _micro_sum("value").alias("sum_value_micros")))


def streaming_session_counts(source_df: DataFrame, gap_minutes: int = 30,
                             watermark: str = "2 hours") -> DataFrame:
    """Structured Streaming form of ``session_windows`` using the native
    ``session_window`` aggregation (merging windows + watermark eviction —
    the scale path for live sessionization; the batch lag/cumsum form stays
    the oracle-checkable twin). Boundary semantics: an event exactly
    ``gap`` after its predecessor starts a NEW session here, while the
    batch form's ``gap > threshold`` keeps it — identical on any data
    without exact-gap spacing."""
    return (source_df.withWatermark("ts", watermark)
            .groupBy(F.session_window("ts", f"{gap_minutes} minutes").alias("win"),
                     "user_id")
            .agg(F.count("*").alias("n_events"),
                 _micro_sum("value").alias("sum_value_micros"))
            .select("user_id", F.col("win.start").alias("session_start"),
                    F.col("win.end").alias("session_end"),
                    "n_events", "sum_value_micros"))


def streaming_event_counts(spark, source_df: DataFrame | None = None,
                           minutes: int = 60, watermark: str = "2 hours"):
    """Structured Streaming form of ``tumbling_event_counts``.

    With ``source_df=None`` builds a rate-source demo stream; callers in
    tests pass a file/memory stream of the same schema. Returns the
    streaming DataFrame (caller attaches writeStream)."""
    if source_df is None:
        src = (spark.readStream.format("rate").option("rowsPerSecond", 100).load()
               .withColumn("event_type", F.concat(F.lit("t"), (F.col("value") % 3)))
               .withColumnRenamed("timestamp", "ts"))
    else:
        src = source_df
    return (src.withWatermark("ts", watermark)
            .groupBy(F.window("ts", f"{minutes} minutes").alias("win"), "event_type")
            .agg(F.count("*").alias("n_events"))
            .select(F.col("win.start").alias("win_start"), "event_type", "n_events"))
