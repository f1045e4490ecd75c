"""Streaming-shaped operators over the events table.

The reference is batch-only (SURVEY.md §2.9); these are the engine's
forward-looking stream surface:

  - batch sessionization (gap-based) with window functions — has an exact
    SQL oracle,
  - a Structured Streaming job (file source -> watermark -> windowed agg ->
    memory sink) proving the same transformations run incrementally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Classic gap-based sessionization: a new session starts when the gap to
    the previous event of the same user exceeds `gap_minutes`. Pure window
    functions (lag + cumulative sum) — one shuffle on user_id."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = gap_minutes * 60
    with_flag = events.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        "value",
        F.when(
            (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w)))
            > gap_s,
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    with_sid = with_flag.withColumn(
        "session_seq",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    return (
        with_sid.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            # round-then-decimal-sum: exact, order-independent, so results
            # are bit-identical across engines and shuffle layouts
            F.sum(F.round(F.col("value"), 4).cast("decimal(18,4)"))
            .cast("double")
            .alias("total_value"),
        )
    )


def asof_last_event(
    events: DataFrame, left_type: str = "purchase", right_type: str = "click"
) -> DataFrame:
    """As-of join: for each `left_type` event, the timestamp of the most
    recent `right_type` event by the same user at or before it.

    Spark has no native ASOF JOIN; the scalable expression is union-tag +
    ONE window pass (a single shuffle on user_id, linear scan per user)
    instead of a per-row range join, which Catalyst would plan as a
    broadcast-nested-loop at scale. Rows sort by (ts, kind) with the right
    type first so equal-timestamp rights are visible to their left row.
    Returns (event_id, user_id, ts, asof_ts nullable)."""
    tagged = events.where(
        F.col("event_type").isin([left_type, right_type])
    ).select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.col("event_type") == right_type, 0)
        .otherwise(1)
        .alias("_k"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "_k", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    asof = F.last(
        F.when(F.col("_k") == 0, F.col("ts")), ignorenulls=True
    ).over(w)
    return (
        tagged.withColumn("asof_ts", asof)
        .where(F.col("_k") == 1)
        .select("event_id", "user_id", "ts", "asof_ts")
    )


def windowed_event_counts(events: DataFrame, minutes: int = 60) -> DataFrame:
    """Tumbling-window counts per event_type (batch form — same logical op
    the streaming job runs incrementally)."""
    return (
        events.groupBy(
            F.window("ts", f"{minutes} minutes").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def stream_windowed_counts(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    query_name: str = "event_counts",
    minutes: int = 60,
    watermark: str = "2 hours",
):
    """Structured Streaming variant: parquet file source with watermarked
    event-time tumbling windows; memory sink for tests. At scale the sink is
    an Iceberg table and the source a Kafka topic — the middle is identical."""
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "4")
        .parquet(events_dir)
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", f"{minutes} minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )
    # 'update' mode: the watermark can finalize and DROP expired window
    # state, so the job really runs incrementally (state bounded by the
    # watermark horizon). 'complete' would retain every window forever and
    # re-emit the full result each trigger; 'append' emits nothing on a
    # finite file source because the watermark never passes the last window.
    # The memory sink accumulates each trigger's updated rows — readers take
    # the latest row per (window_start, event_type).
    return (
        agg.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
