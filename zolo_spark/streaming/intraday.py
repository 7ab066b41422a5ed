"""Intraday streaming aggregation + short-horizon forecast.

Design (idiomatic Structured Streaming, not a port — the reference
never built this):

* :func:`intraday_windows` — event-time sliding windows with a
  watermark bounding state for late data. Incremental: each
  micro-batch updates only open windows.
* :func:`quittin_time_forecast` — per-key SES forecast of the next
  window, recomputed per micro-batch via ``foreachBatch`` over the
  completed windows (the window agg itself stays incremental; only
  the tiny per-key fold re-runs).
* Exactly-once: checkpointed source offsets + idempotent parquet
  sink in :func:`run_to_parquet` (the batch ETLs are at-least-once
  by reference fidelity; streaming is where the engine upgrades).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

EVENTS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def read_events_stream(spark: SparkSession, path: str,
                       max_files_per_trigger: int = 1) -> DataFrame:
    """File-based streaming source over events parquet (the test/demo
    transport; production swaps in Kafka with the same schema)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def intraday_windows(events: DataFrame,
                     window: str = "30 minutes",
                     slide: str = "5 minutes",
                     watermark: str = "10 minutes") -> DataFrame:
    """Sliding event-time windows per event_type with late-data
    watermark; emits sales count + total value per window."""
    return (
        events
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "event_type", "n_events", "total_value")
    )


def quittin_time_forecast(spark: SparkSession, windows_df: DataFrame,
                          alpha: float = 0.6) -> DataFrame:
    """Forecast the NEXT window's total per event_type: SES fold over
    the completed-window series (batch-side helper applied inside
    foreachBatch; pure DataFrame ops, no driver loop)."""
    series = windows_df.groupBy("event_type").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("window_start", "total_value"))),
            lambda s: s["total_value"],
        ).alias("ys")
    )
    return series.filter(F.size("ys") >= 2).select(
        "event_type",
        F.round(
            F.expr(
                f"aggregate(slice(ys, 2, size(ys)-1), element_at(ys, 1), "
                f"(acc, x) -> {alpha}*x + {1 - alpha}*acc)"
            ),
            2,
        ).alias("next_window_forecast"),
    )


def session_windows(events: DataFrame,
                    gap: str = "30 minutes",
                    watermark: str = "10 minutes") -> DataFrame:
    """Native streaming sessionization: events within ``gap`` of each
    other per user merge into one session window (the streaming twin
    of the batch lag-cumsum sessionize query). State is bounded by the
    watermark."""
    return (
        events
        .withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 2).alias("session_value"))
        .select(F.col("s.start").alias("session_start"),
                F.col("s.end").alias("session_end"),
                "user_id", "n_events", "session_value")
    )


def run_to_memory(spark: SparkSession, events: DataFrame,
                  name: str = "intraday") -> "StreamingQuery":
    """Drive the windowed aggregation into an in-memory sink (tests /
    demos): ``processAllAvailable()`` then query the view."""
    agg = intraday_windows(events)
    return (
        agg.writeStream.outputMode("complete")
        .format("memory").queryName(name)
        .start()
    )


def run_to_parquet(spark: SparkSession, events: DataFrame, out_dir: str,
                   checkpoint_dir: str) -> "StreamingQuery":
    """Checkpointed append-mode sink: watermark closes windows, closed
    windows land in parquet exactly once per (window, key)."""
    agg = intraday_windows(events)
    return (
        agg.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .format("parquet").option("path", out_dir)
        .start()
    )
