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


def tumbling_windows(events: DataFrame,
                     window: str = "1 hour",
                     watermark: str = "4 hours") -> DataFrame:
    """Tumbling event-time windows per event_type with a late-data
    watermark; exact DECIMAL value sums so the append-mode output is
    bit-comparable with :func:`watermark_batch_twin`."""
    return (
        events
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum(F.round(F.col("value"), 6).cast("decimal(28,6)"))
             .cast("double").alias("total_value"))
        .select(F.col("w.start").alias("window_start"),
                "event_type", "n_events", "total_value")
    )


def watermark_batch_twin(events: DataFrame, late_mod: int = 7,
                         delay_hours: int = 4) -> DataFrame:
    """Deterministic batch twin of the append-mode tumbling-window
    aggregation WITH watermark-dropped late data — the restatement
    that makes the watermark semantics oracle-checkable (the
    scd2/monitor twins gate sinks and state arithmetic; this gates
    the late-row filter and the append-mode emission predicate).

    Deterministic replay: micro-batch = event-time day bucket, except
    every ``late_mod``-th ``event_id`` arrives TWO buckets late (its
    day's bucket + 2) — real out-of-order arrival, far enough back
    that the watermark actually drops some of it. The Structured
    Streaming semantics were pinned EMPIRICALLY on this engine
    version (progress-log experiments, numRowsDroppedByWatermark):

    * the eviction watermark in batch b = max event time over batches
      < b (floored to milliseconds — event-time stats are tracked in
      ms) minus the delay;
    * the LATE-ROW FILTER uses the watermark lagged one further batch
      (``watermarkForLateEvents`` = the previous trigger's value):
      a row arriving in batch b is DROPPED iff its window end <= max
      event time over batches <= b-2, minus delay. A kept late row
      merges into its window's state even when that window is evicted
      in the very same batch. The lag-1/lag-2 split provably forbids
      duplicate append emissions: a window emitted in batch b' < b
      has end <= wm(b') <= the batch-b filter threshold, so any
      post-emission straggler is dropped, never re-emitted;
    * append mode emits exactly the windows whose end <= the FINAL
      watermark (max over ALL batches - delay; the trailing no-data
      micro-batch performs the last eviction, end == wm inclusive);
      later windows are still open and withheld.

    Streaming == batch on identical buckets is pinned by pytest
    (`test_watermark_batch_twin_equals_streaming`), which exercises
    dropped-late, kept-late, and withheld-open branches.

    Scale shape: the per-batch max is a tiny partial agg (one row per
    day) broadcast back onto the corpus — the running-max window
    function sorts only that per-day frame, never the events; the
    final watermark is a broadcast 1-row agg; the only full shuffle
    is the (window, key) aggregation itself."""
    from pyspark.sql import Window

    delay = F.expr(f"INTERVAL {delay_hours} HOURS")
    tagged = (
        events
        .withColumn("_w_start", F.date_trunc("hour", F.col("ts")))
        .withColumn("_w_end", F.col("_w_start") + F.expr("INTERVAL 1 HOUR"))
        .withColumn(
            "_arr",
            F.date_trunc("day", F.col("ts"))
            + F.when(F.col("event_id") % late_mod == 0,
                     F.expr("INTERVAL 2 DAYS")).otherwise(F.expr("INTERVAL 0 DAY")),
        )
    )
    bmax = tagged.groupBy("_arr").agg(
        F.max(F.date_trunc("millisecond", F.col("ts"))).alias("_mx"))
    # late-events watermark lags the eviction watermark by one batch.
    # The unpartitioned running-max window is safe at any event
    # volume: its frame is bmax — ONE ROW PER ARRIVAL DAY (≤ the
    # simulated calendar span, ~31 rows on the testdata), never the
    # events themselves.
    run = Window.orderBy("_arr").rowsBetween(Window.unboundedPreceding, -2)
    wm = bmax.select(
        "_arr", (F.max("_mx").over(run) - delay).alias("_wm_before"))
    kept = (
        tagged.join(F.broadcast(wm), "_arr")
        .filter(F.col("_wm_before").isNull()
                | (F.col("_w_end") > F.col("_wm_before")))
    )
    final_wm = tagged.agg(
        (F.max(F.date_trunc("millisecond", F.col("ts"))) - delay)
        .alias("_wm_final"))
    return (
        kept.groupBy("_w_start", "_w_end", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum(F.round(F.col("value"), 6).cast("decimal(28,6)"))
             .cast("double").alias("total_value"))
        .crossJoin(F.broadcast(final_wm))
        .filter(F.col("_w_end") <= F.col("_wm_final"))
        .select(F.col("_w_start").alias("window_start"),
                "event_type", "n_events", "total_value")
    )


def session_late_twin(events: DataFrame, gap_hours: int = 4,
                      delay_hours: int = 6, late_mod: int = 7) -> DataFrame:
    """Deterministic batch twin of the append-mode SESSION-window
    aggregation WITH watermark-dropped late data — the last streaming
    shape without a value oracle (r7 ROADMAP #3: the tumbling
    restatement does NOT transfer, because a kept late row landing
    within ``gap`` of an ALREADY-EMITTED session must REOPEN a new
    session where global batch sessionization would merge — so the
    twin replays the per-batch state chain instead of computing one
    global sessionization).

    Deterministic replay (same arrival model as
    :func:`watermark_batch_twin`): micro-batch = event-time day
    bucket, every ``late_mod``-th ``event_id`` arrives two buckets
    late. The session semantics were pinned EMPIRICALLY on this
    engine version (progress-log experiments, round 8):

    * watermark in batch b = max ms-floored event time over batches
      < b, minus the delay;
    * the late filter tests the row's PRE-MERGE window end
      (``ts + gap``) against the watermark lagged one further batch
      (previous trigger's value) — same lag-1 rule as tumbling;
    * kept rows merge into session state FIRST, then sessions whose
      end <= the batch watermark are emitted and leave state
      (inclusive — verified with an exact-equality probe); a kept
      late row can merge into a session evicted in the same batch;
    * a late row inside the span of an ALREADY-emitted session (but
      past the late filter) starts a fresh session — the reopen case
      that makes the global restatement impossible;
    * the trailing no-data batch emits sessions with end <= the
      final watermark (max over all batches - delay, inclusive);
      later sessions are withheld.

    Scale shape: the watermark table is one tiny per-day aggregate
    (collected: 32 rows, bounded by the stream's day span — never
    corpus-sized); the replay itself is ONE ``applyInPandas`` pass
    partitioned by user (each user's chain replays independently
    against the broadcast watermark list), and the session
    aggregation is plain JVM-side groupBy with exact DECIMAL sums.
    No driver loop over micro-batches, no per-batch Spark jobs."""
    import pandas as pd

    gap_us = gap_hours * 3_600_000_000
    delay_us = delay_hours * 3_600_000_000
    tagged = events.select(
        "event_id", "ts", "user_id", "value",
        (F.unix_micros(F.date_trunc("day", F.col("ts")))
         + F.when(F.col("event_id") % late_mod == 0,
                  F.lit(2 * 86_400_000_000)).otherwise(F.lit(0)))
        .alias("_arr_us"),
        F.unix_micros("ts").alias("_ts_us"),
        (F.unix_micros(F.date_trunc("millisecond", F.col("ts"))))
        .alias("_ts_ms_us"),
    )
    bmax = (tagged.groupBy("_arr_us")
            .agg(F.max("_ts_ms_us").alias("_mx"))
            .orderBy("_arr_us").collect())  # one row per arrival day
    buckets: list[tuple[int, int | None, int | None]] = []
    running: list[int] = []
    for i, r in enumerate(bmax):
        wm_evict = max(running) - delay_us if running else None
        wm_late = (max(running[:-1]) - delay_us
                   if len(running) >= 2 else None)
        buckets.append((r["_arr_us"], wm_evict, wm_late))
        running.append(r["_mx"])
    final_wm = max(running) - delay_us

    def replay(pdf: pd.DataFrame) -> pd.DataFrame:
        uid = pdf["user_id"].iloc[0]
        by_arr: dict[int, list[tuple[int, int]]] = {}
        for ts_us, eid, arr in zip(pdf["_ts_us"], pdf["event_id"],
                                   pdf["_arr_us"]):
            by_arr.setdefault(int(arr), []).append((int(ts_us), int(eid)))
        state: list[tuple[int, int]] = []
        out: list[tuple[int, int, int]] = []  # (event_id, sstart, rnd)

        def evict(threshold: int, rnd: int) -> None:
            nonlocal state
            state.sort()
            keep: list[tuple[int, int]] = []
            cur: list[tuple[int, int]] = []
            for row in state:
                if cur and row[0] >= cur[-1][0] + gap_us:
                    _flush(cur, threshold, rnd, keep)
                    cur = []
                cur.append(row)
            if cur:
                _flush(cur, threshold, rnd, keep)
            state = keep

        def _flush(sess, threshold, rnd, keep):
            if sess[-1][0] + gap_us <= threshold:
                out.extend((eid, sess[0][0], rnd) for _, eid in sess)
            else:
                keep.extend(sess)

        for rnd, (arr, wm_evict, wm_late) in enumerate(buckets):
            for ts_us, eid in by_arr.get(arr, ()):
                if wm_late is None or ts_us + gap_us > wm_late:
                    state.append((ts_us, eid))
            if wm_evict is not None:
                evict(wm_evict, rnd)
        evict(final_wm, len(buckets))
        return pd.DataFrame(
            {"event_id": [o[0] for o in out],
             "_sstart_us": [o[1] for o in out],
             "_rnd": [o[2] for o in out]}
        )

    labels = tagged.groupBy("user_id").applyInPandas(
        replay, "event_id long, _sstart_us long, _rnd int")
    return (
        events.select("event_id", "ts", "user_id", "value")
        .join(labels, "event_id")
        .groupBy("user_id", "_sstart_us", "_rnd")
        .agg(
            F.min("ts").alias("session_start"),
            (F.max("ts") + F.expr(f"INTERVAL {gap_hours} HOURS"))
            .alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value"), 6).cast("decimal(28,6)"))
            .cast("double").alias("session_value"),
        )
        .select("session_start", "session_end", "user_id",
                "n_events", "session_value")
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
