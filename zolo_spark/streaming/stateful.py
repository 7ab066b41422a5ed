"""Custom stateful streaming operator via ``applyInPandasWithState``.

A per-key incremental monitor: running event count, running value sum,
and an exponentially-weighted level that updates as micro-batches
arrive — the primitive under 'continuously monitor sales' without
recomputing history per trigger. State lives in the streaming state
store (checkpointed, recoverable); each micro-batch touches only the
keys present in that batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

STATE_SCHEMA = T.StructType([
    T.StructField("n", T.LongType()),
    T.StructField("total", T.DoubleType()),
    T.StructField("level", T.DoubleType()),
])

OUTPUT_SCHEMA = T.StructType([
    T.StructField("event_type", T.StringType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("total_value", T.DoubleType()),
    T.StructField("level", T.DoubleType()),
])

ALPHA = 0.6


def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    n, total, level = state.get if state.exists else (0, 0.0, None)
    for pdf in pdfs:
        vals = pdf["value"].astype(float)
        n += len(vals)
        total += float(vals.sum())
        batch_mean = float(vals.mean()) if len(vals) else None
        if batch_mean is not None:
            level = (
                batch_mean if level is None
                else ALPHA * batch_mean + (1 - ALPHA) * level
            )
    state.update((n, total, level))
    yield pd.DataFrame([{
        "event_type": key[0],
        "n_events": n,
        "total_value": round(total, 2),
        "level": round(level, 4) if level is not None else None,
    }])


def running_monitor_batch(events: DataFrame, alpha: float = ALPHA) -> DataFrame:
    """Deterministic batch twin of :func:`running_monitor`: the final
    per-key state when the stream is replayed with micro-batches =
    ascending event-time DAY buckets — the restatement that makes the
    stateful operator oracle-checkable (micro-batch boundaries are
    otherwise nondeterministic).

    Per ``event_type``: ``n_events`` = total row count, ``total_value``
    = exact sum (per-value round-6 → DECIMAL(28,6) — associative, so
    order-independent across engines; emitted as the exact decimal
    cast to double, never re-rounded), and ``level`` = the EWMA of
    per-bucket means folded in bucket order (first bucket seeds the
    level, exactly the streaming operator's ``level is None`` branch).
    Per-bucket mean divides the exact decimal sum (as double) by the
    non-null count — pandas ``.mean()`` semantics.

    Scale shape: one partial-aggregated shuffle to (key, day), then a
    tiny per-key fold over ≤ days-of-history elements — no window
    sort, no state store; this is the backfill/repair job a streaming
    deployment runs against the same day-bucketed lake partitions.
    Streaming == batch (same buckets) is pinned by pytest."""
    per_bucket = (
        events
        .withColumn("_bk", F.date_trunc("day", F.col("ts")))
        .groupBy("event_type", "_bk")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.count("value").alias("_nv"),
            F.sum(F.round(F.col("value"), 6).cast("decimal(28,6)")).alias("_s"),
        )
        .withColumn("_mean", F.col("_s").cast("double") / F.col("_nv"))
    )
    agg = per_bucket.groupBy("event_type").agg(
        F.sum("_n").alias("n_events"),
        F.sum("_s").alias("_total"),
        F.transform(
            F.sort_array(F.collect_list(F.struct("_bk", "_mean"))),
            lambda s: s["_mean"],
        ).alias("_ms"),
    )
    # left fold seeded by the FIRST element (DuckDB list_reduce's
    # no-init form) — identical to the stream's batch-by-batch update
    level = F.aggregate(
        F.slice(F.col("_ms"), F.lit(2), F.greatest(F.size("_ms") - 1, F.lit(0))),
        F.element_at(F.col("_ms"), 1),
        lambda acc, x: F.lit(alpha) * x + F.lit(1.0 - alpha) * acc,
    )
    return agg.select(
        "event_type",
        "n_events",
        F.col("_total").cast("double").alias("total_value"),
        F.round(level, 4).alias("level"),
    )


def running_monitor(events: DataFrame) -> DataFrame:
    """Stateful per-event_type running (count, sum, EWMA-of-batch-mean).

    Update-mode output: one row per key per micro-batch with the
    post-batch state."""
    return (
        events.groupBy("event_type")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
