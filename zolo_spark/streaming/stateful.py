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
from pyspark.sql import DataFrame
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
