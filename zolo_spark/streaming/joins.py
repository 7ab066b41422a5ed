"""Stream-stream joins (Structured Streaming interval joins).

The classic shape is click→purchase attribution: two unbounded
streams joined on a key with an event-time interval bound. Spark
buffers each side in the state store; the watermark plus the
time-range predicate let it EVICT state once no future match is
possible — without both, a stream-stream join would hold every row
forever. (Reference scope: the reference engine is batch-only; this
is the streaming twin of its header⟕details join family,
/root/reference/bin/etl/square_ETL.py joins, re-expressed over
unbounded input.)

Semantics: inner interval join emits a row the moment both sides are
present; results are identical to running the same join as a batch
query over the same (finite) input — the batch join IS the test
oracle in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def attribution_join(events: DataFrame,
                     horizon: str = "30 minutes",
                     watermark: str = "1 hour",
                     how: str = "inner") -> DataFrame:
    """Join each purchase to the clicks by the same user in the
    preceding ``horizon`` (click.ts <= purchase.ts <= click.ts +
    horizon).

    Takes ONE events stream and splits it into clicks/purchases so
    callers (and tests) drive it with a single source; production
    would pass two independent Kafka topics through the same join
    expression. State per side is bounded by ``watermark`` +
    ``horizon`` — the interval condition is what makes eviction
    possible, so keep it in sync with the business horizon.

    ``how='left_outer'`` keeps unattributed purchases: a purchase
    with no click in its window emits once with NULL click columns,
    but only after the watermark passes ``purchase_ts`` (no earlier
    emission is possible — a matching click could still arrive).
    Until fresh events advance the watermark past that point, the
    unmatched row sits in the state store; finite replays must
    therefore push a watermark-advancing row through BOTH sides to
    flush the tail (see tests/test_streaming.py).
    """
    if how not in ("inner", "left_outer", "leftouter", "left"):
        raise ValueError(
            f"attribution_join supports inner/left_outer, got {how!r}: "
            "right/full outer would make the CLICK side the preserved "
            "one, which inverts the attribution question")
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user_id"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return purchases.join(
        clicks,
        F.expr(
            "c_user_id = p_user_id AND "
            "click_ts <= purchase_ts AND "
            f"purchase_ts <= click_ts + interval {horizon}"
        ),
        how,
    ).select(
        F.col("p_user_id").alias("user_id"),
        "purchase_id", "purchase_ts",
        F.round("purchase_value", 2).alias("purchase_value"),
        "click_id", "click_ts",
    )
