"""Temporal join operators Spark has no native form of (guide §Common
OLAP): as-of join and range join, built as compositions of DataFrame
ops — no UDF, no driver loop.

* :func:`asof_join` — union-and-carry: tag both sides, sort within
  key by (time, side) so right rows at equal timestamps precede left
  rows (backward-inclusive semantics), then ``last(..,
  ignorenulls=True)`` carries the latest right payload onto each left
  row. One shuffle, one sort — same cost class as a window, no
  pairwise blow-up.
* :func:`range_join` — bucketize the time axis so each left row joins
  only its own and the preceding ``ceil(window/width)`` buckets, then
  filter exactly. Candidate pairs are bounded per bucket instead of
  O(|L|·|R|) — the standard scale recipe for interval joins.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str],
    suffix: str = "_r",
) -> DataFrame:
    """Backward as-of join: for every left row, the most recent right
    row with ``right.on <= left.on`` within the same ``by`` key; NULL
    payload when no right row precedes."""
    l_tag = left.withColumn("_side", F.lit(1))
    r_cols = [F.col(c).alias(f"{c}{suffix}") for c in value_cols]
    r_tag = right.select(
        F.col(by), F.col(on), F.lit(0).alias("_side"), *r_cols
    )
    merged = l_tag.unionByName(r_tag, allowMissingColumns=True)

    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.select(
        "*",
        *[
            F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"_carry_{c}")
            for c in value_cols
        ],
    )
    out_cols = [c for c in left.columns] + [
        F.col(f"_carry_{c}").alias(f"{c}{suffix}") for c in value_cols
    ]
    return carried.filter(F.col("_side") == 1).select(*out_cols)


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    window_seconds: int,
    bucket_seconds: int | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Pairs with ``left.on - window <= right.on <= left.on`` within a
    ``by`` key, via time-bucketed equi-join + exact filter."""
    width = bucket_seconds or window_seconds
    n_back = math.ceil(window_seconds / width)

    # cast through "timestamp" so TIMESTAMP_NTZ inputs (micros parquet)
    # work too — NTZ→long is not a legal cast, NTZ→timestamp→long is.
    epoch = F.col(on).cast("timestamp").cast("long")
    l_b = left.withColumn("_lb", F.floor(epoch / width))
    # each left bucket probes itself and the n_back preceding buckets
    l_b = l_b.withColumn(
        "_bucket", F.explode(F.sequence(F.col("_lb") - n_back, F.col("_lb")))
    )
    r_b = right.select(
        F.col(by).alias("_rby"),
        F.col(on).alias(f"{on}{suffix}"),
        F.floor(F.col(on).cast("timestamp").cast("long") / width).alias("_bucket"),
    )
    joined = l_b.join(
        r_b,
        (F.col(by) == F.col("_rby")) & (l_b["_bucket"] == r_b["_bucket"]),
    )
    exact = joined.filter(
        (F.col(f"{on}{suffix}") <= F.col(on))
        & (F.col(f"{on}{suffix}") >= F.col(on) - F.expr(f"INTERVAL {window_seconds} SECONDS"))
    )
    return exact.select(*left.columns, f"{on}{suffix}").distinct()
