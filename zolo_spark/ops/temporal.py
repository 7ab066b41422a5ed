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
* :func:`interval_join` — two interval relations, overlap predicate:
  both sides explode over covered buckets, equi-join on (key,
  bucket), exact filter, DISTINCT dedup. Same blocking idea as
  range_join, generalized to interval×interval.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | list[str],
    value_cols: list[str],
    suffix: str = "_r",
) -> DataFrame:
    """Backward as-of join: for every left row, the most recent right
    row with ``right.on <= left.on`` within the same ``by`` key(s);
    NULL payload when no right row precedes. ``by`` may be a single
    column name or a list (composite key — the window partitions by
    all of them; no struct packing needed)."""
    by_cols = [by] if isinstance(by, str) else list(by)
    l_tag = left.withColumn("_side", F.lit(1))
    r_cols = [F.col(c).alias(f"{c}{suffix}") for c in value_cols]
    r_tag = right.select(
        *[F.col(b) for b in by_cols], F.col(on),
        F.lit(0).alias("_side"), *r_cols
    )
    merged = l_tag.unionByName(r_tag, allowMissingColumns=True)

    w = (
        Window.partitionBy(*by_cols)
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


def time_weighted_avg(df: DataFrame, keys: list[str],
                      ts_col: str = "ts", val_col: str = "value",
                      id_col: str | None = None) -> DataFrame:
    """Time-weighted average over irregularly-sampled events —
    TimescaleDB's ``time_weight('LOCF', ...)`` shape: each value
    holds from its event time until the key's NEXT event
    (last-observation-carried-forward), the last event carries zero
    weight (its holding interval is unobserved), and the average is
    ``Σ value·Δt / Σ Δt`` in integer microseconds.

    A plain AVG over irregular events over-weights bursty periods —
    at 100 TB of telemetry this is THE aggregation monitoring
    actually wants. Determinism: equal timestamps within a key order
    by ``id_col`` (pass the event id; required for an engine-stable
    LOCF sequence), and the value·Δt products sum as exact
    DECIMAL(38,6) of round-6 values times integer micros — partition
    order cannot move a bit. One window over the key ordering + one
    group-by: two shuffles on the same key, no driver state.

    A key with no observed time (a single event — its holding
    interval is unobserved) produces NO row: there is nothing to
    average. A key whose observed intervals are all zero-width
    (equal timestamps) yields NULL with observed_micros = 0.

    Magnitude bound: values are carried as DECIMAL(14,6), so
    ``|value|`` must be < 1e8 (the product precision 14+16+1 = 31
    stays exact inside DECIMAL(38,6) only at that width). Larger
    values raise under ANSI mode (Spark 4 default) rather than
    silently dropping the term.
    """
    order = [F.col(ts_col)] + ([F.col(id_col)] if id_col else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    dt = (F.lead(F.unix_micros(F.col(ts_col))).over(w)
          - F.unix_micros(F.col(ts_col)))
    # exactness bound: product precision 14+16+1 = 31 ≤ 38, scale 6 —
    # the multiply stays EXACT in both Spark and DuckDB (a (38,6)
    # operand would overflow precision and round engine-specifically)
    weighted = df.select(
        *keys,
        dt.cast("decimal(16,0)").alias("_dt"),
        F.round(F.col(val_col), 6).cast("decimal(14,6)").alias("_v"),
    ).filter(F.col("_dt").isNotNull())
    return (
        weighted.groupBy(*keys)
        .agg(
            F.sum((F.col("_v") * F.col("_dt")).cast("decimal(38,6)"))
            .alias("_num"),
            F.sum(F.col("_dt").cast("long")).alias("_den"),
        )
        .select(
            *keys,
            F.when(F.col("_den") > 0,
                   F.round(F.col("_num").cast("double")
                           / F.col("_den"), 8))
            .alias("twa"),
            F.col("_den").alias("observed_micros"),
        )
    )


def resample_locf(df: DataFrame, keys: list[str],
                  step_seconds: int,
                  ts_col: str = "ts", val_col: str = "value",
                  id_col: str | None = None) -> DataFrame:
    """Gap-filled resampling to a regular grid — TimescaleDB's
    ``time_bucket_gapfill(...) + locf(...)`` / QuestDB ``SAMPLE BY
    FILL(PREV)``: per key, one row per ``step_seconds`` bucket from
    the key's first event bucket through its last, carrying the most
    recent value at-or-before each grid point
    (last-observation-carried-forward). The grid starts at the first
    bucket boundary AT OR AFTER the key's first event (ceil) and
    ends at the last boundary at or before its last event, so every
    grid point has a predecessor and every emitted row has a value
    (TimescaleDB emits the leading partial bucket as NULL instead;
    starting at ceil keeps the no-NULL contract without a lookback
    argument). A key whose events all fall strictly inside one step
    (no boundary in range) emits nothing.

    Composition, not new machinery: the per-key grid is a codegen
    ``explode(sequence(first, last, step))`` over one min/max
    aggregate, and the carry is :func:`asof_join` — union-and-carry,
    one shuffle, no pairwise blow-up. Output:
    ``keys + (bucket_ts, value)``.

    With multiple events in one bucket (or equal timestamps) the
    LAST one at-or-before the grid point wins, ordered by
    ``(ts, id_col)`` — pass the event id for an engine-stable
    result."""
    grid_step = F.lit(step_seconds)
    bounds = df.groupBy(*keys).agg(
        F.ceil(F.min(F.col(ts_col).cast("timestamp").cast("long"))
               / grid_step).alias("_b0"),
        F.floor(F.max(F.col(ts_col).cast("timestamp").cast("long"))
                / grid_step).alias("_b1"),
    )
    # a key whose events all fall strictly inside one step has
    # _b0 = ceil(min) > floor(max) = _b1; sequence(b0, b1) would
    # default to step -1 and emit a DESCENDING grid (a NULL-value
    # leading row plus rows past the last event) — drop those keys
    # here so the docstring contract ("emits nothing") holds
    bounds = bounds.filter(F.col("_b0") <= F.col("_b1"))
    grid = bounds.select(
        *keys,
        F.explode(F.sequence(F.col("_b0"), F.col("_b1")))
        .alias("_bucket"),
    ).select(
        *keys,
        (F.col("_bucket") * grid_step).cast("timestamp")
        .alias("bucket_ts"),
    )
    # LOCF carry: order right-side events by (ts, id) so the latest
    # event at-or-before each grid point wins deterministically
    right = df.select(
        *keys,
        F.col(ts_col).cast("timestamp").alias("bucket_ts"),
        F.col(val_col).alias("_val"),
        *([F.col(id_col).alias("_id")] if id_col else []),
    )
    if id_col:
        # collapse equal (key, ts) pairs to the max-id event first —
        # asof_join's union-and-carry is then unambiguous
        w = Window.partitionBy(*keys, "bucket_ts").orderBy(
            F.col("_id").desc())
        right = (right.withColumn("_rn", F.row_number().over(w))
                 .filter(F.col("_rn") == 1).drop("_rn", "_id"))
    out = asof_join(grid, right, on="bucket_ts", by=keys,
                    value_cols=["_val"])
    return out.select(*keys, "bucket_ts",
                      F.col("_val_r").alias(val_col))


def interval_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    l_start: str = "start", l_end: str = "end",
    r_start: str = "start", r_end: str = "end",
    bucket_seconds: int = 3600,
    suffix: str = "_r",
) -> DataFrame:
    """Interval OVERLAP join (the third temporal-join shape after
    as-of and range): pairs within a ``by`` key whose closed
    intervals intersect — ``l.start <= r.end AND r.start <= l.end``.

    Scale recipe: both sides explode over the ``bucket_seconds``-wide
    time buckets their interval covers, the candidate join is a plain
    equi-join on (key, bucket), and the exact predicate filters the
    candidates; a pair sharing several buckets is deduplicated by
    DISTINCT over the output columns. Candidate count is bounded by
    interval length / bucket width per row — never |L|·|R| — which is
    the same blocking idea range_join uses, generalized to two
    interval relations (DuckDB/Postgres express this as a direct
    inequality join; Spark needs the equi-join key to avoid a
    broadcast nested loop at scale). Pick ``bucket_seconds`` near the
    typical interval length: too small explodes more candidate rows,
    too large widens each bucket's cross product.

    Output: every left column plus the right side's start/end (and
    any extra right columns) suffixed. NULL starts/ends never match
    (SQL comparison semantics)."""
    def _b(col):
        return F.floor(F.col(col).cast("timestamp").cast("long")
                       / F.lit(bucket_seconds))

    l_b = left.withColumn(
        "_bucket", F.explode(F.sequence(_b(l_start), _b(l_end))))
    r_cols = [F.col(c).alias(f"{c}{suffix}")
              for c in right.columns if c != by]
    r_b = right.select(
        F.col(by).alias("_rby"), *r_cols).withColumn(
        "_bucket", F.explode(F.sequence(_b(f"{r_start}{suffix}"),
                                        _b(f"{r_end}{suffix}"))))
    joined = l_b.join(
        r_b, (F.col(by) == F.col("_rby"))
        & (l_b["_bucket"] == r_b["_bucket"]))
    exact = joined.filter(
        (F.col(l_start) <= F.col(f"{r_end}{suffix}"))
        & (F.col(f"{r_start}{suffix}") <= F.col(l_end)))
    out_cols = list(left.columns) + [f"{c}{suffix}" for c in right.columns
                                     if c != by]
    return exact.select(*out_cols).distinct()
