"""Behavioral analytics operators (funnel, cohort retention) — the
product-analytics queries every event warehouse grows (Amplitude/
Mixpanel's core, or Snowplow's SQL recipes), expressed as pure
DataFrame compositions.

* :func:`funnel` — ordered-sequence conversion: for each step k, the
  users whose first step-k event happened strictly AFTER their first
  step-(k-1) event. One shuffle (window over the user partition,
  chained per step — same exchange reused), then a tiny driver-side
  union of per-step counts.
* :func:`cohort_retention` — users bucketed by first-activity period
  (the cohort) × activity-period offset. Two pre-aggregations shrink
  the event table to (user, period) pairs BEFORE the join, so the
  join and final group-by run on |users|·|periods| rows, never on raw
  events.

Neither operator needs state or UDFs; both are exact and
engine-portable (DuckDB oracles in the gate registry restate them
with joins/CTEs).
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, Window, functions as F


def funnel(events: DataFrame, steps: list[str],
           user_col: str = "user_id", ts_col: str = "ts",
           type_col: str = "event_type") -> DataFrame:
    """Strict-order funnel: a user converts to step k when their
    EARLIEST step-k event is strictly later than their (recursively
    defined) step-(k-1) conversion time; step 1 is the user's first
    step-1 event. Returns one row per step:
    ``(step, step_name, users, conversion)`` where ``conversion`` is
    users / step-1 users rounded to 6 places (NULL when step 1 is
    empty).

    Plan shape: the chained ``min(when(...)) OVER (PARTITION BY
    user)`` columns all share ONE window exchange (Catalyst collapses
    same-spec windows), so the whole funnel costs one shuffle of the
    filtered events plus a |steps|-row aggregate."""
    w = Window.partitionBy(user_col)
    df = events.select(user_col, ts_col, type_col) \
        .filter(F.col(type_col).isin(steps))
    prev = None
    for k, name in enumerate(steps, start=1):
        hit = F.col(type_col) == name
        if prev is not None:
            hit = hit & (F.col(ts_col) > F.col(prev))
        df = df.withColumn(f"_t{k}",
                           F.min(F.when(hit, F.col(ts_col))).over(w))
        prev = f"_t{k}"
    per_user = df.groupBy(user_col).agg(
        *[F.first(f"_t{k}").alias(f"_t{k}")
          for k in range(1, len(steps) + 1)])
    counts = per_user.agg(*[
        F.count(F.col(f"_t{k}")).alias(f"_c{k}")
        for k in range(1, len(steps) + 1)])
    # unpivot the 1-row count frame lazily (stack generator) — no
    # driver collect; the funnel stays one composable DataFrame.
    # Step names go through F.lit, never a formatted SQL string: a
    # name containing a quote ("add to cart's") is data, not syntax
    # (r12 ADVICE item 3).
    stack_args: list = []
    for k, name in enumerate(steps, start=1):
        stack_args += [F.lit(k), F.lit(name), F.col(f"_c{k}")]
    return counts.select(
        F.stack(F.lit(len(steps)), *stack_args)
        .alias("step", "step_name", "users"),
        F.col("_c1"),
    ).select(
        "step", "step_name", F.col("users").cast("bigint").alias("users"),
        F.when(F.col("_c1") > 0,
               F.round(F.col("users") / F.col("_c1"), 6))
        .alias("conversion"))


def cohort_retention(events: DataFrame, user_col: str = "user_id",
                     ts_col: str = "ts") -> DataFrame:
    """Weekly cohort retention: users grouped by the Monday-truncated
    week of their FIRST event (the cohort), counted as active in each
    later week they appear, keyed by whole-week offset. Returns
    ``(cohort_week timestamp, week_offset int, active_users bigint,
    cohort_size bigint, retention double)`` — ``retention`` =
    active / cohort size rounded to 6 places; offset 0 is 1.0 by
    construction. ``cohort_week`` stays a Monday-midnight timestamp
    (the engine-portable week key the p12 gate pins)."""
    week = F.date_trunc("week", F.col(ts_col))
    # the ONLY event-scale shuffle: distinct (user, week). Everything
    # downstream runs at users×weeks cardinality — the cohort is a
    # window min (no self-join), and cohort_size falls out of the
    # aggregated frame itself: every user is active in their own
    # first week, so size(cohort) == active_users at offset 0.
    activity = (events.select(F.col(user_col).alias("_u"),
                              week.alias("_w")).distinct())
    cohort = F.min("_w").over(Window.partitionBy("_u"))
    tagged = activity.select(
        cohort.alias("_cohort"),
        (F.datediff(F.col("_w"), cohort) / 7)
        .cast("int").alias("week_offset"),
    )
    out = tagged.groupBy("_cohort", "week_offset").agg(
        F.count(F.lit(1)).alias("active_users"))
    size = F.max(F.when(F.col("week_offset") == 0,
                        F.col("active_users"))) \
        .over(Window.partitionBy("_cohort"))
    return out.select(
        F.col("_cohort").alias("cohort_week"),
        "week_offset", "active_users", size.alias("cohort_size"),
        F.round(F.col("active_users") / size, 6).alias("retention"))
