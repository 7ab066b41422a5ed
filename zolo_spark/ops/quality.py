"""Declarative data-quality expectation audit (the dbt-tests /
Great-Expectations shape): evaluate a suite of checks over a table in
as few passes as the checks allow and emit one row per check —
``(check_name, violations, total, passed)`` — the artifact a
warehouse load job records next to every ingest.

Scale design: all ROW-LEVEL checks (not-null, accepted-values, range,
custom predicates) fold into ONE aggregate over a single scan —
adding a check costs an expression, not a pass.  The uniqueness check
is one count-distinct aggregate; each referential check is one
anti-join (AQE picks broadcast when the dimension fits, which
dimension tables do).  Nothing collects row data — only counts reach
the driver-side plan, and the result is itself a tiny DataFrame.

Extends the reference's warehouse side (DDL + append/overwrite sinks,
SURVEY §2.1): the reference loads blindly; a production load gates on
exactly this audit.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F


def expectation_audit(
    df: DataFrame,
    row_checks: dict[str, Column] | None = None,
    unique_keys: list[str] | None = None,
    fk_checks: list[tuple[str, str, DataFrame, str]] | None = None,
) -> DataFrame:
    """Run an expectation suite and return one row per check.

    ``row_checks``: name → boolean Column that is TRUE for a VIOLATING
    row (NULL counts as non-violating, matching SQL CASE semantics —
    declare an explicit ``isNull`` check for null policy).
    ``unique_keys``: column names that must be unique; violations =
    surplus rows (total − distinct).
    ``fk_checks``: (name, fk_col, dim_df, dim_key) — violations =
    rows whose key has no match in the dimension.
    """
    parts: list[DataFrame] = []
    total = F.count(F.lit(1)).alias("total")
    if row_checks:
        aggs = [total] + [
            F.sum(F.when(cond, 1).otherwise(0)).alias(f"v{i}")
            for i, cond in enumerate(row_checks.values())
        ]
        agg = df.agg(*aggs)
        for i, name in enumerate(row_checks):
            parts.append(agg.select(
                F.lit(name).alias("check_name"),
                F.col(f"v{i}").cast("long").alias("violations"),
                F.col("total").cast("long").alias("total")))
    for key in unique_keys or []:
        parts.append(df.agg(
            (F.count(F.lit(1)) - F.countDistinct(key)).alias("v"),
            total,
        ).select(
            F.lit(f"unique:{key}").alias("check_name"),
            F.col("v").cast("long").alias("violations"),
            F.col("total").cast("long").alias("total")))
    if fk_checks:
        # ONE shared lazy totals frame — no eager df.count() action at
        # construction time (an audit is a builder until its result is
        # consumed), and no extra fact-table scan per referential
        # check: every fk branch crossJoins the same 1-row aggregate,
        # which AQE's exchange reuse evaluates once.
        tot = df.agg(total)
        for name, fk_col, dim, dim_key in fk_checks:
            orphans = (df.select(F.col(fk_col).alias("_k"))
                       .join(dim.select(F.col(dim_key).alias("_k")),
                             "_k", "left_anti")
                       .agg(F.count(F.lit(1)).alias("v")))
            parts.append(orphans.crossJoin(tot).select(
                F.lit(name).alias("check_name"),
                F.col("v").cast("long").alias("violations"),
                F.col("total").cast("long").alias("total")))
    if not parts:
        raise ValueError(
            "expectation_audit called with no checks — pass at least "
            "one of row_checks / unique_keys / fk_checks")
    out = reduce(lambda a, b: a.unionByName(b), parts)
    return out.select(
        "check_name", "violations", "total",
        (F.col("violations") == 0).alias("passed"))


def mad_outlier_stats(df: DataFrame, keys: list[str],
                      val_col: str = "value",
                      k: float = 3.5) -> DataFrame:
    """Robust per-group outlier profile — median/MAD flagging, the
    monitoring aggregation that survives the skew a mean/stddev
    z-score drowns in: a value is an outlier when
    ``|x - median| > k * MAD`` (MAD = median absolute deviation,
    k = 3.5 ≈ the classic Iglewicz-Hoberg cutoff for
    0.6745·|x−med|/MAD > 3.5... here k applies to raw MAD — pick k
    for your data; the shape, not the constant, is the point).
    Returns one row per group:
    ``keys + (med, mad, n_outliers, n_rows)`` with med/mad rounded
    to 6 places.

    Two passes by necessity (MAD is a median OF deviations from the
    median), each a single exact-percentile aggregate per group —
    both shuffles on the group key, results broadcast back. Exact
    interpolated percentile on both engines (Spark ``percentile`` ==
    DuckDB ``quantile_cont``), so the profile is value-oracled, not
    approximate."""
    med = df.groupBy(*keys).agg(
        F.expr(f"percentile({val_col}, 0.5)").alias("_med"))
    dev = df.join(F.broadcast(med), keys).select(
        *keys, F.col(val_col).alias("_v"),
        F.abs(F.col(val_col) - F.col("_med")).alias("_ad"),
        "_med")
    mad = dev.groupBy(*keys).agg(
        F.first("_med").alias("_med"),
        F.expr("percentile(_ad, 0.5)").alias("_mad"))
    flagged = dev.drop("_med").join(F.broadcast(mad), keys)
    return (flagged.groupBy(*keys).agg(
        F.round(F.first("_med"), 6).alias("med"),
        F.round(F.first("_mad"), 6).alias("mad"),
        F.sum(F.when(F.abs(F.col("_v") - F.col("_med"))
                     > F.lit(k) * F.col("_mad"), 1).otherwise(0))
        .cast("bigint").alias("n_outliers"),
        F.count(F.lit(1)).alias("n_rows")))
