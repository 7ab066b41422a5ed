"""Relational centerpiece: the weekly-demand query (SURVEY §2.4-2.7).

The reference's heaviest query (``bin/modelling/arima_models.py:75-141``,
cloned in ``holt_model.py``/``simp_avg_model.py``) is three per-source
CTEs — header ⟕ details (J1) ⟕ items dim (J2) ⟕ filtered profile dim
(J3, inner + ``active=1``) with ``date_trunc('week')`` (P12) and a
conjunctive predicate (P4) — UNION ALL'd (U1) and re-aggregated to
(profile, week) totals (A4, U4).

Two implementations live here:

* :func:`weekly_demand` — over the engine's own warehouse tables
  (square/shopify/qb facts + items + coffee_profiles), used by the ETL
  + model pipelines.
* :func:`weekly_demand_testdata` — the structural twin over the
  driver's TPC-H-ish tables (FIXTURES.md §3): orders ⟕ lineitem,
  ⟕ part dim, filtering inner join through supplier→nation→region
  (the ``active=1`` analog), weekly buckets, union of order-status
  slices, group-sum. This is the flagship for ``entry()``.

Scale notes: the dim joins are explicit ``F.broadcast`` (items /
coffee_profiles / part / supplier / nation / region are all small
relative to facts at any scale we target); the single shuffle is the
final (key, week) hash aggregate, which Spark executes with map-side
partial aggregation. No global sort — ordering is applied only by
consumers that need it (the model stage sorts within groups).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def source_weekly(
    header: DataFrame,
    details: DataFrame,
    items: DataFrame,
    profiles: DataFrame,
    *,
    join_key: str,
    item_key: str,
    cast_item_key: bool = False,
    since: str,
) -> DataFrame:
    """One CTE of the weekly-demand query (``arima_models.py:77-91``):
    header ⟕ details on the transaction key (J1), ⟕ items on the
    external product id ``item_key`` (J2; ``cast_item_key`` applies the
    reference's text cast P11 to the items-side id), inner-join to
    active profiles (J3), weekly bucket + weight derive.
    """
    active = profiles.filter(F.col("active") == 1).alias("prof")  # P4
    det = details.alias("det")
    it = items.alias("it")
    items_key = F.col(f"it.{item_key}")
    if cast_item_key:
        items_key = items_key.cast("string")  # P11
    return (
        header.alias("hdr")
        .filter(F.col("created_at") > F.lit(since))  # P4 pushdown
        .join(det, join_key, "left")  # J1
        .join(F.broadcast(it), F.col(f"det.{item_key}") == items_key, "left")  # J2
        .join(F.broadcast(active), F.col("it.profile_id") == F.col("prof.profile_id"),
              "inner")  # J3
        .select(
            F.col("prof.profile_name").alias("profile_name"),
            F.date_trunc("week", F.col("hdr.created_at")).alias("week_date"),  # P12
            (F.col("it.weight") * F.col("det.quantity")).alias("total_weight"),  # P10
        )
    )


def weekly_demand(
    square_trans: DataFrame,
    square_trans_details: DataFrame,
    shopify_trans: DataFrame,
    shopify_trans_details: DataFrame,
    qb_trans: DataFrame,
    qb_trans_details: DataFrame,
    items: DataFrame,
    coffee_profiles: DataFrame,
    since: str = "2017-10-01",
) -> DataFrame:
    """The full weekly-demand query over warehouse tables
    (``arima_models.py:75-141``; ``since`` parameterizes the
    hard-coded ``'2017-10-1'`` — quirk register §2.10)."""
    sq = source_weekly(
        square_trans, square_trans_details, items, coffee_profiles,
        join_key="payment_id", item_key="square_id", since=since,
    )
    sh = source_weekly(
        shopify_trans, shopify_trans_details, items, coffee_profiles,
        join_key="order_id", item_key="shopify_id", cast_item_key=True,  # P11
        since=since,
    )
    qb = source_weekly(
        qb_trans, qb_trans_details, items, coffee_profiles,
        join_key="payment_id", item_key="quickbooks_id", cast_item_key=True,  # P11
        since=since,
    )
    return (
        sq.unionByName(sh).unionByName(qb)  # U1
        .groupBy("profile_name", "week_date")  # A4
        .agg(F.sum("total_weight").alias("weight"))
    )


def weekly_demand_testdata(tables: dict[str, DataFrame], since: str = "1996-01-01") -> DataFrame:
    """Flagship: structural twin of :func:`weekly_demand` on the driver
    testdata (FIXTURES.md §3).

    orders plays the fact header, lineitem the details, part the items
    dim, and supplier→nation→region(r_name='ASIA') the filtering
    inner-join (``active = 1`` analog). Three order-status slices play
    the three sources; weekly buckets on ``o_orderdate``; weight =
    ``l_quantity * p_retailprice``.

    Spark-first note: the reference expresses the three sources as
    three CTEs UNION ALL'd, which over a single physical table would
    scan the facts three times. The slices are disjoint, so this plan
    does ONE fact scan with ``o_orderstatus IN (...)`` — same result,
    one fact join + one agg shuffle instead of three of each. The
    genuine multi-table union lives in :func:`weekly_demand`.
    """
    orders, lineitem = tables["orders"], tables["lineitem"]
    part, supplier = tables["part"], tables["supplier"]
    nation, region = tables["nation"], tables["region"]

    asia_suppliers = (
        supplier
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region.filter(F.col("r_name") == "ASIA")),
              nation.n_regionkey == region.r_regionkey)  # J3 analog
        .select("s_suppkey")
    )

    return (
        orders
        .filter(F.col("o_orderstatus").isin("O", "F", "P")
                & (F.col("o_orderdate") >= F.lit(since)))  # P4 (U1 collapsed)
        .join(lineitem, orders.o_orderkey == lineitem.l_orderkey, "left")  # J1
        .join(F.broadcast(part), lineitem.l_partkey == part.p_partkey, "left")  # J2
        .join(F.broadcast(asia_suppliers),
              lineitem.l_suppkey == asia_suppliers.s_suppkey, "inner")  # J3 analog
        .groupBy(
            F.col("p_name").alias("profile_name"),
            F.date_trunc("week", F.col("o_orderdate")).alias("week_date"),  # P12
        )  # A4
        .agg(F.round(F.sum(F.col("l_quantity") * F.col("p_retailprice")), 2)
             .alias("weight"))  # P10
    )


WEEKLY_DEMAND_TESTDATA_ORACLE = """
WITH asia_suppliers AS (
    SELECT s_suppkey
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
), sliced AS (
    SELECT p_name AS profile_name,
           date_trunc('week', o_orderdate) AS week_date,
           l_quantity * p_retailprice AS total_weight
    FROM orders
    LEFT JOIN lineitem ON o_orderkey = l_orderkey
    LEFT JOIN part ON l_partkey = p_partkey
    JOIN asia_suppliers ON l_suppkey = s_suppkey
    WHERE o_orderstatus IN ('O', 'F', 'P') AND o_orderdate >= DATE '1996-01-01'
)
SELECT profile_name, week_date, ROUND(SUM(total_weight), 2) AS weight
FROM sliced
GROUP BY profile_name, week_date
"""
