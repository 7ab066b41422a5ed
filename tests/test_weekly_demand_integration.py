"""Integration: fixture ETLs + ref tables → weekly-demand query.

Exercises the warehouse variant of the centerpiece query
(``arima_models.py:75-141``) over tables produced by the engine's own
pipelines, including the external-id text casts (P11) and the
``active = 1`` filtering join (J3).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from zolo_spark.ops.relational import weekly_demand
from zolo_spark.pipelines import quickbooks_etl, ref_tables, shopify_etl, square_etl
from zolo_spark.state import WatermarkStore
from zolo_spark.warehouse import Warehouse

from . import fixtures

ITEMS_CSV = """product_name,variant_name,zolo_id,square_id,quickbooks_id,shopify_id,category_name,form,weight,profile_id
Guat,12oz,1,sq_1,1,101,coffee,whole,0.75,1
Guat,12oz,1,sq_2,2,102,coffee,ground,0.75,1
Eth,12oz,2,sq_3,3,103,coffee,whole,0.75,2
Eth,5lb,3,sq_4,4,104,coffee,whole,5.0,2
Blend,12oz,4,sq_5,5,105,coffee,whole,0.75,3
Inactive,12oz,5,sq_6,6,106,coffee,whole,0.75,4
NoProfile,12oz,6,sq_7,7,107,merch,unit,0.0,
"""

PROFILES_CSV = """profile_id,profile_name,roast_level,active,single_origin,c1_origin,c1_process,c1_percent,c2_origin,c2_process,c2_percent,c3_procss,c3_origin,c3_percent
1,Guatemala Antigua,medium,1,1,Guatemala,washed,1.0,,,,,,
2,Ethiopia Sidama,light,1,1,Ethiopia,natural,1.0,,,,,,
3,House Blend,dark,1,0,Brazil,natural,0.6,Colombia,washed,0.4,,,
4,Retired Roast,dark,0,1,Kenya,washed,1.0,,,,,,
"""


@pytest.fixture()
def loaded_wh(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.init()
    store = WatermarkStore(str(tmp_path / "config.yml"))

    items_p = tmp_path / "items.csv"
    items_p.write_text(ITEMS_CSV)
    profiles_p = tmp_path / "profiles.csv"
    profiles_p.write_text(PROFILES_CSV)
    ref_tables.load_ref_tables(spark, wh, str(items_p), str(profiles_p))

    square_etl.run(spark, wh, store,
                   lambda s, e: fixtures.square_fetcher(fixtures.square_payments()))
    shopify_etl.run(
        spark, wh, store,
        lambda s, e: fixtures.count_page_fetchers(
            fixtures.shopify_orders(), shopify_etl.PAGE_SIZE),
    )
    quickbooks_etl.run(
        spark, wh, store,
        lambda s, e: fixtures.start_position_fetchers(
            fixtures.qb_invoices(), quickbooks_etl.PAGE_SIZE),
    )
    return wh


def test_weekly_demand_over_warehouse(spark, loaded_wh):
    wh = loaded_wh
    out = weekly_demand(
        wh.read("square_trans"), wh.read("square_trans_details"),
        wh.read("shopify_trans"), wh.read("shopify_trans_details"),
        wh.read("qb_trans"), wh.read("qb_trans_details"),
        wh.read("items"), wh.read("coffee_profiles"),
        since="2017-10-01",
    )
    rows = out.collect()
    assert len(rows) > 0
    names = {r["profile_name"] for r in rows}
    # inactive profile excluded by the filtering inner join (J3+P4)
    assert "Retired Roast" not in names
    assert names <= {"Guatemala Antigua", "Ethiopia Sidama", "House Blend"}
    # weights are Σ item_weight × quantity > 0, weeks are Mondays
    assert all(r["weight"] > 0 for r in rows)
    assert all(r["week_date"].weekday() == 0 for r in rows)


def test_weekly_demand_since_filters(spark, loaded_wh):
    wh = loaded_wh
    args = [
        wh.read("square_trans"), wh.read("square_trans_details"),
        wh.read("shopify_trans"), wh.read("shopify_trans_details"),
        wh.read("qb_trans"), wh.read("qb_trans_details"),
        wh.read("items"), wh.read("coffee_profiles"),
    ]
    all_rows = weekly_demand(*args, since="2017-10-01").count()
    none_rows = weekly_demand(*args, since="2099-01-01").count()
    assert all_rows > 0 and none_rows == 0


def test_model_jobs_end_to_end(spark, loaded_wh, tmp_path):
    import datetime as dt

    from zolo_spark.pipelines import model_jobs
    from zolo_spark.state import WatermarkStore

    store = WatermarkStore(str(tmp_path / "model_config.yml"))
    fs = dt.datetime(2024, 2, 5)
    # default thresholds (>5/>8/>10 weeks) would exclude the 4-5-week
    # fixture corpus entirely — faithful to the reference, but here
    # min_weeks is lowered so the jobs demonstrably produce forecasts
    model_jobs.run_holt(spark, loaded_wh, store, forecast_start=fs, min_weeks=2)
    model_jobs.run_simp_avg(spark, loaded_wh, store, forecast_start=fs, min_weeks=2)
    model_jobs.run_arima(spark, loaded_wh, store, forecast_start=fs, min_weeks=2)

    holt = loaded_wh.read("model_holt").collect()
    ses = loaded_wh.read("model_simp_avg").collect()
    meta = loaded_wh.read("model_meta").collect()

    for rows in (holt, ses, meta):
        assert len(rows) > 0
        for r in rows:
            assert r["forecast_start"] == fs
            assert r["mse"] is None or r["mse"] >= 0
    for r in meta:
        assert r["lower_bound"] <= r["prediction"] <= r["upper_bound"]

    # default thresholds on the short corpus -> no eligible profiles
    # (reference behavior): re-run with defaults appends nothing
    n = len(holt)
    model_jobs.run_holt(spark, loaded_wh, store, forecast_start=fs)
    assert len(loaded_wh.read("model_holt").collect()) == n
    # separate per-job watermark keys all committed
    assert store.get(model_jobs.ARIMA_KEY) == fs.isoformat()
    assert store.get(model_jobs.HOLT_KEY) == fs.isoformat()
    assert store.get(model_jobs.SES_KEY) == fs.isoformat()
