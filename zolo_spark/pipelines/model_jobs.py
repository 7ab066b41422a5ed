"""Forecasting job pipelines (reference entry point B, SURVEY §3.2).

Each job mirrors one reference script (``arima_models.py`` /
``holt_model.py`` / ``simp_avg_model.py``): weekly-demand extract over
the engine's own warehouse → model-input prep → distributed fit →
append to the model-output table → watermark commit. The reference's
driver loop over products is replaced by the grouped-map jobs in
:mod:`zolo_spark.models.grouped`.
"""

from __future__ import annotations

import datetime as dt
import logging

from pyspark.sql import DataFrame, SparkSession

from ..models import grouped
from ..ops import relational
from ..state import WatermarkStore
from ..warehouse import Warehouse

logger = logging.getLogger(__name__)

# per-job watermark keys — the reference's simp_avg writes Holt's key
# by accident (simp_avg_model.py:52); fixed per quirk register §2.10
ARIMA_KEY = "last_arima_model_run"
HOLT_KEY = "last_holt_model_run"
SES_KEY = "last_simp_avg_model_run"


def weekly_demand_from_warehouse(wh: Warehouse, since: str = "2017-10-01") -> DataFrame:
    """The S6 extract: the weekly-demand query over warehouse tables
    (``arima_models.py:63-146``), `since` parameterized."""
    return relational.weekly_demand(
        wh.read("square_trans"), wh.read("square_trans_details"),
        wh.read("shopify_trans"), wh.read("shopify_trans_details"),
        wh.read("qb_trans"), wh.read("qb_trans_details"),
        wh.read("items"), wh.read("coffee_profiles"),
        since=since,
    )


def _forecast_start() -> dt.datetime:
    now = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
    return now


def run_arima(spark: SparkSession, wh: Warehouse, store: WatermarkStore,
              forecast_start: dt.datetime | None = None,
              since: str = "2017-10-01", min_weeks: int = 5) -> None:
    """``arima_models.main`` analog → model_meta. ``min_weeks`` is the
    per-model eligibility parameter (default >5, arima_models.py:162)."""
    fs = forecast_start or _forecast_start()
    weekly = weekly_demand_from_warehouse(wh, since)
    meta = grouped.arima_job(weekly, fs, min_weeks=min_weeks)
    wh.append(meta, "model_meta")  # S7
    logger.info("Loading %d records to model_meta", wh.read("model_meta").count())
    store.commit(ARIMA_KEY, fs.isoformat())  # S10


def run_holt(spark: SparkSession, wh: Warehouse, store: WatermarkStore,
             forecast_start: dt.datetime | None = None,
             since: str = "2017-10-01", min_weeks: int = 10) -> None:
    """``holt_model.main`` analog → model_holt (>10 weeks default,
    holt_model.py:156)."""
    fs = forecast_start or _forecast_start()
    out = grouped.holt_job(weekly_demand_from_warehouse(wh, since), fs,
                           min_weeks=min_weeks)
    wh.append(out, "model_holt")
    logger.info("Loading %d records to model_holt", wh.read("model_holt").count())
    store.commit(HOLT_KEY, fs.isoformat())


def run_simp_avg(spark: SparkSession, wh: Warehouse, store: WatermarkStore,
                 forecast_start: dt.datetime | None = None,
                 since: str = "2017-10-01", min_weeks: int = 8) -> None:
    """``simp_avg_model.main`` analog → model_simp_avg (correct table
    name in the log line — the reference logs 'model_holt' here;
    >8 weeks default, simp_avg_model.py:156)."""
    fs = forecast_start or _forecast_start()
    out = grouped.ses_job(weekly_demand_from_warehouse(wh, since), fs,
                          min_weeks=min_weeks)
    wh.append(out, "model_simp_avg")
    logger.info("Loading %d records to model_simp_avg",
                wh.read("model_simp_avg").count())
    store.commit(SES_KEY, fs.isoformat())
