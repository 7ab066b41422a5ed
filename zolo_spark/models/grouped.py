"""Distributed per-key model fitting (M5-M6) via ``applyInPandas``.

The reference loops over sorted distinct profiles on the driver
(``arima_models.py:183-213``); here each product's series is fitted
inside an Arrow grouped-map UDF so N products fit on N cores/executors.
Output schemas match the model-output DDLs
(``create_model_meta_table.py:19-29``, ``create_model_holt_table.py:19-25``).

Pipeline shape per job (``arima_models.py:149-169``): filter the
current partial week (P2) → eligibility threshold on history length
(W2+P3; >5 ARIMA / >8 SES / >10 Holt weeks) → re-aggregate (A5) →
groupBy(key).applyInPandas(fit).
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..ops import windows
from . import tsmodels

META_SCHEMA = (
    "profile_name string, best_config string, mse double, "
    "prediction double, std_error double"
)
HOLT_SCHEMA = "profile_name string, mse double, prediction double"


def prepare_model_input(
    weekly: DataFrame,
    forecast_start: dt.datetime | str,
    min_weeks: int,
    key: str = "profile_name",
) -> DataFrame:
    """P2 + W2 + P3 + A5 (``arima_models.py:149-169``)."""
    filtered = weekly.filter(F.col("week_date") < F.lit(forecast_start))  # P2
    counted = filtered.withColumn(
        "week_count", windows.group_count([key])  # W2
    ).filter(F.col("week_count") > min_weeks)  # P3
    return counted.groupBy(key, "week_date").agg(
        F.sum("weight").alias("weight")  # A5 (helper col dropped — §2.10)
    )


def _series(pdf: pd.DataFrame) -> np.ndarray:
    # U4 note: sort within the group, never globally
    return pdf.sort_values("week_date")["weight"].to_numpy(dtype=float)


def arima_job(
    weekly: DataFrame,
    forecast_start: dt.datetime | str,
    min_weeks: int = 5,  # arima_models.py:162
    p_values: range = range(0, 5),
    d_values: range = range(0, 2),
    q_values: range = range(0, 5),
    key: str = "profile_name",
    orders: list[tuple[int, int, int]] | None = None,
    walk_forward_fn=None,
) -> DataFrame:
    """M4+M5+M6 → model_meta rows (``arima_models.py:172-220``).

    One group per key; the (p,d,q) grid runs inside the UDF with the
    batched prefix-OLS walk-forward (``tsmodels.arima_walk_forward``),
    keeping the reference's strictly-better update order — first order
    in grid sequence wins MSE ties (``lib.py:121-128``). With the
    batched solver a key's whole 50-order grid costs ~0.3 s of numpy,
    so key-level granularity beats fanning the grid out as extra group
    keys: 50x less shuffled input and no per-cell Arrow overhead,
    while a wide cluster still parallelizes across keys. (For very few
    keys on a very wide cluster, re-adding grid keys is a one-line
    change — the per-order fits are independent.)

    ``orders`` overrides the p/d/q ranges with an explicit grid list
    (grid-sequence position is the MSE tie-break either way);
    ``walk_forward_fn(y, order) -> (mse, pred, stderr)`` swaps the
    fitting kernel — the oracle gate passes the sequential-fold twin
    ``tsmodels.arima_fold_walk_forward`` so the SAME grid-loop /
    tie-break / skip machinery runs under a DuckDB value oracle."""
    model_input = prepare_model_input(weekly, forecast_start, min_weeks, key)
    if orders is None:
        orders = [(p, d, q) for p in p_values for d in d_values for q in q_values]
    wf = walk_forward_fn if walk_forward_fn is not None else tsmodels.arima_walk_forward

    def fit_key(pdf: pd.DataFrame) -> pd.DataFrame:
        y = _series(pdf)
        best = None  # (mse, order, pred, stderr)
        for order in orders:
            try:
                mse, pred, stderr = wf(y, order)
            except Exception:
                continue  # non-converging order: skipped, lib.py:129-130
            if not np.isfinite(mse):
                # NaN/inf fold MSE is a non-convergence in disguise:
                # keeping a leading NaN would freeze the argmin (every
                # later `mse < NaN` is False) while SQL oracles sort
                # NaN last — skip it like the exception path so both
                # engines agree on pathological series.
                continue
            if best is None or mse < best[0]:
                best = (mse, order, pred, stderr)
        if best is None:
            return pd.DataFrame(columns=[
                "profile_name", "best_config", "mse", "prediction", "std_error",
            ])
        mse, order, pred, stderr = best
        return pd.DataFrame([{
            "profile_name": pdf[key].iloc[0],
            "best_config": str(order),
            "mse": mse,
            "prediction": pred,
            "std_error": stderr,
        }])

    meta = model_input.groupBy(key).applyInPandas(fit_key, schema=META_SCHEMA)
    # M6: CI bounds (arima_models.py:216-217) + P13 literal
    return meta.select(
        "profile_name", "best_config", "mse", "prediction", "std_error",
        (F.col("prediction") - 1.96 * F.col("std_error")).alias("lower_bound"),
        (F.col("prediction") + 1.96 * F.col("std_error")).alias("upper_bound"),
        F.lit(forecast_start).cast("timestamp").alias("forecast_start"),
    )


def _simple_job(
    weekly: DataFrame,
    forecast_start,
    min_weeks: int,
    walk_forward_fn,
    key: str,
) -> DataFrame:
    """``walk_forward_fn(y) -> (mse, prediction)`` — the batched
    one-pass walk-forward (tested equal to the refit-per-step loop)."""
    model_input = prepare_model_input(weekly, forecast_start, min_weeks, key)

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        mse, pred = walk_forward_fn(_series(pdf))
        return pd.DataFrame([{
            "profile_name": pdf[key].iloc[0],
            "mse": mse,
            "prediction": pred,
        }])

    out = model_input.groupBy(key).applyInPandas(fit, schema=HOLT_SCHEMA)
    return out.select(
        "profile_name", "mse", "prediction",
        F.lit(forecast_start).cast("timestamp").alias("forecast_start"),  # P13
    )


def holt_job(weekly: DataFrame, forecast_start,
             min_weeks: int = 10, key: str = "profile_name") -> DataFrame:
    """M2+M5 → model_holt rows (``holt_model.py:176-199``; >10 weeks)."""
    return _simple_job(weekly, forecast_start, min_weeks,
                       tsmodels.holt_walk_forward, key)


def ses_job(weekly: DataFrame, forecast_start,
            min_weeks: int = 8, key: str = "profile_name") -> DataFrame:
    """M3+M5 → model_simp_avg rows (``simp_avg_model.py:175-198``;
    >8 weeks; fixed alpha=0.6 per ``lib.py:84``)."""
    return _simple_job(weekly, forecast_start, min_weeks,
                       lambda y: tsmodels.ses_walk_forward(y, 0.6), key)
