"""Walk-forward evaluation + grid search (M1-M4 harness).

Mirrors ``bin/modelling/lib.py``: 75/25 train/test split, refit per
test point with 1-step forecasts, MSE scoring; ARIMA grid search over
(p,d,q) that skips non-converging orders rather than failing
(``lib.py:121-130``).
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np

from . import tsmodels

TRAIN_FRACTION = 0.75  # lib.py:15-16


def walk_forward_mse(y: np.ndarray, forecast_fn: Callable[[np.ndarray], float]) -> float:
    """M1-M3 shape: split 75/25; for each test point, fit on history,
    forecast one step, append the actual (``lib.py:14-34``)."""
    n = len(y)
    split = int(n * TRAIN_FRACTION)
    history = list(y[:split])
    errs = []
    for actual in y[split:]:
        pred = forecast_fn(np.asarray(history, dtype=float))
        errs.append((float(actual) - pred) ** 2)
        history.append(float(actual))
    return tsmodels.seq_mean(errs)


def arima_grid_search(
    y: np.ndarray,
    p_values: range = range(0, 5),
    d_values: range = range(0, 2),
    q_values: range = range(0, 5),
) -> tuple[tuple[int, int, int], float]:
    """M4: best (p,d,q) by walk-forward MSE over the reference's grid
    (``arima_models.py:47-49``); orders that fail to fit are skipped
    exactly like the reference's bare except (``lib.py:121-130``)."""
    from . import tsmodels

    best_cfg, best_mse = None, float("inf")
    for p in p_values:
        for d in d_values:
            for q in q_values:
                try:
                    mse = walk_forward_mse(
                        y, lambda h, o=(p, d, q): tsmodels.arima_forecast(h, o)[0]
                    )
                except Exception:
                    continue
                if mse < best_mse:
                    best_cfg, best_mse = (p, d, q), mse
    if best_cfg is None:
        raise ValueError("no ARIMA order converged")
    return best_cfg, best_mse
