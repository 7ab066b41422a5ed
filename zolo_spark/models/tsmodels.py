"""Pure-numpy time-series models (M1-M4 model bodies).

Deterministic replacements for the reference's statsmodels calls
(``bin/modelling/lib.py:1-95``): no statsmodels/scipy exists in this
environment, and determinism is a feature for the oracle gate.

* SES: classic recursion with fixed alpha (the reference pins
  ``smoothing_level=0.6, optimized=False`` — ``lib.py:84``) and
  ``l0 = y[0]``.
* Holt: linear-trend recursions; the reference lets statsmodels
  optimize (alpha, beta) by MLE (``lib.py:55``); here a deterministic
  coarse grid minimizes in-sample SSE — same role, reproducible.
* ARIMA(p,d,q): Hannan–Rissanen two-stage least squares (long-AR
  residuals as MA regressors), the standard closed-form estimation
  route when no nonlinear optimizer is available.
"""

from __future__ import annotations

import numpy as np


def ses_forecast(y: np.ndarray, alpha: float = 0.6) -> float:
    """M3: SES one-step forecast. ``l_t = a*y_t + (1-a)*l_{t-1}``,
    ``l0 = y[0]``; forecast = final level (``lib.py:84-88``)."""
    level = float(y[0])
    for v in y[1:]:
        level = alpha * float(v) + (1 - alpha) * level
    return level


def holt_forecast(
    y: np.ndarray, alpha: float | None = None, beta: float | None = None,
) -> float:
    """M2: Holt linear-trend one-step forecast (``lib.py:55-58``).

    With ``alpha``/``beta`` unset, a deterministic grid over
    {0.1..0.9}² picks the pair minimizing one-step-ahead SSE —
    the reproducible stand-in for statsmodels' MLE fit.
    """
    if len(y) < 2:
        return float(y[-1])
    if alpha is not None and beta is not None:
        return _holt_run(y, alpha, beta)[0]
    # vectorized grid: run all (alpha, beta) pairs simultaneously —
    # one pass over the series with (81,)-shaped level/trend state
    g = np.array([i / 10 for i in range(1, 10)])
    a = np.repeat(g, len(g))
    b = np.tile(g, len(g))
    y = np.asarray(y, dtype=float)
    level = np.full_like(a, y[0])
    trend = np.full_like(a, y[1] - y[0])
    sse = np.zeros_like(a)
    for v in y[1:]:
        pred = level + trend
        sse += (v - pred) ** 2
        new_level = a * v + (1 - a) * pred
        trend = b * (new_level - level) + (1 - b) * trend
        level = new_level
    best = int(np.argmin(sse))
    return float(level[best] + trend[best])


def _holt_run(y: np.ndarray, alpha: float, beta: float) -> tuple[float, float]:
    level, trend = float(y[0]), float(y[1]) - float(y[0])
    sse = 0.0
    for v in y[1:]:
        pred = level + trend
        sse += (float(v) - pred) ** 2
        new_level = alpha * float(v) + (1 - alpha) * (level + trend)
        trend = beta * (new_level - level) + (1 - beta) * trend
        level = new_level
    return level + trend, sse


def arima_forecast(
    y: np.ndarray, order: tuple[int, int, int]
) -> tuple[float, float]:
    """M1/M4 body: ARIMA(p,d,q) one-step forecast + residual std error
    via Hannan–Rissanen.

    Returns ``(prediction, std_error)`` mirroring the reference's use
    of statsmodels ``ARIMA.forecast()`` → (forecast, stderr)
    (``arima_models.py:203-209``). Raises on series too short for the
    order — callers skip, as the reference's bare except does
    (``lib.py:129-130``).
    """
    p, d, q = order
    z = np.asarray(y, dtype=float)
    for _ in range(d):
        z = np.diff(z)
    n = len(z)
    if n < max(p, q) + max(p + q, 1) + 2:
        raise ValueError(f"series too short for order {order}")

    mean = z.mean()
    zc = z - mean

    if q > 0:
        # stage 1: long AR to estimate innovations
        m = min(max(p + q + 2, int(np.ceil(np.log(n) * 2))), n - 1)
        resid = _ar_residuals(zc, m)
    else:
        resid = None

    # stage 2: regress z_t on p lags of z and q lags of residuals
    start = max(p, q)
    rows = n - start
    cols = p + q
    if cols == 0:
        pred_c = 0.0  # ARIMA(0,d,0): forecast the mean
        resid_fit = zc
    else:
        X = np.empty((rows, cols))
        for i in range(p):
            X[:, i] = zc[start - 1 - i: n - 1 - i]
        if q > 0:
            r = resid
            for j in range(q):
                X[:, p + j] = r[start - 1 - j: n - 1 - j]
        target = zc[start:]
        coef, *_ = np.linalg.lstsq(X, target, rcond=None)
        resid_fit = target - X @ coef
        # one-step-ahead from the end of the series
        x_next = np.empty(cols)
        for i in range(p):
            x_next[i] = zc[n - 1 - i]
        if q > 0:
            full_resid = np.zeros(n)
            full_resid[start:] = resid_fit
            for j in range(q):
                x_next[p + j] = full_resid[n - 1 - j]
        pred_c = float(x_next @ coef)

    sigma = float(np.sqrt(np.mean(resid_fit**2))) if len(resid_fit) else 0.0
    pred_z = pred_c + mean

    # undo differencing: forecast in levels
    pred = pred_z
    tail = np.asarray(y, dtype=float)
    for k in range(d, 0, -1):
        zk = tail
        for _ in range(k - 1):
            zk = np.diff(zk)
        pred = pred + zk[-1]
    return float(pred), sigma


def _ar_residuals(zc: np.ndarray, m: int) -> np.ndarray:
    """Residuals of an AR(m) OLS fit, zero-padded to len(zc)."""
    n = len(zc)
    X = np.empty((n - m, m))
    for i in range(m):
        X[:, i] = zc[m - 1 - i: n - 1 - i]
    coef, *_ = np.linalg.lstsq(X, zc[m:], rcond=None)
    resid = np.zeros(n)
    resid[m:] = zc[m:] - X @ coef
    return resid
