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


def seq_mean(x) -> float:
    """Strictly sequential left-fold mean.

    ``np.mean`` switches to pairwise summation above 8 elements, which
    no SQL engine reproduces; a left fold adds the same doubles in the
    same order as DuckDB's ``list_reduce(..., (p, q) -> p + q)``, so
    walk-forward MSEs stay bit-equal cross-engine at ANY test-split
    length — this is what lets the FULL-window SES/Holt jobs carry
    value oracles, not just bounded-window twins. (For <=8 elements it
    equals np.mean exactly, so previously-green bounded gates keep
    their hashes.)"""
    s = 0.0
    n = 0
    for v in x:
        s += float(v)
        n += 1
    return s / n if n else float("inf")


def _lag_matrix(v: np.ndarray, lags: int, start: int, stop: int) -> np.ndarray:
    """Columns ``j`` = ``v[t-1-j]`` for ``t`` in ``[start, stop)`` —
    the strided view equivalent of the per-column copy loop."""
    w = np.lib.stride_tricks.sliding_window_view(v, lags)[:, ::-1]
    return w[start - lags: stop - lags]


def _ols(X: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Least-squares via normal equations: ``lstsq`` on the tiny
    (cols x cols) Gram system instead of an SVD of the tall-skinny
    design matrix — identical min-norm solution (``(XᵀX)⁺Xᵀ = X⁺``),
    ~10x faster at the walk-forward refit sizes (n≈350, cols≤12).
    ``pinv`` (not ``lstsq``) so the rank-deficient cutoff is the same
    one the batched walk-forward applies — identical garbage on
    identical degenerate systems."""
    G = X.T @ X
    c = X.T @ y
    return np.linalg.pinv(G) @ c


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


def ses_walk_forward(
    y: np.ndarray, alpha: float = 0.6, train_fraction: float = 0.75,
) -> tuple[float, float]:
    """Batched SES walk-forward: ``(mse, prediction)`` ==
    ``walk_forward_mse(y, ses_forecast)`` + final ``ses_forecast(y)``.

    The SES level recursion at step t does not depend on the prefix
    length, so one pass over the full series yields every history
    prefix's forecast: forecast(y[:h]) = level[h-1]."""
    y = np.asarray(y, dtype=float)
    n = len(y)
    level = np.empty(n)
    level[0] = y[0]
    for t in range(1, n):
        level[t] = alpha * y[t] + (1 - alpha) * level[t - 1]
    split = int(n * train_fraction)
    if split < n:
        errs = (y[split:] - level[split - 1: n - 1]) ** 2
        mse = seq_mean(errs)
    else:
        mse = float("inf")
    return mse, float(level[-1])


def holt_walk_forward(
    y: np.ndarray, train_fraction: float = 0.75,
) -> tuple[float, float]:
    """Batched Holt walk-forward: ``(mse, prediction)`` ==
    ``walk_forward_mse(y, holt_forecast)`` + final ``holt_forecast(y)``.

    Holt's (level, trend) state at t is prefix-independent (init is
    always ``(y[0], y[1]-y[0])``), and the deterministic grid's SSE
    objective over a prefix is a cumulative sum — so one pass records,
    for every prefix h, each grid pair's forecast and SSE, and the
    per-prefix argmin reproduces ``holt_forecast(y[:h])`` exactly."""
    y = np.asarray(y, dtype=float)
    n = len(y)
    split = int(n * train_fraction)
    if n < 2 or split < 2:
        # degenerate: fall back to the sequential definition
        mse = None
        try:
            from . import harness
            mse = harness.walk_forward_mse(y, holt_forecast)
        except Exception:
            mse = float("inf")
        return mse, holt_forecast(y)

    g = np.array([i / 10 for i in range(1, 10)])
    a = np.repeat(g, len(g))
    b = np.tile(g, len(g))
    level = np.full_like(a, y[0])
    trend = np.full_like(a, y[1] - y[0])
    # state AFTER consuming y[:t+1]; forecasts[t] = forecast of y[t+1]
    fc = np.empty((n, len(a)))  # fc[t] = level+trend after t+1 obs
    sse = np.zeros((n, len(a)))  # sse[t] = cumulative through y[t]
    fc[0] = level + trend
    sse[0] = 0.0
    run = np.zeros_like(a)
    for t in range(1, n):
        pred = level + trend
        run = run + (y[t] - pred) ** 2
        new_level = a * y[t] + (1 - a) * pred
        trend = b * (new_level - level) + (1 - b) * trend
        level = new_level
        fc[t] = level + trend
        sse[t] = run
    # prefix y[:h]: grid pair = argmin sse[h-1], forecast = fc[h-1]
    best = np.argmin(sse, axis=1)
    rows = np.arange(n)
    best_fc = fc[rows, best]
    errs = (y[split:] - best_fc[split - 1: n - 1]) ** 2
    mse = seq_mean(errs)
    return mse, float(best_fc[-1])


def ar1_hr_forecast(y: np.ndarray) -> float:
    """Sequential-fold twin of ``arima_forecast(y, (1, 0, 0))``.

    Same Hannan–Rissanen estimate — center by the mean, regress z_t on
    z_{t-1}, forecast ``mu + coef * (z_n - mu)`` — but every sum is an
    explicit left fold over Python floats, so a SQL engine folding the
    same series in the same order produces bit-identical doubles
    (numpy's BLAS dot / pairwise mean use different summation trees).
    Used by the oracle-gated fixed-order fold query; pytest pins it to
    ``arima_forecast`` within float tolerance, which transitively
    value-gates the batched solver's AR path.
    """
    n = len(y)
    if n < 4:  # same eligibility bound as arima_forecast for (1,0,0)
        raise ValueError("series too short for order (1, 0, 0)")
    s = 0.0
    for v in y:
        s += float(v)
    mu = s / n
    sxy = 0.0
    sxx = 0.0
    for t in range(1, n):
        zl = float(y[t - 1]) - mu
        sxy += zl * (float(y[t]) - mu)
        sxx += zl * zl
    coef = sxy / sxx if sxx != 0.0 else 0.0
    return mu + coef * (float(y[n - 1]) - mu)


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
        if p > 0:
            X[:, :p] = _lag_matrix(zc, p, start, n)
        if q > 0:
            X[:, p:] = _lag_matrix(resid, q, start, n)
        target = zc[start:]
        coef = _ols(X, target)
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


def arima_walk_forward(
    y: np.ndarray, order: tuple[int, int, int],
    train_fraction: float = 0.75,
) -> tuple[float, float, float]:
    """Batched walk-forward ARIMA: ``(mse, prediction, std_error)``.

    Numerically equivalent to ``harness.walk_forward_mse(y, lambda h:
    arima_forecast(h, order)[0])`` followed by a full-series
    ``arima_forecast`` — but every prefix refit is solved at once.
    The sequential path re-fits per test point (``lib.py:21-24``:
    one model per history prefix); here each prefix's OLS normal
    equations come from cumulative sums of the one shared lag matrix
    (centered-by-prefix-mean algebra applied to the raw Grams), and
    all prefix systems are solved with a single batched ``pinv``.
    ~25x less Python/LAPACK call overhead per grid cell.
    """
    p, d, q = order
    y = np.asarray(y, dtype=float)
    n_y = len(y)
    split = int(n_y * train_fraction)

    # histories y[:h_y] for h_y = split..n_y-1 (scored) + n_y (final fit)
    h_ys = np.arange(split, n_y + 1)
    if len(h_ys) == 0 or h_ys[0] - d < 1:
        raise ValueError(f"series too short for order {order}")

    # z-space: diff commutes with prefixing, so one full diff serves all
    diffs = [y]
    for _ in range(d):
        diffs.append(np.diff(diffs[-1]))
    z = diffs[-1]
    n_z = len(z)
    hs = h_ys - d  # prefix lengths in z-space
    h_min = int(hs[0])
    if h_min < max(p, q) + max(p + q, 1) + 2:
        raise ValueError(f"series too short for order {order}")

    K = len(hs)
    cum_z = np.cumsum(z)
    mu = cum_z[hs - 1] / hs  # per-step history mean           (K,)

    start = max(p, q)
    cols = p + q
    preds_c = np.zeros(K)
    sigma_final = 0.0

    if cols == 0:
        zc_full = z[: int(hs[-1])] - mu[-1]
        sigma_final = float(np.sqrt(np.mean(zc_full**2)))
    else:
        # ---- stage 1 (q>0): per-prefix long-AR residuals, batched by m
        r_full = None  # (K, n_z) residuals, 0 outside [m, h_k)
        if q > 0:
            r_full = np.zeros((K, n_z))
            ms = np.minimum(
                np.maximum(p + q + 2, np.ceil(np.log(hs) * 2).astype(int)),
                hs - 1,
            )
            t_idx = np.arange(n_z)
            for m in np.unique(ms):
                sel = np.flatnonzero(ms == m)
                A = _lag_matrix(z, int(m), int(m), n_z)      # (n_z-m, m)
                cumP = np.cumsum(A[:, :, None] * A[:, None, :], axis=0)
                cumS = np.cumsum(A, axis=0)
                cumC = np.cumsum(A * z[m:, None], axis=0)
                cumT = np.cumsum(z[m:])
                j = hs[sel] - 1 - m                           # row index
                mu_g = mu[sel][:, None]
                k_g = (hs[sel] - m)[:, None]
                S = cumS[j]                                    # (g, m)
                G = (
                    cumP[j]
                    - mu_g[..., None] * (S[:, :, None] + S[:, None, :])
                    + (k_g * mu_g**2)[..., None]
                )
                c = cumC[j] - mu_g * S - mu_g * cumT[j][:, None] + k_g * mu_g**2
                coef = (np.linalg.pinv(G) @ c[:, :, None]).squeeze(-1)
                # r[t] = z[t] - Σ coef_i z[t-1-i] - μ(1 - Σcoef), t∈[m,h)
                V = A @ coef.T                                 # (n_z-m, g)
                rg = z[m:, None] - V - (mu[sel] * (1 - coef.sum(axis=1)))[None, :]
                valid = t_idx[m:, None] < hs[sel][None, :]
                r_full[sel, m:] = (rg * valid).T

        # ---- stage 2: batched OLS over masked row prefixes
        T2 = n_z - start
        t2 = np.arange(start, n_z)
        mask = (t2[None, :] < hs[:, None]).astype(float)       # (K, T2)
        X = np.zeros((K, T2, cols))
        if p > 0:
            L_ar = _lag_matrix(z, p, start, n_z)               # (T2, p)
            X[:, :, :p] = L_ar[None, :, :] - mu[:, None, None]
        if q > 0:
            for jq in range(q):
                X[:, :, p + jq] = r_full[:, start - 1 - jq: n_z - 1 - jq]
        X *= mask[:, :, None]
        target = (z[None, start:] - mu[:, None]) * mask
        Xt = X.transpose(0, 2, 1)
        G2 = Xt @ X  # batched BLAS, not einsum
        c2 = (Xt @ target[:, :, None]).squeeze(-1)
        coef2 = (np.linalg.pinv(G2) @ c2[:, :, None]).squeeze(-1)

        # stage-2 (ARMA-fit) residuals: the MA lags of x_next come from
        # THESE, not the stage-1 long-AR residuals (arima_forecast's
        # ``full_resid[start:] = resid_fit``); masked rows are 0-0=0
        resid2 = target - (X @ coef2[:, :, None]).squeeze(-1)

        x_next = np.zeros((K, cols))
        for i in range(p):
            x_next[:, i] = z[hs - 1 - i] - mu
        for jq in range(q):
            t_last = hs - 1 - jq  # residual index n-1-j per prefix
            in_fit = t_last >= start  # below start: zero padding
            x_next[:, p + jq] = np.where(
                in_fit,
                resid2[np.arange(K), np.clip(t_last - start, 0, T2 - 1)],
                0.0,
            )
        preds_c = np.einsum("kc,kc->k", x_next, coef2)

        n_valid = int(hs[-1]) - start
        sigma_final = float(np.sqrt(np.mean(resid2[-1, :n_valid] ** 2)))

    # undo differencing: pred = pred_z + Σ_{j<d} diff^j(y)[:h_y-j][-1]
    preds = preds_c + mu
    for j in range(d):
        preds = preds + diffs[j][h_ys - j - 1]

    if K > 1:
        actuals = y[h_ys[:-1]]
        mse = seq_mean((actuals - preds[:-1]) ** 2)
    else:
        mse = float("inf")
    return mse, float(preds[-1]), sigma_final


# Closed-form sub-grid: the orders whose Hannan–Rissanen fit reduces
# to scalar left folds (no q ⇒ no stage-1 long-AR pinv; p ≤ 1 ⇒ the
# stage-2 Gram is 1×1 ⇒ coef = sxy/sxx). These are SQL-replayable, so
# the grid ARGMIN itself — the part of the ARIMA job the batched
# solver shares with every order — can carry a DuckDB value oracle.
FOLD_GRID = ((0, 0, 0), (0, 1, 0), (1, 0, 0), (1, 1, 0))


def arima_fold_forecast(y, order: tuple[int, int, int]) -> float:
    """Sequential-fold twin of ``arima_forecast(y, order)[0]`` for the
    closed-form sub-grid :data:`FOLD_GRID`.

    Every sum is an explicit left fold over Python floats starting at
    0.0, so DuckDB's ``list_reduce(l, (p, q) -> p + q)`` adds the same
    doubles in the same order → bit-equal predictions cross-engine
    (the generalization of :func:`ar1_hr_forecast`, which equals the
    ``(1, 0, 0)`` branch). Raises on series too short for the order,
    with the same bound as :func:`arima_forecast` — callers skip.
    """
    p, d, q = order
    if q != 0 or p not in (0, 1) or d not in (0, 1):
        raise ValueError(f"order {order} outside the fold sub-grid")
    z = [float(v) for v in y]
    for _ in range(d):
        z = [z[t] - z[t - 1] for t in range(1, len(z))]
    n = len(z)
    if n < max(p, q) + max(p + q, 1) + 2:
        raise ValueError(f"series too short for order {order}")
    s = 0.0
    for v in z:
        s += v
    mu = s / n
    if p == 0:
        pred_z = mu  # ARIMA(0,d,0): forecast the (differenced) mean
    else:
        sxy = 0.0
        sxx = 0.0
        for t in range(1, n):
            zl = z[t - 1] - mu
            sxy += zl * (z[t] - mu)
            sxx += zl * zl
        coef = sxy / sxx if sxx != 0.0 else 0.0
        pred_z = mu + coef * (z[n - 1] - mu)
    if d == 1:
        pred_z = pred_z + float(y[len(y) - 1])  # undo differencing
    return pred_z


def _fold_sigma(y, order: tuple[int, int, int]) -> float:
    """Residual std error of the full-series fold fit (mirrors
    ``arima_forecast``'s sigma for the sub-grid orders)."""
    p, d, _ = order
    z = [float(v) for v in y]
    for _ in range(d):
        z = [z[t] - z[t - 1] for t in range(1, len(z))]
    n = len(z)
    s = 0.0
    for v in z:
        s += v
    mu = s / n
    if p == 0:
        resid = [v - mu for v in z]
    else:
        sxy = 0.0
        sxx = 0.0
        for t in range(1, n):
            zl = z[t - 1] - mu
            sxy += zl * (z[t] - mu)
            sxx += zl * zl
        coef = sxy / sxx if sxx != 0.0 else 0.0
        resid = [
            (z[t] - mu) - coef * (z[t - 1] - mu) for t in range(1, n)
        ]
    acc = 0.0
    for r in resid:
        acc += r * r
    return float(np.sqrt(acc / len(resid))) if resid else 0.0


def arima_fold_walk_forward(
    y, order: tuple[int, int, int], train_fraction: float = 0.75,
) -> tuple[float, float, float]:
    """``(mse, prediction, std_error)`` walk-forward using the
    sequential-fold forecast — the oracle-replayable twin of
    :func:`arima_walk_forward` for :data:`FOLD_GRID` orders (pytest
    pins them equal to float tolerance, transitively value-gating the
    batched solver's AR/differencing paths). The error mean is
    :func:`seq_mean`, so the oracle holds at any test-split length."""
    ys = [float(v) for v in y]
    n = len(ys)
    split = int(n * train_fraction)
    if split < 1:
        raise ValueError("series too short for walk-forward")
    preds = [arima_fold_forecast(ys[:h], order) for h in range(split, n)]
    errs = [(ys[h] - preds[h - split]) ** 2 for h in range(split, n)]
    mse = seq_mean(errs) if errs else float("inf")
    return mse, arima_fold_forecast(ys, order), _fold_sigma(ys, order)


def arima_hybrid_walk_forward(
    y, order: tuple[int, int, int], train_fraction: float = 0.75,
) -> tuple[float, float, float]:
    """Fold kernel on :data:`FOLD_GRID` orders (SQL-replayable
    numerics), batched numpy elsewhere — pytest pins the two equal to
    float tolerance on the shared orders, so a full-grid job run with
    this kernel is the same job with oracle-matching arithmetic on the
    sub-grid (the ``m_arima_weekly_forecast_subgrid`` gate's fit)."""
    if tuple(order) in FOLD_GRID:
        return arima_fold_walk_forward(y, order, train_fraction)
    return arima_walk_forward(y, order, train_fraction)


def _ar_residuals(zc: np.ndarray, m: int) -> np.ndarray:
    """Residuals of an AR(m) OLS fit, zero-padded to len(zc)."""
    n = len(zc)
    X = _lag_matrix(zc, m, m, n)
    coef = _ols(X, zc[m:])
    resid = np.zeros(n)
    resid[m:] = zc[m:] - X @ coef
    return resid
