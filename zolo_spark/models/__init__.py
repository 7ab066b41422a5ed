"""Forecasting model stage (SURVEY §2.8: M1-M6).

The reference fits statsmodels ARIMA / Holt / SimpleExpSmoothing per
product in a driver loop; here the models are pure-numpy (statsmodels
is not available in this environment and the loop shape is wrong for
scale anyway) and fitting is distributed per group with
``applyInPandas`` — the reference's hot spot becomes embarrassingly
parallel.
"""
