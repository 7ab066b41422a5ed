"""Window / grouped-transform operators (SURVEY §2.6: W1, W2).

The reference's only window usage is pandas ``groupby(...).transform``
— a whole-partition aggregate broadcast back onto every row. In Spark
that is an aggregate over an unbounded window; no sort is required,
so the physical plan is a hash-partition exchange + window without a
range frame — cheap and skew-tolerant.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, Window, functions as F


def group_min(value, partition_by: Sequence[str]) -> Column:
    """W1: ``groupby(...)['time'].transform('min')`` — first transaction
    time per (date, device) kept on every row (``square_ETL.py:182``)."""
    return F.min(value).over(Window.partitionBy(*partition_by))


def group_count(partition_by: Sequence[str]) -> Column:
    """W2: ``.groupby(...).transform('count')`` — history length per
    product on every row (``arima_models.py:161``)."""
    return F.count(F.lit(1)).over(Window.partitionBy(*partition_by))
