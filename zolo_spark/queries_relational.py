"""Per-operator parity queries (SURVEY §2.2-2.7) on the testdata tables.

Each query exercises one operator from the inventory with a DuckDB
oracle. Names carry the SURVEY operator id (j1, a1, w2, ...).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, Window as W

from .parity_queries import register
from .warehouse import load_testdata

# Registered in subsequent build phases.
