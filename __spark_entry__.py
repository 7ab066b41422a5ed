"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in :mod:`zolo_spark`; this file only adapts it
to the driver's three-function contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from zolo_spark import parity_queries
from zolo_spark.ops import relational
from zolo_spark.warehouse import load_testdata


def entry(spark: SparkSession) -> DataFrame:
    """Flagship weekly-demand query on /root/testdata/sf0.001."""
    tables = load_testdata(spark, "/root/testdata/sf0.001")
    return relational.weekly_demand_testdata(tables)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return parity_queries.queries()


def oracle_sql() -> dict[str, str]:
    return parity_queries.oracle_sql()
