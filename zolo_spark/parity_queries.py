"""Driver-facing query registry.

Every implemented operator from SURVEY §2 (and the beyond-parity
LLM-data operators) gets a named entry here: a Spark callable
``(spark, sf_dir) -> DataFrame`` plus, where SQL-expressible, a
DuckDB oracle SQL string over the same parquet tables. The driver's
correctness gate runs both and hash-compares (row count + schema +
order-insensitive value hash), so every computed column is aliased
identically on both sides and floats are rounded identically on both
sides.

``__spark_entry__.py`` re-exports :data:`QUERIES` / :data:`ORACLES`.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from .warehouse import load_testdata


@dataclass
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None => driver does rows-only check


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle)
        return fn
    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {n: s.oracle for n, s in REGISTRY.items() if s.oracle is not None}


# --------------------------------------------------------------------------
# Flagship — weekly demand (SURVEY §2.4-2.7: J1-J3, P4, P10-P12, U1, A4)
# --------------------------------------------------------------------------
from .ops import relational  # noqa: E402


@register("flagship_weekly_demand", oracle=relational.WEEKLY_DEMAND_TESTDATA_ORACLE)
def flagship_weekly_demand(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.weekly_demand_testdata(load_testdata(spark, sf_dir))


# Subsequent operator groups register themselves on import.
from . import queries_relational  # noqa: E402,F401
from . import queries_llm  # noqa: E402,F401
from . import queries_models  # noqa: E402,F401
