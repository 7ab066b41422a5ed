"""Warehouse catalog: table init (S9), read/write helpers (S7/S8).

The reference keeps its warehouse in Postgres with drop-and-recreate DDL
(``bin/create_tables/*.py``); here the warehouse is managed Parquet under
a root directory, with explicit schemas from :mod:`zolo_spark.schemas`.

Scale posture: fact tables are written partitioned by ``created_at``
date so a 100 TB deployment gets partition pruning on the time
predicates every downstream query carries (SURVEY §7.5).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import schemas

# Fact tables partitioned by event date at rest.
_PARTITIONED = {
    "square_trans": "created_at",
    "shopify_trans": "created_at",
    "qb_trans": "created_at",
}


class Warehouse:
    """Parquet-backed warehouse rooted at ``root``."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def init(self, tables: list[str] | None = None) -> None:
        """Create empty tables with their DDL schemas (reference S9:
        drop-and-recreate, ``create_square_tables.py:16-38`` etc.)."""
        for name in tables or list(schemas.WAREHOUSE_TABLES):
            empty = self.spark.createDataFrame([], schemas.WAREHOUSE_TABLES[name])
            self._write(empty, name, mode="overwrite")

    def read(self, table: str) -> DataFrame:
        want = schemas.WAREHOUSE_TABLES[table]
        df = self.spark.read.schema(want).parquet(self.path(table))
        # hide the _dt partition-discovery column from consumers
        return df.select([f.name for f in want.fields])

    def read_between(self, table: str, start, end) -> DataFrame:
        """Time-sliced read of a partitioned fact table. The predicate
        is applied to the ``_dt`` partition column (directory pruning —
        at 100 TB this is the difference between scanning a day and
        scanning the table) AND to the row-level timestamp."""
        want = schemas.WAREHOUSE_TABLES[table]
        df = self.spark.read.schema(want).parquet(self.path(table))
        part_col = _PARTITIONED.get(table)
        if part_col is not None and "_dt" in df.columns:
            df = df.filter(
                (F.col("_dt") >= F.to_date(F.lit(start)))
                & (F.col("_dt") <= F.to_date(F.lit(end)))
            )
        if part_col is not None:
            df = df.filter(
                (F.col(part_col) >= F.lit(start)) & (F.col(part_col) < F.lit(end))
            )
        return df.select([f.name for f in want.fields])

    def append(self, df: DataFrame, table: str) -> None:
        """S7: ``to_sql(..., if_exists='append')`` analog
        (``square_ETL.py:232-233``)."""
        self._write(df, table, mode="append")

    def overwrite(self, df: DataFrame, table: str) -> None:
        """S8: ``to_sql(..., if_exists='replace')`` analog
        (``qb_customers_ETL.py:190``)."""
        self._write(df, table, mode="overwrite")

    def _write(self, df: DataFrame, table: str, mode: str) -> None:
        want = schemas.WAREHOUSE_TABLES[table]
        df = df.select([F.col(f.name).cast(f.dataType) for f in want.fields])
        writer = df.write.mode(mode)
        part_col = _PARTITIONED.get(table)
        if part_col is not None and part_col in df.columns:
            df = df.withColumn("_dt", F.to_date(F.col(part_col)))
            writer = df.write.mode(mode).partitionBy("_dt")
        writer.parquet(self.path(table))


def load_testdata(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load the driver-provided synthetic tables (TESTDATA.md)."""
    names = [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    dfs = {n: spark.read.parquet(os.path.join(sf_dir, f"{n}.parquet")) for n in names}
    # events.ts is TIMESTAMP(NANOS) in parquet, surfaced as long nanos
    # under spark.sql.legacy.parquet.nanosAsLong; convert to a real
    # timestamp truncated to micros (same truncation DuckDB applies).
    ev = dfs["events"]
    if dict(ev.dtypes)["ts"] == "bigint":
        dfs["events"] = ev.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return dfs


def register_testdata(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load and register the testdata tables as temp views."""
    dfs = load_testdata(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
