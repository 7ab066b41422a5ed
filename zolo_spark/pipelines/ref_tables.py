"""Reference-table bootstrap (reference ``bin/create_tables/load_ref_tables.py``).

S5 + S8: CSVs → ``items`` and ``coffee_profiles`` dimensions with
explicit schemas (the reference's DDL is immediately superseded by
``to_sql(if_exists='replace')`` schema inference; here the explicit
StructType is authoritative).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .. import schemas
from ..warehouse import Warehouse


def load_ref_tables(
    spark: SparkSession,
    warehouse: Warehouse,
    items_csv: str,
    profiles_csv: str,
) -> None:
    items = spark.read.csv(items_csv, header=True, schema=schemas.ITEMS)
    profiles = spark.read.csv(profiles_csv, header=True, schema=schemas.COFFEE_PROFILES)
    warehouse.overwrite(items, "items")  # S8
    warehouse.overwrite(profiles, "coffee_profiles")
