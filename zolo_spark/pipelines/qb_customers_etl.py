"""QuickBooks customers ETL (reference ``bin/etl/qb_customers_ETL.py``).

Full-refresh dimension: unfiltered paged scan → flat projection of
nested fields → overwrite ``qb_customers`` (S8). The reference
iterates ``['QueryResponse']['Invoice']`` by copy-paste accident
(``qb_customers_ETL.py:121``); intent (Customer) implemented.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import schemas
from ..ops import scalar
from ..sources.paginate import paginate_start_position
from ..state import WatermarkStore
from ..warehouse import Warehouse

WATERMARK_KEY = "last_update_qb_customers"
PAGE_SIZE = 25  # qb_customers_ETL.py:99-100


def extract(
    spark: SparkSession,
    fetch_count: Callable[[], int],
    fetch_page: Callable[[int], list],
) -> DataFrame:
    """S4: full scan (no watermark filter), paged by 25."""
    payloads: list = []
    for batch in paginate_start_position(fetch_count, fetch_page, PAGE_SIZE):
        payloads.extend(batch)
    return spark.createDataFrame(payloads, schemas.RAW_QB_CUSTOMERS)


def transform(raw: DataFrame) -> DataFrame:
    """Customers → qb_customers (flat N2 projections,
    ``qb_customers_ETL.py:124-131``)."""
    return raw.select(
        F.col("Id").alias("customer_id"),
        F.col("CompanyName").alias("customer_name"),
        F.col("PrimaryPhone.FreeFormNumber").alias("phone_number"),
        F.col("ShipAddr.Line1").alias("address"),
        F.col("ShipAddr.City").alias("city"),
        F.col("ShipAddr.CountrySubDivisionCode").alias("state"),
        F.col("ShipAddr.PostalCode").alias("zipcode"),
        scalar.parse_timestamp(F.col("MetaData.CreateTime")).alias("create_date"),
    )


def run(
    spark: SparkSession,
    warehouse: Warehouse,
    store: WatermarkStore,
    fetchers_factory: Callable[[], tuple[Callable, Callable]],
) -> None:
    fetch_count, fetch_page = fetchers_factory()
    table = transform(extract(spark, fetch_count, fetch_page))
    warehouse.overwrite(table, "qb_customers")  # S8 full refresh
    store.commit(WATERMARK_KEY, store.now_iso())  # per-job key (§2.10)
