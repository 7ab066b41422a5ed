"""QuickBooks invoices ETL (reference ``bin/etl/quickbooks_ETL.py``).

Raw invoice payloads (Line array with subtotal pseudo-lines and
optionally-absent SalesItemLineDetail members) → ``qb_trans_details``
+ ``qb_trans``.
"""

from __future__ import annotations

import logging
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import schemas
from ..ops import nested, scalar
from ..sources.paginate import paginate_start_position
from ..state import WatermarkStore, extract_window
from ..warehouse import Warehouse

logger = logging.getLogger(__name__)

WATERMARK_KEY = "last_update_quickbooks"
PAGE_SIZE = 25  # quickbooks_ETL.py:104-108


def extract(
    spark: SparkSession,
    fetch_count: Callable[[], int],
    fetch_page: Callable[[int], list],
) -> DataFrame:
    """S3: QBO query pagination by STARTPOSITION/MAXRESULTS; the
    reference's round() page-count bug is implemented as ceil
    (quirk register §2.10)."""
    payloads: list = []
    for batch in paginate_start_position(fetch_count, fetch_page, PAGE_SIZE):
        payloads.extend(batch)
    return spark.createDataFrame(payloads, schemas.RAW_QB_INVOICES)


def transform(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Invoices → (qb_trans_details, qb_trans)."""
    hdr = raw.select(
        F.col("DocNumber").alias("payment_id"),
        # TxnDate is a bare date string; no timezone shift in the
        # reference (quickbooks_ETL.py:133)
        scalar.parse_timestamp("TxnDate").alias("created_at"),  # P5
        F.col("CustomerRef.value").alias("customer_id"),  # N2
        # N4: drop subtotal pseudo-lines lacking an Id
        nested.keep_items_with_id("Line").alias("Line"),
    )

    data = nested.explode_line_items(
        hdr, "Line", ["payment_id", "created_at", "customer_id"]
    ).select(  # N1
        "payment_id", "created_at", "customer_id",
        # N3: absent SalesItemLineDetail members -> NULL
        F.col("item.SalesItemLineDetail.ItemRef.value").alias("quickbooks_id"),
        F.col("item.SalesItemLineDetail.Qty").alias("quantity"),
        F.col("item.SalesItemLineDetail.UnitPrice").alias("price"),
    ).withColumn(
        "dollars", F.col("quantity") * F.col("price")  # P10
    )

    trans = (
        data.groupBy("payment_id", "created_at", "customer_id")
        .agg(
            F.sum("quantity").alias("quantity"),
            F.sum("price").alias("price"),
            F.sum("dollars").alias("dollars"),
        )  # A3
        .select("payment_id", "created_at", "customer_id", "dollars")  # P1
    )

    details = data.select(
        "payment_id", "quickbooks_id",
        F.col("quantity").cast("int").alias("quantity"),
        "price", "dollars",
    )  # P1
    return details, trans


def run(
    spark: SparkSession,
    warehouse: Warehouse,
    store: WatermarkStore,
    fetchers_factory: Callable[[str, str], tuple[Callable, Callable]],
    transactional: bool = False,
) -> None:
    """Watermark window → extract → transform → pair load → watermark.

    Default semantics are the reference's at-least-once
    (``quickbooks_ETL.py:235-240``: two appends, then the watermark);
    ``transactional=True`` publishes the invoice header+details pair
    and the watermark in ONE atomic ``Warehouse.commit_tx``, with the
    extract lower bound read from the tx log — crash anywhere, rerun
    commits the pair exactly once (see the square ETL, r10)."""
    if transactional:
        start = warehouse.committed_watermark_tx(WATERMARK_KEY)
        end = WatermarkStore.now_iso()
        fetch_count, fetch_page = fetchers_factory(start, end)
        details, trans = transform(extract(spark, fetch_count, fetch_page))
        logger.info("date_range for this ETL (UTC): %s - %s", start, end)
        warehouse.commit_tx(
            {"qb_trans_details": details, "qb_trans": trans},
            {WATERMARK_KEY: end},
        )
        logger.info("Committed quickbooks pair + watermark transactionally")
        return
    start, end = extract_window(store, WATERMARK_KEY)
    fetch_count, fetch_page = fetchers_factory(start, end)
    details, trans = transform(extract(spark, fetch_count, fetch_page))
    logger.info("date_range for this ETL (UTC): %s - %s", start, end)
    warehouse.append(details, "qb_trans_details")  # S7
    warehouse.append(trans, "qb_trans")
    logger.info("Loaded qb_trans_details and qb_trans")
    store.commit(WATERMARK_KEY, end)  # S10
