"""Shopify orders ETL (reference ``bin/etl/shopify_ETL.py``).

Raw order payloads (line_items array with stringly-typed numbers,
shipping_lines array) → ``shopify_trans_details`` + ``shopify_trans``.
"""

from __future__ import annotations

import logging
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import schemas
from ..ops import nested, scalar
from ..sources.paginate import paginate_count_pages
from ..state import WatermarkStore, extract_window
from ..warehouse import Warehouse

logger = logging.getLogger(__name__)

WATERMARK_KEY = "last_update_shopify"
PAGE_SIZE = 50  # shopify_ETL.py:82-85


def extract(
    spark: SparkSession,
    fetch_count: Callable[[], int],
    fetch_page: Callable[[int], list],
) -> DataFrame:
    """S2: count then ceil(count/50) page fetches."""
    payloads: list = []
    for batch in paginate_count_pages(fetch_count, fetch_page, PAGE_SIZE):
        payloads.extend(batch)
    return spark.createDataFrame(payloads, schemas.RAW_SHOPIFY_ORDERS)


def transform(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Orders → (shopify_details, shopify_trans)."""
    hdr = raw.select(
        F.col("id").cast("string").alias("order_id"),
        scalar.shift_fixed_offset(scalar.parse_timestamp("created_at"))
        .alias("created_at"),  # P5 + P6
        "line_items",
        # N3: empty shipping_lines -> IndexError -> NaN in the
        # reference (shopify_ETL.py:116-119); try_element_at yields
        # NULL on the empty array (plain element_at throws under ANSI).
        F.try_element_at("shipping_lines", F.lit(1))["price"].cast("double")
        .alias("shipping_price"),
    )

    data = nested.explode_line_items(
        hdr, "line_items", ["order_id", "created_at", "shipping_price"]
    ).select(  # N1
        "order_id", "created_at", "shipping_price",
        # stringly-typed API numbers (shopify_ETL.py:113-115)
        F.col("item.quantity").cast("int").alias("quantity"),
        F.col("item.variant_id").cast("string").alias("shopify_id"),
        F.col("item.price").cast("double").alias("price"),
    ).withColumn(
        "subtotal", F.col("quantity") * F.col("price")  # P10
    )

    trans = (
        data.groupBy("order_id", "created_at")
        .agg(
            F.min("shipping_price").alias("shipping_price"),
            F.sum("subtotal").alias("subtotal"),
        )  # A2
        # P10 + N3: NULL shipping ⇒ NULL total (shopify_ETL.py:160)
        .withColumn(
            "total_dollars",
            scalar.derive_total(F.col("subtotal"), F.col("shipping_price")),
        )
        .select("order_id", "created_at", "shipping_price",
                "subtotal", "total_dollars")  # P1
    )

    details = data.select("order_id", "shopify_id", "quantity", "price")  # P1
    return details, trans


def run(
    spark: SparkSession,
    warehouse: Warehouse,
    store: WatermarkStore,
    fetchers_factory: Callable[[str, str], tuple[Callable, Callable]],
    transactional: bool = False,
) -> None:
    """Watermark window → extract → transform → pair load → watermark.

    Default semantics are the reference's at-least-once: the
    header+details pair loads in two appends and the watermark commits
    AFTER (``shopify_ETL.py:201-206``), so a crash between any two of
    the three re-extracts the window and duplicates rows on rerun.
    ``transactional=True`` routes the PAIR + watermark through ONE
    atomic ``Warehouse.commit_tx`` with the extract lower bound read
    back from the tx log — the same exactly-once upgrade the square
    ETL got in r10 (the crash window exists identically here)."""
    if transactional:
        start = warehouse.committed_watermark_tx(WATERMARK_KEY)
        end = WatermarkStore.now_iso()
        fetch_count, fetch_page = fetchers_factory(start, end)
        details, trans = transform(extract(spark, fetch_count, fetch_page))
        logger.info("date_range for this ETL (UTC): %s - %s", start, end)
        warehouse.commit_tx(
            {"shopify_trans_details": details, "shopify_trans": trans},
            {WATERMARK_KEY: end},
        )
        logger.info("Committed shopify pair + watermark transactionally")
        return
    start, end = extract_window(store, WATERMARK_KEY)
    fetch_count, fetch_page = fetchers_factory(start, end)
    details, trans = transform(extract(spark, fetch_count, fetch_page))
    logger.info("date_range for this ETL (UTC): %s - %s", start, end)
    warehouse.append(details, "shopify_trans_details")  # S7
    warehouse.append(trans, "shopify_trans")
    # correct table names in the log (reference logs square names here,
    # shopify_ETL.py:204-205 — quirk register §2.10)
    logger.info("Loaded shopify_trans_details and shopify_trans")
    store.commit(WATERMARK_KEY, end)  # S10
