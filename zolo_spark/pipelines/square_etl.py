"""Square payments ETL (reference ``bin/etl/square_ETL.py``).

Raw payment payloads (nested: device struct, itemizations array,
tender array) → ``square_trans_details`` + ``square_trans``.

The pandas per-payment loop (``square_ETL.py:113-156``) becomes one
lazy lineage: header projection → explode (N1) → scalar derives
(P5-P9) → window (W1) → market classify (P9) → details projection
(P1) + header aggregate (A1). Everything is JVM-side; no Python in
the row path.
"""

from __future__ import annotations

import logging
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import schemas
from ..ops import nested, scalar, windows
from ..sources.paginate import paginate_batch_token
from ..state import WatermarkStore, extract_window
from ..warehouse import Warehouse

logger = logging.getLogger(__name__)

WATERMARK_KEY = "last_update_square"


def extract(
    spark: SparkSession,
    fetch_page: Callable[[str | None], tuple[list, str | None]],
) -> DataFrame:
    """S1: paginated pull; pagination stays driver-side, payloads land
    as an executor-side DataFrame with the explicit payload schema."""
    payloads: list = []
    for batch in paginate_batch_token(fetch_page):
        payloads.extend(batch)
    return spark.createDataFrame(payloads, schemas.RAW_SQUARE_PAYMENTS)


def transform(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Payments → (square_trans_details, square_trans)."""
    hdr = raw.select(
        "payment_id",
        scalar.shift_fixed_offset(scalar.parse_timestamp("created_at"))
        .alias("created_at"),  # P5 + P6
        F.col("device.name").alias("device_name"),  # N2
        "itemizations",
        # N2+N3: only tender[0] is inspected (quirk register); absent
        # tender/fields => NULL, cents -> dollars (N6)
        (F.try_element_at("tender", F.lit(1))["tendered_money"]["amount"] / 100.0)
        .alias("tendered_cash"),
        (F.try_element_at("tender", F.lit(1))["change_back_money"]["amount"] / 100.0)
        .alias("returned_cash"),
        # Reference quirk (square_ETL.py:137-140): the modifiers
        # list-comp is wrapped in one try/except, so ANY itemization
        # with NULL modifiers voids modifiers for the WHOLE payment.
        F.exists("itemizations", lambda i: i["modifiers"].isNull())
        .alias("mods_void"),
    )

    lines = nested.explode_line_items(
        hdr, "itemizations",
        ["payment_id", "created_at", "device_name",
         "tendered_cash", "returned_cash", "mods_void"],
    )  # N1

    data = lines.select(
        "payment_id", "created_at", "device_name",
        "tendered_cash", "returned_cash",
        F.col("item.quantity").alias("quantity"),
        F.col("item.item_detail.item_variation_id").alias("square_id"),  # N2
        (F.col("item.total_money.amount") / 100.0).alias("dollars"),  # N6
        F.when(F.col("mods_void"), F.lit(None).cast("string"))
        .otherwise(nested.join_names("item.modifiers")).alias("modifiers"),  # N5
        F.col("item.item_variation_name").alias("variation_name"),
    ).withColumns({
        "date": scalar.extract_date("created_at"),  # P7
        "time": scalar.extract_time("created_at"),
        "DOW": scalar.day_of_week("created_at"),  # P8
    }).withColumn(
        "first_trans",
        windows.group_min(F.col("time"), ["date", "device_name"]),  # W1
    ).withColumn(
        "market", scalar.classify_market(F.col("DOW"), F.col("first_trans"))  # P9
    )

    details = data.select(
        "payment_id", "square_id",
        F.col("quantity").cast("int").alias("quantity"),
        "dollars", "modifiers", "variation_name",
    )  # P1

    trans = (
        data.groupBy("payment_id", "created_at", "market")
        .agg(
            F.sum("dollars").alias("dollars"),
            F.min("tendered_cash").alias("tendered_cash"),
            F.min("returned_cash").alias("returned_cash"),
        )  # A1
        .select("payment_id", "created_at", "market",
                "dollars", "tendered_cash", "returned_cash")
    )
    return details, trans


def run(
    spark: SparkSession,
    warehouse: Warehouse,
    store: WatermarkStore,
    fetcher_factory: Callable[[str, str], Callable],
    idempotent: bool = False,
    transactional: bool = False,
) -> None:
    """Full job (``square_ETL.py:40-56``): watermark window → extract →
    transform → append loads → watermark commit.

    Default semantics are the reference's at-least-once (a crash
    between load and watermark commit duplicates the window on rerun);
    ``idempotent=True`` anti-joins already-loaded payment_ids first
    (exactly-once on rerun, S10 upgrade).

    ``transactional=True`` closes the loop from sink to source
    (r9 ROADMAP item 7): the extract lower bound comes from the
    warehouse tx log's committed watermark — not the side-channel
    YAML — and details + header + watermark publish in ONE atomic
    ``Warehouse.commit_tx``. A crash at any point leaves both tables
    and the watermark unmoved, so the rerun re-extracts the same
    window and commits the PAIR exactly once, with no ``dedupe_on``
    key needed (the per-table ``append_commit`` cannot give this:
    two manifests reopen the crash window between their renames)."""
    if transactional:
        start = warehouse.committed_watermark_tx(WATERMARK_KEY)
        end = WatermarkStore.now_iso()
        raw = extract(spark, fetcher_factory(start, end))
        details, trans = transform(raw)
        logger.info("date_range for this ETL (UTC): %s - %s", start, end)
        warehouse.commit_tx(
            {"square_trans_details": details, "square_trans": trans},
            {WATERMARK_KEY: end},
        )
        logger.info("Committed square pair + watermark transactionally")
        return
    start, end = extract_window(store, WATERMARK_KEY)
    raw = extract(spark, fetcher_factory(start, end))
    details, trans = transform(raw)
    key = ["payment_id"] if idempotent else None
    logger.info("date_range for this ETL (UTC): %s - %s", start, end)
    warehouse.append(details, "square_trans_details", dedupe_on=key)  # S7
    warehouse.append(trans, "square_trans", dedupe_on=key)
    logger.info("Loaded square_trans_details and square_trans")
    store.commit(WATERMARK_KEY, end)  # S10
