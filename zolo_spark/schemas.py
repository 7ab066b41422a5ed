"""StructType registry: warehouse tables + raw nested API payloads.

Warehouse DDL mirrors the reference's ``bin/create_tables/*`` scripts
(e.g. ``create_square_tables.py:19-37``, ``create_model_meta_table.py:19-29``,
``load_ref_tables.py:22-52``); raw payload shapes mirror the nested API
documents consumed by the ETLs (``square_ETL.py:120-156``,
``shopify_ETL.py:111-129``, ``quickbooks_ETL.py:132-168``,
``qb_customers_ETL.py:124-131``).
"""

from __future__ import annotations

from pyspark.sql import types as T


def _s(*fields: tuple) -> T.StructType:
    return T.StructType([T.StructField(n, t, True) for n, t in fields])


S = T.StringType()
D = T.DoubleType()
I = T.IntegerType()
L = T.LongType()
TS = T.TimestampType()

# ---------------------------------------------------------------- warehouse
# Fact headers / line items (reference DDL: create_*_tables.py)
SQUARE_TRANS = _s(
    ("payment_id", S), ("created_at", TS), ("market", S),
    ("dollars", D), ("tendered_cash", D), ("returned_cash", D),
)
SQUARE_TRANS_DETAILS = _s(
    ("payment_id", S), ("square_id", S), ("quantity", I),
    ("dollars", D), ("modifiers", S), ("variation_name", S),
)
SHOPIFY_TRANS = _s(
    ("order_id", S), ("created_at", TS), ("shipping_price", D),
    ("subtotal", D), ("total_dollars", D),
)
SHOPIFY_TRANS_DETAILS = _s(
    ("order_id", S), ("shopify_id", S), ("quantity", I), ("price", D),
)
QB_TRANS = _s(
    ("payment_id", S), ("created_at", TS), ("dollars", D), ("customer_id", S),
)
QB_TRANS_DETAILS = _s(
    ("payment_id", S), ("quickbooks_id", S), ("quantity", I),
    ("price", D), ("dollars", D),
)

# Dimensions (load_ref_tables.py:22-52; qb_customers_ETL.py:170-180)
ITEMS = _s(
    ("product_name", S), ("variant_name", S), ("zolo_id", I),
    ("square_id", S), ("quickbooks_id", S), ("shopify_id", S),
    ("category_name", S), ("form", S), ("weight", D), ("profile_id", I),
)
COFFEE_PROFILES = _s(
    ("profile_id", I), ("profile_name", S), ("roast_level", S),
    ("active", I), ("single_origin", I),
    ("c1_origin", S), ("c1_process", S), ("c1_percent", D),
    ("c2_origin", S), ("c2_process", S), ("c2_percent", D),
    # 'c3_procss' [sic] preserved from load_ref_tables.py:49
    ("c3_procss", S), ("c3_origin", S), ("c3_percent", D),
)
QB_CUSTOMERS = _s(
    ("customer_id", S), ("customer_name", S), ("phone_number", S),
    ("address", S), ("city", S), ("state", S), ("zipcode", S),
    ("create_date", TS),
)

# Model-output tables (create_model_meta_table.py:19-29 et al.)
MODEL_META = _s(
    ("profile_name", S), ("best_config", S), ("mse", D),
    ("prediction", D), ("std_error", D),
    ("lower_bound", D), ("upper_bound", D), ("forecast_start", TS),
)
MODEL_HOLT = _s(
    ("profile_name", S), ("mse", D), ("prediction", D), ("forecast_start", TS),
)
MODEL_SIMP_AVG = MODEL_HOLT

# CDC latest-state mirror (beyond-parity): the generic target the
# merge-on-read gate/bench and the streaming upsert sink exercise —
# a dimension-shaped (key, attributes) table MERGE keeps current.
CDC_MIRROR = _s(("cust_id", L), ("segment", S), ("balance", D))

WAREHOUSE_TABLES: dict[str, T.StructType] = {
    "square_trans": SQUARE_TRANS,
    "square_trans_details": SQUARE_TRANS_DETAILS,
    "shopify_trans": SHOPIFY_TRANS,
    "shopify_trans_details": SHOPIFY_TRANS_DETAILS,
    "qb_trans": QB_TRANS,
    "qb_trans_details": QB_TRANS_DETAILS,
    "items": ITEMS,
    "coffee_profiles": COFFEE_PROFILES,
    "qb_customers": QB_CUSTOMERS,
    "model_meta": MODEL_META,
    "model_holt": MODEL_HOLT,
    "model_simp_avg": MODEL_SIMP_AVG,
    "cdc_mirror": CDC_MIRROR,
}

# ------------------------------------------------------------- raw payloads
# Square payment (square_ETL.py:120-156)
RAW_SQUARE_PAYMENTS = T.StructType([
    T.StructField("payment_id", S, False),
    T.StructField("created_at", S, True),
    T.StructField("device", _s(("name", S)), True),
    T.StructField("itemizations", T.ArrayType(_s(
        ("quantity", D),
        ("item_variation_name", S),
        ("item_detail", _s(("item_variation_id", S))),
        ("total_money", _s(("amount", L))),
        ("modifiers", T.ArrayType(_s(("name", S)))),
    )), True),
    T.StructField("tender", T.ArrayType(_s(
        ("tendered_money", _s(("amount", L))),
        ("change_back_money", _s(("amount", L))),
    )), True),
])

# Shopify order (shopify_ETL.py:111-129) — numbers arrive as strings
RAW_SHOPIFY_ORDERS = T.StructType([
    T.StructField("id", L, False),
    T.StructField("created_at", S, True),
    T.StructField("line_items", T.ArrayType(_s(
        ("quantity", S), ("variant_id", L), ("price", S),
    )), True),
    T.StructField("shipping_lines", T.ArrayType(_s(("price", S))), True),
])

# QuickBooks invoice (quickbooks_ETL.py:132-168)
RAW_QB_INVOICES = T.StructType([
    T.StructField("DocNumber", S, False),
    T.StructField("TxnDate", S, True),
    T.StructField("CustomerRef", _s(("value", S)), True),
    T.StructField("Line", T.ArrayType(_s(
        ("Id", S),
        ("SalesItemLineDetail", _s(
            ("ItemRef", _s(("value", S))), ("Qty", D), ("UnitPrice", D),
        )),
    )), True),
])

# QuickBooks customer (qb_customers_ETL.py:124-131)
RAW_QB_CUSTOMERS = T.StructType([
    T.StructField("Id", S, False),
    T.StructField("CompanyName", S, True),
    T.StructField("PrimaryPhone", _s(("FreeFormNumber", S)), True),
    T.StructField("ShipAddr", _s(
        ("Line1", S), ("City", S),
        ("CountrySubDivisionCode", S), ("PostalCode", S),
    ), True),
    T.StructField("MetaData", _s(("CreateTime", S)), True),
])
