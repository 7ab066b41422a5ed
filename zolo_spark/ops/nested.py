"""Nested-data / row-generating operators (SURVEY §2.2: N1-N5).

The reference explodes arrays of line-item dicts with hand-written
pandas loops (``square_ETL.py:122-156``, ``shopify_ETL.py:110-130``,
``quickbooks_ETL.py:131-169``); here each becomes the built-in
``explode`` plus struct-field projection — fully JVM-side, no Python
in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def explode_line_items(
    df: DataFrame,
    array_col: str,
    header_cols: list[str],
    item_alias: str = "item",
    outer: bool = False,
) -> DataFrame:
    """N1: one document with k line items → k rows, header repeated.

    ``outer=True`` keeps documents whose array is NULL/empty (the
    reference's loops simply emit no rows for those — default False
    matches that).
    """
    ex = F.explode_outer if outer else F.explode
    return df.select(*header_cols, ex(array_col).alias(item_alias))


def keep_items_with_id(array_col, id_field: str = "Id") -> Column:
    """N4: drop subtotal pseudo-lines lacking an ``Id`` key before the
    explode (``quickbooks_ETL.py:137``)."""
    col = F.col(array_col) if isinstance(array_col, str) else array_col
    return F.filter(col, lambda x: x[id_field].isNotNull())


def join_names(array_col, name_field: str = "name", sep: str = ";") -> Column:
    """N5: ``';'.join(modifier names)`` per line item
    (``square_ETL.py:138``). NULL array ⇒ NULL (the reference's
    try/except → NaN, N3)."""
    col = F.col(array_col) if isinstance(array_col, str) else array_col
    return F.when(
        col.isNotNull(),
        F.array_join(F.transform(col, lambda m: m[name_field]), sep),
    )
