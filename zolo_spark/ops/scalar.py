"""Scalar / projection operators (SURVEY §2.3: P5-P15, N6).

Semantics-critical translations from the reference's pandas code —
the watch-list items of SURVEY §7.4 live here with their exact
behavioral contracts.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# ---------------------------------------------------------------- P5-P8

def parse_timestamp(col) -> Column:
    """P5: ``pd.to_datetime`` of ISO-8601 strings (``square_ETL.py:175``)."""
    return F.to_timestamp(col)


def shift_fixed_offset(col, hours: int = -7) -> Column:
    """P6: the reference's fixed UTC→Pacific shift, ``created_at -
    timedelta(hours=7)`` (``square_ETL.py:176``) — deliberately NOT a
    real timezone (no DST), replicated literally."""
    return F.col(col) + F.expr(f"INTERVAL {hours} HOURS") if isinstance(col, str) else col + F.expr(f"INTERVAL {hours} HOURS")


def to_pacific(col) -> Column:
    """P6 opt-in correction: real ``America/Los_Angeles`` conversion."""
    return F.from_utc_timestamp(col, "America/Los_Angeles")


def extract_date(col) -> Column:
    """P7: ``.dt.date`` (``square_ETL.py:177``)."""
    return F.to_date(col)


def extract_time(col) -> Column:
    """P7: ``.dt.time`` (``square_ETL.py:178``) as an 'HH:mm:ss' string
    (lexicographically ordered, so `<`/`>` comparisons match
    ``datetime.time`` ordering)."""
    return F.date_format(col, "HH:mm:ss")


def day_of_week(col) -> Column:
    """P8: pandas ``.dt.dayofweek`` — **Monday=0 .. Sunday=6**
    (``square_ETL.py:181``). Spark's ``dayofweek`` is Sun=1..Sat=7 and
    would silently shift every market label; ``weekday`` matches."""
    return F.weekday(col)


# ------------------------------------------------------------------- P9

def classify_market(dow: Column, first_trans: Column) -> Column:
    """P9: the market classification cascade (``square_ETL.py:185-190``).

    The reference is four sequential ``np.where`` overwrites where the
    LAST matching write wins; the branches are tested here in reverse
    priority so the ``when`` chain reproduces that. The 07:00:00-exact
    edge matches neither Saturday market (strict ``<`` / ``>``) and
    falls through to 'other' — replicated exactly.

    ``dow`` is pandas-convention weekday (Mon=0); ``first_trans`` an
    'HH:mm:ss' string (see :func:`extract_time`).
    """
    seven = F.lit("07:00:00")
    return (
        F.when((dow == 6) & (first_trans > seven), F.lit("San Rafael Sunday"))
        .when((dow == 6) & (first_trans < seven), F.lit("Alameda Antique Faire"))
        .when(dow == 5, F.lit("Danville Farmers Market"))
        .when(dow == 3, F.lit("San Rafael Thurs"))
        .otherwise(F.lit("other"))
    )


# ------------------------------------------------------------- P10-P15

def derive_total(subtotal: Column, shipping: Column) -> Column:
    """P10: ``total_dollars = subtotal + shipping_price``
    (``shopify_ETL.py:160``). NULL shipping ⇒ NULL total — SQL NULL
    propagation mirrors the reference's NaN propagation."""
    return subtotal + shipping


def cents_to_dollars(col) -> Column:
    """N6: integer cents → float dollars (``square_ETL.py:128,132-133``)."""
    return F.col(col) / F.lit(100.0) if isinstance(col, str) else col / F.lit(100.0)


def cast_external_id(col) -> Column:
    """P11: text cast of numeric external ids at join time
    (``arima_models.py:101,116``)."""
    return F.col(col).cast("string") if isinstance(col, str) else col.cast("string")


def week_trunc(col) -> Column:
    """P12: ``date_trunc('week', ts)`` — ISO weeks, Monday 00:00; Spark
    and Postgres agree (``arima_models.py:80``)."""
    return F.date_trunc("week", col)
