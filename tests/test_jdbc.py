"""JDBC sink/source option (SURVEY §2.1 S7/S8: the reference's
``to_sql`` wrote to a SQL database — ``square_ETL.py:232-233``).

Round-trips against embedded Derby (the JDBC driver that ships inside
the Spark distribution), exercising create-on-append, idempotent
append via ``dedupe_on``, and truncating overwrite.
"""

from __future__ import annotations

import datetime as dt

import pytest

from zolo_spark import schemas
from zolo_spark.warehouse import Warehouse

TBL = "square_trans"
T0 = dt.datetime(2024, 1, 1, 10, 0)


@pytest.fixture()
def rows(spark):
    want = schemas.WAREHOUSE_TABLES[TBL]
    return spark.createDataFrame(
        [("p1", T0, "AM", 10.5, 20.0, 9.5),
         ("p2", T0, "PM", 3.25, 5.0, 1.75)],
        want,
    )


def test_jdbc_roundtrip_and_idempotent_append(spark, rows, tmp_path):
    wh = Warehouse(spark, str(tmp_path))
    url = f"jdbc:derby:{tmp_path}/derby_rt;create=true"

    # append on a missing table creates it (to_sql behavior)
    wh.append(rows, TBL, dedupe_on=["payment_id"], jdbc_url=url)
    back = wh.read_jdbc(url, TBL)
    assert back.count() == 2
    assert set(back.columns) == {f.name for f in
                                 schemas.WAREHOUSE_TABLES[TBL].fields}

    # idempotent rerun: same natural keys are anti-joined away
    wh.append(rows, TBL, dedupe_on=["payment_id"], jdbc_url=url)
    assert wh.read_jdbc(url, TBL).count() == 2

    # a genuinely new key still lands
    new = spark.createDataFrame(
        [("p3", T0, "AM", 1.0, 1.0, 0.0)], schemas.WAREHOUSE_TABLES[TBL]
    )
    wh.append(new, TBL, dedupe_on=["payment_id"], jdbc_url=url)
    got = {r["payment_id"] for r in
           wh.read_jdbc(url, TBL).select("payment_id").collect()}
    assert got == {"p1", "p2", "p3"}


def test_jdbc_overwrite_replaces_rows(spark, rows, tmp_path):
    wh = Warehouse(spark, str(tmp_path))
    url = f"jdbc:derby:{tmp_path}/derby_ow;create=true"
    wh.overwrite(rows, TBL, jdbc_url=url)
    assert wh.read_jdbc(url, TBL).count() == 2
    one = spark.createDataFrame(
        [("p9", T0, "PM", 2.0, 2.0, 0.0)], schemas.WAREHOUSE_TABLES[TBL]
    )
    wh.overwrite(one, TBL, jdbc_url=url)
    out = wh.read_jdbc(url, TBL).collect()
    assert len(out) == 1 and out[0]["payment_id"] == "p9"


def test_jdbc_missing_table_raises_analysis_exception(spark, tmp_path):
    from pyspark.errors import AnalysisException

    wh = Warehouse(spark, str(tmp_path))
    url = f"jdbc:derby:{tmp_path}/derby_missing;create=true"
    with pytest.raises(AnalysisException, match="TABLE_OR_VIEW_NOT_FOUND"):
        wh.read_jdbc(url, "never_written").collect()
