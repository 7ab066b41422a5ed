"""Spark 4 Python DataSource connector tests (executor-parallel pages)."""

from __future__ import annotations

from pyspark.sql import types as T

from zolo_spark.sources.api_datasource import PagedApiDataSource

SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("name", T.StringType()),
    T.StructField("value", T.DoubleType()),
])


def test_paged_api_reads_all_pages_in_parallel(spark):
    spark.dataSource.register(PagedApiDataSource)
    df = (
        spark.read.format("paged_api").schema(SCHEMA)
        .option("fetcher", "tests.fixtures:gen_page_fetcher")
        .option("total", "230").option("page_size", "50")
        .load()
    )
    assert df.rdd.getNumPartitions() >= 2  # pages spread over partitions
    rows = df.collect()
    assert len(rows) == 250  # 5 pages x 50 (fetcher pads the last page)
    assert {r["id"] for r in rows} == set(range(250))


def test_paged_api_requires_schema(spark):
    spark.dataSource.register(PagedApiDataSource)
    import pytest

    with pytest.raises(Exception, match="schema"):
        (spark.read.format("paged_api")
         .option("fetcher", "tests.fixtures:gen_page_fetcher")
         .option("total", "10").load())
