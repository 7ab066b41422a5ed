"""zolo_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
the reference warehouse (mterzolo/zolo-data-warehouse): nested-API ETL,
a star-schema warehouse, the weekly-demand relational query, grouped
time-series forecasting — re-expressed Spark-first (DataFrame / Spark
SQL / Catalyst / Structured Streaming) and extended with the
large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing).

Design notes
------------
* Everything relational is declared with the DataFrame/SQL API so
  Catalyst does predicate pushdown, column pruning, and join planning.
* Small dimensions are broadcast explicitly; fact-fact joins rely on
  AQE (enabled in :mod:`zolo_spark.session`).
* Python only runs in Arrow-batched pandas UDFs (model stage,
  multimodal stubs); the hot relational path is 100% JVM-side.
"""

__version__ = "0.1.0"
