"""Streaming exact dedup: first-seen-wins over a document stream.

The batch dedup family (:mod:`zolo_spark.llm.dedup`) answers "which
docs in this corpus are dups"; the streaming form answers "is this
arriving doc new" with state bounded by an event-time watermark —
the shape an ingest firehose needs. Docs whose normalized-content
fingerprint was already seen within the watermark horizon are
dropped; state for expired horizons is reclaimed by Spark, so memory
is O(arrival rate × horizon), not O(corpus).

Unbounded-horizon dedup (the 100 TB corpus case) belongs to the
batch path instead: fingerprint/signature index maintained in the
warehouse + :func:`zolo_spark.llm.dedup.incremental_minhash_dedup`
per ingest batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..llm.text import fingerprint


def streaming_exact_dedup(docs: DataFrame, ts_col: str = "ts",
                          text_col: str = "text",
                          watermark: str = "10 minutes") -> DataFrame:
    """Drop docs whose content fingerprint already arrived within the
    watermark horizon (first arrival survives)."""
    fp = docs.withColumn("fp", fingerprint(F.col(text_col)))
    return (
        fp.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["fp"])
    )
