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


def hll_register_sink(batch: DataFrame, state: dict, key_col: str,
                      group_cols: list[str]) -> None:
    """``foreachBatch`` body for streaming distinct-count maintenance:
    each micro-batch's HLL registers MAX-merge into the running
    register table — the incremental form of
    :func:`zolo_spark.ops.sketches.approx_distinct`.

    ``state["registers"]`` holds the merged register frame (in
    production: a warehouse table MERGE'd on (group, idx) with
    ``register = greatest(old, new)``; here an in-memory frame so the
    stream≡batch equivalence is pytest-checkable). Because registers
    are a commutative-idempotent MAX, replayed batches (at-least-once
    sinks) cannot corrupt the count — the property that makes sketch
    maintenance safe under streaming retry semantics.
    """
    from ..ops import sketches

    regs = sketches.hll_registers(batch, key_col, group_cols)
    prev = state.get("registers")
    merged = regs if prev is None else sketches.hll_merge(prev, regs)
    # materialize the tiny (groups×m) frame so the next batch's merge
    # doesn't chain the whole stream's lineage
    state["registers"] = batch.sparkSession.createDataFrame(
        merged.collect(), merged.schema)


def streaming_distinct_counts(state: dict,
                              group_cols: list[str]) -> DataFrame:
    """Current distinct-count estimates from the maintained registers."""
    from ..ops import sketches

    return sketches.hll_estimate(state["registers"], group_cols)
