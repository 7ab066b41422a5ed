"""Streaming CDC ingest: a change stream driving an SCD2 dimension.

``foreachBatch`` is the right Spark shape for this: the dimension
rewrite is a BATCH merge (anti-join + union, ops/merge.scd2_apply),
and Structured Streaming's micro-batch boundary gives it transactional
framing — each batch applies exactly once per checkpoint, and a
restart resumes from the last committed offset without re-applying
(tests prove resume-with-new-files applies only the new batch).

Determinism: the effective timestamp of each applied batch is the
batch's max event time, not wall clock, so replaying the same input
produces a bit-identical dimension.

Scale: the rewrite touches the whole dimension per batch — fine for
dimension-sized tables (the SCD2 use case). At 100 TB fact scale you
would never SCD2 a fact table; for big dims, partition the dimension
on a stable key hash and rewrite only partitions containing batch
keys.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.utils import AnalysisException

from ..ops.merge import scd2_apply


def _latest_per_key(batch: DataFrame, key: str | list[str],
                    ts_col: str) -> DataFrame:
    """Resolve intra-batch duplicates: last change per key wins
    (ts desc, then deterministic tiebreak on the remaining columns).
    ``key`` may be a composite — the window partitions by ALL key
    columns; partitioning by only the first would silently drop every
    other change sharing that prefix before the merge."""
    key_cols = [key] if isinstance(key, str) else list(key)
    order = [F.col(ts_col).desc()] + [
        F.col(c).desc()
        for c in batch.columns if c not in (*key_cols, ts_col)
    ]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        batch.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def _empty_dim(updates: DataFrame, ts_col: str) -> DataFrame:
    """Zero-row dimension with the SCD2 schema implied by the update
    schema (tracked cols + valid_from/valid_to/is_current)."""
    return (
        updates.drop(ts_col)
        .withColumn("valid_from", F.lit(None).cast("timestamp"))
        .withColumn("valid_to", F.lit(None).cast("timestamp"))
        .withColumn("is_current", F.lit(True))
        .limit(0)
    )


def apply_scd2_batch(batch: DataFrame, dim_path: str, key: str,
                     tracked_cols: list[str], ts_col: str = "ts") -> None:
    """Apply one change batch to the parquet dimension at ``dim_path``
    (read → merge → write-to-tmp → atomic swap, so a crashed apply
    never leaves a half-written dimension)."""
    if batch.isEmpty():
        return
    spark = batch.sparkSession
    updates = _latest_per_key(batch, key, ts_col)
    effective = batch.agg(F.max(ts_col)).first()[0]
    try:
        dim = spark.read.parquet(dim_path)
    except AnalysisException:
        dim = _empty_dim(updates, ts_col)
    new_dim = scd2_apply(dim, updates.drop(ts_col), key, effective, tracked_cols)

    tmp, trash = dim_path + "__tmp", dim_path + "__old"
    shutil.rmtree(tmp, ignore_errors=True)
    new_dim.write.mode("overwrite").parquet(tmp)
    if os.path.exists(dim_path):
        shutil.rmtree(trash, ignore_errors=True)
        os.rename(dim_path, trash)
        os.rename(tmp, dim_path)
        shutil.rmtree(trash)
    else:
        os.rename(tmp, dim_path)


def scd2_sink(changes: DataFrame, dim_path: str, checkpoint_dir: str,
              key: str, tracked_cols: list[str], ts_col: str = "ts"):
    """Drive a change stream into an SCD2 dimension. Returns the
    started StreamingQuery; the checkpoint makes batch application
    resumable and effectively-once."""
    return (
        changes.writeStream
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(
            lambda b, _id: apply_scd2_batch(b, dim_path, key, tracked_cols, ts_col)
        )
        .start()
    )


def apply_upsert_batch(batch: DataFrame, wh, table: str,
                       keys: list[str], ts_col: str = "ts",
                       delete_col: str | None = None,
                       mode: str = "cow",
                       branch: str | None = None) -> None:
    """Apply one change batch as a row-level MERGE into the
    tx-managed warehouse table (SCD1 / latest-state mirror — the
    other standard CDC target besides SCD2): intra-batch duplicates
    resolve to the last change per key, then
    ``Warehouse.merge_tx`` publishes the merge as one copy-on-write
    REWRITE record. REPLAY-IDEMPOTENT by the merge algebra alone:
    re-applying a batch replaces matched rows with the same values,
    re-deletes already-absent keys (no-op), and re-inserts keys that
    are now matched (same values again) — so at-least-once delivery
    needs no batch-id ledger here, unlike the additive count-min
    sink."""
    if batch.isEmpty():
        return
    updates = _latest_per_key(batch, keys, ts_col).drop(ts_col)
    wh.merge_tx(table, updates, keys, delete_col=delete_col, mode=mode,
                branch=branch)


def upsert_sink(changes: DataFrame, wh, table: str, keys: list[str],
                checkpoint_dir: str, ts_col: str = "ts",
                delete_col: str | None = None, mode: str = "cow",
                branch: str | None = None):
    """Drive a change stream into a latest-state warehouse table via
    per-batch MERGE. Returns the started StreamingQuery; the
    checkpoint resumes from the last committed offset, and each
    applied batch is one tx-log version — ``table_changes`` between
    two versions IS the change feed the stream produced.

    ``mode="mor"`` applies each batch as a merge-on-read record
    (deletion vector + postimage batch, zero file rewrites) — the
    right shape for a high-frequency CDC mirror, compacted on a
    schedule; the tx_changes SOURCE reads mor records as the same
    row-level diff, so a mor mirror is still re-streamable.

    ``branch`` lands every batch on a warehouse branch
    (write-audit-publish for streams: the mirror accumulates on the
    branch invisible to main readers, an audit job validates
    read_committed_tx(branch=...), and fast_forward publishes the
    whole accumulated window as ONE atomic main version)."""
    return (
        changes.writeStream
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(
            lambda b, _id: apply_upsert_batch(
                b, wh, table, keys, ts_col, delete_col, mode, branch)
        )
        .start()
    )
