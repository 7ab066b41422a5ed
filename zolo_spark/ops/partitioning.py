"""Partition-shape helpers.

Parquet scan parallelism follows file bytes (``maxPartitionBytes``),
which is the right default when cost ∝ bytes. The text/vector
operators break that assumption: a few MB of documents fan out into
millions of shingle grams / hash folds, so a single-file table plans
one scan task and serializes the whole CPU-bound pipeline on one
core. ``fan_out`` widens such inputs to the cluster's parallelism
before the expensive projection — one cheap shuffle of the raw rows
buys full-width execution of everything downstream.

At 100 TB the corpus arrives in thousands of files and the scan is
already wide, so ``fan_out`` is a no-op there by construction (it
only repartitions when the plan is narrower than the session's
default parallelism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` up to ``min_partitions`` (default: the
    session's ``defaultParallelism``) iff it currently plans fewer —
    never narrows an already-wide plan."""
    if df.isStreaming:  # partition shape is the source's concern
        return df
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
