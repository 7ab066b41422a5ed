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


def plan_size_estimate(df: DataFrame) -> int:
    """Catalyst's sizeInBytes estimate of the optimized plan — FREE
    (no Spark job). Used only to pick between bit-identical plans, so
    estimate error costs time, never correctness."""
    return int(df._jdf.queryExecution().optimizedPlan()
               .stats().sizeInBytes())


def _max_partition_bytes(spark) -> int:
    """``spark.sql.files.maxPartitionBytes`` as an exact byte count
    however the conf string spells it."""
    try:
        return int(spark._jsparkSession.sessionState().conf()
                   .filesMaxPartitionBytes())
    except Exception:
        return 128 * 1024 * 1024


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` up to ``min_partitions`` (default: the
    session's ``defaultParallelism``) iff it currently plans fewer —
    never narrows an already-wide plan.

    A frame whose FREE Catalyst estimate clears
    ``target × maxPartitionBytes`` short-circuits untouched: at that
    size it necessarily executes wide (scans split files at
    ``maxPartitionBytes``; AQE's parallelism-first coalescing keeps
    post-shuffle frames that big near session parallelism), and the
    short-circuit avoids ``df.rdd`` — which under AQE MATERIALIZES
    every upstream shuffle/broadcast stage just to read the partition
    count. On a derived frame at deploy scale that would run most of
    the query twice; the estimate check caps the probe's cost at one
    small materialization by construction."""
    if df.isStreaming:  # partition shape is the source's concern
        return df
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if plan_size_estimate(df) >= target * _max_partition_bytes(
            df.sparkSession):
        return df
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def fan_out_heavy(df: DataFrame,
                  min_partitions: int | None = None) -> DataFrame:
    """:func:`fan_out` for frames feeding HEAVY compute (pairwise
    folds, Arrow-UDF matmuls), decided purely from Catalyst's FREE
    ``sizeInBytes`` estimate — never ``df.rdd``, which under AQE
    materializes every upstream shuffle/broadcast stage just to read
    the partition count (measured: one ``fan_out`` on a semi-join
    lineage = three concurrent ~0.5 s jobs in the capstone, thrown
    away and re-run by the real action).

    Decision: estimate under ``target × maxPartitionBytes`` ⇒
    repartition. Why that threshold is safe in both directions: a
    frame estimated LARGER necessarily executes wide already — scans
    split files at ``maxPartitionBytes``, and AQE's parallelism-first
    coalescing keeps post-shuffle frames that size near the session
    parallelism — so skipping the repartition never strands a big
    frame narrow. A frame estimated smaller gets one sub-
    ``target×128 MB`` exchange, trivial next to the compute these
    sites feed (a false positive costs that exchange; at 100 TB the
    estimate is corpus-sized, so the branch never fires). NOT for
    cheap-per-row sites: there the forced width costs more than it
    buys (the r14 ``fan_out_small`` lesson) — use :func:`fan_out`.
    """
    if df.isStreaming:
        return df
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if plan_size_estimate(df) < target * _max_partition_bytes(spark):
        return df.repartition(target)
    return df


def fan_out_small(df: DataFrame,
                  min_partitions: int | None = None) -> DataFrame:
    """:func:`fan_out` for CPU-bound per-row operators: ALSO pins the
    width of a statically-wide but TINY frame.

    A post-shuffle frame statically plans ``shuffle.partitions``-wide,
    but AQE's runtime coalescing (``parallelismFirst`` floors at
    ``minPartitionSize`` = 1 MB) merges a small frame far below the
    session parallelism — and then every downstream per-row operator
    (regex stats, codec kernels, hash folds, shingle hashing)
    executes on a handful of cores no matter what the static plan
    said. A frame whose optimizer estimate is under ``target``
    advisory-floor partitions is therefore force-repartitioned: a
    false positive costs one sub-MB exchange, a false negative keeps
    the existing layout, and at real scale the estimate is
    corpus-sized so the branch never fires. Unlike :func:`fan_out`
    this may override a deliberately wider layout, so it belongs
    directly above expensive per-row compute, not in generic plumbing.
    """
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    # same big-estimate short-circuit as fan_out: definitely wide, and
    # df.rdd on a big derived frame would materialize upstream stages
    if plan_size_estimate(df) >= target * _max_partition_bytes(
            df.sparkSession):
        return df
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    if plan_size_estimate(df) < target * (1 << 20):
        return df.repartition(target)
    return df


def zorder_key(bin_cols: list, bits: int = 8):
    """Morton (Z-order) key over pre-binned integer dimensions — the
    multi-dimensional clustering key behind Delta's OPTIMIZE ZORDER
    and the layout a 100 TB warehouse wants when queries filter on
    several columns at once: sorting files by the interleaved key
    keeps every dimension's value range TIGHT within each file, so
    min/max file statistics prune scans on ANY filtered dimension,
    not just the leading sort column.

    ``bin_cols`` are integer columns already normalized to
    ``[0, 2^bits)`` (use :func:`~zolo_spark.ops.sketches.
    histogram_bins`-style bucketing for doubles). The interleave is a
    sum of ``bits × len(bin_cols)`` pure-integer terms —
    ``((col // 2^i) % 2) · 2^(i·D + d)`` — whole-stage codegen in
    Spark and byte-identical in ANSI SQL, no UDF.
    """
    from pyspark.sql import functions as F

    d_count = len(bin_cols)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for d, c in enumerate(bin_cols):
            bit = F.shiftright(c.cast("long"), i) % 2
            z = z + bit * F.lit(1 << (i * d_count + d)).cast("long")
    return z


def zorder_layout_stats(df: DataFrame, bin_cols: list[str],
                        bits: int = 8, file_bits: int = 8) -> DataFrame:
    """Per-"file" min/max bounds of every dimension after Z-order
    layout: keys are bucketed into ``2^file_bits`` contiguous z-ranges
    (a stand-in for range-partitioned files) and each bucket reports
    its per-dimension bounds — exactly the footer statistics a reader
    would prune against. Deterministic and SQL-replayable; the
    locality property (bounded per-bucket ranges on EVERY dimension)
    is pinned by pytest."""
    from pyspark.sql import functions as F

    z = zorder_key([F.col(c) for c in bin_cols], bits)
    total_bits = bits * len(bin_cols)
    bucket = F.shiftright(z, max(total_bits - file_bits, 0))
    aggs = []
    for c in bin_cols:
        aggs += [F.min(c).alias(f"{c}_lo"), F.max(c).alias(f"{c}_hi")]
    return (df.select(bucket.alias("zbucket"), *bin_cols)
            .groupBy("zbucket")
            .agg(F.count(F.lit(1)).alias("n"), *aggs))
