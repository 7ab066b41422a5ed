"""Skew mitigation: salted joins.

AQE's skew-join handling (on in :mod:`zolo_spark.session`) splits
oversized post-shuffle partitions automatically; explicit salting is
the deterministic fallback when one join key dominates (the classic
hot-customer / null-key problem) or when AQE can't see the skew
(e.g. broadcast-ineligible aggregations).

``salted_join``: the big side gets a uniform salt in [0, n); the
small side is exploded n ways so every (key, salt) pair exists; the
join key becomes (key, salt), spreading one hot key over n reducers.
For big-side-preserving joins (inner / left / left_semi / left_anti)
the result is exactly the plain join's output; right/full outer would
emit each unmatched small-side row once per salt, so they are
rejected rather than silently wrong.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# joins where every output row is driven by the (un-exploded) big side,
# so the n_salts-way explosion of the small side can't duplicate output
_SAFE_HOW = {"inner", "left", "leftouter", "left_outer",
             "left_semi", "leftsemi", "semi",
             "left_anti", "leftanti", "anti"}


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``key`` with the hot-key shuffle
    spread over ``n_salts`` partitions per key.

    ``how`` must be big-side-preserving (inner/left/semi/anti):
    unmatched small-side rows exist ``n_salts`` times after the
    explosion, so right/full outer joins would duplicate them.
    """
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in _SAFE_HOW}:
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, got {how!r}: "
            "right/full outer would emit unmatched small-side rows once per salt"
        )
    salted_big = big.withColumn(
        "_salt", (F.rand(seed=7) * n_salts).cast("int")
    )
    salted_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted_big.join(salted_small, [key, "_salt"], how)
    return out.drop("_salt")


def skew_profile(df: DataFrame, key: str, k: int = 20) -> DataFrame:
    """Hot-key diagnosis: the ``k`` heaviest values of ``key`` with
    their counts, corpus share, and ratio to the mean key frequency —
    the measurement that decides between a plain shuffle join,
    :func:`salted_join`, or dropping a pathological key outright.

    Shape at scale: one map-side-combined groupBy over the fact, a
    single-row total broadcast back over the (distinct-key-sized)
    counts, then a distributed TakeOrdered top-k — no global sort, no
    windows, nothing driver-side.
    """
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").alias("_total"), F.count(F.lit(1)).alias("_n_keys")
    )
    return (
        counts.join(F.broadcast(totals))
        .select(
            key, "cnt",
            F.round(F.col("cnt") / F.col("_total").cast("double"), 6)
            .alias("share"),
            F.round(
                F.col("cnt")
                / (F.col("_total").cast("double") / F.col("_n_keys")), 4
            ).alias("ratio_to_mean"),
        )
        .orderBy(F.col("cnt").desc(), F.col(key))
        .limit(k)
    )


def targeted_salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    max_hot_keys: int = 64,
    how: str = "inner",
    candidates: DataFrame | None = None,
    cm_width: int | None = None,
) -> DataFrame:
    """Skew join that salts ONLY the hot keys: detect the heaviest
    ``max_hot_keys`` values of ``key`` with the count-min sketch
    (:func:`zolo_spark.ops.sketches.cm_heavy_hitters` — fixed-size
    summary, no exact per-key groupBy), route those rows through
    :func:`salted_join` while the cold long tail takes the plain join.

    This is the production shape at 100 TB: blanket salting explodes
    the WHOLE small side ``n_salts``× (n× shuffle volume for keys that
    never needed it); targeted salting explodes only the ≤
    ``max_hot_keys`` hot keys' dimension rows, so the extra shuffle
    volume is O(hot_keys × n_salts) rows regardless of corpus size.
    The only driver exchange is the ≤``max_hot_keys`` hot-key list.

    ``candidates`` bounds the hot-key probe.  The default is the
    SMALL side's keys — a distinct over the dimension frame, never a
    corpus-wide exchange.  A hot big-side key absent from ``small``
    then takes the cold path: the output is still exactly the plain
    join's (pytest-pinned for every big-side-preserving ``how``), it
    just isn't salted — pass an explicit ``candidates`` frame (e.g.
    the current batch's keys) if unmatched hot keys dominate the
    shuffle too.

    Count-min caveat: estimates are one-sided (never UNDER-count), so
    a genuinely hot candidate can't be missed by under-estimation, but
    collided COLD keys can be OVER-estimated above a real hot key and
    evict it from the top-``max_hot_keys`` list when distinct-key
    cardinality far exceeds the sketch's ``depth × width`` cells.  The
    evicted key takes the unsalted cold path — output stays correct,
    only the skew mitigation degrades.  Size ``cm_width`` toward the
    candidate cardinality (default ``sketches.CM_WIDTH`` = 256 cells ×
    4 rows) for high-cardinality keys.
    """
    from .sketches import CM_DEPTH, CM_WIDTH, cm_heavy_hitters

    if how.lower().replace("_", "") not in {h.replace("_", "")
                                            for h in _SAFE_HOW}:
        raise ValueError(
            f"targeted_salted_join supports inner/left/semi/anti, got "
            f"{how!r}: right/full outer would duplicate unmatched "
            "small-side rows once per salt")
    if candidates is None:
        candidates = small.select(key)
    hot = [r[key] for r in
           cm_heavy_hitters(big, key, [], k=max_hot_keys,
                            depth=CM_DEPTH,
                            width=cm_width or CM_WIDTH,
                            candidates=candidates).collect()]
    if not hot:
        return big.join(small, key, how)
    big_hot = big.filter(F.col(key).isin(hot))
    big_cold = big.filter(~F.col(key).isin(hot) | F.col(key).isNull())
    small_hot = small.filter(F.col(key).isin(hot))
    cold = big_cold.join(small, key, how)
    hot_joined = salted_join(big_hot, small_hot, key, n_salts, how)
    return cold.unionByName(hot_joined)
