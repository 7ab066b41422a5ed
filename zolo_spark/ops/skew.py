"""Skew mitigation: salted joins.

AQE's skew-join handling (on in :mod:`zolo_spark.session`) splits
oversized post-shuffle partitions automatically; explicit salting is
the deterministic fallback when one join key dominates (the classic
hot-customer / null-key problem) or when AQE can't see the skew
(e.g. broadcast-ineligible aggregations).

``salted_join``: the big side gets a uniform salt in [0, n); the
small side is exploded n ways so every (key, salt) pair exists; the
join key becomes (key, salt), spreading one hot key over n reducers.
Result is exactly the plain join's output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``key`` with the hot-key shuffle
    spread over ``n_salts`` partitions per key."""
    salted_big = big.withColumn(
        "_salt", (F.rand(seed=7) * n_salts).cast("int")
    )
    salted_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted_big.join(salted_small, [key, "_salt"], how)
    return out.drop("_salt")
