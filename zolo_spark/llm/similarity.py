"""Similarity search over embedding columns.

* :func:`brute_topk` — exact cosine top-k: broadcast the (small) query
  set against the corpus; one scan, no shuffle except the final
  per-query top-k. The correctness baseline.
* :func:`ivf_topk` — IVF-flat scale path: corpus pre-assigned to the
  nearest of C centroids (one shuffle at build time, reusable);
  queries probe only the ``nprobe`` nearest partitions — the classic
  recall/throughput dial. Centroid assignment is a broadcast
  argmax, Arrow-batched via pandas UDF (numpy matmul beats 64 HOF
  folds per row).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F, types as T

from ..ops.partitioning import fan_out
from .dedup import cosine


def brute_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
               vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Exact top-k neighbors for every query vector.

    Ranking uses the ROUNDED cosine with id tiebreak so results are
    stable across engines and runs (raw f64 ties at 1e-16 would make
    rank nondeterministic).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = fan_out(corpus).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 4).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _assign_udf(centroids: np.ndarray, nprobe: int):
    """Pandas UDF: indices of the ``nprobe`` nearest (cosine)
    centroids per vector — one numpy matmul per Arrow batch."""
    cn = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def assign(vs: pd.Series) -> pd.Series:
        m = np.stack(vs.to_numpy())
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = m @ cn.T
        top = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
        return pd.Series([row.astype("int32").tolist() for row in top])

    return assign


def train_centroids(corpus_sample: np.ndarray, n_centroids: int,
                    iters: int = 5, seed: int = 42) -> np.ndarray:
    """Deterministic Lloyd k-means on a driver-side sample (the
    standard IVF recipe: train on a sample, assign at scale)."""
    rng = np.random.default_rng(seed)
    x = corpus_sample / np.maximum(
        np.linalg.norm(corpus_sample, axis=1, keepdims=True), 1e-12
    )
    cent = x[rng.choice(len(x), size=n_centroids, replace=False)]
    for _ in range(iters):
        sims = x @ cent.T
        assign = np.argmax(sims, axis=1)
        for c in range(n_centroids):
            members = x[assign == c]
            if len(members):
                v = members.mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    return cent


def ivf_index(corpus: DataFrame, centroids: np.ndarray,
              vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Assign every corpus vector to its nearest centroid (list index
    0 of a 1-probe assignment). At scale this is written out
    partitioned by ``cell`` so probes prune partitions."""
    assign = _assign_udf(centroids, 1)
    return corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
        F.element_at(assign(F.col(vec_col)), 1).alias("cell"),
    )


def ivf_topk(index: DataFrame, queries: DataFrame, centroids: np.ndarray,
             k: int = 10, nprobe: int = 3,
             vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Probe the ``nprobe`` nearest cells per query, exact cosine
    within them, top-k. Approximate: recall depends on nprobe/C."""
    assign = _assign_udf(centroids, nprobe)
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        F.explode(assign(F.col(vec_col))).alias("cell"),
    )
    scored = (
        index.join(F.broadcast(q), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 4).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
