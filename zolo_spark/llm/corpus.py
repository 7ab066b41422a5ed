"""Corpus-level operators: dup-cluster resolution, deterministic
splits, vocabulary building, quality filtering.

These close the loop on dedup: pair lists (from
:mod:`zolo_spark.llm.dedup`) become survivor sets; corpora get
reproducible train/val/test assignment and a df-ranked vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def dup_clusters(pairs: DataFrame, max_iter: int = 20) -> DataFrame:
    """Connected components over near-dup pairs → (doc_id, cluster_id)
    with cluster_id = min doc id reachable.

    Iterative min-label propagation on the undirected edge list; each
    round is one groupBy shuffle, converging in O(cluster diameter)
    rounds (near-dup clusters are shallow in practice — pairs lists
    are already transitive-ish). Driver only checks the convergence
    counter; labels never leave the cluster.
    """
    # both orientations from ONE pass over pairs: a union of two
    # selects would evaluate the (possibly expensive, e.g. full LSH)
    # upstream lineage twice
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col("doc1").alias("a"), F.col("doc2").alias("b")),
                    F.struct(F.col("doc2").alias("a"), F.col("doc1").alias("b")),
                )
            ).alias("e")
        )
        .select("e.a", "e.b")
        .distinct()
        .persist()
    )
    # round 0 fused into initialization: label(u) = min(u, min neighbor)
    # — one groupBy instead of a distinct + a full propagation round
    labels = (
        edges.groupBy(F.col("a").alias("doc_id"))
        .agg(F.min("b").alias("nbr_min"))
        .select("doc_id", F.least("doc_id", "nbr_min").alias("cluster_id"))
        .persist()
    )
    persisted = labels
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.b == labels.doc_id)
            .groupBy(F.col("a").alias("doc_id"))
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        # carry the convergence flag in the row instead of re-joining
        # the old labels afterwards: one join per round, not two
        updated = (
            labels.join(neighbor_min, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster_id"),
                    F.coalesce(F.col("nbr_min"), F.col("cluster_id")),
                ).alias("cluster_id"),
                (F.col("nbr_min") < F.col("cluster_id")).alias("_changed"),
            )
            .persist()
        )
        changed = updated.filter(F.col("_changed")).limit(1).count()
        persisted.unpersist()
        persisted = updated
        labels = updated.drop("_changed")
        if changed == 0:
            break
    edges.unpersist()
    return labels


def dedup_survivors(df: DataFrame, pairs: DataFrame,
                    id_col: str = "doc_id") -> DataFrame:
    """Keep one doc per dup cluster (min id) plus all unpaired docs —
    the materialized output of a dedup pass."""
    clusters = dup_clusters(pairs)
    losers = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    return df.join(
        losers, df[id_col] == losers.doc_id, "left_anti"
    )


def hash_split(df: DataFrame, id_col: str = "doc_id",
               weights: tuple = (0.8, 0.1, 0.1),
               names: tuple = ("train", "val", "test"),
               salt: str = "split-v1") -> DataFrame:
    """Deterministic, engine-portable split assignment: bucket =
    first 4 md5 hex chars of (salt || id) mod 10000 against cumulative
    weight thresholds. Stable under reruns, resharding, and engine —
    the property a training pipeline needs (random() is none of
    those)."""
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))),
                           1, 4), 16, 10)
        .cast("long") % 10000
    )
    acc, expr = 0.0, None
    for w, name in zip(weights, names):
        acc += w
        cond = bucket < int(acc * 10000)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return df.withColumn("split", expr.otherwise(F.lit(names[-1])))


def build_vocab(df: DataFrame, text_col: str = "text",
                top_k: int = 1000, min_df: int = 2) -> DataFrame:
    """Document-frequency-ranked vocabulary: token → df, rank.
    Deterministic rank tiebreak on the token itself."""
    tokens = df.select(
        F.explode(F.array_distinct(F.split(F.lower(F.col(text_col)), " ")))
        .alias("token")
    )
    dfreq = (
        tokens.filter(F.col("token") != "")
        .groupBy("token").agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_df)
    )
    # take top_k FIRST (distributed TakeOrdered), then rank the small
    # result — a global row_number window would funnel the whole vocab
    # through one partition
    top = dfreq.orderBy(F.col("df").desc(), F.col("token")).limit(top_k)
    w = Window.orderBy(F.col("df").desc(), F.col("token"))
    return top.withColumn("rank", F.row_number().over(w))


def quality_filter(stats: DataFrame, min_quality: float = 0.5,
                   min_tokens: int = 5, max_punct_ratio: float = 0.3) -> DataFrame:
    """Threshold filter over :func:`zolo_spark.llm.text.text_stats`
    output — the standard pre-training corpus gate."""
    return stats.filter(
        (F.col("quality") >= min_quality)
        & (F.col("n_tokens_ws") >= min_tokens)
        & (F.col("punct_ratio") <= max_punct_ratio)
    )
