"""Lexical retrieval over the corpus: BM25 scoring and top-k.

Embedding ANN (:mod:`zolo_spark.llm.similarity`) covers the dense
side of retrieval; this module is the sparse/lexical side — the
Okapi BM25 ranking function (Robertson & Zaragoza 2009, the Lucene
default) used for corpus search, dedup-candidate mining, and
decontamination lookups.

Scale design:

* Corpus statistics (N, average document length) are one tiny
  aggregate, **broadcast** to every executor.
* The query's term list is a literal ``isin`` filter applied to the
  exploded token stream BEFORE any shuffle, so only occurrences of
  query terms (a vanishing fraction of 100 TB) ever reach the
  per-(doc, term) aggregate.
* Document length rides along the explode (no join back to the
  corpus), per-term document frequencies are a second tiny broadcast,
  and the final top-k is a ``TakeOrdered`` — never a global sort.
* Cross-engine exactness: per-(doc, term) scores are rounded to 6
  decimals and summed as DECIMAL (order-independent), the final
  score rounded to 4; ordering uses the rounded score with doc id as
  the deterministic tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

K1 = 1.2
B = 0.75


def bm25_topk(df: DataFrame, terms: list[str], k: int = 10,
              text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Top-``k`` documents for a bag-of-words query under BM25
    (k1=1.2, b=0.75, Lucene idf ``ln(1 + (N-df+0.5)/(df+0.5))``).
    Returns ``(id_col, score)``, best first.
    """
    if not terms:
        raise ValueError("need at least one query term")
    toks = F.split(F.lower(F.col(text_col)), " ")
    base = df.select(F.col(id_col), F.size(toks).alias("dl"),
                     F.explode(toks).alias("token"))
    stats = df.select(F.size(toks).alias("dl")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_dl"),
    )
    hits = base.filter(F.col("token").isin(list(terms)))
    dfreq = hits.groupBy("token").agg(
        F.countDistinct(id_col).alias("df_t")
    )
    tf = hits.groupBy(id_col, "token").agg(
        F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl")
    )
    scored = (
        tf.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(stats))
        .select(
            id_col,
            F.round(
                F.log(
                    1.0
                    + (F.col("n_docs") - F.col("df_t") + 0.5)
                    / (F.col("df_t") + 0.5)
                )
                * (F.col("tf") * (K1 + 1))
                / (
                    F.col("tf")
                    + K1
                    * (
                        1
                        - B
                        + B
                        * F.col("dl")
                        / (
                            F.col("total_dl").cast("double")
                            / F.col("n_docs")
                        )
                    )
                ),
                6,
            )
            .cast("decimal(28,6)")
            .alias("term_score"),
        )
    )
    # The exact DECIMAL sum is cast straight to double (deterministic
    # IEEE conversion) — re-rounding the sum to fewer decimals would
    # reintroduce engine-dependent midpoint behavior (a sum of
    # round-6 terms can land exactly on a 4-decimal midpoint).
    return (
        scored.groupBy(id_col)
        .agg(F.sum("term_score").cast("double").alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )
