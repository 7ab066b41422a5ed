"""Large-scale training-data-pipeline operators (beyond-parity).

The reference warehouse has no text/embedding tooling; these are the
operators a 100 TB LLM-data pipeline needs, built Spark-first:

* :mod:`text` — language ID, quality scoring, token counting,
  document fingerprinting (pure built-in expressions, zero UDFs).
* :mod:`dedup` — exact, MinHash+LSH, SimHash, n-gram Jaccard,
  embedding-cosine near-dup.
* :mod:`similarity` — brute-force cosine top-k (exact baseline) and
  coordinate-sign LSH bucketing (scale path).
* :mod:`classifier` — distributed logistic-regression training
  (map-side-combined gradient sums; the kmeans exchange shape) +
  codegen corpus scoring: classifier-based filtering, DCLM-style.
* :mod:`multimodal` — binary media columns with typed metadata and
  Arrow-batched decode/feature plumbing (decode stubbed: no media
  libs in this container; the Spark-side schema/batching is real).

Determinism discipline: every hash is md5-based (portable to the
DuckDB oracle), every float path is widened to float64 BEFORE
arithmetic (f32 accumulation order differs between engines).
"""
