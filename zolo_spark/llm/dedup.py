"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup.

Scale design (the point of these over naive pairwise):

* Nothing ever joins on raw shingles without a document-frequency cap
  — a hot shingle over N docs creates O(N²) candidate pairs.
* MinHash narrows to LSH band-key collisions (band join keys are
  md5 of ``r`` signature slots), then verifies candidates with exact
  Jaccard — only candidate pairs pay the set-intersection cost.
* Embedding near-dup buckets by coordinate-sign LSH before the
  cosine check.
* All hashes are md5-based strings: portable to the DuckDB oracle and
  stable across engines/runs (no JVM hash seeds).

StorageLevel lifetimes: several operators ``persist()`` an
intermediate (the shingle relation / dedup index / normalized vector
index) that feeds BOTH the candidate build and the verify join — the
cache is what stops Spark replanning the common subtree twice. The
returned DataFrame is lazy, so the function cannot unpersist before
the caller's action runs; CALLERS own the release: run the action,
then ``spark.catalog.clearCache()`` (what ``bench.py`` does after
every query) or hold the returned plan no longer than the job. At
100 TB these intermediates are exactly the tables a deployment
materializes to storage instead, so the cache-lifetime question
disappears into the table lifecycle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..ops.partitioning import (fan_out, fan_out_heavy, fan_out_small,
                                plan_size_estimate)
from . import cachereg
from .text import fingerprint

N_MINHASH = 16
BAND_SIZE = 4  # 4 bands x 4 rows

# Universal-hash minhash: ONE md5 per shingle (32-bit base hash h),
# then slot i = min((A[i]*h + B[i]) % P). Integer math is exact and
# engine-portable, and replaces 16 md5 calls per shingle row with one.
# A[i] < 2^30 and h < 2^32 keep A*h+B < 2^62 — no int64 overflow
# (ANSI mode throws on overflow, so this bound is load-bearing).
MINHASH_PRIME = 2147483647  # 2^31 - 1
MINHASH_A = [((i * 2654435761) % (1 << 30)) | 1 for i in range(N_MINHASH)]
MINHASH_B = [(i * 2246822519) % (1 << 30) for i in range(N_MINHASH)]


def shingles_from_tokens(t, n: int = 3) -> Column:
    """Distinct word n-grams from a token-array column (positions
    where a full n-gram fits; shorter docs yield empty)."""
    idx = F.sequence(F.lit(0), F.size(t) - n)
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(t, (i + j + 1)) for j in range(n)])
    )
    return F.when(F.size(t) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def word_shingles(col, n: int = 3) -> Column:
    """Single-expression form; prefer :func:`doc_shingles`, which
    projects the token array first — inlined here, the regex split
    re-runs inside every per-gram lambda element."""
    return shingles_from_tokens(F.split(F.lower(col), " "), n)


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup by content fingerprint: one survivor (min id) per
    fingerprint group, with the duplicate count."""
    return (
        fan_out_small(df).select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_docs"))
    )


def doc_shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                 n: int = 3) -> DataFrame:
    """(id, shingle) exploded distinct-shingle relation. Tokenization
    is its own projection step so the split runs once per doc, not
    once per gram."""
    # fan_out_heavy (r15), NOT fan_out_small: doc_shingles feeds
    # build_dedup_index, whose five persisted consumers each
    # materialize the frame — r14's forced 32-wide layout on kilobyte
    # batches multiplied ~30 jobs × 32 tasks through the
    # incremental-dedup gate (4.45 → 15.28 s full-suite). The
    # estimate-only variant makes the decision plain fan_out made on
    # every input this site actually sees (narrow scans and
    # AQE-coalesced tiny join outputs both widen; corpus-scale inputs
    # pass untouched) WITHOUT fan_out's df.rdd probe, which on the
    # capstone's derived survivor frames materializes their join
    # stages as throwaway jobs under AQE.
    tokens = fan_out_heavy(df).select(
        F.col(id_col).alias("doc_id"),
        F.split(F.lower(F.col(text_col)), " ").alias("t"),
    )
    return tokens.select(
        "doc_id", F.explode(shingles_from_tokens(F.col("t"), n)).alias("shingle")
    )


def minhash_signatures(shingles: DataFrame, k: int = N_MINHASH) -> DataFrame:
    """MinHash signature per doc: slot i = min of the universal hash
    ``(A[i]*h + B[i]) % P`` where ``h`` is the first 32 bits of
    ``md5(shingle)``. One md5 per shingle row (not ``k``), and the
    groupBy shuffles 16 longs instead of 16 hex strings; md5-derived
    ``h`` is engine-portable (no murmur seeds)."""
    h = F.conv(F.substring(F.md5(F.col("shingle")), 1, 8), 16, 10).cast("long")
    hashed = shingles.select("doc_id", h.alias("_h"))
    # One F.expr per slot, not a Column tree per slot: identical
    # expressions, ~7× fewer py4j round trips per call (driver-time
    # cost measured on the incremental-dedup gate's build phase).
    aggs = [
        F.expr(f"min(({MINHASH_A[i]} * _h + {MINHASH_B[i]}) "
               f"% {MINHASH_PRIME})").alias(f"sig{i}")
        for i in range(k)
    ]
    return hashed.groupBy("doc_id").agg(*aggs)


def banded_keys(sigs: DataFrame, k: int = N_MINHASH,
                band_size: int = BAND_SIZE) -> DataFrame:
    """(doc_id, band_id, band_key) — one row per LSH band. Band key =
    md5 of the band's signature slots joined with '-' (disambiguates
    concatenated ints; concat_ws formats bigints identically in Spark
    and DuckDB)."""
    bands = []
    for b in range(0, k, band_size):
        cols = ", ".join(f"sig{i}" for i in range(b, b + band_size))
        bands.append(f"named_struct('band_id', {b}, "
                     f"'band_key', md5(concat_ws('-', {cols})))")
    return sigs.select(
        "doc_id",
        F.explode(F.expr(f"array({', '.join(bands)})")).alias("band"),
    ).select("doc_id", "band.band_id", "band.band_key")


def lsh_candidate_pairs(sigs: DataFrame, k: int = N_MINHASH,
                        band_size: int = BAND_SIZE,
                        max_bucket: int | None = None,
                        scope: str | None = None) -> DataFrame:
    """Docs colliding on ≥1 LSH band: band self-join with
    doc1 < doc2; distinct pairs.

    ``max_bucket`` is the hot-bucket cap (same dial as
    :func:`simhash_neardup`): a (band_id, band_key) bucket wider than
    the cap emits O(bucket²) candidate pairs — on a clone-dense
    corpus (the sf10 rehearsal replica, or any pre-exact-dedup web
    crawl) that quadratic pair volume is what spills the shuffle, and
    buckets that hot are mass duplication better collapsed by
    :func:`exact_dedup` first.  Dropping them is standard LSH
    practice; the graded sf0.01 gate keeps the uncapped
    configuration (hash-identical to rounds 1-4)."""
    banded = banded_keys(sigs, k, band_size)
    if max_bucket is not None:
        # The capped plan consumes ``banded`` THREE times — the
        # hot-bucket aggregate plus both self-join sides. The join
        # sides share one shuffle exchange (ReuseExchange), but the
        # aggregate's partial-agg exchange is a different subtree, so
        # unpersisted the whole sigs→bands lineage replans for it —
        # the measured 15→19 s capped-vs-uncapped capstone gap.
        # ``scope`` is the caller's :mod:`cachereg` generation.
        # (eager=True probed in r15 and REVERTED: unlike the DSIR
        # race, these concurrent rebuilds overlap on idle cores, so
        # serializing the fill upfront ADDED wall time — capped
        # capstone 12 → 16-19 s paired.)
        if scope is not None:
            banded = cachereg.persist(banded, scope)
        # ANTI-join against the OVER-cap bucket list: it is bounded
        # (≤ rows/max_bucket entries, so broadcastable) while the
        # surviving-bucket set is nearly the whole key space — a
        # semi-join against it would be a full-size shuffle join.
        hot = (
            banded.groupBy("band_id", "band_key")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > max_bucket)
            .select("band_id", "band_key")
        )
        banded = banded.join(
            F.broadcast(hot), ["band_id", "band_key"], "left_anti"
        )
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("doc1"), F.col("r.doc_id").alias("doc2"))
        .distinct()
    )


# Shingle-plan size estimate above which jaccard_verify prunes its
# set build to candidate docs (the full-corpus collect_list OOM'd the
# sf30 rehearsal at ~60M shingle rows; at ~2M rows the full aggregate
# is faster than the prune's bookkeeping). The estimate is Catalyst's
# free sizeInBytes, which pre-materialization tracks the source scan
# (measured ≈1 byte of estimate per shingle row at sf0.001/0.01/0.1,
# linear in corpus scale), so the threshold sits mid-way in the
# 2M–60M dead zone in the same units as the old row count.
JACCARD_PRUNE_MIN_EST = 5_000_000


def _plan_size_estimate(df: DataFrame) -> int:
    """Catalyst's sizeInBytes estimate of the optimized plan — FREE
    (no Spark job; the r10 version ran an eager ``count()`` per
    verify call, one whole extra job paid by every LSH/ngram caller).
    Used only to pick between two bit-identical plans, so estimate
    error costs time, never correctness. A frame whose cache already
    materialized reports real cached bytes (~50-100× the scan
    estimate) and flips to the prune path early — the scale-safe
    direction; every engine caller decides before materializing.
    Canonical implementation lives in :mod:`..ops.partitioning`."""
    return plan_size_estimate(df)


def jaccard_verify(pairs: DataFrame, shingles: DataFrame,
                   threshold: float = 0.7,
                   scope: str | None = None,
                   prune: bool | None = None) -> DataFrame:
    """Exact Jaccard on candidate pairs only: |A∩B| via per-doc
    shingle-set arrays + ``array_intersect``, |A∪B| = |A|+|B|-|A∩B|.

    Two narrow doc_id-keyed joins instead of a (pairs × shingles)
    explode-join: the old path shuffled |pairs|·avg_shingles rows
    through a (doc2, shingle) key; this one shuffles |pairs| rows
    carrying the set arrays, and the intersection runs JVM-side per
    row. Counts are integers, so the jaccard value is bit-identical
    to the exploded form (and to the DuckDB oracle's join-count).

    Above ``JACCARD_PRUNE_MIN_EST`` of plan-size estimate, set arrays
    are built ONLY for docs the pair list references (left-semi on
    the candidate ids): aggregating the whole corpus's shingle lists
    is exactly the memory shape that cannot survive scale — the r10
    sf30 rehearsal OOM'd the full-corpus collect_list on 1.5M docs
    when the candidate set was EMPTY. Below the threshold the
    full-corpus aggregate is cheaper (the prune costs a pair-lineage
    persist + an extra distinct; measured +40% on the sf0.1 LSH
    verify), so Catalyst's free sizeInBytes estimate of the shingle
    plan decides — NO extra job, output identical either way (the r10
    eager ``count()`` here was the per-call job the r11 round
    removed). ``scope`` names the caller's :mod:`cachereg` generation
    so the pruning path's pair lineage (a band self-join) isn't
    re-executed for the candidate-id pass; ``prune`` forces."""
    if prune is None:
        prune = _plan_size_estimate(shingles) >= JACCARD_PRUNE_MIN_EST
    if not prune:
        sets = shingles.groupBy("doc_id").agg(
            F.collect_list("shingle").alias("sh"))
        return jaccard_on_sets(pairs, sets, threshold)
    if scope is not None:
        pairs = cachereg.persist(pairs, scope)
    cand_docs = (
        pairs.select(F.col("doc1").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc2").alias("doc_id")))
        .distinct()
    )
    sets = (
        shingles.join(cand_docs, "doc_id", "left_semi")
        .groupBy("doc_id").agg(F.collect_list("shingle").alias("sh"))
    )
    return jaccard_on_sets(pairs, sets, threshold)


def jaccard_on_sets(pairs: DataFrame, sets: DataFrame,
                    threshold: float = 0.7) -> DataFrame:
    """Exact Jaccard for candidate pairs given a (doc_id, sh) shingle-
    set relation — the verify kernel shared by the batch and
    incremental dedup paths."""
    s1 = sets.select(F.col("doc_id").alias("_d1"), F.col("sh").alias("_sh1"))
    s2 = sets.select(F.col("doc_id").alias("_d2"), F.col("sh").alias("_sh2"))
    return (
        pairs
        .join(s1, F.col("doc1") == F.col("_d1"))
        .join(s2, F.col("doc2") == F.col("_d2"))
        .select(
            "doc1", "doc2",
            F.size(F.array_intersect("_sh1", "_sh2")).alias("_i"),
            F.size("_sh1").alias("_z1"), F.size("_sh2").alias("_z2"),
        )
        .select(
            "doc1", "doc2",
            F.round(
                F.col("_i")
                / (F.col("_z1") + F.col("_z2") - F.col("_i")).cast("double"),
                4,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# Below this distinct-content share the corpus counts as clone-dense
# and the collapse-first machinery pays for itself; above it the class
# collapse + pair re-expansion is pure overhead (measured 2.8× on the
# clone-light sf0.1 corpus, r9 VERDICT item 1). 0.9 leaves margin for
# the HLL estimator's ~2% relative error (rsd=0.02 below) — a corpus
# that genuinely clears 0.9 gains little from collapsing anyway.
CLONE_FREE_MIN_DISTINCT = 0.9


def _likely_clone_free(df: DataFrame, text_col: str) -> bool:
    """ONE map-side-combined aggregate — row count + HLL-approximate
    distinct content fingerprints (~2% error) — deciding whether the
    collapse-first machinery is worth its overhead.  The decision
    affects only the PLAN: the collapse-first and pairwise forms are
    bit-identical on any corpus (pytest-pinned), so a borderline
    misfire costs time, never correctness."""
    r = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.approx_count_distinct(F.md5(F.col(text_col)), rsd=0.02)
        .alias("d"),
    ).first()
    return r["n"] == 0 or r["d"] >= CLONE_FREE_MIN_DISTINCT * r["n"]


def _content_classes(df: DataFrame, text_col: str, id_col: str):
    """(members, reps): exact-content classes keyed by md5 of the RAW
    text — identical text ⟹ identical shingles/signatures, so any
    signature-level computation done once per class representative is
    valid for every member.  ``members`` = (doc_id, rep);
    ``reps`` = the representative rows of ``df`` (min doc_id)."""
    # fan_out_heavy (see doc_shingles): one md5 per row is cheap
    # compute, but the inputs here are whole documents (the md5 reads
    # every byte) and several callers pass DERIVED frames whose
    # df.rdd probe would materialize join stages; the estimate-only
    # decision matches plain fan_out's on every input this site sees.
    classed = fan_out_heavy(df).select(
        F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("_cls")
    )
    rep_of = classed.groupBy("_cls").agg(F.min("doc_id").alias("rep"))
    members = classed.join(rep_of, "_cls").select("doc_id", "rep")
    reps = df.join(
        rep_of.select(F.col("rep").alias(id_col)), id_col, "left_semi"
    )
    return members, reps


def _expand_class_pairs(rep_pairs: DataFrame, members: DataFrame,
                        eligible_reps: DataFrame,
                        self_score) -> DataFrame:
    """Expand verified representative-level pairs back to member
    pairs, preserving the pairwise operator's exact output semantics:

    * cross-class: every (member of rep1) × (member of rep2) pair
      inherits the reps' verified score — identical inputs would have
      produced the identical score pairwise;
    * within-class: every member pair of a class whose rep is in
      ``eligible_reps`` scores ``self_score`` (identical content ⟹
      jaccard 1.0 / hamming 0), exactly what the pairwise banded join
      emits for identical signatures.

    ``rep_pairs`` carries (doc1, doc2, <score col>) at rep level; the
    score column is whatever sits in position 3."""
    score_col = rep_pairs.columns[2]
    score = self_score if isinstance(self_score, Column) else F.lit(self_score)
    m1 = members.select(F.col("rep").alias("_r1"), F.col("doc_id").alias("_m1"))
    m2 = members.select(F.col("rep").alias("_r2"), F.col("doc_id").alias("_m2"))
    cross = (
        rep_pairs
        .join(m1, F.col("doc1") == F.col("_r1"))
        .join(m2, F.col("doc2") == F.col("_r2"))
        .select(
            F.least("_m1", "_m2").alias("doc1"),
            F.greatest("_m1", "_m2").alias("doc2"),
            score_col,
        )
    )
    elig = members.join(
        eligible_reps.select(F.col(eligible_reps.columns[0]).alias("rep")),
        "rep", "left_semi",
    )
    w1 = elig.select("rep", F.col("doc_id").alias("_m1"))
    w2 = elig.select("rep", F.col("doc_id").alias("_m2"))
    within = (
        w1.join(w2, "rep")
        .filter(F.col("_m1") < F.col("_m2"))
        .select(
            F.col("_m1").alias("doc1"), F.col("_m2").alias("doc2"),
            score.alias(score_col),
        )
    )
    return cross.unionByName(within)


def _minhash_rep_pairs(df: DataFrame, text_col: str, id_col: str,
                       n: int, threshold: float,
                       max_bucket: int | None):
    """Shared collapse-first core: (members, verified rep pairs,
    eligible reps) — reps with ≥1 shingle, i.e. a signature."""
    members, reps = _content_classes(df, text_col, id_col)
    cachereg.begin("minhash")
    sh = cachereg.persist(doc_shingles(reps, text_col, id_col, n),
                          "minhash")
    sigs = minhash_signatures(sh)
    pairs = lsh_candidate_pairs(sigs, max_bucket=max_bucket,
                                scope="minhash")
    rep_pairs = jaccard_verify(pairs, sh, threshold, scope="minhash")
    return members, rep_pairs, sigs.select("doc_id")


def minhash_lsh_cluster_edges(df: DataFrame, text_col: str = "text",
                              id_col: str = "doc_id", n: int = 3,
                              threshold: float = 0.7,
                              max_bucket: int | None = None) -> DataFrame:
    """Connectivity-equivalent edge list for duplicate-cluster CC,
    WITHOUT expanding clone cliques: verified rep-level near-dup
    pairs ∪ member→rep star edges (classes with ≥2 members whose rep
    has a signature). A k-clone family contributes k−1 star edges
    instead of C(k,2) pair edges — same connected components, same
    min-id cluster labels (the rep IS the class min id), so a CC over
    these edges equals a CC over :func:`minhash_lsh_dedup`'s pairs
    (pinned by pytest). This is the input a 100 TB dup-cluster pass
    feeds label propagation."""
    members, rep_pairs, eligible = _minhash_rep_pairs(
        df, text_col, id_col, n, threshold, max_bucket)
    star = (
        members.filter(F.col("doc_id") != F.col("rep"))
        .join(eligible.select(F.col("doc_id").alias("rep")),
              "rep", "left_semi")
        .select(F.col("rep").alias("doc1"), F.col("doc_id").alias("doc2"))
    )
    return rep_pairs.select("doc1", "doc2").unionByName(star)


def minhash_lsh_dedup(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", n: int = 3,
                      threshold: float = 0.7,
                      max_bucket: int | None = None,
                      clone_free: bool | None = None) -> DataFrame:
    """Full MinHash→LSH→verify near-dup pipeline, collapse-first.

    Identical-content docs are collapsed to one class representative
    BEFORE shingling: signatures, banding, and Jaccard verification
    run over representatives only, and verified pairs expand back to
    members afterwards (cross-class pairs inherit the rep score;
    within-class pairs are jaccard 1.0 — exactly what the pairwise
    band join emits for identical signatures, so the output is
    bit-identical to the naive form; pytest pins the equivalence).

    This is what makes the UNCAPPED configuration linear on a
    clone-dense corpus (any real web crawl): a 100-clone family costs
    one signature build and C(100,2) narrow output rows instead of
    C(100,2) banded-join rows each dragging two shingle arrays
    through the verify shuffle — the r5 sf10 rehearsal's disk-fill.
    ``max_bucket`` still caps hot buckets (now measured in distinct
    contents, its true meaning; see :func:`lsh_candidate_pairs`).

    The shingle relation feeds the signature build AND both sides of
    the verification join; Spark replans common subtrees from scratch,
    so it is persisted — at scale this is the materialized shingle
    index every dedup pass reuses.

    ``clone_free`` (r9 VERDICT item 1): on a corpus with ~zero exact
    duplicates the collapse machinery (class build + pair
    re-expansion) is pure overhead, so the UNCAPPED form routes to the
    bit-identical pairwise plan — explicitly (``True``, e.g. after
    :func:`exact_dedup`, whose survivors are distinct by construction)
    or measured (``None`` → one :func:`_likely_clone_free` aggregate).
    A capped call stays collapse-first UNLESS the caller DECLARES
    ``clone_free=True``: ``max_bucket`` counts DISTINCT contents, and
    only on a declared-distinct corpus do doc-level and content-level
    bucket widths provably coincide (the measured decision has HLL
    error, so a borderline corpus must not flip cap semantics — it
    keeps the collapse plan the capped gate's oracle replays)."""
    if clone_free is None and max_bucket is None:
        clone_free = _likely_clone_free(df, text_col)  # measured
    if clone_free is True:
        return minhash_lsh_dedup_pairwise(
            df, text_col, id_col, n, threshold, max_bucket=max_bucket)
    members, rep_pairs, eligible = _minhash_rep_pairs(
        df, text_col, id_col, n, threshold, max_bucket)
    # eligible = classes whose rep produced a signature (≥1 shingle):
    # empty-shingle docs never band, so their clone pairs are NOT
    # emitted — same as the pairwise form.
    return _expand_class_pairs(rep_pairs, members, eligible, 1.0)


def minhash_lsh_dedup_pairwise(df: DataFrame, text_col: str = "text",
                               id_col: str = "doc_id", n: int = 3,
                               threshold: float = 0.7,
                               max_bucket: int | None = None) -> DataFrame:
    """The naive all-docs pairwise form (no content-class collapse) —
    kept as the semantic reference the collapse-first implementation
    is pinned against, and for corpora known clone-free."""
    cachereg.begin("minhash_pairwise")
    sh = cachereg.persist(doc_shingles(df, text_col, id_col, n),
                          "minhash_pairwise")
    pairs = lsh_candidate_pairs(minhash_signatures(sh),
                                max_bucket=max_bucket,
                                scope="minhash_pairwise")
    return jaccard_verify(pairs, sh, threshold, scope="minhash_pairwise")


def dedup_pipeline(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", n: int = 3,
                   threshold: float = 0.7) -> DataFrame:
    """The standard crawl-processing composition: exact dedup FIRST
    (linear — collapses mass duplication), then MinHash-LSH near-dup
    over the exact survivors only, UNCAPPED.

    This ordering is what makes the uncapped near-dup tractable on a
    clone-dense corpus: identical documents share identical shingle
    sets, so every clone family lands its whole population in the same
    LSH buckets — O(family²) candidate pairs that ``max_bucket`` would
    otherwise have to drop. Collapsing families to one survivor first
    keeps bucket widths at the true near-dup density and the band join
    linear, with no cap and therefore no recall loss; this is the
    configuration to run at 100 TB. Returns near-dup pairs (doc1,
    doc2, jaccard ≥ threshold) among exact survivors (keep_id = min
    doc_id per fingerprint group)."""
    keep = exact_dedup(df, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    survivors = df.join(keep, id_col, "left_semi")
    # exact survivors have distinct normalized (hence raw) text, so the
    # collapse machinery has nothing to collapse — skip it AND the
    # measuring aggregate
    return minhash_lsh_dedup(survivors, text_col, id_col, n, threshold,
                             clone_free=True)


def build_dedup_index(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", n: int = 3,
                      class_key: str = "chain") -> DataFrame:
    """Materialized dedup index: (doc_id, sh, sig0..sig15, cls). At
    100 TB this is the persisted table an ingest pipeline maintains —
    new batches dedup against it without re-shingling the corpus.
    ``cls`` is the content-class key, computed ONCE at ingest so the
    incremental path never re-chains md5s over the stored corpus's
    shingle sets. ``class_key``: ``"chain"`` (default,
    :func:`shingle_set_key` — collision-proof up to md5) or
    ``"digest"`` (:func:`shingle_set_digest` — half the md5 budget;
    statistical collision resistance). Batches must dedup against an
    index built with the SAME mode."""
    sh = doc_shingles(df, text_col, id_col, n)
    sets = sh.groupBy("doc_id").agg(F.collect_list("shingle").alias("sh"))
    keyfn = shingle_set_key if class_key == "chain" else shingle_set_digest
    return (
        minhash_signatures(sh).join(sets, "doc_id")
        .withColumn("cls", keyfn("sh"))
    )


def shingle_set_key(sh) -> Column:
    """Content-class key of a shingle-SET array: md5 chain over the
    sorted elements' per-element md5s (``md5(acc ‖ md5(x))`` fold).

    A separator-joined ``md5(concat_ws(sep, sort_array(sh)))`` would
    be ambiguous whenever shingle text itself contains the separator
    (raw text is only lowercased/split, not control-char-stripped —
    distinct sets could collide into one class and be emitted as false
    jaccard-1.0 pairs) AND it materializes the whole set as one string
    per doc before hashing. The chain keeps every intermediate at
    64 hex chars regardless of set size and is injective up to md5
    collisions: each element contributes a fixed-width 32-char block,
    so no split ambiguity exists."""
    if isinstance(sh, str):   # one parse instead of a lambda tree
        return F.expr(f"aggregate(sort_array({sh}), '', "
                      "(acc, x) -> md5(concat(acc, md5(x))))")
    return F.aggregate(
        F.sort_array(sh), F.lit(""),
        lambda acc, x: F.md5(F.concat(acc, F.md5(x))),
    )


def shingle_set_digest(sh) -> Column:
    """Cheap content-class key: ``size ‖ xor(h1) ‖ xor(h2)`` where h1
    and h2 are INDEPENDENT 60-bit slices of one md5 per element
    (chars 1-15 and 17-31 — the chain key pays two md5s plus the
    96-char re-hash per fold step; r7 priced that at +46%
    incremental-ingest cost). Order-insensitive by construction (xor
    is commutative — no sort needed), no separator ambiguity (integers
    only), overflow-free under ANSI mode. The two slices must be
    independent hashes, NOT a derived mix: the r8 version's second
    component ``xor(mix(h1))`` was GF(2)-linear (shift-xor commutes
    with the xor fold), so it equaled ``mix(xor(h1))`` identically and
    added ZERO bits — effective resistance was ~60 bits + set size,
    birthday-colliding around 2^30 same-size sets (r8 ADVICE). With
    independent slices, collision odds are ~2^-120 statistical rather
    than the chain's md5-strength; enable via ``class_key="digest"``.
    Note within-class pairs are emitted as jaccard-1.0 duplicates
    WITHOUT minhash verification — the digest alone carries the
    false-merge risk, which is why its strength matters.

    MEASURED (round 8, sf1 = 50k docs): the whole class-key stage is
    ~0.5-1 s of a ~14 s warm incremental run — the r7 "+46%
    incremental cost" attributed to the chain key was dominated by
    shared-JVM suite state, not md5 budget (digest saves ~3-7% warm,
    34% only against a cold first run's JIT warm-up). The default
    therefore STAYS "chain": md5-strength collision resistance at a
    cost that measurement shows is negligible; digest remains the
    dial for ingest paths that hash much longer documents."""
    h1 = lambda x: F.conv(F.substring(F.md5(x), 1, 15), 16, 10).cast("long")  # noqa: E731
    h2 = lambda x: F.conv(F.substring(F.md5(x), 17, 15), 16, 10).cast("long")  # noqa: E731
    xor1 = F.aggregate(sh, F.lit(0).cast("long"),
                       lambda acc, x: acc.bitwiseXOR(h1(x)))
    xor2 = F.aggregate(sh, F.lit(0).cast("long"),
                       lambda acc, x: acc.bitwiseXOR(h2(x)))
    return F.concat_ws("-", F.size(sh).cast("string"),
                       xor1.cast("string"), xor2.cast("string"))


def incremental_minhash_dedup(new_df: DataFrame, index: DataFrame,
                              text_col: str = "text",
                              id_col: str = "doc_id", n: int = 3,
                              threshold: float = 0.7,
                              class_key: str = "chain") -> DataFrame:
    """Near-dup pairs INVOLVING the new batch: new×index and new×new
    band collisions, Jaccard-verified — never index×index.

    Equivalent to running :func:`minhash_lsh_dedup` over
    (corpus ∪ batch) and keeping the pairs that touch the batch, but
    the work is O(batch bands + collisions): the corpus side is a
    band-key join against the materialized index, not a rescan. Pairs
    are oriented doc1 < doc2 like the batch path.

    Collapse-first (round 6): the index has no raw text, so content
    classes key on the SORTED shingle-set hash — equal shingle sets ⟹
    identical signatures/bands AND jaccard exactly 1.0, so verifying
    once per class representative and expanding to member pairs that
    touch the batch reproduces the pairwise output bit-for-bit (the
    equivalence tests cover clones split across index and batch).
    This keeps ingest cost linear when a batch redelivers content the
    index already holds many copies of — the at-least-once ingest
    norm at 100 TB."""
    cachereg.begin("incremental_dedup")
    new_idx = cachereg.persist(
        build_dedup_index(new_df, text_col, id_col, n, class_key),
        "incremental_dedup")
    new_ids = new_idx.select("doc_id")
    if "cls" not in index.columns:  # pre-round-7 index: derive once
        keyfn = (shingle_set_key if class_key == "chain"
                 else shingle_set_digest)
        index = index.withColumn("cls", keyfn("sh"))
    # all_idx feeds the class build AND (through rep_idx) both band
    # sides and both jaccard set sides — FIVE consumers. Unpersisted,
    # Spark recomputes the whole index lineage (shingle explode,
    # collect_list, 16 minhash folds, the md5-chain class key) once
    # per consumer; that recompute was the bulk of the gate's
    # 3.5→10 s six-round creep (r11 bisect: warm call dropped
    # 8.6→~2 s with these two persists). In production the corpus
    # side is a materialized parquet table, so these persists cache
    # a cheap scan, not a recompute — and the new-batch side they
    # also cover is small by definition.
    all_idx = cachereg.persist(index.unionByName(new_idx),
                               "incremental_dedup")
    classed = all_idx.withColumn("_cls", F.col("cls"))
    rep_of = classed.groupBy("_cls").agg(F.min("doc_id").alias("rep"))
    members = cachereg.persist(
        classed.join(rep_of, "_cls").select("doc_id", "rep"),
        "incremental_dedup")
    rep_idx = cachereg.persist(
        all_idx.join(
            rep_of.select(F.col("rep").alias("doc_id")),
            "doc_id", "left_semi"),
        "incremental_dedup")
    # classes containing ≥1 batch member form the "new" side
    new_reps = (
        members.join(new_ids, "doc_id", "left_semi")
        .select(F.col("rep").alias("doc_id")).distinct()
    )
    nb = banded_keys(
        rep_idx.join(new_reps, "doc_id", "left_semi").drop("sh")
    ).alias("l")
    ab = banded_keys(rep_idx.drop("sh")).alias("r")
    cand = (
        nb.join(
            ab,
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col("l.doc_id") != F.col("r.doc_id")),
        )
        .select(
            F.least("l.doc_id", "r.doc_id").alias("doc1"),
            F.greatest("l.doc_id", "r.doc_id").alias("doc2"),
        )
        .distinct()
    )
    rep_pairs = jaccard_on_sets(cand, rep_idx.select("doc_id", "sh"), threshold)
    expanded = _expand_class_pairs(
        rep_pairs, members, members.select("rep").distinct(), 1.0
    )
    # keep only pairs touching the batch (class expansion can produce
    # index×index member pairs when a class spans the boundary)
    f1 = new_ids.select(F.col("doc_id").alias("_f1"))
    f2 = new_ids.select(F.col("doc_id").alias("_f2"))
    return (
        expanded
        .join(f1, expanded.doc1 == F.col("_f1"), "left")
        .join(f2, expanded.doc2 == F.col("_f2"), "left")
        .filter(F.col("_f1").isNotNull() | F.col("_f2").isNotNull())
        .select("doc1", "doc2", expanded.columns[2])
    )


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 5,
                        threshold: float = 0.5, max_df: int = 20) -> DataFrame:
    """Inverted-index n-gram Jaccard: join docs through shared
    shingles, capped at document frequency ≤ ``max_df`` (stop-shingle
    removal — the O(N²) guard), then exact Jaccard."""
    cachereg.begin("ngram")
    sh = cachereg.persist(doc_shingles(df, text_col, id_col, n), "ngram")
    # Anti-join the OVER-cap side: stop-shingles (df > max_df) are the
    # Zipf head — few and bounded-ish — while the under-cap side is
    # nearly ALL distinct shingles and grows with the corpus. The r10
    # sf30 rehearsal killed the old broadcast(under-cap) semi-join at
    # a >1 GiB driver collect (spark.driver.maxResultSize); same
    # bounded-side discipline as source_cap / lsh hot buckets. No
    # broadcast hint: AQE converts the anti-join to broadcast at
    # runtime when the stop list is small, and degrades to a shuffle
    # join instead of a driver OOM when it is not.
    hot = (
        sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > max_df)
        .select("shingle")
    )
    sh_rare = sh.join(hot, "shingle", "left_anti")
    pairs = (
        sh_rare.alias("a")
        .join(
            sh_rare.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2"))
        .distinct()
    )
    return jaccard_verify(pairs, sh, threshold, scope="ngram")


# ------------------------------------------------------------- simhash

SIMHASH_BITS = 16  # 4 md5 hex chars; compact and oracle-portable


def token_hashes(col, hex_chars: int = 4) -> Column:
    """Per-token hashes: first ``hex_chars`` md5 hex chars as int
    (4 → 16-bit, the oracle-portable default; 12 → 48-bit for wide
    signatures — ≤ 15 keeps the value in a signed long)."""
    t = F.split(F.lower(col), " ")
    return F.transform(
        t,
        lambda x: F.conv(F.substring(F.md5(x), 1, hex_chars), 16, 10)
        .cast("long"),
    )


def simhash_from_hashes(th, bits: int = SIMHASH_BITS) -> Column:
    """SimHash signature from a precomputed token-hash array: bit b is
    set iff Σ_tokens (±1 on bit b) > 0. Taking the hash array as input
    lets callers materialize it once — the 16 bit-folds would
    otherwise each recompute the md5 transform."""
    def _bit_contrib(b: int):
        # 2-arg merge lambda (pyspark inspects arity; a default-arg
        # third parameter would be misread as aggregate's finish fn)
        def merge(acc, h):
            return acc + (
                F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.lit(1))
                .otherwise(F.lit(-1))
            )
        return F.aggregate(th, F.lit(0).cast("long"), merge)

    sig = F.lit(0).cast("long")
    for b in range(bits):
        sig = sig + F.when(_bit_contrib(b) > 0, F.lit(2**b)).otherwise(F.lit(0))
    return sig


def simhash(col, bits: int = SIMHASH_BITS) -> Column:
    """SimHash over whitespace tokens (single-expression form)."""
    return simhash_from_hashes(token_hashes(col), bits)


def simhash_chunks(bits: int = SIMHASH_BITS,
                   max_hamming: int = 2) -> list[tuple[int, int]]:
    """(start_bit, length) spans splitting a ``bits``-wide signature
    into ``max_hamming + 1`` chunks — pigeonhole: two signatures
    within Hamming ≤ ``max_hamming`` agree exactly on ≥1 chunk."""
    n = max_hamming + 1
    base, extra = divmod(bits, n)
    out, start = [], 0
    for i in range(n):
        ln = base + (1 if i < extra else 0)
        out.append((start, ln))
        start += ln
    return out


def simhash_neardup(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", bits: int = SIMHASH_BITS,
                    max_hamming: int = 2,
                    max_bucket: int | None = None,
                    clone_free: bool | None = None) -> DataFrame:
    """Near-dup pairs at Hamming distance ≤ ``max_hamming``:
    pigeonhole-banded candidate join (exact match on ≥1 signature
    chunk) then exact ``bit_count(xor)`` verify — the banding bounds
    candidates the way LSH bands do for MinHash. Candidate volume ~
    N²·(k+1)/2^chunk_bits: with the oracle-portable 16-bit signature
    the chunks are 5-6 bits (collision-heavy); a 100 TB deployment
    widens the signature (``bits=48`` via 12-hex-char token hashes —
    16-bit chunks, measured linear at the sf3 rehearsal where the
    16-bit path went quadratic) and/or caps band-bucket width with
    ``max_bucket``: a (chunk, value) bucket wider than the cap is a
    mass-duplication or hash-collision hot spot — candidates from it
    are dropped (standard LSH practice; run exact dedup first, which
    catches identical content at linear cost).

    Collapse-first (round 6): identical-content docs collapse to one
    representative BEFORE hashing — signature, chunk banding and the
    Hamming verify run over distinct contents only, and verified rep
    pairs expand back to member pairs (within-class pairs are Hamming
    0, exactly what the pairwise chunk join emits for identical
    signatures, so the output is bit-identical; pytest pins it). This
    removes the O(clone-family²) banded-join volume that made the
    uncapped 16-bit configuration quadratic at the sf10 rehearsal —
    the residual quadratic term is in DISTINCT near-identical
    contents, which the chunk-bit/width dials above govern.

    ``clone_free`` (r9 VERDICT item 1): the collapse overhead is real
    on clone-light corpora (2.8× at sf0.1), so the uncapped form
    routes to the bit-identical pairwise plan when the corpus is
    known (``True``) or measured (``None``) to have ~zero exact-dup
    mass; capped calls stay collapse-first (the cap counts distinct
    contents)."""
    if max_bucket is None:
        if clone_free is None:
            clone_free = _likely_clone_free(df, text_col)
        if clone_free:
            return simhash_neardup_pairwise(
                df, text_col, id_col, bits, max_hamming)
    members, reps = _content_classes(df, text_col, id_col)
    hashed = fan_out_small(reps).select(
        F.col(id_col).alias("doc_id"),
        token_hashes(F.col(text_col), hex_chars=max(4, (bits + 3) // 4))
        .alias("th"),
    )
    sigs = hashed.select(
        "doc_id", simhash_from_hashes(F.col("th"), bits).alias("sig")
    )
    chunks = [
        F.struct(
            F.lit(i).alias("chunk_id"),
            F.shiftright("sig", start).bitwiseAND(F.lit((1 << ln) - 1)).alias("chunk_val"),
        )
        for i, (start, ln) in enumerate(simhash_chunks(bits, max_hamming))
    ]
    banded = sigs.select(
        "doc_id", "sig", F.explode(F.array(*chunks)).alias("c")
    ).select("doc_id", "sig", "c.chunk_id", "c.chunk_val")
    if max_bucket is not None:
        # Same anti-join-the-bounded-side shape as the MinHash cap.
        hot = (
            banded.groupBy("chunk_id", "chunk_val")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > max_bucket)
            .select("chunk_id", "chunk_val")
        )
        banded = banded.join(
            F.broadcast(hot), ["chunk_id", "chunk_val"], "left_anti"
        )
    cand = (
        banded.alias("l")
        .join(
            banded.alias("r"),
            (F.col("l.chunk_id") == F.col("r.chunk_id"))
            & (F.col("l.chunk_val") == F.col("r.chunk_val"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc1"), F.col("r.doc_id").alias("doc2"),
            F.col("l.sig").alias("_s1"), F.col("r.sig").alias("_s2"),
        )
        .distinct()
    )
    rep_pairs = (
        cand.select(
            "doc1", "doc2",
            F.bit_count(F.col("_s1").bitwiseXOR(F.col("_s2"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
    # every doc has a simhash signature (unlike shingles there is no
    # empty-set dropout), so every class expands its within pairs —
    # the literal is cast to bit_count's output type so the expanded
    # union keeps the pairwise schema
    zero = F.lit(0).cast(
        "int"
    )
    return _expand_class_pairs(
        rep_pairs, members, members.select("rep").distinct(), zero
    )


def simhash_neardup_pairwise(df: DataFrame, text_col: str = "text",
                             id_col: str = "doc_id", bits: int = SIMHASH_BITS,
                             max_hamming: int = 2) -> DataFrame:
    """The naive all-docs pairwise form — the semantic reference the
    collapse-first implementation is pinned against."""
    hashed = fan_out_small(df).select(
        F.col(id_col).alias("doc_id"),
        token_hashes(F.col(text_col), hex_chars=max(4, (bits + 3) // 4))
        .alias("th"),
    )
    sigs = hashed.select(
        "doc_id", simhash_from_hashes(F.col("th"), bits).alias("sig")
    )
    chunks = [
        F.struct(
            F.lit(i).alias("chunk_id"),
            F.shiftright("sig", start).bitwiseAND(F.lit((1 << ln) - 1))
            .alias("chunk_val"),
        )
        for i, (start, ln) in enumerate(simhash_chunks(bits, max_hamming))
    ]
    banded = sigs.select(
        "doc_id", "sig", F.explode(F.array(*chunks)).alias("c")
    ).select("doc_id", "sig", "c.chunk_id", "c.chunk_val")
    cand = (
        banded.alias("l")
        .join(
            banded.alias("r"),
            (F.col("l.chunk_id") == F.col("r.chunk_id"))
            & (F.col("l.chunk_val") == F.col("r.chunk_val"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc1"), F.col("r.doc_id").alias("doc2"),
            F.col("l.sig").alias("_s1"), F.col("r.sig").alias("_s2"),
        )
        .distinct()
    )
    return (
        cand.select(
            "doc1", "doc2",
            F.bit_count(F.col("_s1").bitwiseXOR(F.col("_s2"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash_dedup(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Group docs by identical SimHash signature (Hamming distance 0;
    near-dup banding over signature halves is the scale extension).
    Token hashes are projected in their own step so the md5 transform
    runs once, not once per bit-fold."""
    hashed = fan_out_small(df).select(
        F.col(id_col).alias("doc_id"), token_hashes(F.col(text_col)).alias("th")
    )
    return (
        hashed.select("doc_id", simhash_from_hashes(F.col("th")).alias("sig"))
        .groupBy("sig")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_docs"))
    )


# ------------------------------------------- embedding cosine near-dup

def sign_bucket(vec, dims: list[int]) -> Column:
    """Coordinate-sign LSH key: concat of sign bits of the chosen
    dims. Vectors within small angle agree on most coordinate signs."""
    bits = [
        F.when(F.element_at(vec, d + 1) > 0, F.lit("1")).otherwise(F.lit("0"))
        for d in dims
    ]
    return F.concat(*bits)


def cosine(a, b) -> Column:
    """Cosine in float64: widen BEFORE arithmetic (f32 accumulation
    order is engine-specific; f64 over the same order is exact)."""
    da = F.transform(a, lambda x: x.cast("double"))
    db = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(da, db, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.transform(da, lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(F.transform(db, lambda x: x * x),
                            F.lit(0.0), lambda acc, x: acc + x))
    return dot / (na * nb)


def embedding_near_dup(df: DataFrame, vec_col: str = "embedding",
                       id_col: str = "vec_id", threshold: float = 0.9,
                       bucket_dims: tuple = tuple(range(16))) -> DataFrame:
    """Near-dup vector pairs: sign-LSH bucket join then exact cosine.
    Bucketing is recall<1 by design (the scale path); the brute-force
    exact check lives in :mod:`zolo_spark.llm.similarity`.

    The DEFAULT is 16 sign bits — the scale-safe width: 8 bits leave
    ~N²/256 pair growth (the 13.4× sf3→sf10 blowup in BASELINE.md),
    16 bits keep buckets ~N/65536 and were measured 9× faster at sf10.
    Pass ``bucket_dims=tuple(range(8))`` to opt back into the narrow
    (higher-recall, small-corpus) configuration."""
    # Precompute the f64 copy and the norm ONCE per vector and persist:
    # CollapseProject would otherwise inline the sqrt-aggregate into
    # every pair row (single-use alias), paying 3 array folds per pair
    # instead of 1. The persisted frame is the "normalized index" a
    # 100 TB deployment would materialize anyway. The per-pair formula
    # dot/(na*nb) evaluates the exact expression trees the inline form
    # did, so results are bit-identical (oracle unchanged).
    dv = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    keyed = fan_out_small(df).select(
        F.col(id_col).alias("vid"),
        dv.alias("v"),
        F.sqrt(F.aggregate(F.transform(dv, lambda x: x * x),
                           F.lit(0.0), lambda acc, x: acc + x)).alias("nrm"),
        sign_bucket(F.col(vec_col), list(bucket_dims)).alias("bucket"),
    )
    cachereg.begin("embedding_near_dup")
    keyed = cachereg.persist(keyed, "embedding_near_dup")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    return (
        keyed.alias("a")
        .join(
            keyed.alias("b"),
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vid") < F.col("b.vid")),
        )
        .select(
            F.col("a.vid").alias("id1"), F.col("b.vid").alias("id2"),
            F.round(dot / (F.col("a.nrm") * F.col("b.nrm")), 4).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def duplicate_spans(df: DataFrame, n: int = 10, min_count: int = 2,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Duplicate-passage detection — the relational core of substring
    dedup (Lee et al. 2021, *Deduplicating Training Data Makes
    Language Models Better*): find every maximal token span of a
    document that is covered by ``n``-grams occurring ≥ ``min_count``
    times in the corpus.  Returns one row per merged span:
    ``(id_col, span_id, start_tok, end_tok, span_tokens)`` (token
    positions 0-based inclusive); a cleaning pass drops or rewrites
    these spans.

    Shape: posexplode the ``n``-grams with their token positions, one
    corpus-wide count per gram (map-side combined — hot grams
    pre-aggregate per partition), keep positions of repeated grams,
    then merge overlapping/adjacent ``[pos, pos+n-1]`` intervals per
    document with a running-max-end window (the sessionize pattern on
    token positions).  The gram-keyed shuffle is the scale cost; a
    boilerplate-heavy corpus makes some grams hot, which AQE skew
    handling splits — and the output stays bounded by |positions|
    because each position appears exactly once regardless of how hot
    its gram is.  All-integer output.
    """
    toks = fan_out_small(df).select(
        F.col(id_col).alias("doc_id"),
        F.split(F.lower(F.col(text_col)), " ").alias("t"),
    )
    # sequence(0, -1) would DESCEND in Spark, so short docs need the
    # explicit empty-array branch (the shingles helper's same guard).
    gram_arr = F.when(
        F.size("t") >= n,
        F.transform(
            F.sequence(F.lit(0), F.size("t") - n),
            lambda i: F.array_join(F.slice("t", i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = toks.select(
        "doc_id", F.posexplode(gram_arr).alias("pos", "gram")
    )
    counts = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("_n"))
    dup_pos = (
        grams.join(counts.filter(F.col("_n") >= min_count), "gram")
        .select("doc_id", "pos", (F.col("pos") + n - 1).alias("end"))
    )
    w_prev = (
        Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = dup_pos.select(
        "doc_id", "pos", "end",
        F.when(
            F.col("pos")
            > F.coalesce(F.max("end").over(w_prev), F.lit(-2)) + 1,
            F.lit(1),
        ).otherwise(F.lit(0)).alias("_new"),
    ).select(
        "doc_id", "pos", "end",
        F.sum("_new").over(w_run).cast("long").alias("span_id"),
    )
    return (
        flagged.groupBy("doc_id", "span_id")
        .agg(
            F.min("pos").cast("long").alias("start_tok"),
            F.max("end").cast("long").alias("end_tok"),
        )
        .select(
            "doc_id", "span_id", "start_tok", "end_tok",
            (F.col("end_tok") - F.col("start_tok") + 1).alias("span_tokens"),
        )
    )


# ------------------------------------------------- winnowing fingerprints

_WINNOW_POS_BASE = 1 << 31  # pos < 2^31 tokens/doc; 24-bit hash keeps
#                             (h+1)*2^31 ≤ 2^55 — no int64 overflow


def winnow_fingerprints(df: DataFrame, k: int = 4, w: int = 4,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS algorithm): hash every token ``k``-gram,
    slide a window of ``w`` consecutive hashes, and select each
    window's minimum hash (RIGHTMOST position on ties); the distinct
    selected ``(pos, fp)`` pairs are the document's fingerprint set.
    Guarantees: any shared token run of length ≥ ``k + w - 1`` yields
    ≥ 1 shared fingerprint, and fingerprint density is ~``2/(w+1)`` —
    the standard sub-linear sketch for plagiarism/overlap detection.

    Engine shape — ONE shuffle total: raw docs hash-partition by
    doc_id up front (widening narrow scans AND pre-satisfying the
    window's distribution, so no second exchange on the exploded gram
    relation), then the rightmost-min selection is a single window
    MIN over the packed int64 key ``(h+1)·2³¹ − pos`` — "lowest hash,
    rightmost position" — with no per-window explode (a naive
    start×offset join multiplies the gram relation by ``w``).
    Dedup of re-selected positions rides the SAME sort as a LAG
    (each fingerprint's selection run is contiguous in start order —
    proof: a window between two selections of ``p`` must contain a
    strictly smaller key, which every later window containing ``p``
    would also contain), replacing a global DISTINCT exchange. The
    24-bit md5-derived gram hash is engine-portable. Output:
    ``(doc_id, pos, fp)`` — ``pos`` the selected gram's token
    position, ``fp`` its 24-bit hash."""
    toks = df.repartition(F.col(id_col)).select(
        F.col(id_col).alias("doc_id"),
        F.split(F.lower(F.col(text_col)), " ").alias("t"),
    )
    gram_arr = F.when(
        F.size("t") >= k,
        F.transform(
            F.sequence(F.lit(0), F.size("t") - k),
            lambda i: F.array_join(F.slice("t", i + 1, k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = toks.select("doc_id", F.posexplode(gram_arr).alias("pos", "gram"))
    h = F.conv(F.substring(F.md5(F.col("gram")), 1, 6), 16, 10).cast("long")
    keyed = grams.select(
        "doc_id", "pos",
        ((h + 1) * F.lit(_WINNOW_POS_BASE) - F.col("pos")).alias("key"),
    )
    frame = (
        Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    )
    seq = Window.partitionBy("doc_id").orderBy("pos")
    sel = (
        keyed.select(
            "doc_id", "pos",
            F.min("key").over(frame).alias("m"),
            F.count(F.lit(1)).over(frame).alias("cnt"),
        )
        .filter(F.col("cnt") == w)  # full windows only
        .withColumn("_prev", F.lag("m").over(seq))
        .filter(F.col("_prev").isNull() | (F.col("_prev") != F.col("m")))
    )
    # unpack: h = ceil(m / 2^31) - 1, pos = (h+1)*2^31 - m (all > 0,
    # so truncating integer division == ceil via the +base-1 trick).
    # MUST be int64 `div` — float `/` rounds the 53-bit mantissa on
    # keys near 2^55 and would decode the wrong (h, pos).
    h_sel = F.expr(
        f"(m + {_WINNOW_POS_BASE - 1}) div {_WINNOW_POS_BASE}"
    ) - 1
    return sel.select(
        "doc_id",
        ((h_sel + 1) * F.lit(_WINNOW_POS_BASE) - F.col("m")).alias("pos"),
        h_sel.alias("fp"),
    )


# ----------------------------------------- edit-distance similarity join

def edit_distance_pairs(df: DataFrame, str_col: str = "text",
                        id_col: str = "doc_id",
                        max_dist: int = 2) -> DataFrame:
    """Exact edit-distance similarity self-join: every pair with
    ``levenshtein ≤ max_dist``, PassJoin-style (Li, Deng & Feng,
    VLDB 2011 — the partition-based signature scheme), collapse-first
    like the rest of the near-dup family.

    Identical strings collapse to one class representative BEFORE the
    segment machinery (equal strings ⟹ distance 0 and identical
    blocking keys), the PassJoin runs over distinct strings only, and
    verified rep pairs expand back to members — cross-class pairs
    inherit the reps' distance, within-class pairs are distance 0,
    bit-identical to the pairwise form (pytest pins it). Without the
    collapse, a k-clone key family drags C(k,2) identical-key
    candidate rows through the blocking join — measured 20×
    superlinear on the 10×-replica sf1 rehearsal (153 s), 6.8 s
    collapsed.

    Blocking is EXHAUSTIVE, not probabilistic: each string is indexed
    under its ``d+1`` even segments, and probes with every substring
    that could equal a segment of a shorter-or-equal partner
    (partner length window ``[m-d, m]``, start shift ``≤ d``). By
    pigeonhole, ``≤ d`` edits cannot touch all ``d+1`` segments, and
    the untouched segment appears in the partner shifted by at most
    the net indel count before it (``≤ d``) — so every true pair
    shares ≥ 1 ``(partner_len, segment_id, content)`` key from
    within the shift window. That completeness is exactly what the
    naive-O(n²) oracle value-hashes. Zero-length segments (strings
    shorter than ``d+1``) emit empty-content keys that match any
    aligned empty probe — wasteful-but-complete, and rare in real
    corpora.

    Scale shape: index emits ``d+1`` rows per distinct string, probe
    ``O(d²·(2d+1))`` — both linear in the corpus; the join shuffles
    short substring keys, never documents; verification runs Spark's
    thresholded codegen ``levenshtein`` (early exit past ``d``) once
    per DISTINCT candidate rep pair. No driver state, no cartesian.
    """
    base = (
        df.select(F.col(id_col).alias("doc_id"),
                  F.col(str_col).alias("s"))
        .filter(F.col("s").isNotNull())
    )
    members, reps = _content_classes(base, "s", "doc_id")
    rep_pairs = edit_distance_pairs_pairwise(reps, "s", "doc_id",
                                             max_dist)
    eligible = reps.select("doc_id")
    return _expand_class_pairs(rep_pairs, members, eligible,
                               F.lit(0).cast("long"))


def edit_distance_pairs_pairwise(df: DataFrame, str_col: str = "text",
                                 id_col: str = "doc_id",
                                 max_dist: int = 2) -> DataFrame:
    """The naive all-docs pairwise PassJoin (no content-class
    collapse) — the semantic reference the collapse-first form is
    pinned against, and the direct path for corpora known distinct
    (e.g. after :func:`exact_dedup`)."""
    d = max_dist
    k = d + 1
    # fan_out_heavy: the index/probe builds explode every row into
    # d+1 / O(d²·(2d+1)) substring keys — heavy per-row compute that
    # otherwise runs on the scan's layout (a single-file corpus = ONE
    # task, measured as the gate's two 0.7–1.4 s single-task
    # broadcast builds). Estimate-decided, so no df.rdd probe on the
    # collapse-first caller's join lineage.
    base = fan_out_heavy(
        df.select(F.col(id_col).alias("doc_id"),
                  F.col(str_col).alias("s"))
        .filter(F.col("s").isNotNull())
    ).withColumn("m", F.length("s"))

    def seg_sql(lexpr: str, i: int) -> tuple[str, str]:
        """(start0, len) SQL of segment i under the even partition of
        ``lexpr`` into k parts — first (L % k) parts get +1. Strings,
        not Columns: the 45-element probe array built one Column at a
        time was ~2.6 s of py4j chatter per call; one F.expr parses
        JVM-side in one hop, to the identical expression tree."""
        b = f"CAST(FLOOR(({lexpr}) / {k}) AS INT)"
        r = f"CAST(({lexpr}) % {k} AS INT)"
        ln = f"({b} + (CASE WHEN {i} < {r} THEN 1 ELSE 0 END))"
        st = f"({i} * {b} + LEAST({i}, {r}))"
        return st, ln

    idx_segs = []
    for i in range(k):
        st, ln = seg_sql("m", i)
        idx_segs.append(f"named_struct('i', {i}, "
                        f"'c', substring(s, {st} + 1, {ln}))")
    idx = base.select(
        F.col("doc_id").alias("id_a"), F.col("m").alias("L"),
        F.explode(F.expr(f"array({','.join(idx_segs)})")).alias("g"),
    ).select("id_a", "L", F.col("g.i").alias("i"), F.col("g.c").alias("c"))

    probe_keys = []
    for delta in range(d + 1):
        lp = f"(m - {delta})"  # candidate partner length (≤ m)
        for i in range(k):
            st, ln = seg_sql(lp, i)
            for sh in range(-d, d + 1):
                p = f"({st} + {sh})"
                # lp == 0 is a legal partner (the empty string: its
                # distance to s is m, a true pair whenever m ≤ d)
                ok = (f"({lp} >= 0 AND {p} >= 0 "
                      f"AND ({p} + {ln}) <= m)")
                probe_keys.append(
                    f"CASE WHEN {ok} THEN named_struct("
                    f"'L', CAST({lp} AS INT), 'i', {i}, "
                    f"'c', substring(s, {p} + 1, {ln})) END")
    probe = base.select(
        F.col("doc_id").alias("id_b"), F.col("m").alias("mb"),
        F.explode(F.expr(
            "array_distinct(array_compact(array("
            + ",".join(probe_keys) + ")))")).alias("g"),
    ).select("id_b", "mb", F.col("g.L").alias("L"),
             F.col("g.i").alias("i"), F.col("g.c").alias("c"))

    cand = (
        idx.join(probe, ["L", "i", "c"])
        .filter(F.col("id_a") != F.col("id_b"))
        .select(F.least("id_a", "id_b").alias("doc1"),
                F.greatest("id_a", "id_b").alias("doc2"))
        .distinct()
    )
    s1 = base.select(F.col("doc_id").alias("doc1"), F.col("s").alias("s1"))
    s2 = base.select(F.col("doc_id").alias("doc2"), F.col("s").alias("s2"))
    return (
        cand.join(s1, "doc1").join(s2, "doc2")
        .withColumn("dist",
                    F.levenshtein("s1", "s2", d).cast("long"))
        .filter(F.col("dist") >= 0)  # thresholded kernel: -1 = past d
        .select("doc1", "doc2", "dist")
    )


def remove_duplicate_spans(df: DataFrame, n: int = 10,
                           min_count: int = 2,
                           text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """The cleaning pass over :func:`duplicate_spans` — substring
    dedup as Lee et al. 2021 actually apply it: every token covered
    by a repeated-passage span is CUT from the document, the rest is
    rejoined in order. Returns one row per input document:
    ``(id_col, text_clean, n_removed_tokens)`` — documents with no
    spans pass through unchanged, a fully-covered document becomes
    the empty string (still one row: downstream length/quality
    filters decide its fate, not this operator).

    Shape: the span detection is :func:`duplicate_spans` (one
    gram-keyed shuffle); spans collapse to ≤ a-few-per-doc arrays
    (one doc-keyed shuffle) and the splice itself is pure codegen —
    per token, an ``exists`` probe over the doc's own span array
    (O(tokens × spans), spans per doc are few by construction since
    overlaps were merged). Original casing is preserved: spans are
    token POSITIONS, valid in the original split because
    lowercasing never changes tokenization."""
    spans = duplicate_spans(df, n, min_count, text_col, id_col)
    by_doc = spans.groupBy("doc_id").agg(
        F.collect_list(
            F.struct(F.col("start_tok").alias("s"),
                     F.col("end_tok").alias("e"))).alias("spans"))
    toks = fan_out_small(df).select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), " ").alias("t"),
    )
    joined = toks.join(by_doc, "doc_id", "left").select(
        "doc_id", "t",
        F.coalesce(
            F.col("spans"),
            F.array().cast("array<struct<s:bigint,e:bigint>>"),
        ).alias("spans"),
    )
    idx = F.sequence(F.lit(0).cast("long"), F.size("t") - 1)
    kept = F.filter(
        idx,
        lambda i: ~F.exists(
            F.col("spans"), lambda sp: (i >= sp["s"]) & (i <= sp["e"])),
    )
    return joined.select(
        "doc_id",
        F.array_join(
            F.transform(kept, lambda i: F.element_at("t", (i + 1).cast("int"))),
            " ").alias("text_clean"),
        (F.size("t") - F.size(kept)).cast("long")
        .alias("n_removed_tokens"),
    )
