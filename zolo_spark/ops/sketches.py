"""Portable approximate-distinct sketch (HyperLogLog) with exact
cross-engine replay.

Spark's native ``approx_count_distinct`` is an HLL++ whose register
hashing is engine-internal, so its *values* can only ever be graded
rows-only (``a10_approx_aggregates``).  This module is the engine's
own sketch: the same HyperLogLog estimator (Flajolet et al. 2007)
built from primitives both Spark and an ANSI oracle evaluate
bit-identically —

* hash: the first 8 hex chars of ``md5(key)`` as a 32-bit integer
  (both engines agree on md5 and on hex→int),
* register index: ``h % m``; remaining value ``w = h // m``,
* rank: position of the leftmost 1-bit of ``w`` found *textually* —
  ``instr(lpad(bin(w), 32-b, '0'), '1')`` — pure integer/string ops,
  no float log2 near power-of-two boundaries,
* estimate: ``alpha·m² / Σ 2^(−M_j)``; every ``2^(−M_j)`` term is a
  dyadic rational ≥ 2^(−(32−b+1)), so the float sum is EXACT and
  order-independent no matter how Spark merges partitions; the only
  libm call is the final ``ln`` of the linear-counting branch,
  absorbed by the round-4 output.

Scale design: this is the mergeable-sketch shape a 100 TB engine
actually wants — per-partition registers combine with ``MAX`` (one
map-side-combined shuffle on (group, idx), at most ``m`` rows per
group survive), and sketches built over disjoint shards merge into
the exact same registers as a single pass (pinned by pytest), so
incremental ingest can maintain distinct counts without re-scanning
history.  Register rows per group are bounded by ``m`` regardless of
cardinality — the estimate aggregate is O(groups·m).

Reference parity: the reference has no sketch operator; this extends
its aggregate family (SURVEY §2.5) the way a warehouse needs at
scales where exact COUNT(DISTINCT) stops being affordable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: number of registers (power of two). 256 ⇒ b=8 index bits, standard
#: error 1.04/√m ≈ 6.5%.
M_REGISTERS = 256
_B_BITS = 8          # log2(M_REGISTERS)
_W_BITS = 32 - _B_BITS
_MAX_RHO = _W_BITS + 1


def _alpha() -> float:
    """HLL bias constant, derived with the same float ops the oracle
    uses (``0.7213 / (1 + 1.079/m)``) so both engines hold the
    identical double."""
    return 0.7213 / (1.0 + 1.079 / float(M_REGISTERS))


def hll_registers(df: DataFrame, key_col: str,
                  group_cols: list[str]) -> DataFrame:
    """(group..., idx, register) — the sketch itself.

    One map-side-combined MAX shuffle on (group, idx); output is at
    most ``m`` rows per group.  All codegen: md5 → conv → split into
    (idx, w) → textual leftmost-1 rank.
    """
    h = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8),
               16, 10).cast("long")
    # NULL keys would hash to a (NULL idx, NULL register) row that
    # hll_estimate counts as an occupied register (COUNT(*)) while SUM
    # skips its NULL term — skewing both the harmonic sum and the
    # linear-counting V. COUNT(DISTINCT) ignores NULLs; so do we.
    df = (df.where(F.col(key_col).isNotNull())
          .select(*group_cols, h.alias("_h")))
    w = F.floor(F.col("_h") / M_REGISTERS).cast("long")
    rho = F.when(w == 0, F.lit(_MAX_RHO)).otherwise(
        F.instr(F.lpad(F.bin(w), _W_BITS, "0"), "1"))
    return (
        df.select(*group_cols,
                  (F.col("_h") % M_REGISTERS).alias("idx"),
                  rho.alias("rho"))
        .groupBy(*group_cols, "idx")
        .agg(F.max("rho").alias("register"))
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built over disjoint (or overlapping) shards:
    registers combine with MAX — the algebraic property that makes the
    sketch incremental at 100 TB."""
    merged = sketches[0]
    for s in sketches[1:]:
        merged = merged.unionByName(s)
    keys = [c for c in merged.columns if c != "register"]
    return merged.groupBy(*keys).agg(F.max("register").alias("register"))


def hll_estimate(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """(group..., hll_distinct) from a register sketch.

    Implements the standard estimator with linear-counting fallback:
    absent buckets contribute 2^0 = 1 to the harmonic sum and count
    toward V (empty registers).  Everything up to the final round is
    exact float math (sums of dyadic rationals)."""
    m = float(M_REGISTERS)
    agg = registers.groupBy(*group_cols).agg(
        (F.sum(F.pow(F.lit(0.5), F.col("register")))
         + (F.lit(m) - F.count(F.lit(1)))).alias("_ssum"),
        (F.lit(M_REGISTERS) - F.count(F.lit(1))).alias("_v"),
    )
    raw = F.lit(_alpha()) * m * m / F.col("_ssum")
    est = F.when((raw <= 2.5 * m) & (F.col("_v") > 0),
                 F.lit(m) * F.log(F.lit(m) / F.col("_v"))).otherwise(raw)
    return agg.select(*group_cols, F.round(est, 4).alias("hll_distinct"))


def approx_distinct(df: DataFrame, key_col: str,
                    group_cols: list[str]) -> DataFrame:
    """End-to-end portable approximate COUNT(DISTINCT key) per group."""
    return hll_estimate(hll_registers(df, key_col, group_cols), group_cols)


# ------------------------------------------------- histogram quantiles

N_BINS = 128


def value_range(df: DataFrame, val_col: str,
                group_cols: list[str]) -> DataFrame:
    """(group..., _lo, _hi, _n) — the per-group range frame the
    histogram bins against. Sharded ingest computes this once over
    the global keyspace (or fixes it a priori) so shard histograms
    stay mergeable."""
    return df.groupBy(*group_cols).agg(
        F.min(F.col(val_col).cast("double")).alias("_lo"),
        F.max(F.col(val_col).cast("double")).alias("_hi"),
        F.count(F.lit(1)).alias("_n"),
    )


def histogram_bins(df: DataFrame, val_col: str, group_cols: list[str],
                   rng: DataFrame, n_bins: int = N_BINS) -> DataFrame:
    """(group..., _lo, _hi, _n, bin, cnt) against a FIXED range frame.
    Counts from disjoint shards binned against the same range ADD —
    the additive-merge property pinned by pytest."""
    x = F.col(val_col).cast("double")
    width = (F.col("_hi") - F.col("_lo")) / n_bins
    # clamp BOTH ends: when binning a different sample against a fixed
    # reference range (drift monitoring), values may fall outside it
    bin_id = F.greatest(
        F.least(F.floor((x - F.col("_lo")) / width).cast("long"),
                F.lit(n_bins - 1)),
        F.lit(0).cast("long"))
    return (
        df.join(F.broadcast(rng), group_cols)
        .select(*group_cols, "_lo", "_hi", "_n",
                F.when(F.col("_hi") == F.col("_lo"), F.lit(0))
                .otherwise(bin_id).alias("bin"))
        .groupBy(*group_cols, "_lo", "_hi", "_n", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def histogram_quantile(df: DataFrame, val_col: str, group_cols: list[str],
                       quantiles: list[float],
                       n_bins: int = N_BINS) -> DataFrame:
    """Portable approximate quantiles via a fixed-bin equi-width
    histogram — the mergeable, value-replayable alternative to both
    exact ``percentile`` (which buffers every value on one executor)
    and ``percentile_approx`` (whose KLL/GK sketch is
    engine-internal, hence rows-only-gradable).

    Two scans: (1) per-group min/max — a 2-double frame, broadcast;
    (2) per-(group, bin) counts with map-side combine — at most
    ``n_bins`` rows per group survive the shuffle.  The estimate
    interpolates linearly inside the bin holding the target rank
    ``q·n``.  Bin counts from disjoint shards ADD (same global
    min/max), so the sketch is incremental the same way
    :func:`hll_registers` is.  Error is bounded by the bin width —
    (max−min)/n_bins — regardless of data size.

    Determinism: bin ids are ``floor`` of identical IEEE doubles; the
    cumulative sums are integer; the interpolation is one expression
    tree evaluated on identical inputs in both engines; output
    rounds to 4.  Returns (group..., q, quantile_est).
    """
    spark = df.sparkSession
    rng = value_range(df, val_col, group_cols)
    hist = histogram_bins(df, val_col, group_cols, rng, n_bins)
    from pyspark.sql import Window as W

    cum = F.sum("cnt").over(
        W.partitionBy(*group_cols).orderBy("bin")
        .rowsBetween(W.unboundedPreceding, 0))
    hist = hist.withColumn("cum", cum)
    qf = spark.createDataFrame([(float(q),) for q in quantiles], "q double")
    target = F.col("q") * F.col("_n")
    # the winning bin: lowest bin whose cumulative count reaches the
    # target rank; min_by keeps its (cnt, cum, lo, hi) for interpolation
    win = (
        hist.crossJoin(F.broadcast(qf))
        .filter(F.col("cum") >= target)
        .groupBy(*group_cols, "q")
        .agg(F.min_by(
            F.struct("bin", "cnt", "cum", "_lo", "_hi", "_n"), F.col("bin")
        ).alias("w"))
        .select(*group_cols, "q", "w.*")
    )
    width_w = (F.col("_hi") - F.col("_lo")) / n_bins
    est = (F.col("_lo") + width_w
           * (F.col("bin")
              + (F.col("q") * F.col("_n") - (F.col("cum") - F.col("cnt")))
              / F.col("cnt")))
    return win.select(
        *group_cols, "q",
        F.round(F.when(F.col("_hi") == F.col("_lo"), F.col("_lo"))
                .otherwise(est), 4).alias("quantile_est"),
    )


# --------------------------------------------------- distribution drift

def psi_drift(ref: DataFrame, cur: DataFrame, val_col: str,
              group_cols: list[str], n_bins: int = 10) -> DataFrame:
    """Population Stability Index per group — the standard production
    drift monitor between a REFERENCE snapshot of a metric and its
    CURRENT distribution:  ``PSI = Σ_bins (q_b − p_b)·ln(q_b / p_b)``
    (≈0 stable, ≳0.2 action).  Bins are fixed from the reference
    range (the deployment convention: the monitor's bins are frozen
    when the reference is taken), current values outside it clamp
    into the edge bins; add-1 smoothing on counts keeps every term
    finite, with ALL ``n_bins`` bins enumerated explicitly so both
    engines see identical smoothed masses.

    Scale: two histogram passes (≤ ``n_bins`` rows per group each),
    tiny totals/grid frames joined broadcast, one exact-DECIMAL sum
    of round-6 terms per group — the whole monitor is
    O(data) + O(groups·bins), and the reference histogram can be a
    PERSISTED table maintained incrementally (bin counts add, see
    :func:`histogram_bins`), so production pays one scan of the
    current window only.
    """
    spark = ref.sparkSession
    rng = value_range(ref, val_col, group_cols)
    rbin = (histogram_bins(ref, val_col, group_cols, rng, n_bins)
            .select(*group_cols, "bin", F.col("cnt").alias("rc")))
    cbin = (histogram_bins(cur, val_col, group_cols, rng, n_bins)
            .select(*group_cols, "bin", F.col("cnt").alias("cc")))
    rtot = rbin.groupBy(*group_cols).agg(F.sum("rc").alias("rtot"))
    ctot = cbin.groupBy(*group_cols).agg(F.sum("cc").alias("ctot"))
    grid = (rng.select(*group_cols)
            .crossJoin(F.broadcast(
                spark.range(n_bins).select(F.col("id").alias("bin")))))
    joined = (
        grid.join(F.broadcast(rbin), [*group_cols, "bin"], "left")
        .join(F.broadcast(cbin), [*group_cols, "bin"], "left")
        .join(F.broadcast(rtot), group_cols)
        .join(F.broadcast(ctot), group_cols)
        .na.fill({"rc": 0, "cc": 0})
    )
    p = (F.col("rc") + 1).cast("double") / (F.col("rtot") + n_bins).cast("double")
    q = (F.col("cc") + 1).cast("double") / (F.col("ctot") + n_bins).cast("double")
    term = F.round((q - p) * F.log(q / p), 6).cast("decimal(28,6)")
    return (joined.groupBy(*group_cols)
            .agg(F.round(F.sum(term).cast("double"), 6).alias("psi")))


# ------------------------------------------------ count-min / heavy keys

CM_DEPTH = 4
CM_WIDTH = 256


def cm_sketch(df: DataFrame, key_col: str, group_cols: list[str],
              depth: int = CM_DEPTH, width: int = CM_WIDTH) -> DataFrame:
    """(group..., row, col, cnt) — a count-min sketch (Cormode &
    Muthukrishnan 2005) of key frequencies per group.

    The ``depth`` hash rows are INDEPENDENT 8-hex-char slices of ONE
    md5 per key (chars 1-8, 9-16, 17-24, 25-32 — the same md5-derived
    discipline as :func:`hll_registers`; md5's 32 hex chars fund up to
    4 rows), each reduced mod ``width``.  One posexplode (×depth
    pre-shuffle rows) then a map-side-combined COUNT shuffle on
    (group, row, col): at most ``depth × width`` cells per group
    survive, regardless of cardinality — the mergeable fixed-size
    summary a 100 TB ingest maintains incrementally where an exact
    per-key groupBy stops being affordable.  NULL keys are ignored
    (COUNT semantics over a key that doesn't exist).
    """
    if depth > 4:
        raise ValueError("depth > 4 needs more hash material than one md5")
    md5 = F.md5(F.col(key_col).cast("string"))
    cells = F.array(*[
        F.conv(F.substring(md5, 1 + 8 * r, 8), 16, 10).cast("long") % width
        for r in range(depth)
    ])
    return (
        df.where(F.col(key_col).isNotNull())
        .select(*group_cols, F.posexplode(cells).alias("row", "col"))
        .groupBy(*group_cols, "row", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cm_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built over disjoint shards: cell counts ADD —
    the algebraic property that makes the sketch incremental (the
    additive sibling of :func:`hll_merge`'s MAX)."""
    merged = sketches[0]
    for s in sketches[1:]:
        merged = merged.unionByName(s)
    keys = [c for c in merged.columns if c != "cnt"]
    return merged.groupBy(*keys).agg(F.sum("cnt").alias("cnt"))


def cm_lookup(sketch: DataFrame, keys: DataFrame, key_col: str,
              group_cols: list[str], depth: int = CM_DEPTH,
              width: int = CM_WIDTH) -> DataFrame:
    """(group..., key, cm_count) — point estimates for a candidate key
    frame: min over the ``depth`` cells the key hashes to (absent cell
    = 0).  The sketch side is at most ``depth × width`` rows per group
    — broadcast, so the lookup costs the candidates ONE broadcast join
    + one (group, key) aggregate, never a shuffle of the corpus.
    Estimates overcount (collisions only inflate cells), never
    undercount — the classic one-sided CM guarantee."""
    md5 = F.md5(F.col(key_col).cast("string"))
    cells = F.array(*[
        F.conv(F.substring(md5, 1 + 8 * r, 8), 16, 10).cast("long") % width
        for r in range(depth)
    ])
    probes = keys.select(
        *group_cols, F.col(key_col),
        F.posexplode(cells).alias("row", "col"))
    return (
        probes.join(F.broadcast(sketch), [*group_cols, "row", "col"], "left")
        .groupBy(*group_cols, key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cm_count"))
    )


def cm_heavy_hitters(df: DataFrame, key_col: str, group_cols: list[str],
                     k: int = 10, depth: int = CM_DEPTH,
                     width: int = CM_WIDTH,
                     candidates: DataFrame | None = None) -> DataFrame:
    """Top-k keys per group by count-min estimate — (group..., key,
    cm_count, rank), rank ties broken by key for cross-engine
    determinism.

    Hot-key detection for :func:`skew_profile` / salted joins without
    an exact per-key count: the sketch pass is fixed-size per group,
    and only candidate keys are ranked.  ``candidates`` is the bounded
    frame to probe — at 100 TB pass the CURRENT batch's keys (or the
    dimension side's keys) against a sketch merged over all history
    (:func:`cm_merge`), so no historical data is ever re-scanned.
    When omitted, the candidate set falls back to an exact
    ``.distinct()`` over the corpus keys — fine at small data, but at
    scale that is the same shuffle class as the exact groupBy the
    sketch exists to avoid, so large deployments should always pass
    ``candidates``.  The rank filter sits directly above its window,
    which Catalyst executes as a partial top-k (WindowGroupLimit),
    never a global sort."""
    from pyspark.sql import Window as W

    sketch = cm_sketch(df, key_col, group_cols, depth, width)
    if candidates is None:
        candidates = df  # small-data fallback: exact distinct below
    cands = candidates.where(F.col(key_col).isNotNull()) \
        .select(*group_cols, key_col).distinct()
    est = cm_lookup(sketch, cands, key_col, group_cols, depth, width)
    # the unpartitioned fallback window's frame is the CANDIDATE set,
    # not the corpus — bounded by the caller's probe frame (a batch's
    # keys / a dimension's keys); WindowGroupLimit turns the rank<=k
    # filter into a partial top-k so even a generous candidate set
    # never funnels through one partition as a full sort
    win = (W.partitionBy(*group_cols) if group_cols else W.partitionBy()) \
        .orderBy(F.col("cm_count").desc(), F.col(key_col))
    return (est.withColumn("rank", F.row_number().over(win))
            .filter(F.col("rank") <= k))


# ------------------------------------------------ bloom membership

BLOOM_BITS = 8192     # m: filter width in bits (256 x 32-bit words)
BLOOM_HASHES = 4      # k: independent 8-hex md5 slices, as in cm_sketch
_BLOOM_WORD = 32      # word width; bits stay < 32 so every word is a
                      # positive int in BOTH engines (1<<63 would wrap)


def _bloom_positions(key_col: str, m_bits: int, k_hashes: int):
    md5 = F.md5(F.col(key_col).cast("string"))
    return [
        F.conv(F.substring(md5, 1 + 8 * r, 8), 16, 10).cast("long") % m_bits
        for r in range(k_hashes)
    ]


def bloom_build(df: DataFrame, key_col: str,
                group_cols: list[str] | None = None,
                m_bits: int = BLOOM_BITS,
                k_hashes: int = BLOOM_HASHES) -> DataFrame:
    """(group..., word_idx, word) — a Bloom filter over the keys,
    packed into 32-bit words: k independent 8-hex md5 slices per key
    (md5's 32 hex chars fund up to 4, the cm_sketch discipline), bit
    positions OR-combined per word with one map-side-combined
    ``bit_or`` shuffle. At most ``m_bits/32`` rows per group survive
    regardless of cardinality. NULL keys are ignored (a NULL is never
    "in" a set). Words OR-merge across shards (:func:`bloom_merge`) —
    idempotent AND commutative, so streaming maintenance needs no
    delivery dedup, unlike the additive count-min."""
    if k_hashes > 4:
        raise ValueError("k_hashes > 4 needs more hash material than one md5")
    group_cols = group_cols or []
    pos = F.explode(F.array(*_bloom_positions(key_col, m_bits, k_hashes)))
    exploded = (df.where(F.col(key_col).isNotNull())
                .select(*group_cols, pos.alias("p")))
    # 2^(p%32) via float pow, exact below 2^52 and byte-identical in
    # DuckDB (shiftleft with a COLUMN shift has no DataFrame surface)
    return (
        exploded.select(
            *group_cols,
            F.floor(F.col("p") / _BLOOM_WORD).cast("long").alias("word_idx"),
            F.pow(F.lit(2.0), F.col("p") % _BLOOM_WORD)
            .cast("long").alias("b"))
        .groupBy(*group_cols, "word_idx")
        .agg(F.bit_or("b").alias("word"))
    )


def bloom_merge(*blooms: DataFrame) -> DataFrame:
    """OR-merge shard filters — the idempotent member of the sketch
    family's merge trio (HLL MAX, count-min SUM, bloom OR)."""
    merged = blooms[0]
    for b in blooms[1:]:
        merged = merged.unionByName(b)
    keys = [c for c in merged.columns if c != "word"]
    return merged.groupBy(*keys).agg(F.bit_or("word").alias("word"))


def bloom_words_literal(bloom: DataFrame,
                        m_bits: int = BLOOM_BITS) -> list[int]:
    """Collect an UNGROUPED filter to a dense ``m_bits/32``-int word
    list (missing words = 0) — a bounded driver exchange (256 ints at
    the default width) that :func:`bloom_prune` embeds as a literal
    array, the runtime-filter shape that needs NO join on the fact."""
    words = [0] * (m_bits // _BLOOM_WORD)
    for r in bloom.collect():  # ≤ m_bits/32 rows by construction
        words[r["word_idx"]] = r["word"]
    return words


def bloom_might_contain(key_col: str, words: list[int],
                        m_bits: int = BLOOM_BITS,
                        k_hashes: int = BLOOM_HASHES):
    """Boolean Column: all k bits set in the literal word array —
    pure codegen (md5 + element_at + shiftright), zero joins, zero
    shuffle on the probed side. One-sided: a present key ALWAYS
    passes; an absent key passes with p ≈ (1-e^(-kn/m))^k."""
    arr = F.array(*[F.lit(int(w)).cast("long") for w in words])
    cond = F.lit(True)
    for p in _bloom_positions(key_col, m_bits, k_hashes):
        word = F.element_at(arr, F.floor(p / _BLOOM_WORD).cast("int") + 1)
        mask = F.pow(F.lit(2.0), p % _BLOOM_WORD).cast("long")
        cond = cond & (word.bitwiseAND(mask) != 0)
    return cond


def bloom_prune(fact: DataFrame, dim_keys: DataFrame, key_col: str,
                m_bits: int = BLOOM_BITS,
                k_hashes: int = BLOOM_HASHES) -> DataFrame:
    """Pre-join pruning: drop fact rows whose key CANNOT be in the
    dimension key set — the Bloom runtime-filter a 100 TB semi-join
    pushes below the shuffle (Spark's own runtime filters / Iceberg
    DPP shape). Build the filter over the (small) dimension side, ship
    it as a literal array, filter the fact with pure codegen; the
    survivors still need the real join (false positives pass), but
    the shuffle now moves only plausibly-matching rows."""
    words = bloom_words_literal(
        bloom_build(dim_keys, key_col, [], m_bits, k_hashes), m_bits)
    return fact.where(
        bloom_might_contain(key_col, words, m_bits, k_hashes))
