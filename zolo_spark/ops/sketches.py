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
    df = df.select(*group_cols, h.alias("_h"))
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
