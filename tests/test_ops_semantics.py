"""Unit tests for the hard-semantics operators (SURVEY §7.4 watch list).

These pin the behaviors that differ between pandas and naive Spark
translations: weekday convention, np.where overwrite order + the
07:00:00 edge, NaN/NULL propagation, explode row counts.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row, functions as F

from zolo_spark.ops import nested, scalar, windows


def test_weekday_monday_zero(spark):
    # 2024-01-01 is a Monday; pandas dayofweek == 0.
    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1),), (dt.datetime(2024, 1, 4),),  # Mon, Thu
         (dt.datetime(2024, 1, 6),), (dt.datetime(2024, 1, 7),)],  # Sat, Sun
        "ts timestamp",
    )
    got = [r[0] for r in df.select(scalar.day_of_week("ts")).collect()]
    assert got == [0, 3, 5, 6]


@pytest.mark.parametrize(
    "dow,first,expect",
    [
        (3, "09:00:00", "San Rafael Thurs"),
        (5, "09:00:00", "Danville Farmers Market"),
        (6, "06:59:59", "Alameda Antique Faire"),
        (6, "07:00:01", "San Rafael Sunday"),
        # the 07:00:00-exact edge matches neither strict inequality
        # (square_ETL.py:187-190) and falls through to 'other'
        (6, "07:00:00", "other"),
        (0, "09:00:00", "other"),
        (4, "06:00:00", "other"),
    ],
)
def test_market_classification(spark, dow, first, expect):
    df = spark.createDataFrame([(dow, first)], "dow int, first_trans string")
    got = df.select(
        scalar.classify_market(F.col("dow"), F.col("first_trans"))
    ).first()[0]
    assert got == expect


def test_null_propagation_in_total(spark):
    # NaN shipping ⇒ NaN total (shopify_ETL.py:160) → NULL in Spark
    df = spark.createDataFrame(
        [(10.0, 2.5), (20.0, None)], "subtotal double, shipping double"
    )
    got = [
        r[0]
        for r in df.select(
            scalar.derive_total(F.col("subtotal"), F.col("shipping"))
        ).collect()
    ]
    assert got == [12.5, None]


def test_explode_row_counts(spark):
    # N1: one document with k line items -> k rows; no-array docs drop
    df = spark.createDataFrame(
        [
            Row(payment_id="p1", itemizations=[{"q": 1.0}, {"q": 2.0}]),
            Row(payment_id="p2", itemizations=[{"q": 3.0}]),
            Row(payment_id="p3", itemizations=None),
        ]
    )
    out = nested.explode_line_items(df, "itemizations", ["payment_id"])
    assert out.count() == 3
    outer = nested.explode_line_items(df, "itemizations", ["payment_id"], outer=True)
    assert outer.count() == 4  # p3 kept with NULL item


def test_join_names_null_array(spark):
    # N5+N3: NULL modifiers array -> NULL joined string, not ''
    df = spark.createDataFrame(
        [
            Row(mods=[Row(name="oat"), Row(name="extra shot")]),
            Row(mods=None),
        ]
    )
    got = [r[0] for r in df.select(nested.join_names("mods")).collect()]
    assert got == ["oat;extra shot", None]


def test_group_min_transform(spark):
    # W1: per-group min broadcast back onto every row
    df = spark.createDataFrame(
        [("a", 3), ("a", 1), ("b", 7)], "k string, v int"
    )
    got = {
        (r["k"], r["v"]): r["m"]
        for r in df.select("k", "v", windows.group_min(F.col("v"), ["k"]).alias("m")).collect()
    }
    assert got == {("a", 3): 1, ("a", 1): 1, ("b", 7): 7}


def test_cents_to_dollars(spark):
    df = spark.createDataFrame([(1234,)], "cents long")
    assert df.select(scalar.cents_to_dollars("cents")).first()[0] == 12.34


def test_week_trunc_monday_start(spark):
    # 2024-01-07 is a Sunday -> its ISO week starts Mon 2024-01-01
    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 7, 23, 0),), (dt.datetime(2024, 1, 8, 0, 0),)],
        "ts timestamp",
    )
    got = [r[0] for r in df.select(scalar.week_trunc("ts")).collect()]
    assert got == [dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 8)]


def test_asof_join_no_preceding_right(spark):
    from zolo_spark.ops import temporal

    left = spark.createDataFrame(
        [(1, "u", dt.datetime(2024, 1, 1, 10)),
         (2, "u", dt.datetime(2024, 1, 1, 12)),
         (3, "v", dt.datetime(2024, 1, 1, 9))],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u", dt.datetime(2024, 1, 1, 11), 5.0),
         ("u", dt.datetime(2024, 1, 1, 8), 1.0)],
        "k string, ts timestamp, v double",
    )
    out = {r["id"]: r["v_r"] for r in temporal.asof_join(
        left, right, on="ts", by="k", value_cols=["v"]
    ).collect()}
    assert out == {1: 1.0, 2: 5.0, 3: None}  # 3: key v has no right rows


def test_asof_join_equal_timestamp_inclusive(spark):
    from zolo_spark.ops import temporal

    left = spark.createDataFrame(
        [(1, "u", dt.datetime(2024, 1, 1, 10))], "id long, k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("u", dt.datetime(2024, 1, 1, 10), 9.0)], "k string, ts timestamp, v double"
    )
    out = temporal.asof_join(left, right, on="ts", by="k", value_cols=["v"]).first()
    assert out["v_r"] == 9.0  # backward-INCLUSIVE at equal ts


def test_range_join_equals_theta_join(spark):
    from zolo_spark.ops import temporal

    import random
    rng = random.Random(5)
    base = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(i, f"k{rng.randint(0, 2)}", base + dt.timedelta(minutes=rng.randint(0, 500)))
         for i in range(40)],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [(f"k{rng.randint(0, 2)}", base + dt.timedelta(minutes=rng.randint(0, 500)))
         for _ in range(40)],
        "user_id string, ts timestamp",
    )
    got = {(r["event_id"], r["ts_r"]) for r in temporal.range_join(
        left, right, on="ts", by="user_id", window_seconds=1800
    ).collect()}
    # ground truth: direct theta join
    from pyspark.sql import functions as FF
    lr = left.alias("l").join(
        right.alias("r"),
        (FF.col("l.user_id") == FF.col("r.user_id"))
        & (FF.col("r.ts") <= FF.col("l.ts"))
        & (FF.col("r.ts") >= FF.col("l.ts") - FF.expr("INTERVAL 1800 SECONDS")),
    ).select(FF.col("l.event_id"), FF.col("r.ts").alias("ts_r")).distinct()
    want = {(r["event_id"], r["ts_r"]) for r in lr.collect()}
    assert got == want


def test_salted_join_equals_plain_join(spark):
    from zolo_spark.ops.skew import salted_join

    # 90% of big rows share one hot key
    big = spark.createDataFrame(
        [(i, "hot" if i % 10 else f"k{i}") for i in range(200)], "id long, k string"
    )
    small = spark.createDataFrame(
        [("hot", 1.0)] + [(f"k{i * 10}", float(i)) for i in range(20)],
        "k string, v double",
    )
    got = {(r["id"], r["v"]) for r in salted_join(big, small, "k", n_salts=4).collect()}
    want = {(r["id"], r["v"]) for r in big.join(small, "k").collect()}
    assert got == want


def test_merge_upsert(spark):
    from zolo_spark.ops.merge import merge_upsert

    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "id long, name string, v double"
    )
    updates = spark.createDataFrame(
        [(2, "b2", 25.0), (4, "d", 40.0)], "id long, name string, v double"
    )
    got = {r["id"]: (r["name"], r["v"]) for r in
           merge_upsert(target, updates, ["id"]).collect()}
    assert got == {1: ("a", 10.0), 2: ("b2", 25.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_scd2_apply(spark):
    from zolo_spark.ops.merge import scd2_apply

    t0 = dt.datetime(2024, 1, 1)
    t1 = dt.datetime(2024, 6, 1)
    dim = spark.createDataFrame(
        [("c1", "Oakland", t0, None, True),
         ("c2", "Berkeley", t0, None, True)],
        "customer_id string, city string, valid_from timestamp, "
        "valid_to timestamp, is_current boolean",
    )
    updates = spark.createDataFrame(
        [("c1", "Alameda"),   # changed -> close + new version
         ("c2", "Berkeley")], # unchanged -> untouched
        "customer_id string, city string",
    )
    out = scd2_apply(dim, updates, "customer_id", t1, ["city"]).collect()
    rows = {(r["customer_id"], r["is_current"]): r for r in out}
    assert len(out) == 3
    closed = rows[("c1", False)]
    assert closed["city"] == "Oakland" and closed["valid_to"] == t1
    new = rows[("c1", True)]
    assert new["city"] == "Alameda" and new["valid_from"] == t1 and new["valid_to"] is None
    assert rows[("c2", True)]["valid_to"] is None  # untouched


def test_scd2_new_key_inserted(spark):
    """A business key present only in `updates` gets an initial open
    version — not silently dropped (it has no current row to compare
    against, so the change-detection join never sees it)."""
    from zolo_spark.ops.merge import scd2_apply

    t0, t1 = dt.datetime(2024, 1, 1), dt.datetime(2024, 6, 1)
    dim = spark.createDataFrame(
        [("c1", "Oakland", t0, None, True)],
        "customer_id string, city string, valid_from timestamp, "
        "valid_to timestamp, is_current boolean",
    )
    updates = spark.createDataFrame(
        [("c1", "Oakland"),   # unchanged
         ("c9", "Fremont")],  # brand-new key
        "customer_id string, city string",
    )
    out = scd2_apply(dim, updates, "customer_id", t1, ["city"]).collect()
    rows = {(r["customer_id"], r["is_current"]): r for r in out}
    assert len(out) == 2
    new = rows[("c9", True)]
    assert new["city"] == "Fremont"
    assert new["valid_from"] == t1 and new["valid_to"] is None
    assert rows[("c1", True)]["valid_from"] == t0  # untouched


def test_salted_join_left_and_anti(spark):
    """Big-side-preserving hows match the plain join; right/full raise."""
    import pytest as _pytest
    from zolo_spark.ops.skew import salted_join

    big = spark.createDataFrame(
        [(i, "hot" if i % 3 else f"k{i}") for i in range(30)], "id long, k string"
    )
    small = spark.createDataFrame(
        [("hot", 1.0), ("k0", 2.0), ("nomatch", 9.0)], "k string, v double"
    )
    for how in ("left", "left_anti"):
        got = {tuple(r) for r in salted_join(big, small, "k", n_salts=4, how=how)
               .select("id").collect()}
        want = {tuple(r) for r in big.join(small, "k", how).select("id").collect()}
        assert got == want, how
    for how in ("right", "full", "full_outer"):
        with _pytest.raises(ValueError, match="salted_join supports"):
            salted_join(big, small, "k", how=how)


def test_scd2_null_safe_comparison(spark):
    from zolo_spark.ops.merge import scd2_apply

    t0, t1 = dt.datetime(2024, 1, 1), dt.datetime(2024, 6, 1)
    dim = spark.createDataFrame(
        [("c1", None, t0, None, True)],
        "customer_id string, city string, valid_from timestamp, "
        "valid_to timestamp, is_current boolean",
    )
    # NULL -> NULL is NOT a change (eqNullSafe)
    same = spark.createDataFrame([("c1", None)], "customer_id string, city string")
    assert scd2_apply(dim, same, "customer_id", t1, ["city"]).count() == 1
    # NULL -> value IS a change
    upd = spark.createDataFrame([("c1", "Oakland")], "customer_id string, city string")
    assert scd2_apply(dim, upd, "customer_id", t1, ["city"]).count() == 2


def test_skew_profile_finds_planted_hot_key(spark):
    from zolo_spark.ops.skew import skew_profile

    rows = [(99,)] * 60 + [(i,) for i in range(40)]  # key 99: 60% share
    df = spark.createDataFrame(rows, "k long")
    out = skew_profile(df, "k", k=3).collect()
    assert out[0]["k"] == 99 and out[0]["cnt"] == 60
    assert abs(out[0]["share"] - 0.6) < 1e-9
    # mean frequency = 100/41 keys; hot key is ~24.6x the mean
    assert abs(out[0]["ratio_to_mean"] - round(60 / (100 / 41), 4)) < 1e-9
    # remaining slots: count-1 keys in ascending key order (tie pinned)
    assert [r["k"] for r in out[1:]] == [0, 1]


# ------------------------------------------------------- portable HLL

def test_hll_merge_equals_single_pass(spark):
    """Sharded sketches merged with MAX must reproduce the single-pass
    registers and hence the identical estimate — the algebraic
    property that makes the sketch incremental at scale."""
    from zolo_spark.ops import sketches

    rows = [("g", i % 700) for i in range(3000)]
    df = spark.createDataFrame(rows, "grp string, k long")
    single = sketches.approx_distinct(df, "k", ["grp"]).collect()[0]
    a = sketches.hll_registers(df.filter(F.col("k") % 2 == 0), "k", ["grp"])
    b = sketches.hll_registers(df.filter(F.col("k") % 2 == 1), "k", ["grp"])
    merged = sketches.hll_estimate(
        sketches.hll_merge(a, b), ["grp"]).collect()[0]
    assert merged["hll_distinct"] == single["hll_distinct"]


def test_hll_ignores_null_keys(spark):
    """NULL keys must not perturb the sketch (COUNT(DISTINCT) ignores
    NULLs): before the r9 fix a NULL key produced a (NULL idx, NULL
    register) row that skewed the harmonic sum and linear-counting V."""
    from zolo_spark.ops import sketches

    rows = [("g", i % 50) for i in range(500)]
    df = spark.createDataFrame(rows, "grp string, k long")
    withnull = df.unionByName(
        spark.createDataFrame([("g", None)] * 25, "grp string, k long"))
    clean = sketches.approx_distinct(df, "k", ["grp"]).collect()[0]
    dirty = sketches.approx_distinct(withnull, "k", ["grp"]).collect()[0]
    assert dirty["hll_distinct"] == clean["hll_distinct"]
    # and no NULL-index register row exists in the sketch itself
    regs = sketches.hll_registers(withnull, "k", ["grp"])
    assert regs.filter(F.col("idx").isNull()).count() == 0


def test_hll_accuracy_envelope(spark):
    """m=256 ⇒ ~6.5% standard error; assert a generous 3-sigma bound
    on a few cardinalities spanning the linear-counting crossover."""
    from zolo_spark.ops import sketches

    for n in (150, 1000, 20000):
        df = spark.range(n).select(F.lit("g").alias("grp"),
                                   F.col("id").alias("k"))
        est = sketches.approx_distinct(df, "k", ["grp"]).collect()[0]
        assert abs(est["hll_distinct"] - n) / n < 0.20, (n, est)


def test_hll_register_bounds(spark):
    """Registers live in [1, 25] and at most m rows per group."""
    from zolo_spark.ops import sketches

    df = spark.range(5000).select(F.lit("g").alias("grp"),
                                  F.col("id").alias("k"))
    regs = sketches.hll_registers(df, "k", ["grp"]).collect()
    assert len(regs) <= 256
    assert all(1 <= r["register"] <= 25 for r in regs)
    assert all(0 <= r["idx"] < 256 for r in regs)


# ------------------------------------------- portable histogram quantile

def test_histogram_quantile_accuracy_and_edges(spark):
    """Estimates land within one bin width of the exact quantile;
    degenerate (constant) groups return the constant."""
    from zolo_spark.ops import sketches

    import numpy as np

    rng = np.random.RandomState(11)
    vals = [float(v) for v in rng.uniform(10, 510, 4000)]
    rows = [("a", v) for v in vals] + [("const", 42.0)] * 50
    df = spark.createDataFrame(rows, "grp string, x double")
    out = {(r["grp"], r["q"]): r["quantile_est"]
           for r in sketches.histogram_quantile(
               df, "x", ["grp"], [0.25, 0.5, 0.75]).collect()}
    bin_w = (max(vals) - min(vals)) / sketches.N_BINS
    for q in (0.25, 0.5, 0.75):
        exact = float(np.quantile(vals, q))
        assert abs(out[("a", q)] - exact) <= bin_w + 1e-9, (q, exact)
        assert out[("const", q)] == 42.0


def test_histogram_bins_merge_additively(spark):
    """Shard histograms binned against the same range frame sum to
    the single-pass histogram — the incremental-ingest property."""
    from pyspark.sql import functions as F

    from zolo_spark.ops import sketches

    df = spark.createDataFrame(
        [("g", float(i % 97) + 0.5) for i in range(900)],
        "grp string, x double")
    rng = sketches.value_range(df, "x", ["grp"])
    full = {(r["grp"], r["bin"]): r["cnt"]
            for r in sketches.histogram_bins(df, "x", ["grp"], rng).collect()}
    h1 = sketches.histogram_bins(
        df.filter(F.col("x") < 50), "x", ["grp"], rng)
    h2 = sketches.histogram_bins(
        df.filter(F.col("x") >= 50), "x", ["grp"], rng)
    merged = (h1.unionByName(h2)
              .groupBy("grp", "bin").agg(F.sum("cnt").alias("cnt")))
    got = {(r["grp"], r["bin"]): r["cnt"] for r in merged.collect()}
    assert got == full


def test_histogram_max_value_lands_in_last_bin(spark):
    """x == hi must clamp into bin n_bins-1, never overflow."""
    from zolo_spark.ops import sketches

    df = spark.createDataFrame(
        [("g", 0.0), ("g", 100.0)], "grp string, x double")
    rng = sketches.value_range(df, "x", ["grp"])
    bins = {r["x" if False else "bin"]
            for r in sketches.histogram_bins(df, "x", ["grp"], rng).collect()}
    assert bins == {0, sketches.N_BINS - 1}


# --------------------------------------------------------- z-order key

def test_zorder_key_matches_reference_interleave(spark):
    """Spark's generated integer expression equals a bit-twiddling
    reference implementation on random 8-bit pairs."""
    import random

    from zolo_spark.ops.partitioning import zorder_key

    random.seed(13)
    pairs = [(random.randrange(256), random.randrange(256))
             for _ in range(200)] + [(0, 0), (255, 255), (1, 0), (0, 1)]
    df = spark.createDataFrame(pairs, "b0 long, b1 long")
    got = {(r["b0"], r["b1"]): r["z"] for r in df.select(
        "b0", "b1", zorder_key([F.col("b0"), F.col("b1")]).alias("z")
    ).collect()}

    def ref(x, y):
        z = 0
        for i in range(8):
            z |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
        return z

    assert all(got[(x, y)] == ref(x, y) for x, y in pairs)


def test_zorder_buckets_bound_every_dimension(spark):
    """Splitting the 16-bit keyspace at 8 bits fixes the top 4 bits
    of BOTH dims: every bucket's per-dimension range is < 16 — the
    pruning property that makes the layout useful."""
    import random

    from zolo_spark.ops.partitioning import zorder_layout_stats

    random.seed(29)
    rows = [(random.randrange(256), random.randrange(256))
            for _ in range(5000)]
    df = spark.createDataFrame(rows, "b0 long, b1 long")
    stats = zorder_layout_stats(df, ["b0", "b1"]).collect()
    assert len(stats) <= 256
    for r in stats:
        assert r["b0_hi"] - r["b0_lo"] < 16
        assert r["b1_hi"] - r["b1_lo"] < 16


# ------------------------------------------------------------ PSI drift

def test_psi_zero_on_identical_and_large_on_shift(spark):
    from zolo_spark.ops import sketches

    import numpy as np

    rng = np.random.RandomState(17)
    vals = [float(v) for v in rng.uniform(0, 100, 2000)]
    ref = spark.createDataFrame([("g", v) for v in vals], "grp string, x double")
    # identical sample -> every term is exactly 0
    out = sketches.psi_drift(ref, ref, "x", ["grp"]).collect()[0]
    assert out["psi"] == 0.0
    # shifted sample -> strong drift signal
    cur = spark.createDataFrame(
        [("g", v + 60.0) for v in vals], "grp string, x double")
    out = sketches.psi_drift(ref, cur, "x", ["grp"]).collect()[0]
    assert out["psi"] > 0.2, out["psi"]


def test_psi_clamps_out_of_range_current_values(spark):
    """Current values beyond the frozen reference range land in the
    edge bins instead of vanishing or erroring."""
    from zolo_spark.ops import sketches

    ref = spark.createDataFrame(
        [("g", float(v)) for v in range(0, 100)], "grp string, x double")
    cur = spark.createDataFrame(
        [("g", -500.0), ("g", 1e6)], "grp string, x double")
    out = sketches.psi_drift(ref, cur, "x", ["grp"]).collect()
    assert len(out) == 1 and out[0]["psi"] is not None


# ------------------------------------------------------ DQ expectations

def test_expectation_audit_counts_planted_violations(spark):
    from pyspark.sql import functions as F

    from zolo_spark.ops.quality import expectation_audit

    rows = [(1, "A", 10.0, 100), (2, "B", -5.0, 100), (2, "A", 0.0, 999),
            (3, None, 7.0, 100)]
    df = spark.createDataFrame(rows, "id long, status string, amt double,"
                                     " fk long")
    dim = spark.createDataFrame([(100,), (200,)], "k long")
    out = {r["check_name"]: r for r in expectation_audit(
        df,
        row_checks={
            "not_null:status": F.col("status").isNull(),
            "accepted:status": ~F.col("status").isin("A", "B"),
            "range:amt_positive": ~(F.col("amt") > 0),
        },
        unique_keys=["id"],
        fk_checks=[("fk:dim", "fk", dim, "k")],
    ).collect()}
    assert out["not_null:status"]["violations"] == 1
    # NULL status is not an accepted-values violation (SQL CASE rules)
    assert out["accepted:status"]["violations"] == 0
    assert out["range:amt_positive"]["violations"] == 2  # -5 and 0
    assert out["unique:id"]["violations"] == 1           # one surplus row
    assert out["fk:dim"]["violations"] == 1              # fk 999
    assert all(r["total"] == 4 for r in out.values())
    assert not out["unique:id"]["passed"]


def test_expectation_audit_row_checks_share_one_scan(spark):
    """All row-level checks must fold into a single aggregate: the
    audit plan scans the fact once for them (one Aggregate over the
    relation per row-check family, not one per check)."""
    from pyspark.sql import functions as F

    from zolo_spark.ops.quality import expectation_audit

    df = spark.createDataFrame([(1, 2.0)], "id long, x double")
    out = expectation_audit(df, row_checks={
        "a": F.col("x") < 0, "b": F.col("x") > 10, "c": F.col("id").isNull(),
    })
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # 3 row checks -> 3 union branches over ONE shared aggregate each
    # (Catalyst dedups the common agg subtree at exchange reuse time;
    # at minimum no per-check scan of the base relation beyond the 3
    # branch projections of the same aggregate)
    assert plan.count("Aggregate") <= 3


# --------------------------------------------------- count-min sketch

def test_countmin_merge_equals_single_pass(spark):
    """Sharded sketches merged with SUM must reproduce the single-pass
    cells exactly — the additive sibling of the HLL MAX-merge."""
    from zolo_spark.ops import sketches

    rows = [("g", i % 37) for i in range(1500)]
    df = spark.createDataFrame(rows, "grp string, k long")
    a = sketches.cm_sketch(df.filter(F.col("k") % 2 == 0), "k", ["grp"])
    b = sketches.cm_sketch(df.filter(F.col("k") % 2 == 1), "k", ["grp"])
    merged = {tuple(r) for r in sketches.cm_merge(a, b).collect()}
    single = {tuple(r) for r in sketches.cm_sketch(df, "k", ["grp"]).collect()}
    assert merged == single


def test_countmin_never_undercounts_and_finds_hot_keys(spark):
    """CM estimates are one-sided (collisions only inflate), the hot
    key surfaces at rank 1 with its EXACT count when the sketch is
    sparse, and NULL keys are ignored."""
    from zolo_spark.ops import sketches

    rows = ([("g", i % 40) for i in range(2000)]      # 40 keys x 50
            + [("g", 999)] * 500                       # hot key
            + [("g", None)] * 30)
    df = spark.createDataFrame(rows, "grp string, k long")
    truth = {r["k"]: r["cnt"] for r in
             df.where(F.col("k").isNotNull())
             .groupBy("k").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    cands = df.where(F.col("k").isNotNull()).select("grp", "k").distinct()
    est = sketches.cm_lookup(
        sketches.cm_sketch(df, "k", ["grp"]), cands, "k", ["grp"])
    for r in est.collect():
        assert r["cm_count"] >= truth[r["k"]]
    hh = sketches.cm_heavy_hitters(df, "k", ["grp"], k=3).collect()
    assert hh[0]["k"] == 999 and hh[0]["cm_count"] == 500
    assert [r["rank"] for r in hh] == [1, 2, 3]
    # depth>4 would need more hash material than one md5 provides
    import pytest as _pytest
    with _pytest.raises(ValueError):
        sketches.cm_sketch(df, "k", ["grp"], depth=5)


def test_countmin_lookup_of_absent_key_is_bounded(spark):
    """A key never inserted estimates as min over its cells — 0 when
    its cells are empty, never negative, never NULL."""
    from zolo_spark.ops import sketches

    df = spark.createDataFrame([("g", i) for i in range(20)],
                               "grp string, k long")
    sk = sketches.cm_sketch(df, "k", ["grp"])
    probe = spark.createDataFrame([("g", 10_000_019)], "grp string, k long")
    out = sketches.cm_lookup(sk, probe, "k", ["grp"]).collect()
    assert len(out) == 1 and 0 <= out[0]["cm_count"] <= 20


def test_targeted_salted_join_equals_plain_join(spark):
    """Sketch-targeted salting must reproduce the plain join exactly
    for every big-side-preserving how, while exploding only the hot
    keys' dimension rows."""
    from zolo_spark.ops import skew

    big_rows = ([("k%d" % (i % 50), i) for i in range(2000)]
                + [("hot", i) for i in range(3000)]
                + [(None, -1)] * 5)
    big = spark.createDataFrame(big_rows, "key string, v long")
    small = spark.createDataFrame(
        [("k%d" % i, "dim%d" % i) for i in range(40)] + [("hot", "dimH")],
        "key string, label string")

    for how in ("inner", "left", "left_semi", "left_anti"):
        want = {tuple(r) for r in big.join(small, "key", how).collect()}
        got = {tuple(r) for r in skew.targeted_salted_join(
            big, small, "key", n_salts=4, max_hot_keys=8, how=how
        ).collect()}
        assert got == want, how

    import pytest as _pytest
    with _pytest.raises(ValueError):
        skew.targeted_salted_join(big, small, "key", how="full_outer")


# ------------------------------------------------------ bloom filter

def test_bloom_no_false_negatives_and_idempotent_merge(spark):
    """Present keys ALWAYS pass (the one-sided guarantee pruning
    relies on); shard OR-merge == single pass AND re-merging a shard
    is a no-op (idempotent — the property that lets a streaming sink
    skip delivery dedup, unlike the additive count-min)."""
    from zolo_spark.ops import sketches

    dim = spark.createDataFrame([(i,) for i in range(0, 400, 2)], "k long")
    fact = spark.createDataFrame(
        [(i,) for i in range(400)] + [(None,)], "k long")
    got = {r["k"] for r in sketches.bloom_prune(fact, dim, "k").collect()}
    present = set(range(0, 400, 2))
    assert present <= got            # no false negatives, ever
    assert None not in got           # NULL is never "in" a set
    fp_rate = len(got - present) / 200
    assert fp_rate < 0.05            # m=8192, k=4, n=200 -> ~1e-4

    a = sketches.bloom_build(dim.filter("k < 200"), "k", [])
    b = sketches.bloom_build(dim.filter("k >= 200"), "k", [])
    single = {tuple(r) for r in sketches.bloom_build(dim, "k", []).collect()}
    merged = sketches.bloom_merge(a, b)
    assert {tuple(r) for r in merged.collect()} == single
    assert {tuple(r) for r in
            sketches.bloom_merge(merged, b).collect()} == single


def test_bloom_prune_is_codegen_joinless_on_fact(spark):
    """The probe side must be a pure filter over a literal word array
    — no join, no shuffle, no Python eval on the fact."""
    from zolo_spark.ops import sketches

    dim = spark.createDataFrame([(i,) for i in range(50)], "k long")
    fact = spark.createDataFrame([(i,) for i in range(500)], "k long")
    plan = sketches.bloom_prune(fact, dim, "k") \
        ._jdf.queryExecution().executedPlan().toString()
    for bad in ("Join", "Exchange", "BatchEvalPython", "ArrowEvalPython"):
        assert bad not in plan, bad


def test_time_weighted_avg_locf(spark):
    """Hand-computed LOCF time-weighted average: value 10 holds 2 s,
    value 20 holds 1 s -> twa = (10*2 + 20*1)/3; the last event
    carries no weight; a single-event key has no observed time and
    produces NO row; equal timestamps order by the id column."""
    from zolo_spark.ops.temporal import time_weighted_avg

    rows = [
        (1, "a", "2024-01-01 00:00:00", 10.0),
        (2, "a", "2024-01-01 00:00:02", 20.0),
        (3, "a", "2024-01-01 00:00:03", 99.0),   # last: zero weight
        (4, "b", "2024-01-01 00:00:00", 5.0),    # single event
        # equal-ts pair: id 5 precedes id 6, so 7.0 holds 0 s and
        # 9.0 holds 4 s
        (5, "c", "2024-01-01 00:00:00", 7.0),
        (6, "c", "2024-01-01 00:00:00", 9.0),
        (7, "c", "2024-01-01 00:00:04", 1.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, k string, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {r["k"]: (r["twa"], r["observed_micros"]) for r in
           time_weighted_avg(df, ["k"], ts_col="ts", val_col="value",
                             id_col="event_id").collect()}
    assert got["a"] == (round((10 * 2 + 20 * 1) / 3, 8), 3_000_000)
    assert "b" not in got  # single event: no observed interval
    assert got["c"] == (9.0, 4_000_000)


def test_resample_locf_gapfill(spark):
    """Gap-filled LOCF resample: a key with events at t=0 and t=25 s
    on a 10 s grid emits buckets 0,10,20 carrying 1.0 (t=25 lands in
    bucket 2's SUCCESSOR grid point only if the grid reaches it —
    max bucket = floor(25/10) = 2, whose grid point 20 s precedes the
    event, so it still carries 1.0); equal-(key,ts) events resolve to
    the max id; grid points before a key's first event don't exist."""
    from zolo_spark.ops.temporal import resample_locf

    rows = [
        (1, "a", "2024-01-01 00:00:00", 1.0),
        (2, "a", "2024-01-01 00:00:25", 9.0),
        (3, "b", "2024-01-01 00:00:10", 5.0),
        (4, "b", "2024-01-01 00:00:10", 7.0),   # same ts: id 4 wins
    ]
    df = spark.createDataFrame(
        rows, "event_id long, k string, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {(r["k"], str(r["bucket_ts"])): r["value"] for r in
           resample_locf(df, ["k"], step_seconds=10, ts_col="ts",
                         val_col="value", id_col="event_id").collect()}
    assert got == {
        ("a", "2024-01-01 00:00:00"): 1.0,
        ("a", "2024-01-01 00:00:10"): 1.0,
        ("a", "2024-01-01 00:00:20"): 1.0,
        ("b", "2024-01-01 00:00:10"): 7.0,
    }
    # python-model equivalence on a denser deterministic series
    import datetime as dt
    events = [(i, "x",
               f"2024-01-01 00:{i // 2:02d}:{(i * 17) % 60:02d}",
               float(i)) for i in range(1, 25)]
    df2 = spark.createDataFrame(
        events, "event_id long, k string, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got2 = {str(r["bucket_ts"]): r["value"] for r in
            resample_locf(df2, ["k"], step_seconds=60, ts_col="ts",
                          val_col="value", id_col="event_id").collect()}
    parsed = sorted((dt.datetime.strptime(t, "%Y-%m-%d %H:%M:%S"), i, v)
                    for i, _, t, v in events)
    t0 = -(-int(parsed[0][0].timestamp()) // 60)  # ceil
    t1 = int(parsed[-1][0].timestamp()) // 60
    want = {}
    for b in range(t0, t1 + 1):
        ref = dt.datetime.utcfromtimestamp(b * 60)
        best = max(((t, i, v) for t, i, v in parsed if t <= ref),
                   key=lambda x: (x[0], x[1]))
        want[str(ref)] = best[2]
    assert got2 == want

def test_resample_locf_no_boundary_in_range_emits_nothing(spark):
    """A key whose events all fall strictly inside one step has
    ceil(min) > floor(max); sequence() would default to step -1 and
    emit a DESCENDING grid (NULL leading row + a row past the last
    event). The bounds filter must drop such keys entirely."""
    from zolo_spark.ops.temporal import resample_locf

    rows = [
        (1, "a", "2024-01-01 00:01:01", 1.0),
        (2, "a", "2024-01-01 00:01:59", 2.0),   # both inside [60,120)
        (3, "b", "2024-01-01 00:02:00", 5.0),   # exactly on boundary
    ]
    df = spark.createDataFrame(
        rows, "event_id long, k string, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = resample_locf(df, ["k"], step_seconds=60, ts_col="ts",
                        val_col="value", id_col="event_id").collect()
    got = {(r["k"], str(r["bucket_ts"])): r["value"] for r in out}
    assert got == {("b", "2024-01-01 00:02:00"): 5.0}
    assert all(r["value"] is not None for r in out)


def test_resample_locf_composite_key(spark):
    """Multi-column ``keys`` partitions the grid and the carry by ALL
    key columns — two series sharing the first key component must not
    bleed values into each other."""
    from zolo_spark.ops.temporal import resample_locf

    rows = [
        (1, "a", "x", "2024-01-01 00:00:00", 1.0),
        (2, "a", "x", "2024-01-01 00:00:25", 9.0),
        (3, "a", "y", "2024-01-01 00:00:00", 5.0),
        (4, "a", "y", "2024-01-01 00:00:15", 6.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, k1 string, k2 string, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {(r["k1"], r["k2"], str(r["bucket_ts"])): r["value"] for r in
           resample_locf(df, ["k1", "k2"], step_seconds=10, ts_col="ts",
                         val_col="value", id_col="event_id").collect()}
    assert got == {
        ("a", "x", "2024-01-01 00:00:00"): 1.0,
        ("a", "x", "2024-01-01 00:00:10"): 1.0,
        ("a", "x", "2024-01-01 00:00:20"): 1.0,
        ("a", "y", "2024-01-01 00:00:00"): 5.0,
        ("a", "y", "2024-01-01 00:00:10"): 5.0,
    }


def test_asof_join_composite_by_key(spark):
    """asof_join with ``by`` as a list: the carry is scoped to the
    full composite key."""
    from zolo_spark.ops.temporal import asof_join

    left = spark.createDataFrame(
        [("a", "x", "2024-01-01 00:00:05"),
         ("a", "y", "2024-01-01 00:00:05")],
        "k1 string, k2 string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [("a", "x", "2024-01-01 00:00:01", 10.0),
         ("a", "y", "2024-01-01 00:00:02", 20.0)],
        "k1 string, k2 string, ts string, v double",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {(r["k1"], r["k2"]): r["v_r"] for r in
           asof_join(left, right, on="ts", by=["k1", "k2"],
                     value_cols=["v"]).collect()}
    assert got == {("a", "x"): 10.0, ("a", "y"): 20.0}

def test_funnel_strict_order_semantics(spark):
    """Hand-computed funnel: step-k events BEFORE the step-(k-1)
    conversion don't count (strict order); a user missing step 1
    never converts at later steps even with step-2/3 events; equal
    timestamps do NOT advance (strictly greater)."""
    from zolo_spark.ops.analytics import funnel

    rows = [
        # u1 converts fully in order
        (1, "view", "2024-01-01 10:00:00"),
        (1, "click", "2024-01-01 10:01:00"),
        (1, "purchase", "2024-01-01 10:02:00"),
        # u2: click BEFORE first view -> not converted at step 2;
        # a later click converts
        (2, "click", "2024-01-01 09:00:00"),
        (2, "view", "2024-01-01 10:00:00"),
        (2, "click", "2024-01-01 11:00:00"),
        # u3: no view at all -> counts nowhere
        (3, "click", "2024-01-01 10:00:00"),
        (3, "purchase", "2024-01-01 11:00:00"),
        # u4: click at EXACTLY the view time -> strict > means no
        (4, "view", "2024-01-01 10:00:00"),
        (4, "click", "2024-01-01 10:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {r["step"]: (r["step_name"], r["users"], r["conversion"])
           for r in funnel(df, ["view", "click", "purchase"]).collect()}
    assert got == {
        1: ("view", 3, 1.0),            # u1, u2, u4
        2: ("click", 2, round(2 / 3, 6)),  # u1, u2 (late click)
        3: ("purchase", 1, round(1 / 3, 6)),  # u1 only
    }

    # r12 ADVICE item 3: step names are DATA, not SQL syntax — a
    # quoted name ("add to cart's") must work, not break the unpivot
    quoted = df.withColumn(
        "event_type",
        F.when(F.col("event_type") == "click",
               F.lit("add to cart's")).otherwise(F.col("event_type")))
    got_q = {r["step"]: (r["step_name"], r["users"]) for r in
             funnel(quoted,
                    ["view", "add to cart's", "purchase"]).collect()}
    assert got_q == {1: ("view", 3), 2: ("add to cart's", 2),
                     3: ("purchase", 1)}


def test_cohort_retention_hand_model(spark):
    """Hand-computed weekly cohorts: u1/u2 first-seen week of
    2024-01-01 (Mon), u3 the following week; activity counted once
    per (user, week); retention = active / cohort size."""
    from zolo_spark.ops.analytics import cohort_retention

    rows = [
        (1, "2024-01-02 10:00:00"), (1, "2024-01-03 10:00:00"),  # w0 x2
        (1, "2024-01-09 10:00:00"),                              # w1
        (2, "2024-01-04 10:00:00"),                              # w0
        (2, "2024-01-16 10:00:00"),                              # w2
        (3, "2024-01-10 10:00:00"),                              # cohort w1
        (3, "2024-01-17 10:00:00"),                              # +1
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {(str(r["cohort_week"]), r["week_offset"]):
           (r["active_users"], r["cohort_size"], r["retention"])
           for r in cohort_retention(df).collect()}
    assert got == {
        ("2024-01-01 00:00:00", 0): (2, 2, 1.0),
        ("2024-01-01 00:00:00", 1): (1, 2, 0.5),
        ("2024-01-01 00:00:00", 2): (1, 2, 0.5),
        ("2024-01-08 00:00:00", 0): (1, 1, 1.0),
        ("2024-01-08 00:00:00", 1): (1, 1, 1.0),
    }

def test_interval_join_overlap_semantics(spark):
    """Hand-computed interval overlap: touching endpoints match
    (closed intervals), disjoint don't, cross-key never, and a pair
    spanning several buckets appears ONCE (distinct dedup)."""
    from zolo_spark.ops.temporal import interval_join

    left = spark.createDataFrame(
        [(1, "a", "2024-01-01 10:00:00", "2024-01-01 11:00:00"),
         (2, "a", "2024-01-01 12:00:00", "2024-01-01 12:30:00"),
         (3, "b", "2024-01-01 10:00:00", "2024-01-01 11:00:00")],
        "lid long, k string, start string, end string"
    ).withColumn("start", F.to_timestamp("start")) \
     .withColumn("end", F.to_timestamp("end"))
    right = spark.createDataFrame(
        # overlaps l1 across 3+ buckets at 900s; touches l1's end
        [(10, "a", "2024-01-01 09:30:00", "2024-01-01 10:45:00"),
         (11, "a", "2024-01-01 11:00:00", "2024-01-01 11:10:00"),
         (12, "a", "2024-01-01 11:30:00", "2024-01-01 11:59:00"),
         (13, "b", "2024-01-01 10:30:00", "2024-01-01 10:40:00")],
        "rid long, k string, start string, end string"
    ).withColumn("start", F.to_timestamp("start")) \
     .withColumn("end", F.to_timestamp("end"))

    out = interval_join(left, right, by="k", bucket_seconds=900)
    pairs = sorted((r["lid"], r["rid_r"]) for r in out.collect())
    assert pairs == [(1, 10), (1, 11), (3, 13)]
    # multi-bucket overlap deduplicated
    assert len(pairs) == len(set(pairs))

def test_mad_outlier_stats_hand_model(spark):
    """Hand-computed MAD profile: values 1..9 plus a 1000 spike —
    median 5.5 over 10 values, MAD from the deviations, exactly one
    flagged outlier; a constant group has MAD 0 and any deviation
    flags."""
    from zolo_spark.ops.quality import mad_outlier_stats

    vals_a = [float(v) for v in range(1, 10)] + [1000.0]
    rows = [("a", v) for v in vals_a] + [("b", 7.0)] * 4 + [("b", 8.0)]
    df = spark.createDataFrame(rows, "k string, value double")
    got = {r["k"]: (r["med"], r["mad"], r["n_outliers"], r["n_rows"])
           for r in mad_outlier_stats(df, ["k"], val_col="value",
                                      k=3.5).collect()}

    import statistics
    med_a = statistics.median(vals_a)
    mad_a = statistics.median(sorted(abs(v - med_a) for v in vals_a))
    n_out_a = sum(1 for v in vals_a if abs(v - med_a) > 3.5 * mad_a)
    assert got["a"] == (round(med_a, 6), round(mad_a, 6), n_out_a, 10)
    # group b: median 7, MAD 0 -> the single 8.0 deviates > 0
    assert got["b"] == (7.0, 0.0, 1, 5)
