"""Property-based tests (hypothesis) for the semantic traps
(SURVEY §5.2 layer 4): NULL propagation, explode counts, market
classification exhaustiveness, SES fold bounds, watermark round-trip.

Hypothesis drives the INPUT GENERATION; each property runs Spark once
per example list (batched into one DataFrame) to keep runtime sane.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import Row, functions as F

from zolo_spark.llm import dedup
from zolo_spark.models import tsmodels
from zolo_spark.ops import nested, scalar
from zolo_spark.state import WatermarkStore

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.one_of(st.none(), st.floats(0, 1e6, allow_nan=False)),
            st.one_of(st.none(), st.floats(0, 1e4, allow_nan=False)),
        ),
        min_size=1, max_size=30,
    )
)
def test_total_null_iff_operand_null(spark, rows):
    # P10+N3: total is NULL exactly when either operand is NULL
    df = spark.createDataFrame(rows, "subtotal double, shipping double")
    got = df.select(
        "subtotal", "shipping",
        scalar.derive_total(F.col("subtotal"), F.col("shipping")).alias("t"),
    ).collect()
    for r in got:
        if r["subtotal"] is None or r["shipping"] is None:
            assert r["t"] is None
        else:
            assert abs(r["t"] - (r["subtotal"] + r["shipping"])) < 1e-6


@settings(**SETTINGS)
@given(
    payloads=st.lists(
        st.lists(st.integers(0, 5), min_size=0, max_size=4), min_size=1, max_size=20
    )
)
def test_explode_row_count_is_sum_of_k(spark, payloads):
    # N1: exploded rows == Σ len(items); empty/None arrays emit none
    rows = [
        Row(pid=i, items=[{"q": float(v)} for v in items] if items else None)
        for i, items in enumerate(payloads)
    ]
    # explicit schema: hypothesis can generate all-None item arrays,
    # which break schema inference
    df = spark.createDataFrame(
        rows, "pid long, items array<struct<q: double>>"
    )
    out = nested.explode_line_items(df, "items", ["pid"])
    assert out.count() == sum(len(p) for p in payloads)


@settings(**SETTINGS)
@given(
    ts=st.lists(
        st.datetimes(
            min_value=dt.datetime(2020, 1, 1), max_value=dt.datetime(2025, 1, 1)
        ),
        min_size=1, max_size=40,
    )
)
def test_market_classification_total_function(spark, ts):
    # P9: every (dow, first_trans) lands in exactly one of 5 labels
    df = spark.createDataFrame([(t,) for t in ts], "ts timestamp")
    out = df.select(
        scalar.classify_market(
            scalar.day_of_week("ts"), scalar.extract_time("ts")
        ).alias("m")
    ).collect()
    labels = {"San Rafael Thurs", "Danville Farmers Market",
              "Alameda Antique Faire", "San Rafael Sunday", "other"}
    assert all(r["m"] in labels for r in out)


@settings(**SETTINGS)
@given(
    y=st.lists(st.floats(0.1, 1e4, allow_nan=False), min_size=2, max_size=50),
    alpha=st.floats(0.05, 0.95),
)
def test_ses_forecast_within_series_bounds(y, alpha):
    # SES level is a convex combination -> stays inside [min, max]
    import numpy as np

    pred = tsmodels.ses_forecast(np.array(y), alpha)
    assert min(y) - 1e-9 <= pred <= max(y) + 1e-9


@settings(**SETTINGS)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("abc xyz"), min_size=1, max_size=40
        ),
        min_size=1, max_size=15, unique=True,
    )
)
def test_exact_dedup_partitions_corpus(spark, texts):
    # exact dedup groups partition the corpus: Σ n_docs == N
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = dedup.exact_dedup(df).collect()
    assert sum(r["n_docs"] for r in out) == len(texts)
    # identical normalized text ⇒ same group (plant one dup)
    df2 = spark.createDataFrame(
        [(0, "a b"), (1, "A b!"), (2, "c")], "doc_id long, text string"
    )
    groups = dedup.exact_dedup(df2).collect()
    assert {r["n_docs"] for r in groups} == {2, 1}


@settings(max_examples=10, deadline=None)
@given(
    keys=st.dictionaries(
        st.sampled_from(["a", "b", "c"]),
        st.text(alphabet="0123456789-:T", min_size=1, max_size=20),
        min_size=1,
    )
)
def test_watermark_store_round_trip(tmp_path_factory, keys):
    # S10: commits persist and last-write-wins per key
    p = tmp_path_factory.mktemp("wm") / "config.yml"
    store = WatermarkStore(str(p))
    for k, v in keys.items():
        store.commit(k, v)
    for k, v in keys.items():
        assert store.get(k) == v
    assert store.get("missing", "DEFAULT") == "DEFAULT"


@given(
    px=st.integers(1, 40).flatmap(
        lambda w: st.integers(1, 24).flatmap(
            lambda h: st.lists(
                st.integers(0, 255), min_size=w * h, max_size=w * h
            ).map(lambda vals: (w, h, vals))
        )
    )
)
@settings(max_examples=40, deadline=None)
def test_png_round_trip_property(px):
    """Any grayscale image survives encode→decode bit-exactly —
    across every scanline-filter combination the encoder cycles
    through."""
    import numpy as np

    from zolo_spark.llm import multimodal

    w, h, vals = px
    img = np.array(vals, dtype=np.uint8).reshape(h, w)
    out = multimodal.png_decode(multimodal.png_encode(img))
    assert (out["width"], out["height"]) == (w, h)
    assert (out["pixels"] == img).all()


@given(
    samples=st.lists(st.integers(-32768, 32767), min_size=1, max_size=2000),
    rate=st.sampled_from([8000, 16000, 44100]),
)
@settings(max_examples=40, deadline=None)
def test_wav_round_trip_property(samples, rate):
    import numpy as np

    from zolo_spark.llm import multimodal

    s = np.array(samples, dtype=np.int16)
    wav = multimodal.wav_decode(multimodal.wav_encode(s, rate))
    assert wav["rate"] == rate and wav["n_samples"] == len(s)
    assert (wav["samples"] == s).all()


@given(
    px=st.integers(1, 40).flatmap(
        lambda w: st.integers(1, 24).flatmap(
            lambda h: st.lists(
                st.integers(0, 255), min_size=w * h, max_size=w * h
            ).map(lambda vals: (w, h, vals))
        )
    ),
    quality=st.sampled_from([25, 50, 75, 90]),
)
@settings(max_examples=30, deadline=None)
def test_jpeg_round_trip_property(px, quality):
    """Baseline JPEG is lossy, so the property is structural: any
    grayscale image (any dims, incl. non-multiples of 8 → pad+crop)
    survives encode→decode with correct dimensions and a per-pixel
    error within the worst-case quantization bound derived from the
    codec's own table: each DCT coefficient is off by ≤ q_uv/2, the
    (u,v) basis has max amplitude c_u·c_v/4, so
    |Δpixel| ≤ Σ_uv (q_uv/2)(c_u c_v/4), plus 1 for uint8 rounding
    (output clamps to [0,255], so 255 also bounds)."""
    import numpy as np

    from zolo_spark.llm import multimodal

    w, h, vals = px
    img = np.array(vals, dtype=np.uint8).reshape(h, w)
    out = multimodal.jpeg_decode(multimodal.jpeg_encode(img, quality))
    assert (out["width"], out["height"]) == (w, h)
    assert out["pixels"].shape == (h, w)
    err = np.abs(out["pixels"].astype(int) - img.astype(int))
    qt = multimodal._jpeg_qtable(quality).astype(float)
    c = np.ones(8)
    c[0] = 1 / np.sqrt(2)
    bound = min(255.0, (qt / 2 * np.outer(c, c) / 4).sum() + 1)
    assert err.max() <= bound


@given(
    seed=st.integers(0, 10_000),
    wb=st.integers(1, 4),
    hb=st.integers(1, 3),
)
@settings(max_examples=30, deadline=None)
def test_jpeg_flat_even_blocks_lossless_at_q50(seed, wb, hb):
    """The oracle-carrying regime: 8x8-block-constant images with even
    values are EXACTLY lossless at quality 50 (q00=16 divides 8·s for
    even level-shifted s; all AC coefficients are zero)."""
    import numpy as np

    from zolo_spark.llm import multimodal

    rng = np.random.default_rng(seed)
    vals = 2 * rng.integers(0, 128, (hb, wb), dtype=np.int64)
    img = np.kron(vals, np.ones((8, 8), dtype=np.int64)).astype(np.uint8)
    out = multimodal.jpeg_decode(multimodal.jpeg_encode(img, 50))
    assert (out["pixels"] == img).all()


@given(
    px=st.integers(8, 40).flatmap(
        lambda w: st.integers(8, 24).flatmap(
            lambda h: st.lists(
                st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3
            ).map(lambda vals: (w, h, vals))
        )
    ),
    quality=st.sampled_from([50, 75, 90]),
)
@settings(max_examples=15, deadline=None)
def test_jpeg_color_round_trip_property(px, quality):
    """Color (YCbCr 4:2:0) structural property: any RGB image (any
    dims → pad to 16 + crop) survives encode→decode with correct
    shape. Per-pixel error has no tight closed bound (2×2 chroma
    subsampling is itself lossy on arbitrary content), so the checks
    are: exact dims, and luminance preserved within the grayscale
    quantization bound + color-transform slack — Y is NOT subsampled,
    so its error budget matches the grayscale codec's."""
    import numpy as np

    from zolo_spark.llm import multimodal

    w, h, vals = px
    img = np.array(vals, dtype=np.uint8).reshape(h, w, 3)
    out = multimodal.jpeg_decode_color(
        multimodal.jpeg_encode_color(img, quality))
    assert (out["width"], out["height"]) == (w, h)
    assert out["pixels"].shape == (h, w, 3)
    y_in = multimodal.rgb_to_ycbcr(
        img[..., 0], img[..., 1], img[..., 2])[0]
    y_out = multimodal.rgb_to_ycbcr(
        out["pixels"][..., 0], out["pixels"][..., 1],
        out["pixels"][..., 2])[0]
    qt = multimodal._jpeg_qtable(quality).astype(float)
    c = np.ones(8)
    c[0] = 1 / np.sqrt(2)
    # + slack for the two integer color transforms' rounding (≤3 each
    # way through the chroma cross-terms) on top of uint8 rounding
    bound = min(255.0, (qt / 2 * np.outer(c, c) / 4).sum() + 4)
    assert np.abs(y_out.astype(int) - y_in.astype(int)).max() <= bound


def test_jpeg_color_exact_triples_roundtrip():
    """The oracle-carrying regime: 16×16-MCU-constant images colored
    from JPEG_RT_TRIPLES reconstruct BIT-EXACTLY at quality 50 — each
    triple's (Y, Cb, Cr) lands on (even, 128+17k, 128+17k), the
    classes where both DC quantizers divide exactly and the integer
    inverse transform returns the original RGB. Also pins the triple
    table itself: every entry must be a fixed point of
    inverse∘forward and in the exact classes."""
    import numpy as np

    from zolo_spark.llm import multimodal

    for (r, g, b) in multimodal.JPEG_RT_TRIPLES:
        y, cb, cr = (int(v[0]) for v in multimodal.rgb_to_ycbcr(
            np.array([r]), np.array([g]), np.array([b])))
        assert y % 2 == 0 and (cb - 128) % 17 == 0 and (cr - 128) % 17 == 0
        rr, gg, bb = (int(v[0]) for v in multimodal.ycbcr_to_rgb(
            np.array([y]), np.array([cb]), np.array([cr])))
        assert (rr, gg, bb) == (r, g, b)

    trip = np.array(multimodal.JPEG_RT_TRIPLES, dtype=np.uint8)
    rng = np.random.default_rng(5)
    for wm, hm in [(1, 1), (3, 2), (2, 3)]:
        cols = trip[rng.integers(0, 8, (hm, wm))]
        img = np.kron(cols, np.ones((16, 16, 1), dtype=np.uint8))
        out = multimodal.jpeg_decode_color(multimodal.jpeg_encode_color(img))
        assert (out["pixels"] == img).all()


def test_jpeg_color_decoder_strictness():
    """The color decoder rejects malformed/unsupported inputs: bad
    SOI, truncation, and the grayscale stream (wrong component
    count); the grayscale decoder likewise rejects the color
    stream."""
    import numpy as np
    import pytest

    from zolo_spark.llm import multimodal

    img = np.full((16, 16, 3), 100, dtype=np.uint8)
    good = multimodal.jpeg_encode_color(img)
    with pytest.raises(ValueError):
        multimodal.jpeg_decode_color(b"\x00\x01" + good[2:])
    with pytest.raises(ValueError):
        multimodal.jpeg_decode_color(good[:40])
    gray = multimodal.jpeg_encode(np.full((8, 8), 100, dtype=np.uint8))
    with pytest.raises(ValueError):
        multimodal.jpeg_decode_color(gray)
    with pytest.raises(ValueError):
        multimodal.jpeg_decode(good)


def test_jpeg_decoder_strictness():
    """The decoder rejects malformed containers rather than guessing."""
    import numpy as np
    import pytest

    from zolo_spark.llm import multimodal

    img = np.full((8, 8), 100, dtype=np.uint8)
    good = multimodal.jpeg_encode(img)
    with pytest.raises(ValueError):
        multimodal.jpeg_decode(b"\x00\x01" + good[2:])  # bad SOI
    with pytest.raises(ValueError):
        multimodal.jpeg_decode(good[:40])  # truncated mid-segment

    # smooth (low-frequency) content at high quality decodes near-exact
    y, x = np.mgrid[0:16, 0:16]
    smooth = (128 + 60 * np.sin(x / 5) + 40 * np.cos(y / 4)).astype(np.uint8)
    out = multimodal.jpeg_decode(multimodal.jpeg_encode(smooth, 90))
    err = np.abs(out["pixels"].astype(int) - smooth.astype(int))
    assert err.max() <= 4


@settings(**SETTINGS)
@given(
    keys=st.lists(st.integers(0, 100000), min_size=1, max_size=400),
    split=st.integers(2, 5),
)
def test_hll_shard_merge_invariant(spark, keys, split):
    """For ANY key multiset and ANY disjoint sharding, merged shard
    sketches equal the single-pass sketch register-for-register —
    the algebraic property incremental ingest relies on."""
    from zolo_spark.ops import sketches

    df = spark.createDataFrame([("g", k) for k in keys], "grp string, k long")
    single = sorted(
        (r["idx"], r["register"])
        for r in sketches.hll_registers(df, "k", ["grp"]).collect())
    shards = [df.filter(F.col("k") % split == i) for i in range(split)]
    regs = [sketches.hll_registers(s, "k", ["grp"]) for s in shards]
    nonempty = [r for r, s in zip(regs, shards) if s.count() > 0]
    merged = sorted(
        (r["idx"], r["register"])
        for r in sketches.hll_merge(*nonempty).collect())
    assert merged == single


@settings(**SETTINGS)
@given(
    vals=st.lists(st.floats(-1e5, 1e5, allow_nan=False, allow_infinity=False),
                  min_size=3, max_size=300),
)
def test_histogram_quantiles_monotone_and_bounded(spark, vals):
    """Estimates are monotone in q and always inside [min, max]."""
    from zolo_spark.ops import sketches

    df = spark.createDataFrame([("g", float(v)) for v in vals],
                               "grp string, x double")
    out = {r["q"]: r["quantile_est"]
           for r in sketches.histogram_quantile(
               df, "x", ["grp"], [0.1, 0.5, 0.9]).collect()}
    assert out[0.1] <= out[0.5] <= out[0.9]
    lo, hi = min(vals), max(vals)
    # round-4 output can sit a hair outside the true extrema
    assert lo - 1e-3 <= out[0.1] and out[0.9] <= hi + 1e-3


@settings(**SETTINGS)
@given(
    events=st.lists(
        st.tuples(st.integers(0, 5),              # user
                  st.integers(0, 2),              # step index
                  st.integers(0, 50)),            # ts offset seconds
        min_size=1, max_size=40),
)
def test_funnel_matches_pure_python_model(spark, events):
    """funnel() equals the obvious sequential model: t1 = first step-1
    event; t_k = first step-k event strictly after t_{k-1}; step-k
    users = those with t_k defined."""
    from zolo_spark.ops.analytics import funnel

    steps = ["s0", "s1", "s2"]
    base = dt.datetime(2024, 1, 1)
    rows = [(u, steps[k], base + dt.timedelta(seconds=off))
            for (u, k, off) in events]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp")

    # pure-python model
    conv: dict[int, list] = {}
    for u in {r[0] for r in rows}:
        mine = [(t, s) for (uu, s, t) in rows if uu == u]
        t_prev = None
        ts_list = []
        for k, name in enumerate(steps):
            cand = [t for (t, s) in mine if s == name
                    and (t_prev is None or t > t_prev)]
            if not cand:
                break
            t_prev = min(cand)
            ts_list.append(t_prev)
        conv[u] = ts_list
    want = [sum(1 for v in conv.values() if len(v) > k)
            for k in range(3)]

    got = {r["step"]: r["users"]
           for r in funnel(df, steps).collect()}
    assert [got[1], got[2], got[3]] == want
    base_users = want[0]
    if base_users:
        got_conv = {r["step"]: r["conversion"]
                    for r in funnel(df, steps).collect()}
        assert got_conv[2] == round(want[1] / base_users, 6)
