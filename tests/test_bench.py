"""bench.py hygiene (r4 VERDICT item 5): --sf snapping is recorded
honestly, and interrupted scale-replica builds are rebuilt rather than
served half-written."""

from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import bench  # noqa: E402
import gen_sf  # noqa: E402


def test_snap_records_actual_scale():
    # --sf 0.34 can only build whole sf0.1 replicas: k=3, recorded 0.3
    assert bench._snap(0.34) == (3, 0.3)
    assert bench._snap(1.0) == (10, 1.0)
    assert bench._snap(0.1) == (1, 0.1)
    with pytest.raises(SystemExit):
        bench._snap(0.04)


def test_scale_dir_rebuilds_unless_marker_complete(tmp_path, monkeypatch):
    calls: list[tuple[str, int]] = []

    def fake_generate(out, k):
        os.makedirs(out, exist_ok=True)
        # emulate a COMPLETED build: tables + marker
        open(os.path.join(out, "lineitem.parquet"), "w").close()
        with open(os.path.join(out, gen_sf.COMPLETE_MARKER), "w") as f:
            f.write(str(k))
        calls.append((out, k))

    monkeypatch.setattr(gen_sf, "generate", fake_generate)
    monkeypatch.setattr(bench, "REPO", str(tmp_path))
    os.makedirs(tmp_path / ".benchdata", exist_ok=True)

    out_dir = str(tmp_path / ".benchdata" / "sf0.3")

    # interrupted build: tables exist but no marker → must regenerate
    os.makedirs(out_dir, exist_ok=True)
    (tmp_path / ".benchdata" / "sf0.3" / "lineitem.parquet").touch()
    d, sf = bench._scale_dir(0.34)
    assert (d, sf) == (out_dir, 0.3)
    assert calls == [(out_dir, 3)]

    # stale marker from a different k → regenerate
    with open(os.path.join(out_dir, gen_sf.COMPLETE_MARKER), "w") as f:
        f.write("99")
    bench._scale_dir(0.3)
    assert len(calls) == 2

    # valid marker → served from cache, no rebuild
    with open(os.path.join(out_dir, gen_sf.COMPLETE_MARKER), "w") as f:
        f.write("3")
    bench._scale_dir(0.3)
    assert len(calls) == 2


def test_compact_line_fits_driver_tail_and_covers_graded_window():
    """Rounds 1-4 printed a >2000-char JSON line; the driver keeps only
    the last ~2000 chars of stdout, cut the line's head, and recorded
    ``parsed: null`` every round. The final line must fit WITH margin
    and still carry every graded-window query."""
    import json
    import random

    from zolo_spark import parity_queries

    rng = random.Random(7)
    names = list(parity_queries.REGISTRY)
    timings = {n: rng.random() * 30 for n in names}
    line = bench.compact_line(round(sum(timings.values()), 4), timings, 0.1)
    assert len(line) <= bench.TAIL_LIMIT
    d = json.loads(line)
    assert d["metric"] and d["unit"] == "sec" and d["sf"] == 0.1
    assert d["n_queries"] == len(names)
    graded = names[:50]
    assert all(g in d["queries"] for g in graded)


def test_compact_line_carries_prev_same_box_ratio():
    """The round-8 same-box drift baseline must survive the driver's
    2000-char stdout tail: the ratio rides the compact line."""
    import json
    import random

    from zolo_spark import parity_queries

    rng = random.Random(7)
    timings = {n: rng.random() * 30 for n in parity_queries.REGISTRY}
    line = bench.compact_line(round(sum(timings.values()), 4), timings,
                              0.1, prev_ratio=1.17)
    d = json.loads(line)
    assert d["prev_same_box_ratio"] == 1.17
    assert len(line) <= bench.TAIL_LIMIT


def test_prev_same_box_error_path_never_raises(monkeypatch):
    """A missing/bad baseline commit yields an error record, not an
    exception — the round's own bench record must never be lost to
    the diagnostic."""
    monkeypatch.setattr(bench, "PREV_ROUND_COMMIT", "0000000")
    out = bench._prev_same_box()
    assert out["commit"] == "0000000" and "error" in out


def test_prev_same_box_compares_cold_to_cold(monkeypatch):
    """r8 ADVICE: both sides of the drift ratio must come from the
    SAME cold-process probe path — comparing the warm full-suite JVM
    at HEAD against a cold prev-round subprocess biased the ratio low
    by JIT warm-up. Intercept _probe_run and verify it runs for BOTH
    the worktree and the repo HEAD."""
    calls = []

    def fake_probe(workdir):
        calls.append(workdir)
        return {n: 1.0 for n in bench.PREV_PROBES}

    monkeypatch.setattr(bench, "_probe_run", fake_probe)
    monkeypatch.setattr(bench, "PREV_ROUND_COMMIT", "HEAD")
    out = bench._prev_same_box()
    # two MIRRORED rounds (prev, head, head, prev): both sides probe
    # cold-subprocess twice so order/thermal bias cancels to first
    # order and the per-query MIN drops transient interference
    assert len(calls) == 4 and calls[1] == calls[2] == bench.REPO
    assert calls[0] != bench.REPO  # first call = the prev worktree
    assert calls[3] == calls[0]
    assert out["ratio_current_over_prev"] == 1.0
    assert out["total"] == out["current_total"] == len(bench.PREV_PROBES)
