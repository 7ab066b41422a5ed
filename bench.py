"""Benchmark harness (driver contract).

Runs every registered query at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: ``{"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}``.

Each query is materialized with the ``noop`` sink so the full plan
(including all projected columns) executes without sink I/O skewing
the numbers. The first run's numbers on this machine establish
BASELINE (BASELINE.md): no published reference numbers exist.

``--sf N`` (e.g. ``python bench.py --sf 1``) runs a scale-rehearsal
instead: the driver's read-only sf0.1 tables are replicated
key-shifted to sf N under ``.benchdata/sfN`` (cached across runs) and
the JSON line is ALSO written to ``BENCH_sf{{N}}.json`` so scale
regressions — not just sf0.1 — are tracked round-over-round. The
plain no-flag invocation is byte-identical to the driver contract.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from zolo_spark import parity_queries  # noqa: E402
from zolo_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.abspath(__file__))

# The driver keeps only the last ~2000 chars of bench stdout; the final
# JSON line must fit inside that window WITH margin or it can't parse.
TAIL_LIMIT = 1900

# --- same-box drift baseline (r7 VERDICT item 4) ---------------------
# Cross-round bench totals kept getting confounded by machine drift
# (the r7 box ran 17% slower than r6's): the full no-flag run now ALSO
# re-benches a fixed probe subset at the PREVIOUS round's commit in a
# throwaway worktree and records both sides in BENCH_full.json, so a
# reader can separate environment drift from real regression without
# re-running anything. Update the commit each round.
PREV_ROUND_COMMIT = "4d91fce"  # round-14 record (end-of-round snapshot)
PREV_PROBES = [
    "flagship_weekly_demand", "j1_left_join_header_details",
    "w2_group_count_filter", "sessionize_events",
    "llm_minhash_lsh_dedup", "llm_simhash_neardup",
    "llm_incremental_dedup", "llm_bm25_topk", "llm_video_frames",
    "m_ses_weekly_forecast",
]


def _probe_run(workdir: str) -> dict | str:
    """Run ``PREV_PROBES`` in a fresh cold process rooted at
    ``workdir`` (its own bench.py, its own zolo_spark) and return the
    per-query timings dict, or an error string. Both sides of the
    drift ratio go through this SAME path so JVM/JIT warm-up cancels
    out — the r8 version compared warm full-suite timings at HEAD
    against a cold prev-round subprocess, biasing the ratio low."""
    import subprocess

    pat = "^(" + "|".join(PREV_PROBES) + ")$"
    env = dict(os.environ, SPARK_GRAFT_NO_PREV="1")
    r = subprocess.run(
        [sys.executable, os.path.join(workdir, "bench.py"), "--only", pat],
        capture_output=True, text=True, timeout=1200, env=env, cwd=workdir)
    rec_path = os.path.join(workdir, "BENCH_full_partial.json")
    if not os.path.exists(rec_path):
        return f"probe bench wrote no record: {(r.stderr or '')[-200:]}"
    with open(rec_path) as f:
        rec = json.loads(f.read())
    os.remove(rec_path)  # scratch record, not a run artifact
    return rec.get("queries", {})


def _prev_same_box() -> dict | None:
    """Re-run ``PREV_PROBES`` at ``PREV_ROUND_COMMIT`` in a detached
    worktree AND cold at HEAD (same box, same data, same cold-process
    invocation) and return {commit, total, current_total, queries,
    ratio_current_over_prev}. Any failure returns a dict with an
    ``error`` instead — the baseline is diagnostic, never a reason to
    lose the round's record.

    TWO rounds in MIRRORED order (prev, head, head, prev) with a
    per-query MIN: a single prev-then-head pass put whichever side
    ran later under whatever thermal/cache state the suite left
    behind — measured ±25% ratio swings (0.77–1.23) across
    back-to-back r11 runs, with the Python-UDF-heavy probes swinging
    most. Mirroring cancels monotone drift to first order and the
    min discards transient interference on either side."""
    import shutil
    import subprocess

    wt = "/tmp/zolo_prev_wt"
    try:
        subprocess.run(["git", "-C", REPO, "worktree", "remove",
                        "--force", wt], capture_output=True)
        shutil.rmtree(wt, ignore_errors=True)
        r = subprocess.run(
            ["git", "-C", REPO, "worktree", "add", "--detach", wt,
             PREV_ROUND_COMMIT],
            capture_output=True, text=True, timeout=60)
        if r.returncode != 0:
            return {"commit": PREV_ROUND_COMMIT,
                    "error": f"worktree add failed: {r.stderr[:200]}"}
        prev_q = _probe_run(wt)
        if isinstance(prev_q, str):
            return {"commit": PREV_ROUND_COMMIT, "error": f"prev: {prev_q}"}
        cur_q = _probe_run(REPO)
        if isinstance(cur_q, str):
            return {"commit": PREV_ROUND_COMMIT, "error": f"head: {cur_q}"}
        cur_q2 = _probe_run(REPO)  # mirrored second round
        prev_q2 = _probe_run(wt)
        if not isinstance(cur_q2, str):
            cur_q = {n: min(cur_q[n], cur_q2.get(n, cur_q[n]))
                     for n in cur_q}
        if not isinstance(prev_q2, str):
            prev_q = {n: min(prev_q[n], prev_q2.get(n, prev_q[n]))
                      for n in prev_q}
        common = [n for n in PREV_PROBES if n in cur_q and n in prev_q]
        cur_t = round(sum(cur_q[n] for n in common), 4)
        prev_t = round(sum(prev_q[n] for n in common), 4)
        return {
            "commit": PREV_ROUND_COMMIT,
            "queries": {n: prev_q[n] for n in common},
            "total": prev_t,
            "current_queries": {n: cur_q[n] for n in common},
            "current_total": cur_t,
            "ratio_current_over_prev":
                round(cur_t / prev_t, 4) if prev_t else None,
        }
    except Exception as exc:  # noqa: BLE001
        return {"commit": PREV_ROUND_COMMIT, "error": str(exc)[:200]}
    finally:
        subprocess.run(["git", "-C", REPO, "worktree", "remove",
                        "--force", wt], capture_output=True)
        shutil.rmtree(wt, ignore_errors=True)


def _snap(sf: float) -> tuple[int, float]:
    """Snap a requested --sf to whole sf0.1 replicas; the SNAPPED sf
    is what gets recorded (e.g. --sf 0.34 builds k=3 → sf 0.3, and
    0.3 — not 0.34 — lands in the JSON line)."""
    k = round(sf / 0.1)
    if k < 1:
        raise SystemExit(f"--sf must be >= 0.1 (got {sf})")
    return k, round(k * 0.1, 10)


def _scale_dir(sf: float) -> tuple[str, float]:
    """Repo-local replica of the testdata at the snapped scale (built
    once; rebuilt if a previous build was interrupted — completeness
    is judged by gen_sf's ``_COMPLETE`` marker, not table existence)."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import gen_sf

    k, sf = _snap(sf)
    tag = f"{sf:g}"
    out = os.path.join(REPO, ".benchdata", f"sf{tag}")
    marker = os.path.join(out, gen_sf.COMPLETE_MARKER)
    done = os.path.exists(marker) and open(marker).read().strip() == str(k)
    if not done:
        print(f"generating sf{tag} ({k}x sf0.1) under {out}...",
              file=sys.stderr)
        gen_sf.generate(out, k)
    return out, sf


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=None,
                    help="scale-rehearsal factor (multiples of 0.1)")
    ap.add_argument("--only", default=None,
                    help="regex: run only matching query names")
    ap.add_argument("--exclude", default=None,
                    help="regex: skip matching query names")
    args = ap.parse_args()

    if args.sf is not None:
        sf_dir, sf = _scale_dir(args.sf)
    else:
        sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        m = re.search(r"sf([0-9.]+)", sf_dir)
        sf = float(m.group(1)) if m else -1.0
    spark = get_spark("zolo_spark_bench")

    names = sorted(parity_queries.REGISTRY)
    if args.only:
        names = [n for n in names if re.search(args.only, n)]
    if args.exclude:
        names = [n for n in names if not re.search(args.exclude, n)]

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in names:
        spec = parity_queries.REGISTRY[name]
        # A failing query (e.g. a scale rehearsal running out of disk)
        # must cost its own timing, not the whole run's results.
        try:
            df = spec.fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()  # warm (JIT, file listing)
            spark.catalog.clearCache()  # warm run may have persisted intermediates
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 4)
        except Exception as exc:  # noqa: BLE001
            errors[name] = str(exc).split("\n")[0][:200]
            print(f"ERROR {name}: {errors[name]}", file=sys.stderr)
        finally:
            spark.catalog.clearCache()

    total = round(sum(timings.values()), 4)
    full = {
        "metric": "zolo_spark query suite wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if errors:
        full["errors"] = errors
    prev_ratio = None
    if (args.sf is None and not args.only and not args.exclude
            and not os.environ.get("SPARK_GRAFT_NO_PREV")):
        spark.stop()  # free the box — the probe re-runs need it quiet
        prev = _prev_same_box()
        if prev is not None:
            full["prev_same_box"] = prev
            prev_ratio = prev.get("ratio_current_over_prev")
    # A filtered run must not masquerade as the full suite's record.
    part = "_partial" if (args.only or args.exclude) else ""
    full_path = os.path.join(
        REPO,
        f"BENCH_sf{sf:g}{part}.json" if args.sf is not None
        else f"BENCH_full{part}.json",
    )
    with open(full_path, "w") as f:
        f.write(json.dumps(full) + "\n")
    print(f"wrote {full_path} ({len(timings)} queries)", file=sys.stderr)
    print(compact_line(total, timings, sf, prev_ratio=prev_ratio))


def compact_line(total: float, timings: dict[str, float], sf: float,
                 limit: int = TAIL_LIMIT,
                 prev_ratio: float | None = None) -> str:
    """ONE JSON line guaranteed to fit the driver's tail capture.

    The driver records only the last ~2000 chars of stdout; rounds 1-4
    printed a >2000-char line (90+ queries), so the head — with
    ``"metric"`` — was cut and ``parsed`` came back null every round.
    Emit the graded-window queries first (registry order == grading
    order), then as many of the rest as fit within ``limit``.
    """
    graded = [n for n in parity_queries.REGISTRY if n in timings]
    base = {
        "metric": "zolo_spark query suite wall time",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "queries": {},
    }
    if prev_ratio is not None:
        # current probe time / same-box prev-round probe time: >1 =
        # slower than last round ON THIS BOX (drift already factored)
        base["prev_same_box_ratio"] = prev_ratio
    line = ""
    for nd in (3, 2):
        kept: dict[str, float] = {}
        for name in graded:
            trial = dict(base, queries=dict(kept, **{name: round(timings[name], nd)}))
            if len(json.dumps(trial)) > limit:
                break
            kept[name] = round(timings[name], nd)
        line = json.dumps(dict(base, queries=kept))
        if len(kept) == len(graded):
            break
    return line


if __name__ == "__main__":
    main()
