"""Zero-copy shallow clones (``Warehouse.clone_table``) — Delta
SHALLOW CLONE / Iceberg snapshot-referencing parity: the clone
references the source's committed files in place (no bytes move),
then diverges freely. The governance surfaces under test: snapshot
selection (version/tag), DV replay order, schema evolution carry,
divergence isolation both ways, clone-of-clone chains, fold
survival, clone-aware vacuum (the Delta hazard this engine closes),
and bloom/stats metadata carry."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from zolo_spark.warehouse import Warehouse


def _wh(spark, tmp_path, **kw):
    kw.setdefault("auto_compact_dvs", None)
    return Warehouse(spark, str(tmp_path / "wh"), **kw)


def _base(spark, n=200):
    return spark.range(0, n).select(
        F.col("id").alias("cust_id"),
        F.concat(F.lit("seg"), (F.col("id") % 5).cast("string"))
        .alias("segment"),
        (F.col("id") * 1.5).alias("balance"))


def _rows(df):
    return sorted((r["cust_id"], r["segment"], r["balance"])
                  for r in df.collect())


def test_clone_is_zero_copy_and_reads_equal(spark, tmp_path):
    wh = _wh(spark, tmp_path)
    wh.commit_tx({"cdc_mirror": _base(spark)})
    wh.commit_tx({"cdc_mirror": _base(spark).filter("cust_id < 50")
                  .withColumn("segment", F.lit("extra"))})
    wh.clone_table("cdc_mirror", "cdc_dev")
    assert _rows(wh.read_committed_tx("cdc_dev")) == \
        _rows(wh.read_committed_tx("cdc_mirror"))
    # zero-copy: the clone's directory holds no data files
    clone_dir = wh.path("cdc_dev")
    assert not os.path.isdir(clone_dir) or not any(
        f.startswith("batch-") for f in os.listdir(clone_dir))


def test_clone_divergence_is_isolated_both_ways(spark, tmp_path):
    wh = _wh(spark, tmp_path)
    wh.commit_tx({"cdc_mirror": _base(spark)})
    wh.clone_table("cdc_mirror", "cdc_dev")
    # write to the clone: source unchanged
    upd = spark.createDataFrame([(7, "clone_upd", 0.0)],
                                "cust_id long, segment string, balance double")
    wh.merge_tx("cdc_dev", upd, ["cust_id"])
    assert wh.read_committed_tx("cdc_dev") \
        .filter("segment = 'clone_upd'").count() == 1
    assert wh.read_committed_tx("cdc_mirror") \
        .filter("segment = 'clone_upd'").count() == 0
    # write to the source: clone unchanged
    wh.delete_tx("cdc_mirror", "cust_id = 9")
    assert wh.read_committed_tx("cdc_mirror") \
        .filter("cust_id = 9").count() == 0
    assert wh.read_committed_tx("cdc_dev") \
        .filter("cust_id = 9").count() == 1


def test_clone_at_version_and_tag(spark, tmp_path):
    wh = _wh(spark, tmp_path)
    wh.commit_tx({"cdc_mirror": _base(spark, n=100)})
    wh.create_tag("v1")
    wh.commit_tx({"cdc_mirror": _base(spark, n=100)
                  .withColumn("cust_id", F.col("cust_id") + 1000)})
    wh.clone_table("cdc_mirror", "cdc_v1", as_of_tag="v1")
    assert wh.read_committed_tx("cdc_v1").count() == 100
    assert wh.read_committed_tx("cdc_mirror").count() == 200


def test_clone_carries_live_deletion_vectors(spark, tmp_path):
    """The clone's replay preserves record ORDER, so stacked DVs
    apply with the same _fv < v_dv scoping as on the source."""
    wh = _wh(spark, tmp_path)
    wh.commit_tx({"cdc_mirror": _base(spark)})
    wh.update_tx("cdc_mirror", {"segment": "concat(segment, '_P')"},
                 "balance > 150", keys=["cust_id"], mode="mor")
    wh.delete_tx("cdc_mirror", "cust_id % 7 = 3",
                 keys=["cust_id"], mode="mor")
    wh.clone_table("cdc_mirror", "cdc_dev")
    assert _rows(wh.read_committed_tx("cdc_dev")) == \
        _rows(wh.read_committed_tx("cdc_mirror"))
    # compacting the clone materializes ITS dvs only
    wh.compact("cdc_dev", target_file_bytes=1 << 20)
    assert _rows(wh.read_committed_tx("cdc_dev")) == \
        _rows(wh.read_committed_tx("cdc_mirror"))


def test_clone_carries_schema_evolution(spark, tmp_path):
    wh = _wh(spark, tmp_path)
    wh.commit_tx({"cdc_mirror": _base(spark, n=20)})
    wh.add_column_tx("cdc_mirror", "tier", "string")
    wh.rename_column_tx("cdc_mirror", "segment", "seg_name")
    wh.clone_table("cdc_mirror", "cdc_dev")
    got = wh.read_committed_tx("cdc_dev")
    assert set(got.columns) == {"cust_id", "seg_name", "balance", "tier"}
    # evolve the clone independently
    wh.rename_column_tx("cdc_dev", "seg_name", "seg2")
    assert "seg2" in wh.read_committed_tx("cdc_dev").columns
    assert "seg_name" in wh.read_committed_tx("cdc_mirror").columns


def test_clone_of_clone_resolves_to_original_bytes(spark, tmp_path):
    wh = _wh(spark, tmp_path)
    wh.commit_tx({"cdc_mirror": _base(spark, n=50)})
    wh.clone_table("cdc_mirror", "c1")
    wh.clone_table("c1", "c2")
    assert _rows(wh.read_committed_tx("c2")) == \
        _rows(wh.read_committed_tx("cdc_mirror"))
    for t in ("c1", "c2"):
        d = wh.path(t)
        assert not os.path.isdir(d) or not any(
            f.startswith("batch-") and "bloom" not in f
            for f in os.listdir(d))


def test_clone_survives_fold(spark, tmp_path):
    wh = _wh(spark, tmp_path)
    wh.commit_tx({"cdc_mirror": _base(spark, n=60)})
    wh.clone_table("cdc_mirror", "cdc_dev")
    wh.commit_tx({"cdc_dev": _base(spark, n=10)
                  .withColumn("cust_id", F.col("cust_id") + 5000)})
    wh.checkpoint_txlog(retain_last=1)
    wh2 = _wh(spark, tmp_path)
    assert wh2.read_committed_tx("cdc_dev").count() == 70
    assert wh2.read_committed_tx("cdc_mirror").count() == 60


def test_vacuum_is_clone_aware(spark, tmp_path):
    """Compact the SOURCE (supersedes its batches), expire its
    history, vacuum: the superseded source bytes are still referenced
    by the clone's retained records and must survive — the exact
    hazard Delta documents for shallow clones + VACUUM."""
    wh = _wh(spark, tmp_path)
    wh.commit_tx({"cdc_mirror": _base(spark)})
    wh.clone_table("cdc_mirror", "cdc_dev")
    wh.compact("cdc_mirror", target_file_bytes=1 << 20)
    wh.expire_snapshots(retain_last=1)
    assert wh.read_committed_tx("cdc_dev").count() == 200
    assert _rows(wh.read_committed_tx("cdc_dev")) == \
        _rows(wh.read_committed_tx("cdc_mirror"))


def test_clone_carries_bloom_index(spark, tmp_path):
    """Point lookups on the clone prune through the SOURCE's
    sidecars (entries relocated, _fi order preserved)."""
    wh = _wh(spark, tmp_path,
             bloom_cols={"cdc_mirror": ["cust_id"],
                         "cdc_dev": ["cust_id"]},
             bloom_bits=1 << 12)
    for i in range(4):
        wh.commit_tx({"cdc_mirror":
                      _base(spark, n=400)
                      .filter(F.col("cust_id") % 4 == i).coalesce(1)})
    wh.clone_table("cdc_mirror", "cdc_dev")
    got = wh.point_lookup("cdc_dev", {"cust_id": 123}).collect()
    assert len(got) == 1 and got[0]["segment"] == "seg3"
    cand, total = wh.last_point_lookup
    assert total == 4 and cand < total, (cand, total)


def test_clone_name_collisions_raise(spark, tmp_path):
    wh = _wh(spark, tmp_path)
    wh.commit_tx({"cdc_mirror": _base(spark, n=10)})
    with pytest.raises(ValueError, match="base table"):
        wh.clone_table("cdc_mirror", "items")
    wh.clone_table("cdc_mirror", "cdc_dev")
    with pytest.raises(ValueError, match="already exists"):
        wh.clone_table("cdc_mirror", "cdc_dev")
    with pytest.raises(ValueError, match="no committed tx table"):
        wh.clone_table("nope", "cdc_x")


def test_clone_constraints_carry_and_enforce(spark, tmp_path):
    wh = _wh(spark, tmp_path)
    wh.commit_tx({"cdc_mirror": _base(spark, n=20)})
    wh.add_constraint_tx("cdc_mirror", "bal_pos", "balance >= 0")
    wh.clone_table("cdc_mirror", "cdc_dev")
    bad = spark.createDataFrame([(999, "x", -5.0)],
                                "cust_id long, segment string, balance double")
    with pytest.raises(Exception, match="bal_pos|constraint"):
        wh.commit_tx({"cdc_dev": bad})


def test_clone_rederives_on_cas_race(spark, tmp_path):
    """A clone losing the CAS race re-derives from the fresh log: a
    concurrent commit to the SOURCE that lands first is reflected in
    an at-latest clone (snapshot = publish time), and a concurrent
    clone taking the target name raises instead of double-creating."""
    wh = _wh(spark, tmp_path)
    wh.commit_tx({"cdc_mirror": _base(spark, n=30)})

    real_publish = wh._publish_txlog
    state = {"raced": False}

    def racing_publish(log):
        if not state["raced"]:
            state["raced"] = True
            # another writer lands a source commit first
            wh2 = Warehouse(wh.spark, wh.root, auto_compact_dvs=None)
            wh2._publish_txlog = real_publish
            extra = _base(spark, n=5).withColumn(
                "cust_id", F.col("cust_id") + 900)
            Warehouse.commit_tx(wh2, {"cdc_mirror": extra})
            raise FileExistsError("lost the race")
        return real_publish(log)

    wh._publish_txlog = racing_publish
    wh.clone_table("cdc_mirror", "cdc_dev")
    wh._publish_txlog = real_publish
    # the retried derivation saw the concurrent commit
    assert wh.read_committed_tx("cdc_dev").count() == 35
    # concurrent target-name taker: second clone raises
    with pytest.raises(ValueError, match="already exists"):
        wh.clone_table("cdc_mirror", "cdc_dev")


def test_clone_model_random_walk(spark, tmp_path):
    """Model-based stress over the clone surface: a seeded walk
    interleaving commits, merges, row-level deletes, clones (of
    sources AND of clones), compaction, checkpoint folds, and vacuum
    across a growing family of tables — after EVERY op, EVERY table
    must equal its pure-Python model. This is the cross-table
    isolation property stated once per dedicated test above, checked
    here under arbitrary interleavings."""
    import random

    wh = _wh(spark, tmp_path)
    rng = random.Random(23)
    model: dict[str, dict[int, float]] = {"cdc_mirror": {}}
    next_key = 0
    next_clone = 0

    def df_of(d):
        rows = [(k, "s", w) for k, w in sorted(d.items())] or None
        return spark.createDataFrame(
            rows or [], "cust_id long, segment string, balance double")

    def check_all():
        for t, want in model.items():
            got = {r["cust_id"]: r["balance"]
                   for r in wh.read_committed_tx(t).collect()}
            assert got == want, f"{t}: {got} != {want}"

    wh.commit_tx({"cdc_mirror": df_of({0: 1.0, 1: 2.0})})
    model["cdc_mirror"] = {0: 1.0, 1: 2.0}
    next_key = 2

    for step in range(18):
        op = rng.choice(["commit", "commit", "merge", "delete",
                         "clone", "clone", "compact", "checkpoint",
                         "vacuum"])
        t = rng.choice(sorted(model))
        cur = model[t]
        if op == "commit":
            fresh = {next_key + i: float(rng.randint(1, 9))
                     for i in range(rng.randint(1, 2))}
            next_key += len(fresh)
            wh.commit_tx({t: df_of(fresh)})
            cur.update(fresh)
        elif op == "merge" and cur:
            upd = {k: cur[k] + 100.0
                   for k in rng.sample(sorted(cur), 1)}
            wh.merge_tx(t, df_of(upd), ["cust_id"])
            cur.update(upd)
        elif op == "delete" and cur:
            k = rng.choice(sorted(cur))
            wh.delete_tx(t, f"cust_id = {k}")
            cur.pop(k)
        elif op == "clone":
            tgt = f"c{next_clone}"
            next_clone += 1
            wh.clone_table(t, tgt)
            model[tgt] = dict(cur)
        elif op == "compact" and cur:
            wh.compact(t)
        elif op == "checkpoint":
            wh.checkpoint_txlog(retain_last=3)
        elif op == "vacuum":
            wh.expire_snapshots(retain_last=3)
        check_all()
    assert next_clone >= 2, "walk must have exercised clones"
