"""MERGE / upsert / SCD2 emulation (no Delta/Iceberg jars in this
environment — the classic anti-join + union recipe, guide §Common
OLAP 'CDC / SCD2').

* :func:`merge_upsert` — MERGE INTO semantics on a key: matched rows
  replaced by the update, unmatched kept, new keys inserted. One
  anti-join + one union; the rewrite is the whole-table operation a
  format with deletion vectors would avoid, so partition the table
  and merge per partition at scale.
* :func:`scd2_apply` — type-2 dimension history: current rows whose
  attributes changed are closed (``valid_to`` stamped, ``is_current``
  false) and a new current version is appended.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def merge_upsert(target: DataFrame, updates: DataFrame,
                 keys: list[str],
                 delete_col: str | None = None) -> DataFrame:
    """MERGE: update-matched + insert-unmatched by ``keys``.
    ``updates`` wins on key collision; duplicate keys inside
    ``updates`` must be pre-resolved by the caller.

    ``delete_col`` names a boolean tombstone column on ``updates``:
    a matched key with a true tombstone is DELETED (Delta's ``WHEN
    MATCHED ... DELETE``); an unmatched tombstone is a no-op insert
    of nothing. The column is dropped from the output.

    Scale shape: one anti-join (broadcastable when the update batch
    is small — the CDC norm) + one union; no shuffle of the target
    beyond the join."""
    kept = target.join(updates.select(*keys).distinct(), keys, "left_anti")
    if delete_col is not None:
        updates = updates.filter(
            ~F.coalesce(F.col(delete_col), F.lit(False))
        ).drop(delete_col)
    return kept.unionByName(updates)


def scd2_apply(dim: DataFrame, updates: DataFrame, key: str,
               effective_ts, tracked_cols: list[str]) -> DataFrame:
    """Slowly-changing-dimension type 2.

    ``dim`` carries (``key``, tracked attributes, ``valid_from``,
    ``valid_to``, ``is_current``); ``updates`` carries (``key``,
    tracked attributes). Rows whose tracked attributes changed get
    their current version closed at ``effective_ts`` and a new open
    version appended; unchanged and absent keys pass through; keys
    present only in ``updates`` are inserted as initial open versions
    (``valid_from = effective_ts``).
    """
    cur = dim.filter(F.col("is_current"))
    hist = dim.filter(~F.col("is_current"))

    cmp_cond = F.lit(False)
    for c in tracked_cols:
        cmp_cond = cmp_cond | ~F.col(f"cur.{c}").eqNullSafe(F.col(f"upd.{c}"))

    # inner join: only keys present in the update batch can change
    joined = cur.alias("cur").join(updates.alias("upd"), key, "inner")
    # persisted: referenced by three branches below (closed/unchanged/
    # new_versions) — without it the compare-join runs three times
    changed_keys = joined.filter(cmp_cond).select(F.col(key)).distinct().persist()

    closed = (
        cur.join(changed_keys, key, "left_semi")
        .withColumn("valid_to", F.lit(effective_ts).cast("timestamp"))
        .withColumn("is_current", F.lit(False))
    )
    unchanged = cur.join(changed_keys, key, "left_anti")
    new_versions = (
        updates.join(changed_keys, key, "left_semi")
        .withColumn("valid_from", F.lit(effective_ts).cast("timestamp"))
        .withColumn("valid_to", F.lit(None).cast("timestamp"))
        .withColumn("is_current", F.lit(True))
    )
    # brand-new business keys: no current version exists yet, so the
    # inner compare-join above never sees them — insert them as the
    # initial open version rather than silently dropping new entities
    inserts = (
        updates.join(cur.select(key), key, "left_anti")
        .withColumn("valid_from", F.lit(effective_ts).cast("timestamp"))
        .withColumn("valid_to", F.lit(None).cast("timestamp"))
        .withColumn("is_current", F.lit(True))
    )
    return (hist.unionByName(unchanged).unionByName(closed)
            .unionByName(new_versions).unionByName(inserts))
