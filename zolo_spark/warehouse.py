"""Warehouse catalog: table init (S9), read/write helpers (S7/S8).

The reference keeps its warehouse in Postgres with drop-and-recreate DDL
(``bin/create_tables/*.py``); here the warehouse is managed Parquet under
a root directory, with explicit schemas from :mod:`zolo_spark.schemas`.

Scale posture: fact tables are written partitioned by ``created_at``
date so a 100 TB deployment gets partition pruning on the time
predicates every downstream query carries (SURVEY §7.5). With
``bucketed=True`` the header/detail fact pairs are additionally
bucketed on their join key, making the header⟕details join (J1, the
biggest fact-fact join in every model extract) shuffle-free: both
sides arrive pre-hashed into the same bucket layout, so a 100 TB join
moves zero bytes over the network.
"""

from __future__ import annotations

import math
import os
import re
import shutil
import time

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructType
from pyspark.errors import AnalysisException

from . import schemas

# Fact tables partitioned by event date at rest.
_PARTITIONED = {
    "square_trans": "created_at",
    "shopify_trans": "created_at",
    "qb_trans": "created_at",
}

# Header/detail pairs bucket on the key their J1 join uses, so the
# join is co-located at rest (zero-shuffle sort-merge join).
_BUCKETED = {
    "square_trans": "payment_id",
    "square_trans_details": "payment_id",
    "shopify_trans": "order_id",
    "shopify_trans_details": "order_id",
    "qb_trans": "payment_id",
    "qb_trans_details": "payment_id",
}

# Tx-log per-file stats recorded by default on the ETL tx tables,
# keyed on each table's natural merge key (the same key _BUCKETED
# co-locates on): a CDC MERGE into these prunes on pure tx-log
# metadata — zero footer round trips, the gap that matters on object
# storage where a 100 TB table has 10^5 files. Callers can extend or
# disable via the ``stats_cols`` constructor arg.
_DEFAULT_STATS_COLS = {t: [k] for t, k in _BUCKETED.items()}

# --- driver-side xxhash64 (XXH64, Collet's published spec; the port
# mirrors Spark's catalyst XXH64 so bloom point-lookup probes hash
# WITHOUT a Spark job — pytest pins every branch bit-equal to
# F.xxhash64 over value/seed/length grids) -------------------------
_XXP1 = 0x9E3779B185EBCA87
_XXP2 = 0xC2B2AE3D27D4EB4F
_XXP3 = 0x165667B19E3779F9
_XXP4 = 0x85EBCA77C2B2AE63
_XXP5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _xxfmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _XXP2) & _M64
    h ^= h >> 29
    h = (h * _XXP3) & _M64
    h ^= h >> 32
    return h


def _signed64(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def _xxh64_long(v: int, seed: int) -> int:
    """Spark XXH64.hashLong: the 8-byte primitive path."""
    h = (seed + _XXP5 + 8) & _M64
    k1 = _rotl64((v & _M64) * _XXP2 & _M64, 31) * _XXP1 & _M64
    h ^= k1
    h = (_rotl64(h, 27) * _XXP1 + _XXP4) & _M64
    return _signed64(_xxfmix(h))


def _xxh64_int(v: int, seed: int) -> int:
    """Spark XXH64.hashInt: the 4-byte primitive path (int, short,
    byte are all widened to this by catalyst)."""
    h = (seed + _XXP5 + 4) & _M64
    h ^= ((v & 0xFFFFFFFF) * _XXP1) & _M64
    h = (_rotl64(h, 23) * _XXP2 + _XXP3) & _M64
    return _signed64(_xxfmix(h))


def _xxh64_bytes(data: bytes, seed: int) -> int:
    """Spark XXH64.hashUnsafeBytes (strings hash their UTF-8 bytes):
    stride-32 accumulator rounds over the 8-byte-aligned prefix, then
    one 4-byte step, then per-byte steps."""
    length = len(data)
    nwords = length - (length % 8)
    off = 0
    if nwords >= 32:
        v1 = (seed + _XXP1 + _XXP2) & _M64
        v2 = (seed + _XXP2) & _M64
        v3 = seed & _M64
        v4 = (seed - _XXP1) & _M64
        end32 = nwords - (nwords % 32)
        while off < end32:
            v1 = (_rotl64((v1 + int.from_bytes(
                data[off:off + 8], "little") * _XXP2) & _M64, 31)
                * _XXP1) & _M64
            v2 = (_rotl64((v2 + int.from_bytes(
                data[off + 8:off + 16], "little") * _XXP2) & _M64, 31)
                * _XXP1) & _M64
            v3 = (_rotl64((v3 + int.from_bytes(
                data[off + 16:off + 24], "little") * _XXP2) & _M64, 31)
                * _XXP1) & _M64
            v4 = (_rotl64((v4 + int.from_bytes(
                data[off + 24:off + 32], "little") * _XXP2) & _M64, 31)
                * _XXP1) & _M64
            off += 32
        h = (_rotl64(v1, 1) + _rotl64(v2, 7)
             + _rotl64(v3, 12) + _rotl64(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl64((v * _XXP2) & _M64, 31) * _XXP1) & _M64
            h = (h * _XXP1 + _XXP4) & _M64
    else:
        h = (seed + _XXP5) & _M64
    h = (h + length) & _M64
    while off < nwords:
        k1 = _rotl64((int.from_bytes(data[off:off + 8], "little")
                      * _XXP2) & _M64, 31) * _XXP1 & _M64
        h ^= k1
        h = (_rotl64(h, 27) * _XXP1 + _XXP4) & _M64
        off += 8
    if off + 4 <= length:
        h ^= (int.from_bytes(data[off:off + 4], "little")
              * _XXP1) & _M64
        h = (_rotl64(h, 23) * _XXP2 + _XXP3) & _M64
        off += 4
    while off < length:
        h ^= (data[off] * _XXP5) & _M64
        h = (_rotl64(h, 11) * _XXP1) & _M64
        off += 1
    return _signed64(_xxfmix(h))


class ConcurrentWriteError(RuntimeError):
    """A REWRITE (merge / compact / restore) was built from a snapshot
    another writer has since changed — committing it would silently
    drop the concurrent writer's rows. Delta raises
    ``ConcurrentModificationException`` here; re-run the operation
    against the current state."""


class Warehouse:
    """Parquet-backed warehouse rooted at ``root``.

    ``bucketed=True`` stores the fact tables as catalog tables (bucket
    layout lives in catalog metadata, not parquet) bucketed per
    ``_BUCKETED``; data files still land under ``root``. ``buckets``
    sizes the layout — pick ``expected_table_bytes / 256 MB`` at
    deploy scale (e.g. ~4096 for a 1 TB details table)."""

    def __init__(self, spark: SparkSession, root: str,
                 bucketed: bool = False, buckets: int = 8,
                 auto_checkpoint_every: int | None = None,
                 auto_checkpoint_retain: int = 10,
                 auto_compact_dvs: int | None = 6,
                 stats_cols: dict[str, list[str]] | None = None,
                 bloom_cols: dict[str, list[str]] | None = None,
                 bloom_bits: int = 1 << 20,
                 bloom_hashes: int = 5):
        """``auto_checkpoint_every=N`` opts into tx-log maintenance on
        ingest: after a commit, if the log holds ≥ N records, it is
        folded down to an ``auto_checkpoint_retain``-record
        time-travel window (Delta writes a checkpoint every 10
        commits the same way). Off by default — explicit
        ``checkpoint_txlog``/``expire_snapshots`` remain the
        maintenance path, and auto mode never vacuums (dropping
        batch dirs stays an explicit operator decision).

        ``auto_compact_dvs=N`` bounds merge-on-read debt: after a
        ``merge_tx(mode="mor")`` leaves a table with ≥ N live
        deletion vectors, the table is compacted (DVs materialized,
        one right-sized batch) in the same call — Databricks'
        auto-compaction for DV tables. Every read pays one broadcast
        join per live DV (measured +0.4–0.5 s each at the 6M-row
        rehearsal scale, BASELINE.md round 12), so N trades merge
        latency against read amplification; the default 6 sits in
        the measured 4–8 sweet spot. ``None`` disables — DVs then
        accumulate until an explicit :meth:`compact`.

        ``stats_cols={"table": ["key", ...]}`` opts a table into
        Delta-style per-file column stats IN THE TX LOG: every
        staged batch's footer min/max for those columns is recorded
        on its commit record, so merge-file pruning becomes a pure
        metadata decision — no per-file footer round trips at merge
        time, the gap that matters on object storage where a 100 TB
        table has 10^5 files. Files committed before the opt-in (or
        for other columns) fall back to footer reads, exactly as
        before. Defaults to ``_DEFAULT_STATS_COLS`` — the ETL tx
        tables on their natural merge keys — so the product
        pipelines get metadata-only MERGE pruning out of the box;
        pass ``{}`` to disable.

        ``bloom_cols={"table": ["key", ...]}`` opts a table into
        Delta-style BLOOM FILTER INDEXES — the data-skipping tier for
        point predicates min/max stats can't serve: a high-cardinality
        key that is NOT the clustering column has near-full-domain
        min/max on every file, so stats pruning keeps nothing, while a
        per-file bloom proves "key definitely not in this file" and
        skips it. Every commit of an opted table computes, in ONE
        distributed job per table (never collected to the driver), a
        per-(file, column) bloom bitmap over the staged batch and
        writes it as a parquet SIDECAR next to the data (Delta stores
        its bloom indexes in index files the same way — the bitmaps
        are far too large for the JSON log at real file sizes). The
        sidecars feed :meth:`point_lookup` and refine
        :meth:`merge_tx`'s file pruning; files without an index (or
        indexed under a different ``bloom_bits``/``bloom_hashes``
        config) conservatively stay candidates. Sizing: a bloom needs
        ~10 bits per distinct key for a ~1% false-positive rate — the
        default 2^20 bits (128 KiB/file/column) serves files of up to
        ~10^5 keys; at 128 MB files of ~10^6 rows pass ``bloom_bits=
        1 << 23``. Off by default: the index job adds one scan of the
        staged batch to every commit, a price only point-lookup /
        CDC-merge workloads should pay."""
        self.spark = spark
        self.root = root
        self.bucketed = bucketed
        self.buckets = buckets
        self.auto_checkpoint_every = auto_checkpoint_every
        self.auto_checkpoint_retain = auto_checkpoint_retain
        self.auto_compact_dvs = auto_compact_dvs
        self.stats_cols = dict(_DEFAULT_STATS_COLS if stats_cols is None
                               else stats_cols)
        self.bloom_cols = dict(bloom_cols or {})
        self.bloom_bits = bloom_bits
        self.bloom_hashes = bloom_hashes
        # catalog namespace derived from the root path: two warehouses
        # in one session never collide
        self._db = "zolo_wh_" + re.sub(r"[^a-z0-9]+", "_", root.lower()).strip("_")
        if bucketed:
            self.spark.sql(f"CREATE DATABASE IF NOT EXISTS {self._db}")

    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _qualified(self, table: str) -> str:
        return f"{self._db}.{table}"

    def _is_bucketed(self, table: str) -> bool:
        return self.bucketed and table in _BUCKETED

    def init(self, tables: list[str] | None = None) -> None:
        """Create empty tables with their DDL schemas (reference S9:
        drop-and-recreate, ``create_square_tables.py:16-38`` etc.)."""
        for name in tables or list(schemas.WAREHOUSE_TABLES):
            if self._is_bucketed(name):
                self.spark.sql(
                    f"DROP TABLE IF EXISTS {self._qualified(name)}"
                )
            empty = self.spark.createDataFrame([], schemas.WAREHOUSE_TABLES[name])
            self._write(empty, name, mode="overwrite")

    def read(self, table: str) -> DataFrame:
        want = schemas.WAREHOUSE_TABLES[table]
        if self._is_bucketed(table):
            # catalog read: keeps the bucket spec, so downstream joins
            # on the bucket key plan with zero exchanges
            df = self.spark.table(self._qualified(table))
        else:
            df = self.spark.read.schema(want).parquet(self.path(table))
        # hide the _dt partition-discovery column from consumers
        return df.select([f.name for f in want.fields])

    def read_between(self, table: str, start, end) -> DataFrame:
        """Time-sliced read of a partitioned fact table. The predicate
        is applied to the ``_dt`` partition column (directory pruning —
        at 100 TB this is the difference between scanning a day and
        scanning the table) AND to the row-level timestamp."""
        want = schemas.WAREHOUSE_TABLES[table]
        if self._is_bucketed(table):
            df = self.spark.table(self._qualified(table))
        elif self._table_in_txlog(table):
            # tx-managed: committed file list only (a raw directory
            # read would trip over batch-* nesting AND leak staged
            # uncommitted batches). No _dt directories here — pruning
            # comes from parquet footer min/max on the timestamp
            # column, kept tight by the sort in commit_tx staging.
            df = self.read_committed_tx(table)
        else:
            df = self.spark.read.schema(want).parquet(self.path(table))
        part_col = _PARTITIONED.get(table)
        if part_col is not None and "_dt" in df.columns:
            df = df.filter(
                (F.col("_dt") >= F.to_date(F.lit(start)))
                & (F.col("_dt") <= F.to_date(F.lit(end)))
            )
        if part_col is not None:
            df = df.filter(
                (F.col(part_col) >= F.lit(start)) & (F.col(part_col) < F.lit(end))
            )
        return df.select([f.name for f in want.fields])

    def append(self, df: DataFrame, table: str,
               dedupe_on: list[str] | None = None,
               jdbc_url: str | None = None) -> None:
        """S7: ``to_sql(..., if_exists='append')`` analog
        (``square_ETL.py:232-233``).

        ``dedupe_on``: natural-key columns for idempotent append — new
        rows whose key already exists in the table are anti-joined
        away, upgrading the reference's at-least-once watermark
        semantics (S10) to effectively-once on rerun. Default off for
        behavioral fidelity.

        ``jdbc_url``: route the sink to an external RDBMS over JDBC
        instead of the managed parquet path — the reference's
        ``to_sql`` wrote to a SQL database, and this is the literal
        analog (S7/S8 mapping, SURVEY §2.1). The dedupe read then also
        goes through JDBC so idempotency holds against the actual
        destination table."""
        if jdbc_url is None and self._has_manifest(table):
            raise ValueError(
                f"table {table} is manifest-managed (append_commit); a "
                "plain append would write files the manifest never "
                "references — commit through append_commit instead"
            )
        if jdbc_url is None and self._table_in_txlog(table):
            raise ValueError(
                f"table {table} is tx-managed (commit_tx); a plain "
                "append would write files the tx log never references "
                "— commit through commit_tx instead"
            )
        if dedupe_on:
            try:
                src = (self.read_jdbc(jdbc_url, table) if jdbc_url
                       else self.read(table))
                existing = src.select(*dedupe_on).distinct()
                df = df.join(existing, dedupe_on, "left_anti")
            except AnalysisException:
                # first write: table/path doesn't exist yet → plain
                # append. Anything else (corrupt footer, executor
                # failure) must propagate — silently skipping the
                # anti-join would disable idempotency without signal.
                pass
        if jdbc_url is not None:
            self._write_jdbc(df, table, "append", jdbc_url)
        else:
            self._write(df, table, mode="append")

    def file_stats(self, table: str) -> tuple[int, int]:
        """(parquet file count, total bytes) under the table path —
        the small-files health metric compaction acts on."""
        files = total = 0
        for dirpath, _dirs, fnames in os.walk(self.path(table)):
            for fn in fnames:
                if fn.endswith(".parquet"):
                    files += 1
                    total += os.path.getsize(os.path.join(dirpath, fn))
        return files, total

    def compact(self, table: str,
                target_file_bytes: int = 128 * 1024 * 1024,
                zorder_by: list[str] | None = None,
                zorder_bits: int = 8,
                where: str | None = None) -> tuple[int, int]:
        """Rewrite a path-based table into right-sized files and
        return (files_before, files_after).

        ``where`` — Delta's ``OPTIMIZE table WHERE predicate`` (tx
        tables only): rewrite ONLY the committed files holding rows
        matching the predicate, re-reference the rest untouched. At
        100 TB this is how maintenance stays affordable — yesterday's
        hot partition compacts in O(its files) while the cold 99% of
        the table is never read. Contents are preserved exactly (the
        predicate selects FILES, it never filters rows).

        Long-running ingest (many small `append` batches, streaming
        micro-batches) accretes files far smaller than a scan task
        wants; at 100 TB the file-listing + task-per-file overhead
        dominates scans. Partitioned tables are rewritten with one
        shuffle keyed on ``_dt`` (one writer task per date →
        per-date consolidation); unpartitioned tables repartition to
        ``ceil(bytes / target)``. The rewrite lands in a temp dir and
        is swapped in with directory renames — on an object store a
        deployment would swap a catalog pointer / manifest instead.

        ``zorder_by`` — Delta's ``OPTIMIZE ... ZORDER BY`` analog:
        each named numeric column is normalized into ``2^zorder_bits``
        equi-width bins (bounds from one tiny min/max aggregate) and
        the rewrite is range-partitioned + sorted on the Morton
        interleave (:func:`~zolo_spark.ops.partitioning.zorder_key`),
        so every file's min/max footer statistics stay TIGHT on every
        listed dimension and a reader prunes files on ANY of them, not
        just a leading sort column (pytest measures the file-skip
        ratio against the unclustered layout: on a 64×64 2-D grid in
        17 files, a second-dimension-only box prunes 76% of files and
        a 2-D corner box 94%, where plain compaction prunes 0%).
        Partitioned tables
        z-order WITHIN each date partition (sort inside the per-date
        writer task → row-group-level clustering)."""
        if self._is_bucketed(table):
            raise ValueError(
                "bucketed tables carry their layout in the catalog; "
                "compact via INSERT OVERWRITE to preserve the bucket spec"
            )
        if where is not None and not self._table_in_txlog(table):
            raise ValueError(
                "compact(where=...) needs the tx log's file-level "
                "bookkeeping; only tx-managed tables support it")
        if self._has_manifest(table):
            # Manifest tables must keep manifest + files consistent: a
            # directory swap here would strand _MANIFEST.json in the
            # __old dir and silently reset the committed watermark to
            # epoch. Rewrite committed data as ONE new batch and
            # republish the manifest atomically instead.
            return self._compact_committed(
                table, target_file_bytes, zorder_by, zorder_bits)
        if self._table_in_txlog(table):
            # Tx-managed tables carry their file lists (relative
            # paths) in the warehouse tx log: the directory swap
            # below would strand every committed batch the log
            # references. Rewrite + publish a REWRITE record through
            # the log's own atomic rename instead (superseded files
            # stay time-travel-readable until expire_snapshots).
            return self._compact_committed_tx(
                table, target_file_bytes, zorder_by, zorder_bits,
                where)
        files_before, total = self.file_stats(table)
        want = schemas.WAREHOUSE_TABLES[table]
        df = self.read(table)
        df = df.select([F.col(f.name).cast(f.dataType) for f in want.fields])
        if zorder_by:
            df = self._with_zorder_key(df, zorder_by, zorder_bits)
        part_col = _PARTITIONED.get(table)
        tmp = self.path(table) + "__compacting"
        if part_col is not None and part_col in df.columns:
            df = df.withColumn("_dt", F.to_date(F.col(part_col)))
            out = df.repartition(F.col("_dt"))
            if zorder_by:
                out = (out.sortWithinPartitions("_dt", "_zkey")
                       .drop("_zkey"))
            (out.write.mode("overwrite").partitionBy("_dt").parquet(tmp))
        else:
            n = max(1, math.ceil(total / target_file_bytes))
            if zorder_by:
                out = (df.repartitionByRange(n, "_zkey")
                       .sortWithinPartitions("_zkey").drop("_zkey"))
            else:
                out = df.repartition(n)
            out.write.mode("overwrite").parquet(tmp)
        live, trash = self.path(table), self.path(table) + "__old"
        shutil.rmtree(trash, ignore_errors=True)
        os.rename(live, trash)
        os.rename(tmp, live)
        shutil.rmtree(trash)
        return files_before, self.file_stats(table)[0]

    # ---------------------------------------------------------------
    # Transactional append: manifest + watermark in ONE atomic rename.
    # The reference's watermark lives in config.yml and commits AFTER
    # the load (square_ETL.py:20-22,53-56), so a crash between the two
    # re-extracts the window and appends duplicates (at-least-once,
    # S10). Here the table's committed contents are DEFINED by a
    # manifest file that also carries the watermark: data files are
    # written invisible, then one os.replace of the manifest publishes
    # files and watermark together — the crash window is closed by
    # construction (the Iceberg/Delta snapshot-commit pattern; on an
    # object store the rename becomes a conditional PUT of the
    # manifest pointer).

    def _manifest_path(self, table: str) -> str:
        return os.path.join(self.path(table), "_MANIFEST.json")

    def _has_manifest(self, table: str) -> bool:
        return os.path.exists(self._manifest_path(table))

    def _compact_committed(self, table: str, target_file_bytes: int,
                           zorder_by: list[str] | None,
                           zorder_bits: int) -> tuple[int, int]:
        """Compact a manifest-managed table: rewrite the committed rows
        into one right-sized batch directory, then publish a manifest
        referencing only the new files (watermarks carried over) with
        the same atomic rename ``append_commit`` uses. A crash at any
        point leaves the old manifest (and its files) live; the staged
        rewrite is garbage ``vacuum_uncommitted`` collects."""
        import json
        import uuid

        man = self._read_manifest(table)
        files_before = len(man["files"])
        if files_before == 0:
            return 0, 0
        root = self.path(table)
        total = sum(os.path.getsize(os.path.join(root, rel))
                    for rel in man["files"])
        df = self.read_committed(table)
        if zorder_by:
            df = self._with_zorder_key(df, zorder_by, zorder_bits)
        n = max(1, math.ceil(total / target_file_bytes))
        if zorder_by:
            out = (df.repartitionByRange(n, "_zkey")
                   .sortWithinPartitions("_zkey").drop("_zkey"))
        else:
            out = df.repartition(n)
        batch_dir = f"batch-{uuid.uuid4().hex}"
        out.write.mode("overwrite").parquet(os.path.join(root, batch_dir))
        new_files = sorted(
            os.path.join(batch_dir, fn)
            for fn in os.listdir(os.path.join(root, batch_dir))
            if fn.endswith(".parquet"))
        new_man = {"files": new_files, "watermarks": man["watermarks"]}
        tmp = self._manifest_path(table) + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(new_man, f)
        os.replace(tmp, self._manifest_path(table))  # THE commit point
        self.vacuum_uncommitted(table)  # drop the superseded batches
        return files_before, len(new_files)

    def _read_manifest(self, table: str) -> dict:
        import json

        p = self._manifest_path(table)
        if not os.path.exists(p):
            return {"files": [], "watermarks": {}}
        with open(p) as f:
            return json.load(f)

    def append_commit(self, df: DataFrame, table: str,
                      watermark_key: str | None = None,
                      watermark_value: str | None = None) -> None:
        """Exactly-once append: stage the batch's parquet under an
        invisible batch directory, then publish (manifest file list +
        watermark) with one atomic manifest rename. A crash at ANY
        point before the rename leaves the watermark unmoved and the
        staged files unreferenced, so the rerun re-extracts the same
        window and commits it once — zero duplicates without
        ``dedupe_on`` (pytest injects the crash)."""
        import json
        import uuid

        if self._table_in_txlog(table):
            raise ValueError(
                f"table {table} is tx-managed (commit_tx); a manifest "
                "commit would fork its committed contents into two "
                "disagreeing logs — keep committing through commit_tx"
            )
        want = schemas.WAREHOUSE_TABLES[table]
        df = df.select([F.col(f.name).cast(f.dataType) for f in want.fields])
        batch_dir = f"batch-{uuid.uuid4().hex}"
        out = os.path.join(self.path(table), batch_dir)
        df.write.mode("overwrite").parquet(out)
        new_files = sorted(
            os.path.join(batch_dir, fn) for fn in os.listdir(out)
            if fn.endswith(".parquet"))
        man = self._read_manifest(table)
        man["files"] = man["files"] + new_files
        if watermark_key is not None:
            man["watermarks"][watermark_key] = watermark_value
        tmp = self._manifest_path(table) + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(man, f)
        os.replace(tmp, self._manifest_path(table))  # THE commit point

    def read_committed(self, table: str) -> DataFrame:
        """The manifest-defined contents — staged-but-uncommitted
        batch directories are invisible here by construction."""
        man = self._read_manifest(table)
        if not man["files"]:
            return self.spark.createDataFrame(
                [], schemas.WAREHOUSE_TABLES[table])
        paths = [os.path.join(self.path(table), rel)
                 for rel in man["files"]]
        return self.spark.read.schema(
            schemas.WAREHOUSE_TABLES[table]).parquet(*paths)

    def committed_watermark(self, table: str, key: str,
                            default: str = "1970-01-01T00:00:00") -> str:
        """The watermark that committed WITH the data — the extract
        lower bound a rerun must use for exactly-once semantics."""
        return self._read_manifest(table)["watermarks"].get(key, default)

    # ---------------------------------------------------------------
    # Multi-table transactional commit: ONE warehouse-level tx log.
    # The per-table manifest (append_commit) closes the crash window
    # for a single table, but the reference ETLs load header+details
    # PAIRS from one extract — two per-table commits reopen the window
    # between them (crash ⇒ details committed, header not, watermark
    # ambiguous). The tx log is the multi-table extension: every
    # table's staged files and the watermark publish in ONE atomic
    # metadata-file publish, so the pair + watermark are
    # all-or-nothing by construction.
    #
    # Commit protocol (Iceberg's metadata.json chain): the current log
    # is the HIGHEST-numbered _TXLOG.{n}.json; a writer stages the new
    # log to a tmp file and publishes with os.link(tmp, next-number) —
    # link fails atomically if another writer took that number, and
    # the loser re-reads the (now longer) log and retries. That makes
    # concurrent commit_tx calls SERIALIZABLE with no lost updates —
    # os.replace of a single file was last-writer-wins. On an object
    # store, os.link is the conditional PUT (If-None-Match) of the
    # next metadata key. Legacy single-file _TXLOG.json logs are read
    # as generation 0 and upgraded on the next publish.

    _TXLOG_RETAIN_FILES = 3  # superseded metadata files kept for
    #                          readers mid-flight; older ones GC'd on
    #                          expire_snapshots

    def _txlog_generations(self) -> list[tuple[int, str]]:
        """Sorted (n, path) of every published metadata file."""
        import re

        out = []
        if not os.path.isdir(self.root):
            return out
        for fn in os.listdir(self.root):
            m = re.fullmatch(r"_TXLOG\.(\d+)\.json", fn)
            if m:
                out.append((int(m.group(1)), os.path.join(self.root, fn)))
        legacy = os.path.join(self.root, "_TXLOG.json")
        if os.path.exists(legacy):
            out.append((0, legacy))
        return sorted(out)

    def _txlog_path(self) -> str:
        """The CURRENT log file (highest generation), or the legacy /
        first-generation default when none is published yet."""
        gens = self._txlog_generations()
        if gens:
            return gens[-1][1]
        return os.path.join(self.root, "_TXLOG.json")

    def _read_txlog(self) -> dict:
        import json

        # a generation can be GC'd between resolving the path and
        # opening it (concurrent publishes past the retain window) —
        # re-resolve rather than misreading "no log"
        for _ in range(5):
            p = self._txlog_path()
            try:
                with open(p) as f:
                    return json.load(f)
            except FileNotFoundError:
                if not self._txlog_generations():
                    break
        else:
            # 5 consecutive reads lost the race while generations
            # still exist — returning {"txs": []} here would let a
            # commit built on the empty read publish a log containing
            # only its own tx, silently discarding ALL committed
            # history. Raise instead; only a genuinely fresh
            # warehouse (no generations at all) gets the empty log.
            raise RuntimeError(
                "tx log unreadable after 5 retries while generations "
                f"exist under {self.root}; refusing to treat the "
                "warehouse as empty")
        return {"txs": []}

    def _publish_txlog(self, log: dict) -> None:
        """Atomically publish ``log`` as the next metadata generation
        (compare-and-swap; raises ``FileExistsError`` to the caller's
        retry loop if a concurrent writer took the number first)."""
        import json
        import uuid

        gens = self._txlog_generations()
        next_gen = (gens[-1][0] if gens else 0) + 1
        tmp = os.path.join(self.root,
                           f"_TXLOG.tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(log, f)
        target = os.path.join(self.root, f"_TXLOG.{next_gen}.json")
        try:
            os.link(tmp, target)  # THE commit point (atomic CAS)
        finally:
            os.remove(tmp)
        # drop superseded generations beyond the retain window; the
        # legacy file is superseded the moment generation 1 exists
        for n, p in gens[:-self._TXLOG_RETAIN_FILES or None]:
            try:
                os.remove(p)
            except OSError:
                pass

    @staticmethod
    def _raw_head(log: dict) -> int:
        """The last version number in the RAW log (main and branch
        records alike) — what ``expect_version`` compares against."""
        raw = Warehouse._all_txs(log)
        return raw[-1][0] if raw else 0

    @staticmethod
    def _all_txs(log: dict) -> list[tuple[int, dict]]:
        """EVERY record as (version, tx) pairs in log order — main
        AND branch lineages. Records written before versioning get
        the implicit version prev+1 — monotone by construction, so a
        legacy log time-travels by position. Version assignment for
        new records MUST use this raw list (a branch record occupies
        its version number even though main readers never see it)."""
        out, v = [], 0
        for tx in log["txs"]:
            v = tx.get("version", v + 1)
            out.append((v, tx))
        return out

    @staticmethod
    def _branch_state(pairs: list[tuple[int, dict]]
                      ) -> tuple[dict, dict]:
        """Replay branch refs over raw pairs:
        ``(live, published)`` where ``live`` maps a branch name to
        ``(create_version, fork_version)`` of its CURRENT lineage
        (latest create wins — a recreated name is a fresh lineage;
        its records are scoped by ``version > create_version``), and
        ``published`` maps a name to the list of
        ``(create_version, publish_version)`` windows fast-forwarded
        into main."""
        live: dict[str, tuple[int, int]] = {}
        published: dict[str, list[tuple[int, int]]] = {}
        for v, tx in pairs:
            for n, fork in tx.get("branch_create", {}).items():
                live[n] = (v, fork)
            for n, cv in tx.get("branch_publish", {}).items():
                published.setdefault(n, []).append((cv, v))
            for n in tx.get("branch_drop", []):
                live.pop(n, None)
        return live, published

    @staticmethod
    def _effective_txs(log: dict,
                       branch: str | None = None
                       ) -> list[tuple[int, dict]]:
        """The (version, tx) pairs VISIBLE to a lineage, in version
        order — Iceberg branch semantics over one append-only log.

        Main (``branch=None``) sees untagged records plus every
        branch record a ``branch_publish`` (fast-forward) merged in.
        A branch sees main AS OF ITS FORK plus its own tagged records
        — writes to main after the fork never leak into the branch,
        and branch records never leak into main until published.
        With no branch records in the log this is the identity over
        :meth:`_all_txs` (zero-cost for the common case)."""
        pairs = Warehouse._all_txs(log)
        if branch is None and not any(
                "branch" in tx for _, tx in pairs):
            return pairs
        live, published = Warehouse._branch_state(pairs)

        def main_visible(v: int, tx: dict) -> bool:
            b = tx.get("branch")
            if b is None:
                return True
            return any(cv < v < pv for cv, pv in published.get(b, []))

        if branch is None:
            return [(v, tx) for v, tx in pairs if main_visible(v, tx)]
        if branch not in live:
            raise ValueError(f"no branch {branch}")
        cv, fork = live[branch]
        return [(v, tx) for v, tx in pairs
                if (tx.get("branch") == branch and v > cv)
                or (main_visible(v, tx) and v <= fork)]

    @staticmethod
    def _replay_files(txs: list[tuple[int, dict]], table: str,
                      as_of_version: int | None = None) -> list[str]:
        """The table's committed file list at ``as_of_version`` (or
        now): walk records in order, a REWRITE record (compaction)
        replaces the accumulated list, a plain tx extends it."""
        files: list[str] = []
        for v, tx in txs:
            if as_of_version is not None and v > as_of_version:
                break
            if table in tx.get("replaces", []):
                files = list(tx["tables"].get(table, []))
            else:
                files.extend(tx["tables"].get(table, []))
        return files

    @staticmethod
    def _replay_file_versions(txs: list[tuple[int, dict]], table: str,
                              as_of_version: int | None = None
                              ) -> list[tuple[int, list[str]]]:
        """Like :meth:`_replay_files` but keeps each surviving file's
        COMMIT VERSION — the ``_fv`` a merge-on-read deletion vector
        is applied against (a DV at version v deletes matching rows
        only in files committed strictly before v). A REWRITE record
        resets the segments to one (its own version); a checkpoint
        snapshot contributes one segment at the snapshot version,
        which is strictly below every retained DV's version, so
        folding never changes DV application."""
        segs: list[tuple[int, list[str]]] = []
        for v, tx in txs:
            if as_of_version is not None and v > as_of_version:
                break
            if table in tx.get("replaces", []):
                segs = [(v, list(tx["tables"].get(table, [])))]
            elif tx["tables"].get(table):
                segs.append((v, list(tx["tables"][table])))
        return [(v, fl) for v, fl in segs if fl]

    @staticmethod
    def _replay_dvs(txs: list[tuple[int, dict]], table: str,
                    as_of_version: int | None = None
                    ) -> list[tuple[int, list[str], list[str]]]:
        """The table's LIVE deletion vectors at ``as_of_version`` (or
        now): ``[(version, key_cols, dv_files)]`` in commit order. A
        REWRITE record (compaction / restore / cow-merge) materializes
        every earlier DV into its rewritten files, so it clears the
        accumulated list — same replay rule as the file list."""
        dvs: list[tuple[int, list[str], list[str]]] = []
        for v, tx in txs:
            if as_of_version is not None and v > as_of_version:
                break
            if table in tx.get("replaces", []):
                dvs = []
            if tx.get("dv", {}).get(table):
                dvs.append((v, list(tx["dv_keys"][table]),
                            list(tx["dv"][table])))
        return dvs

    def _check_retained(self, as_of_version: int | None,
                        txs: list[tuple[int, dict]]) -> None:
        """Raise if ``as_of_version`` predates the retained window —
        a checkpoint SNAPSHOT record folds history, so versions below
        its version are expired (Iceberg: unknown snapshot id)."""
        if as_of_version is None or not txs:
            return
        v0, tx0 = txs[0]
        if tx0.get("snapshot") and as_of_version < v0:
            raise ValueError(
                f"version {as_of_version} expired: the tx log's "
                f"retained window starts at version {v0} "
                "(checkpoint_txlog folded earlier history)")

    def commit_tx(self, frames: dict[str, DataFrame],
                  watermarks: dict[str, str] | None = None,
                  branch: str | None = None) -> None:
        """Atomically append every frame to its table AND publish the
        watermarks: stage each table's parquet under an invisible
        batch directory, then append one tx record to the log with a
        single atomic rename. A crash at ANY point before the rename
        leaves every table unchanged and every watermark unmoved —
        the rerun re-extracts the same window and commits the whole
        pair exactly once (pytest injects the crash).

        ``branch`` lands the commit on a named branch
        (:meth:`create_branch`): invisible to main readers until
        :meth:`fast_forward` publishes the lineage — Iceberg's
        write-audit-publish onto a branch."""
        import uuid

        for table in frames:
            if self._has_manifest(table):
                raise ValueError(
                    f"table {table} is manifest-managed (append_commit); "
                    "a tx commit would fork its committed contents into "
                    "two disagreeing logs — keep committing through "
                    "append_commit"
                )
        lineage = self._effective_txs(self._read_txlog(), branch) \
            if branch is not None else None
        fields_of = {t: self._tx_fields(t, lineage) for t in frames}
        staged: dict[str, list[str]] = {}
        for table, df in frames.items():
            df = self._to_physical(df, fields_of[table])
            c_cols = self._cluster_cols(table, lineage)
            if c_cols:
                # cluster each staged batch on the spec columns so
                # every file's footer min/max is tight — that's what
                # read_between prunes against on tx tables (no _dt
                # directories here); the columns come from the
                # evolved cluster spec (set_clustering), falling back
                # to the static default
                df = df.sortWithinPartitions(*c_cols)
            batch_dir = f"batch-{uuid.uuid4().hex}"
            out = os.path.join(self.path(table), batch_dir)
            df.write.mode("overwrite").parquet(out)
            staged[table] = sorted(
                os.path.join(batch_dir, fn) for fn in os.listdir(out)
                if fn.endswith(".parquet"))
        validated = {
            table: (self._validate_staged(table, staged[table],
                                          fields_of[table], lineage),
                    staged[table])
            for table in staged}
        self._append_tx_record(staged, dict(watermarks or {}),
                               validated_constraints=validated,
                               branch=branch)
        if (self.auto_checkpoint_every is not None
                and len(self._read_txlog()["txs"])
                >= self.auto_checkpoint_every):
            self.checkpoint_txlog(retain_last=self.auto_checkpoint_retain)

    def _append_tx_record(self, tables: dict[str, list[str]],
                          watermarks: dict[str, str] | None = None,
                          replaces: list[str] | None = None,
                          schema_add: dict | None = None,
                          schema_drop: dict | None = None,
                          schema_rename: dict | None = None,
                          expect_files: dict[str, list[str]] | None = None,
                          dv: dict[str, list[str]] | None = None,
                          dv_keys: dict[str, list[str]] | None = None,
                          constraint_add: dict | None = None,
                          constraint_drop: dict | None = None,
                          wap: str | None = None,
                          validated_constraints: dict | None = None,
                          tag_add: dict | None = None,
                          tag_drop: list | None = None,
                          expect_version: int | None = None,
                          branch: str | None = None,
                          branch_create: dict | None = None,
                          branch_publish: dict | None = None,
                          branch_drop: list | None = None,
                          cluster_spec: dict | None = None
                          ) -> None:
        """Append one versioned record and publish as the next
        metadata generation — THE commit point for every tx-log
        mutation. Optimistic concurrency: on a CAS collision (another
        writer published first) the whole read-append-publish retries
        against the fresh log, so concurrent commits serialize with
        no lost updates.

        ``expect_files`` is the writer's READ SET (per-table committed
        file lists its record was computed FROM). Every attempt —
        including the first, and every CAS retry — re-replays those
        tables against the fresh log and raises
        :class:`ConcurrentWriteError` if any list changed: a REWRITE
        record built on a stale snapshot would silently drop rows a
        concurrent commit added (r11 VERDICT item 5 — Delta fails the
        transaction when files it read were rewritten; appends to
        UNRELATED tables still retry through).

        ``validated_constraints`` is the writer's CONSTRAINT READ SET:
        per-table ``(constraint_state, staged_files)`` — the
        CHECK-constraint state the batch was validated against (as
        returned by :meth:`_validate_staged`) plus the NEWLY STAGED
        files it covers (never kept/committed files: a violation
        removes the listed dirs, which must only ever be this
        writer's own staging garbage). Every attempt re-reads the
        live constraints from the fresh log; if a concurrent
        ``add_constraint_tx`` / ``drop`` changed them, the staged
        files are RE-VALIDATED against the new state before this
        record may publish — so a constraint published after this
        batch's validation still gates the batch, keeping 'the
        constraint is an invariant of the table' true under
        concurrency (the symmetric half lives in add_constraint_tx's
        expect_files snapshot; r12 ADVICE item 1).

        ``expect_version`` is the SCHEMA/TAG writer's read set: the
        log version its preconditions were checked against. Any
        record published since — including by the CAS retry of a lost
        race — raises :class:`ConcurrentWriteError` so the caller
        re-validates on fresh state (two concurrent
        ``add_column_tx('x')`` must not both land; a duplicate-name
        check done once before the loop can't see the winner)."""
        # stats_cols opt-in: record each staged file's footer min/max
        # on its commit record so future merge pruning is pure
        # metadata (Delta's per-file stats). Computed ONCE before the
        # CAS loop (the files are just-written and page-warm); only
        # JSON-portable scalar bounds are recorded — anything else
        # falls back to footer reads at merge time.
        stats: dict = {}
        for t, rels in tables.items():
            cols = self.stats_cols.get(t)
            if not cols:
                continue
            # footers (and the recorded stats) speak PHYSICAL names;
            # the stats_cols config speaks logical
            p_of = {ln: ph for ln, ph, _ in self._tx_fields(t)}
            cols = [p_of.get(c, c) for c in cols]
            per_file: dict = {}
            for rel in rels:
                fs = self._footer_stats(t, rel, cols)
                if fs is None:
                    continue
                ok = {}
                for c, rng in fs.items():
                    if rng is None:
                        ok[c] = None
                    elif all(isinstance(v, (str, int, float))
                             and not isinstance(v, bool) for v in rng):
                        ok[c] = [rng[0], rng[1]]
                if ok:
                    per_file[rel] = ok
            if per_file:
                stats[t] = per_file
        # bloom_cols opt-in: build the per-file bloom index sidecar
        # for newly staged files (computed once before the CAS loop —
        # the files are immutable; a REWRITE record re-listing kept
        # files never re-indexes them, their old sidecars still apply)
        blooms = self._index_staged_blooms(tables)
        validated = {t: cons for t, (cons, _)
                     in (validated_constraints or {}).items()}
        for _ in range(50):
            log = self._read_txlog()
            # read-set checks (files, DVs, constraints) are scoped to
            # the WRITER's lineage; version numbers are global (a
            # branch record occupies its number in the raw log)
            eff = self._effective_txs(log, branch)
            raw = self._all_txs(log)
            if expect_version is not None:
                # against the RAW head: ANY record — main or branch —
                # published since the caller's snapshot re-runs its
                # precondition checks
                cur_v = raw[-1][0] if raw else 0
                if cur_v != expect_version:
                    raise ConcurrentWriteError(
                        f"log advanced past version {expect_version} "
                        f"(now {cur_v}): preconditions were checked "
                        "against a stale snapshot; re-validate and "
                        "retry")
            for t, (_, staged_rels) in (validated_constraints or {}).items():
                if not staged_rels:
                    continue
                live = self._tx_constraints(t, eff)
                if live != validated.get(t):
                    # a concurrent constraint change published after
                    # this batch was validated: re-validate against
                    # the fresh state (violation removes the staged
                    # dirs and raises — the record never publishes)
                    self._validate_staged(
                        t, staged_rels, self._tx_fields(t, eff), eff)
                    validated[t] = live
            if expect_files is not None:
                for t, read_set in expect_files.items():
                    # the read set covers BOTH the file list and the
                    # live deletion vectors: a concurrent pure-delete
                    # MOR merge changes only the DVs, and a rewrite
                    # published over it would silently resurrect the
                    # deleted rows
                    now = (self._replay_files(eff, t),
                           self._replay_dvs(eff, t))
                    if now != read_set:
                        raise ConcurrentWriteError(
                            f"table {t}: committed state changed since "
                            "this rewrite's snapshot read; re-run the "
                            "merge/compact/restore against the current "
                            "state")
            rec: dict = {"tables": tables,
                         "watermarks": watermarks or {},
                         # wall-clock commit time: Delta
                         # timestampAsOf-style time travel
                         "ts": time.time(),
                         "version": (raw[-1][0] if raw else 0) + 1}
            if branch:
                rec["branch"] = branch
            if branch_create:
                rec["branch_create"] = branch_create
            if branch_publish:
                rec["branch_publish"] = branch_publish
            if branch_drop:
                rec["branch_drop"] = branch_drop
            if cluster_spec is not None:
                rec["cluster_spec"] = cluster_spec
            if replaces:
                rec["replaces"] = replaces
            if schema_add:
                rec["schema_add"] = schema_add
            if schema_drop:
                rec["schema_drop"] = schema_drop
            if schema_rename:
                rec["schema_rename"] = schema_rename
            if dv:
                rec["dv"] = dv
                rec["dv_keys"] = dv_keys or {}
            if constraint_add:
                rec["constraint_add"] = constraint_add
            if constraint_drop:
                rec["constraint_drop"] = constraint_drop
            if tag_add:
                rec["tag_add"] = tag_add
            if tag_drop:
                rec["tag_drop"] = tag_drop
            if wap:
                rec["wap"] = wap
            if stats:
                rec["stats"] = stats
            if blooms:
                rec["bloom"] = blooms
            log["txs"].append(rec)
            try:
                self._publish_txlog(log)
                return
            except FileExistsError:
                continue  # lost the CAS race: re-read and retry
        raise RuntimeError(
            "tx commit failed after 50 CAS retries - writer storm?")

    def read_committed_tx(self, table: str,
                          as_of_version: int | None = None,
                          as_of_tag: str | None = None,
                          as_of_timestamp: float | None = None,
                          branch: str | None = None) -> DataFrame:
        """The tx-log-defined contents of ``table`` — staged batches
        from unfinished commits are invisible by construction.

        ``as_of_version`` time-travels: the table as of that commit
        version (Iceberg ``snapshot-id`` / Delta ``versionAsOf``).
        Superseded files stay on disk until the retention window
        moves past them (:meth:`expire_snapshots`), so any version
        the log still holds is reconstructible; an expired version
        raises. ``as_of_tag`` resolves a named ref
        (:meth:`create_tag`) — a live tag's version never expires.
        ``as_of_timestamp`` (epoch seconds) resolves to the LAST
        commit at or before that wall-clock instant (Delta's
        ``timestampAsOf``; commit times are the writer's clock, so
        the usual skew caveat applies). ``branch`` reads a named
        branch's lineage: main as of the fork plus the branch's own
        commits (:meth:`create_branch`)."""
        txs = self._effective_txs(self._read_txlog(), branch)
        if as_of_tag is not None:
            tags = self._tx_tags(txs)
            if as_of_tag not in tags:
                raise ValueError(f"no tag {as_of_tag}")
            as_of_version = tags[as_of_tag]
        if as_of_timestamp is not None:
            if as_of_version is not None:
                raise ValueError(
                    "pass as_of_version/as_of_tag OR as_of_timestamp")
            as_of_version = self._resolve_timestamp(
                txs, as_of_timestamp)
        self._check_retained(as_of_version, txs)
        fields = self._tx_fields(table, txs, as_of_version)
        files = self._replay_files(txs, table, as_of_version)
        if not files:
            return self.spark.createDataFrame(
                [], self._tx_schema(table, txs, as_of_version))
        dvs = self._replay_dvs(txs, table, as_of_version)
        if dvs:
            return self._to_logical(
                self._read_with_dvs(table, txs,
                                    self._physical_schema(fields),
                                    dvs, as_of_version), fields)
        # Explicit PHYSICAL schema over parquet: files written BEFORE
        # a column add simply lack the column and read as NULL — the
        # standard no-rewrite schema-evolution read (Iceberg/Delta
        # add-column); renamed columns read their stable physical
        # name and alias to the current logical one.
        return self._to_logical(
            self.spark.read.schema(self._physical_schema(fields))
            .parquet(*[os.path.join(self.path(table), rel)
                       for rel in files]),
            fields)

    def point_lookup(self, table: str, values: dict,
                     branch: str | None = None,
                     as_of_version: int | None = None,
                     as_of_tag: str | None = None) -> DataFrame:
        """Rows of ``table`` matching the conjunctive equality
        ``values`` (``{col: value}``), reading ONLY the committed
        files the metadata can't rule out — min/max stats first
        (``stats_cols``), then the per-file bloom index
        (``bloom_cols``). On a bloom-indexed key this is the O(few
        files) primary-key probe on a 100 TB table: min/max stats
        alone can't serve it when the key isn't the clustering column
        (every file spans the domain), and without either tier the
        lookup scans every file's footer-passing row groups. Supports
        the same time-travel/branch surface as
        :meth:`read_committed_tx`; deletion vectors resolve exactly
        as a full read would (the pruned subset still reads under its
        per-segment commit versions). ``self.last_point_lookup``
        records ``(files read, files total)`` for observability.

        A NULL probe value returns an empty frame (SQL equality is
        never true on NULL), matching ``WHERE c = NULL`` semantics."""
        txs = self._effective_txs(self._read_txlog(), branch)
        if as_of_tag is not None:
            tags = self._tx_tags(txs)
            if as_of_tag not in tags:
                raise ValueError(f"no tag {as_of_tag}")
            as_of_version = tags[as_of_tag]
        self._check_retained(as_of_version, txs)
        fields = self._tx_fields(table, txs, as_of_version)
        dt_of = {ln: dt for ln, _, dt in fields}
        for c in values:
            if c not in dt_of:
                raise ValueError(f"no column {c} on {table}")
        files = self._replay_files(txs, table, as_of_version)
        if not files or any(v is None for v in values.values()):
            self.last_point_lookup = (0, len(files))
            return self.spark.createDataFrame(
                [], self._tx_schema(table, txs, as_of_version))
        cand = self._point_candidate_files(table, txs, fields,
                                           files, values)
        self.last_point_lookup = (len(cand), len(files))
        if not cand:
            return self.spark.createDataFrame(
                [], self._tx_schema(table, txs, as_of_version))
        pred = None
        for c, v in values.items():
            e = F.col(c) == F.lit(v).cast(dt_of[c])
            pred = e if pred is None else pred & e
        dvs = self._replay_dvs(txs, table, as_of_version)
        if dvs:
            df = self._to_logical(
                self._read_with_dvs(table, txs,
                                    self._physical_schema(fields),
                                    dvs, as_of_version, only=cand),
                fields)
        else:
            df = self._to_logical(
                self.spark.read.schema(self._physical_schema(fields))
                .parquet(*[os.path.join(self.path(table), rel)
                           for rel in cand]),
                fields)
        return df.filter(pred)

    def _point_candidate_files(self, table: str, txs, fields,
                               files: list[str],
                               values: dict) -> list[str]:
        """The committed files a point probe can't skip: min/max
        containment per column (all-NULL column or out-of-range value
        ⇒ skip; unusable stats or incomparable types ⇒ candidate),
        then the bloom tier for indexed keys — one tiny Spark job for
        the probe's hash positions, then driver-side bit tests
        against the cached sidecars."""
        keys = list(values)
        stats = self._file_key_stats(table, files, keys)
        cand = []
        for rel in files:
            st = stats.get(rel)
            if st is None:
                cand.append(rel)
                continue
            ok = True
            for c in keys:
                rng = st.get(c)
                if rng is None:
                    ok = False      # col all-NULL here: no match
                    break
                try:
                    if not (rng[0] <= values[c] <= rng[1]):
                        ok = False
                        break
                except TypeError:
                    pass            # incomparable: can't rule out
            if ok:
                cand.append(rel)
        bkeys = [c for c in keys
                 if c in (self.bloom_cols.get(table) or [])]
        if bkeys and cand:
            p_of = {ln: ph for ln, ph, _ in fields}
            dt_of = {ln: dt for ln, _, dt in fields}
            pcols = [p_of.get(c, c) for c in bkeys]
            pos = self._bloom_probe_positions(
                [(values[c], dt_of[c]) for c in bkeys])
            words = {p >> 6 for ps in pos for p in ps}
            blooms = self._bloom_for_files(table, txs, cand, pcols,
                                           words)
            cand = [rel for rel in cand
                    if rel not in blooms
                    or all(self._bloom_might_contain(
                        blooms[rel][2][pc], p)
                        for pc, p in zip(pcols, pos))]
        return cand

    def clone_table(self, source: str, target: str,
                    as_of_version: int | None = None,
                    as_of_tag: str | None = None,
                    branch: str | None = None) -> None:
        """ZERO-COPY shallow clone (Delta ``CREATE TABLE ... SHALLOW
        CLONE`` / Iceberg snapshot referencing): ``target`` becomes a
        fully independent tx table whose committed files are the
        SOURCE's files at the chosen snapshot, referenced in place —
        no data bytes move, however large the table. Implemented as a
        log-level replay: the source's retained records (≤ the
        snapshot version) are rewritten to the target — file lists,
        deletion vectors, REWRITE markers, schema evolution,
        constraints, clustering spec, per-file stats and bloom-index
        entries all carry over with their relative order preserved
        (so DV ``_fv < v_dv`` scoping replays exactly) — and appended
        in ONE atomic publish. The first record binds the clone to
        its source's base schema via ``clone_base`` (fold-surviving).

        After the clone, the two tables share bytes but diverge
        freely: writes, merges, row-level ops, compaction, and schema
        changes on either side never affect the other. UNLIKE Delta —
        where vacuuming a source breaks its shallow clones — this
        warehouse's orphan GC resolves cross-table references, so a
        source file stays pinned while any clone's retained history
        references it. Tags, branches, watermarks, and WAP state are
        deliberately NOT cloned (they are refs into the shared log,
        not table state). Branch/tag/version pick the snapshot the
        same way :meth:`read_committed_tx` does."""
        if target in schemas.WAREHOUSE_TABLES:
            raise ValueError(
                f"{target} is a base table name; clone targets must "
                "not shadow the static schema registry")

        def reloc(rel: str) -> str:
            # target-relative path into the source's directory; stays
            # correct for clones of clones (normpath collapses the
            # chained ..-hops to the original table)
            return os.path.normpath(os.path.join("..", source, rel))

        def derive(log: dict) -> list[dict]:
            # re-derived per CAS attempt: a lost race re-validates on
            # the fresh log (concurrent writer took the target name;
            # concurrent checkpoint/expire folded retention past the
            # requested snapshot — stale records would reference
            # just-vacuumed bytes)
            for _, tx in self._all_txs(log):
                if target in (set(tx.get("tables", {}))
                              | set(tx.get("clone_base", {}))):
                    raise ValueError(
                        f"table {target} already exists")
            txs = self._effective_txs(log, branch)
            aov = as_of_version
            if as_of_tag is not None:
                tags = self._tx_tags(txs)
                if as_of_tag not in tags:
                    raise ValueError(f"no tag {as_of_tag}")
                aov = tags[as_of_tag]
            self._check_retained(aov, txs)
            base = self._clone_base_of(source, txs)
            if not any(source in tx.get("tables", {})
                       or source in tx.get("clone_base", {})
                       for _, tx in txs):
                raise ValueError(f"no committed tx table {source}")
            return self._clone_records(source, target, base, txs,
                                       aov, reloc)

        derive(self._read_txlog())   # fail fast on bad arguments
        # the empty table dir must exist: ..-relative references are
        # resolved PHYSICALLY by the OS (cdc_dev/../src needs cdc_dev
        # present), and driver-side footer/size reads go through it
        os.makedirs(self.path(target), exist_ok=True)
        for _ in range(50):
            log = self._read_txlog()
            cloned = derive(log)
            head = (self._all_txs(log)[-1][0]
                    if self._all_txs(log) else 0)
            out = []
            for i, rec in enumerate(cloned):
                out.append(dict(rec, tables=rec.get("tables", {}),
                                watermarks={}, ts=time.time(),
                                version=head + 1 + i))
            log["txs"].extend(out)
            try:
                self._publish_txlog(log)
                return
            except FileExistsError:
                continue
        raise RuntimeError(
            "clone failed after 50 CAS retries - writer storm?")

    @staticmethod
    def _clone_records(source: str, target: str, base: str, txs,
                       as_of_version: int | None, reloc) -> list[dict]:
        """The source's retained records (≤ the snapshot version)
        rewritten to the clone target: every source-scoped portion —
        file lists, REWRITE markers, DVs, stats, bloom entries,
        schema ops, constraints, clustering — carried with paths
        relocated and relative order preserved. The first record
        binds ``clone_base``."""
        cloned: list[dict] = []
        for v, tx in txs:
            if as_of_version is not None and v > as_of_version:
                break
            rec: dict = {}
            if source in tx.get("tables", {}):
                rec["tables"] = {target: [
                    reloc(r) for r in tx["tables"][source]]}
            if source in tx.get("replaces", []):
                rec["replaces"] = [target]
            if source in tx.get("dv", {}):
                rec["dv"] = {target: [reloc(r)
                                      for r in tx["dv"][source]]}
                rec["dv_keys"] = {
                    target: tx.get("dv_keys", {}).get(source, [])}
            if source in tx.get("stats", {}):
                rec["stats"] = {target: {
                    reloc(r): st
                    for r, st in tx["stats"][source].items()}}
            if source in tx.get("bloom", {}):
                rec["bloom"] = {target: [
                    {**e,
                     "files": [reloc(r) for r in e["files"]],
                     "sidecar": [reloc(r) for r in e["sidecar"]]}
                    for e in tx["bloom"][source]]}
            for k in ("schema_add", "schema_drop", "schema_rename",
                      "schema_retired", "constraint_add",
                      "constraint_drop"):
                if source in tx.get(k, {}):
                    rec[k] = {target: tx[k][source]}
            if source in tx.get("cluster_spec", {}):
                rec["cluster_spec"] = {
                    target: tx["cluster_spec"][source]}
            if rec:
                cloned.append(rec)
        if not cloned:
            raise ValueError(
                f"{source} has no records at or before the requested "
                "snapshot")
        cloned[0]["clone_base"] = {target: base}
        return cloned

    def _read_with_dvs(self, table: str, txs, schema, dvs,
                       as_of_version: int | None,
                       only: list[str] | None = None) -> DataFrame:
        """Merge-on-read: the committed files minus every live
        deletion vector's matching keys. Each file segment reads
        tagged with its COMMIT VERSION ``_fv``; a DV at version v
        deletes matching rows only where ``_fv < v`` (a merge's own
        postimage batch commits AT v, so it survives its own DV; a
        later merge's DV supersedes earlier postimages). Each DV is a
        key-list parquet, update-batch-sized, applied as one BROADCAST
        left join + filter — the read never shuffles the base table.
        The segment count is bounded by the retained record count
        (checkpoints fold history; compaction collapses to one
        segment and clears the DVs). ``only`` restricts the read to a
        committed-file subset (the row-level ops' pruned rewrite path)
        — each file still reads under its own commit version so the
        DVs apply exactly as they would on the full read."""
        root = self.path(table)
        segs = self._replay_file_versions(txs, table, as_of_version)
        if only is not None:
            want = set(only)
            segs = [(v, [rel for rel in fl if rel in want])
                    for v, fl in segs]
            segs = [(v, fl) for v, fl in segs if fl]
        df = None
        for v, fl in segs:
            part = (self.spark.read.schema(schema)
                    .parquet(*[os.path.join(root, rel) for rel in fl])
                    .withColumn("_fv", F.lit(v)))
            df = part if df is None else df.unionByName(part)
        if df is None:   # `only` selected no committed file
            df = (self.spark.createDataFrame([], schema)
                  .withColumn("_fv", F.lit(0)))
        for v_dv, keys, dv_files in dvs:
            # explicit key schema (projected from the table's physical
            # schema): a schemaless read runs one footer-inference job
            # per DV per read — measured ~0.35 s each on the row-level
            # twins, pure driver latency the key types already answer
            dv_schema = StructType(
                [schema[k] for k in keys if k in schema.fieldNames()])
            reader = self.spark.read
            if len(dv_schema) == len(keys):
                reader = reader.schema(dv_schema)
            dvk = (reader
                   .parquet(*[os.path.join(root, rel) for rel in dv_files])
                   .select(*keys).distinct()
                   .withColumn("_dvhit", F.lit(True)))
            df = (df.join(F.broadcast(dvk), keys, "left")
                  .filter(~(F.col("_dvhit").eqNullSafe(True)
                            & (F.col("_fv") < F.lit(v_dv))))
                  .drop("_dvhit"))
        return df.drop("_fv")

    @staticmethod
    def _resolve_timestamp(txs: list[tuple[int, dict]],
                           ts: float) -> int:
        """The last version whose commit time is ≤ ``ts``. Records
        from logs written before commit times existed count as
        arbitrarily old (always eligible) — resolution can only be
        as precise as the recorded history."""
        best = None
        for v, tx in txs:
            if tx.get("ts", 0.0) <= ts:
                best = v
        if best is None:
            raise ValueError(
                f"no commit at or before timestamp {ts}")
        return best

    @staticmethod
    def _clone_base_of(table: str, records) -> str:
        """The STATIC base-schema table a (possibly cloned) tx table
        resolves to: a shallow clone's first record carries
        ``clone_base`` mapping the clone to its source's ULTIMATE
        base (resolved at clone time, so this is a single hop even
        for clones of clones). ``records`` may be plain record dicts
        or ``(version, record)`` pairs."""
        for r in records:
            tx = r[1] if isinstance(r, tuple) else r
            b = tx.get("clone_base", {}).get(table)
            if b:
                return b
        return table

    @staticmethod
    def _replay_fields(table: str, records: list[dict]
                       ) -> list[tuple[str, str, str | None]]:
        """Replay add/drop/rename records over the static base schema
        into ``[(logical, physical, dtype_str|None)]`` — the Iceberg
        field-identity model with PHYSICAL parquet column names
        standing in for field ids. A base column's physical name is
        its original name forever (rename is pure metadata); an added
        column's physical name is recorded on its add record (a
        re-added name gets a FRESH physical name, so bytes a dropped
        column left in old files can never resurrect). ``dtype`` is
        None for base columns (their type lives in the static
        schema). Order within one record: drop → rename → add (only
        checkpoint snapshots carry more than one kind, and that order
        makes drop-then-readd and rename-then-readd fold cleanly)."""
        fields: list[tuple[str, str, str | None]] = [
            (f.name, f.name, None)
            for f in schemas.WAREHOUSE_TABLES[
                Warehouse._clone_base_of(table, records)].fields]
        for tx in records:
            for entry in tx.get("schema_drop", {}).get(table, []):
                name = entry[0] if isinstance(entry, list) else entry
                fields = [f for f in fields if f[0] != name]
            # apply a record's renames as ONE simultaneous mapping:
            # a folded checkpoint emits the NET rename state as
            # multiple entries in one record, and sequential
            # application corrupts chains that reuse a freed name
            # (rename a->b then c->a) or swap via a temp name
            ren = {old: new for old, new
                   in tx.get("schema_rename", {}).get(table, [])}
            if ren:
                fields = [(ren.get(ln, ln), ph, dt)
                          for ln, ph, dt in fields]
            for add in tx.get("schema_add", {}).get(table, []):
                name, dtype = add[0], add[1]
                phys = add[2] if len(add) > 2 else name
                fields.append((name, phys, dtype))
        return fields

    def _tx_fields(self, table: str,
                   txs: list[tuple[int, dict]] | None = None,
                   as_of_version: int | None = None
                   ) -> list[tuple[str, str, object]]:
        """The table's EFFECTIVE field list at ``as_of_version`` (or
        now) as ``[(logical, physical, DataType)]`` — see
        :meth:`_replay_fields` for the identity model."""
        from pyspark.sql.types import _parse_datatype_string

        if txs is None:
            txs = self._effective_txs(self._read_txlog())
        recs = [tx for v, tx in txs
                if as_of_version is None or v <= as_of_version]
        base = {f.name: f.dataType
                for f in schemas.WAREHOUSE_TABLES[
                    self._clone_base_of(table, recs)].fields}
        return [(ln, ph, base[ph] if dt is None
                 else _parse_datatype_string(dt))
                for ln, ph, dt in self._replay_fields(table, recs)]

    def _tx_schema(self, table: str,
                   txs: list[tuple[int, dict]] | None = None,
                   as_of_version: int | None = None):
        """The table's EFFECTIVE logical schema at ``as_of_version``
        (or now): base schema plus adds, minus drops, through renames
        — the schema time-travels with the data."""
        from pyspark.sql.types import StructField, StructType

        return StructType([
            StructField(ln, dt, True)
            for ln, _, dt in self._tx_fields(table, txs, as_of_version)])

    @staticmethod
    def _physical_schema(fields):
        """StructType over the PHYSICAL column names — what the
        parquet files actually store."""
        from pyspark.sql.types import StructField, StructType

        return StructType([StructField(ph, dt, True)
                           for _, ph, dt in fields])

    @staticmethod
    def _to_logical(df: DataFrame, fields) -> DataFrame:
        """Alias a physical-named frame to its logical names (no-op
        select when no rename/re-add has diverged them)."""
        if all(ln == ph for ln, ph, _ in fields):
            return df
        extra = [c for c in df.columns
                 if c not in {ph for _, ph, _ in fields}]
        return df.select(*[F.col(ph).alias(ln) for ln, ph, _ in fields],
                         *extra)

    @staticmethod
    def _to_physical(df: DataFrame, fields,
                     extras: bool = False) -> DataFrame:
        """Project a logical-named frame onto the physical write
        schema: present columns cast, absent columns fill NULL (the
        add-column evolution contract), each landing under its
        PHYSICAL name. ``extras=True`` passes non-schema columns
        (tombstones) through under their own names."""
        have = set(df.columns)
        logicals = {ln for ln, _, _ in fields}
        extra = [c for c in df.columns
                 if c not in logicals] if extras else []
        return df.select(
            *[(F.col(ln).cast(dt) if ln in have
               else F.lit(None).cast(dt)).alias(ph)
              for ln, ph, dt in fields],
            *extra)

    def _retired_physicals(self, table: str,
                           txs: list[tuple[int, dict]]) -> set:
        """Physical column names that once held data and were dropped
        — never reusable (old files still carry their bytes).
        Tracked via the drop records' ``[logical, physical]`` pairs
        and preserved across folds in ``schema_retired``."""
        out: set = set()
        for _, tx in txs:
            out.update(tx.get("schema_retired", {}).get(table, []))
            for entry in tx.get("schema_drop", {}).get(table, []):
                if isinstance(entry, list):
                    out.add(entry[1])
        return out

    def add_column_tx(self, table: str, name: str, dtype: str) -> None:
        """Add a nullable column to a tx-managed table — Iceberg's
        ``ALTER TABLE ADD COLUMN``: one metadata-only tx record, no
        file rewrite. Existing files read the column as NULL; later
        commits may supply it (absent columns in an incoming frame
        fill NULL). The add participates in time travel: reads at a
        version before the add see the old schema. Calling this on a
        fresh table CLAIMS it for the tx subsystem (plain
        append/overwrite will refuse from then on).

        Re-adding a previously dropped (or renamed-away) name binds a
        FRESH physical column, so values the old column left in
        still-referenced files stay invisible — Iceberg's field-id
        semantics, which name-matching alone would violate."""
        from pyspark.sql.types import _parse_datatype_string
        _parse_datatype_string(dtype)  # validate eagerly, not at read
        self._reject_manifest_schema_change(table)

        def attempt():
            log = self._read_txlog()
            txs = self._effective_txs(log)
            head = self._raw_head(log)
            fields = self._tx_fields(table, txs)
            if name in {ln for ln, _, _ in fields}:
                raise ValueError(
                    f"column {name} already exists on {table}")
            used = {ph for _, ph, _ in fields} \
                | self._retired_physicals(table, txs)
            phys = name
            if name in used:
                phys = f"{name}__v{head + 1}"
            add = [name, dtype] if phys == name else [name, dtype, phys]
            self._append_tx_record(
                {}, schema_add={table: [add]}, expect_version=head)
        self._retry_metadata_tx(attempt)

    def _retry_metadata_tx(self, attempt):
        """Run a check-preconditions-then-publish closure under the
        optimistic protocol: ``attempt`` reads the fresh log, checks
        its preconditions, and publishes with that snapshot's version
        as ``expect_version``; a :class:`ConcurrentWriteError` (any
        record landed mid-flight — including the winner of a
        same-name race, whose publish must flip this attempt's
        precondition into a ValueError) re-runs the WHOLE closure, so
        the checks and the record are always built from the state
        they publish against."""
        for _ in range(10):
            try:
                return attempt()
            except ConcurrentWriteError:
                continue
        raise ConcurrentWriteError(
            "metadata tx lost the validation race 10 times - "
            "writer storm?")

    def _reject_manifest_schema_change(self, table: str) -> None:
        """A schema-change record on a manifest-managed table would
        CLAIM it for the tx subsystem while append_commit keeps
        publishing through the manifest — two disagreeing logs, the
        same fork commit_tx refuses."""
        if self._has_manifest(table):
            raise ValueError(
                f"table {table} is manifest-managed (append_commit); "
                "schema evolution needs the tx log — migrate the "
                "table to commit_tx first")

    def _guard_constraint_refs(self, table: str, name: str,
                               txs: list[tuple[int, dict]],
                               op: str) -> None:
        """Drop/rename precondition: live CHECK constraints must not
        reference the column (their exprs are logical-name SQL;
        Databricks makes you drop the constraint first)."""
        for cname, expr in self._tx_constraints(table, txs).items():
            if re.search(rf"\b{re.escape(name)}\b", expr):
                raise ValueError(
                    f"cannot {op} column {name} on {table}: CHECK "
                    f"constraint {cname} ({expr}) references it — "
                    "drop the constraint first")

    def drop_column_tx(self, table: str, name: str) -> None:
        """Iceberg's ``ALTER TABLE DROP COLUMN``: one metadata-only
        record, no file rewrite. The column vanishes from reads and
        from the write schema; its bytes stay in already-committed
        files (invisible — reads select physical columns explicitly)
        until compaction/expiry rewrites them. Time travel to a
        version before the drop still sees the column. Re-adding the
        same name later binds a fresh physical column (never the old
        bytes)."""
        self._reject_manifest_schema_change(table)

        def attempt():
            log = self._read_txlog()
            txs = self._effective_txs(log)
            fields = self._tx_fields(table, txs)
            match = [f for f in fields if f[0] == name]
            if not match:
                raise ValueError(f"no column {name} on {table}")
            if len(fields) == 1:
                raise ValueError(
                    f"cannot drop the last column of {table}")
            self._guard_constraint_refs(table, name, txs, "drop")
            # live deletion vectors key on PHYSICAL names; dropping a
            # DV key column would break their anti-join — compact first
            phys = match[0][1]
            for _, dv_keys, _ in self._replay_dvs(txs, table):
                if phys in dv_keys:
                    raise ValueError(
                        f"cannot drop column {name} on {table}: a live "
                        "deletion vector keys on it — compact(table) "
                        "first")
            if phys in self._cluster_cols(table, txs):
                raise ValueError(
                    f"cannot drop column {name} on {table}: it is "
                    "an active clustering column — "
                    "set_clustering(table, None) first")
            self._append_tx_record(
                {}, schema_drop={table: [[name, phys]]},
                expect_version=self._raw_head(log))
        self._retry_metadata_tx(attempt)

    def rename_column_tx(self, table: str, old: str, new: str) -> None:
        """Iceberg's ``ALTER TABLE RENAME COLUMN``: pure metadata —
        the physical parquet name never changes, so no file is
        rewritten and old files keep reading correctly; only the
        LOGICAL name every reader and writer sees moves. Time travel
        to a version before the rename sees the old name. Renaming
        to a previously-dropped name is fine (distinct physical
        identity)."""
        self._reject_manifest_schema_change(table)

        def attempt():
            log = self._read_txlog()
            txs = self._effective_txs(log)
            logicals = [ln for ln, _, _ in self._tx_fields(table, txs)]
            if old not in logicals:
                raise ValueError(f"no column {old} on {table}")
            if new in logicals:
                raise ValueError(
                    f"column {new} already exists on {table}")
            self._guard_constraint_refs(table, old, txs, "rename")
            self._append_tx_record(
                {}, schema_rename={table: [[old, new]]},
                expect_version=self._raw_head(log))
        self._retry_metadata_tx(attempt)

    # ------------------------------------------------ CHECK constraints

    def _tx_constraints(self, table: str,
                        txs: list[tuple[int, dict]] | None = None
                        ) -> dict[str, str]:
        """The table's live CHECK constraints (name → SQL expr),
        replayed from ``constraint_add`` / ``constraint_drop``
        records — Delta's ``ALTER TABLE ADD CONSTRAINT`` metadata."""
        if txs is None:
            txs = self._effective_txs(self._read_txlog())
        out: dict[str, str] = {}
        for _, tx in txs:
            for name, expr in tx.get("constraint_add", {}).get(table, []):
                out[name] = expr
            for name in tx.get("constraint_drop", {}).get(table, []):
                out.pop(name, None)
        return out

    def add_constraint_tx(self, table: str, name: str,
                          expr: str) -> None:
        """Delta's ``ADD CONSTRAINT name CHECK (expr)``: one
        metadata-only record; every subsequent ``commit_tx`` /
        ``merge_tx`` batch is validated against the expression before
        its record publishes (SQL CHECK semantics — NULL passes,
        FALSE violates), and the EXISTING committed rows are
        validated now, so the constraint is an invariant of the
        table, not just of future writes.

        The existing-row validation participates in the optimistic-
        concurrency protocol (r12 ADVICE item 1): the record carries
        the (files, DVs) snapshot the scan read as its READ SET, so a
        data commit that publishes between this validation and this
        publish forces a re-validation of the fresh state instead of
        landing rows the constraint never saw (the mirror-image race
        — a batch validated before this constraint publishes — is
        closed by _append_tx_record's in-loop constraint re-check)."""
        for _ in range(10):
            txs = self._effective_txs(self._read_txlog())
            if name in self._tx_constraints(table, txs):
                raise ValueError(
                    f"constraint {name} already exists on {table}")
            files = self._replay_files(txs, table)
            dvs = self._replay_dvs(txs, table)
            cur = self.read_committed_tx(table)
            bad = cur.filter(
                ~F.coalesce(F.expr(expr), F.lit(True))).count()
            if bad:
                raise ValueError(
                    f"cannot add constraint {name} to {table}: {bad} "
                    f"existing row(s) violate CHECK ({expr})")
            try:
                self._append_tx_record(
                    {}, constraint_add={table: [[name, expr]]},
                    expect_files={table: (files, dvs)})
                return
            except ConcurrentWriteError:
                continue  # table changed under the scan: re-validate
        raise ConcurrentWriteError(
            f"add_constraint_tx({table}, {name}) lost the validation "
            "race 10 times - writer storm?")

    def drop_constraint_tx(self, table: str, name: str) -> None:
        """Delta's ``DROP CONSTRAINT``: metadata-only record."""

        def attempt():
            log = self._read_txlog()
            txs = self._effective_txs(log)
            if name not in self._tx_constraints(table, txs):
                raise ValueError(f"no constraint {name} on {table}")
            self._append_tx_record({}, constraint_drop={table: [name]},
                                   expect_version=self._raw_head(log))
        self._retry_metadata_tx(attempt)

    # ------------------------------------------------ tags (Iceberg refs)

    def _tx_tags(self, txs: list[tuple[int, dict]] | None = None
                 ) -> dict[str, int]:
        """Live named refs (tag → version), replayed from
        ``tag_add`` / ``tag_drop`` records — Iceberg's TAG refs."""
        if txs is None:
            txs = self._effective_txs(self._read_txlog())
        out: dict[str, int] = {}
        for _, tx in txs:
            out.update(tx.get("tag_add", {}))
            for n in tx.get("tag_drop", []):
                out.pop(n, None)
        return out

    def create_tag(self, name: str, version: int | None = None) -> int:
        """Iceberg's ``CREATE TAG``: a named ref to a commit version
        (default: the current one). A live tag PINS its version
        against checkpoint folding — ``checkpoint_txlog`` /
        ``expire_snapshots`` never fold past the oldest tagged
        version, so ``read_committed_tx(as_of_tag=...)`` keeps
        working however much maintenance runs (the audit/repro
        anchor: tag the snapshot a model trained on). Returns the
        pinned version."""
        def attempt():
            log = self._read_txlog()
            txs = self._effective_txs(log)
            v = version if version is not None \
                else (txs[-1][0] if txs else 0)
            self._check_retained(v, txs)
            if txs and v > txs[-1][0]:
                raise ValueError(
                    f"version {v} does not exist yet "
                    f"(current is {txs[-1][0]})")
            if name in self._tx_tags(txs):
                raise ValueError(f"tag {name} already exists")
            self._append_tx_record({}, tag_add={name: v},
                                   expect_version=self._raw_head(log))
            return v
        return self._retry_metadata_tx(attempt)

    def drop_tag(self, name: str) -> None:
        """Drop a named ref — its version becomes expirable again."""

        def attempt():
            log = self._read_txlog()
            txs = self._effective_txs(log)
            if name not in self._tx_tags(txs):
                raise ValueError(f"no tag {name}")
            self._append_tx_record({}, tag_drop=[name],
                                   expect_version=self._raw_head(log))
        self._retry_metadata_tx(attempt)

    # ------------------------------------------- clustering spec evolution

    def _cluster_cols(self, table: str,
                      txs: list[tuple[int, dict]] | None = None
                      ) -> list[str]:
        """The table's ACTIVE clustering columns (PHYSICAL names) —
        the commit-time ``sortWithinPartitions`` keys that keep
        parquet footers tight for read_between / merge / row-level
        pruning. Replayed from ``cluster_spec`` records (last writer
        wins, explicit ``None``/empty = unclustered); tables that
        never evolved fall back to the static ``_PARTITIONED``
        default. Multi-column specs sort lexicographically — footer
        ranges stay tight on the LEADING column and tighten on later
        ones within runs of equal prefixes (Iceberg multi-field
        spec / Delta multi-column OPTIMIZE ZORDER's cheap cousin)."""
        if txs is None:
            txs = self._effective_txs(self._read_txlog())
        spec: list[str] = []
        found = False
        for _, tx in txs:
            if table in tx.get("cluster_spec", {}):
                raw = tx["cluster_spec"][table]
                spec = ([raw] if isinstance(raw, str)
                        else list(raw or []))
                found = True
        if found:
            return spec
        default = _PARTITIONED.get(table)
        return [default] if default else []

    def _cluster_col(self, table: str,
                     txs: list[tuple[int, dict]] | None = None
                     ) -> str | None:
        """Single-column view of :meth:`_cluster_cols` (the leading
        sort key), for callers that only need one."""
        cols = self._cluster_cols(table, txs)
        return cols[0] if cols else None

    def set_clustering(self, table: str,
                       columns: str | list[str] | None) -> None:
        """Iceberg partition-spec evolution, clustering flavor:
        change the column(s) NEW commits/rewrites sort on, as one
        metadata record. Files already committed are untouched and
        stay readable exactly as written (their footers remain tight
        on the OLD columns, so predicates on them keep pruning those
        files; new files prune on the new columns) — the defining
        property of Iceberg's spec evolution, where a spec change
        never rewrites data. ``None`` disables clustering. The spec
        stores PHYSICAL column names, so later renames never stale
        it."""
        self._reject_manifest_schema_change(table)
        want = ([columns] if isinstance(columns, str)
                else list(columns or []))

        def attempt():
            log = self._read_txlog()
            txs = self._effective_txs(log)
            p_of = {ln: ph for ln, ph, _
                    in self._tx_fields(table, txs)}
            missing = [c for c in want if c not in p_of]
            if missing:
                raise ValueError(
                    f"no column(s) {missing} on {table}")
            self._append_tx_record(
                {}, expect_version=self._raw_head(log),
                cluster_spec={table: [p_of[c] for c in want] or None})
        self._retry_metadata_tx(attempt)

    # ------------------------------------------------ branches (writable refs)

    def create_branch(self, name: str,
                      version: int | None = None) -> int:
        """Iceberg's ``CREATE BRANCH``: a WRITABLE named ref forked
        from a main version (default: the current head). Writes with
        ``branch=name`` (:meth:`commit_tx` / :meth:`merge_tx`) land
        on the branch lineage — invisible to main readers;
        ``read_committed_tx(branch=name)`` sees main as of the fork
        plus the branch's commits. :meth:`fast_forward` publishes the
        lineage into main; :meth:`drop_branch` abandons it. A live
        branch pins its fork version against checkpoint folding, same
        as a tag. Returns the fork version."""
        def attempt():
            log = self._read_txlog()
            txs = self._effective_txs(log)
            v = version if version is not None \
                else (txs[-1][0] if txs else 0)
            self._check_retained(v, txs)
            if txs and v > txs[-1][0]:
                raise ValueError(
                    f"version {v} does not exist yet "
                    f"(current is {txs[-1][0]})")
            live, _ = self._branch_state(self._all_txs(log))
            if name in live:
                raise ValueError(f"branch {name} already exists")
            self._append_tx_record({}, branch_create={name: v},
                                   expect_version=self._raw_head(log))
            return v
        return self._retry_metadata_tx(attempt)

    def drop_branch(self, name: str) -> None:
        """Abandon a branch: its unpublished records become invisible
        garbage (reclaimed when the next checkpoint fold rewrites the
        log past them); already-published history stays in main."""
        def attempt():
            raw = self._all_txs(self._read_txlog())
            if name not in self._branch_state(raw)[0]:
                raise ValueError(f"no branch {name}")
            self._append_tx_record({}, branch_drop=[name],
                                   expect_version=raw[-1][0]
                                   if raw else 0)
        self._retry_metadata_tx(attempt)

    def list_branches(self) -> dict[str, int]:
        """Live branches as name → fork version."""
        live, _ = self._branch_state(self._all_txs(self._read_txlog()))
        return {n: fork for n, (_, fork) in live.items()}

    def fast_forward(self, name: str) -> int:
        """Iceberg's ``fastForward(main, branch)``: publish the
        branch lineage into main in ONE atomic record. Precondition
        (the definition of fast-forward): main must not have advanced
        past the branch's unpublished history — every main-visible
        version above the fork must already be one of this branch's
        published records; otherwise the histories diverged and a
        replay onto a fresh branch is required (this engine does not
        synthesize merge commits). The branch stays live afterwards —
        its head and main's are equal until either side moves again.
        This is the publish half of write-audit-publish on a branch:
        stage commits on the branch, audit via
        ``read_committed_tx(branch=...)``, fast-forward atomically.
        Returns the published head version."""
        def attempt():
            log = self._read_txlog()
            raw = self._all_txs(log)
            live, _ = self._branch_state(raw)
            if name not in live:
                raise ValueError(f"no branch {name}")
            cv, fork = live[name]
            main = self._effective_txs(log)

            def changes_state(tx: dict) -> bool:
                # ref bookkeeping (branch/tag create-drop-publish) is
                # not divergence — only records that change table
                # state, watermarks, schema, or constraints are
                return bool(tx["tables"] or tx.get("watermarks")
                            or tx.get("replaces") or tx.get("dv")
                            or tx.get("schema_add")
                            or tx.get("schema_drop")
                            or tx.get("schema_rename")
                            or tx.get("constraint_add")
                            or tx.get("constraint_drop")
                            or tx.get("wap"))

            divergent = [v for v, tx in main
                         if v > fork and tx.get("branch") != name
                         and changes_state(tx)]
            if divergent:
                raise ValueError(
                    f"cannot fast-forward branch {name}: main "
                    f"advanced past its fork (versions {divergent}); "
                    "create a fresh branch and replay")
            tail = [v for v, tx in raw
                    if tx.get("branch") == name and v > cv]
            # expect_version pins the RAW head: ANY concurrent record
            # (main or branch) re-runs the divergence check
            self._append_tx_record({}, branch_publish={name: cv},
                                   expect_version=raw[-1][0]
                                   if raw else 0)
            return tail[-1] if tail else (main[-1][0] if main else 0)
        return self._retry_metadata_tx(attempt)

    def describe_detail(self, table: str) -> dict:
        """Delta's ``DESCRIBE DETAIL`` as a driver-local dict: current
        version, committed file count/bytes, LIVE deletion-vector
        count (the merge-on-read read-amplification debt
        ``auto_compact_dvs`` bounds), schema columns, and live CHECK
        constraints — the numbers an operator reads before deciding
        to compact."""
        txs = self._effective_txs(self._read_txlog())
        files = self._replay_files(txs, table)
        root = self.path(table)
        size = 0
        for rel in files:
            try:
                size += os.path.getsize(os.path.join(root, rel))
            except OSError:
                pass
        return {
            "table": table,
            "version": txs[-1][0] if txs else 0,
            "num_files": len(files),
            "size_bytes": size,
            "num_live_dvs": len(self._replay_dvs(txs, table)),
            "columns": [f.name for f in self._tx_schema(table, txs)],
            "constraints": self._tx_constraints(table, txs),
            "clustering": self._cluster_cols(table, txs),
            "tags": self._tx_tags(txs),
            "branches": self.list_branches(),
        }

    # ------------------------------------------------ write-audit-publish

    def stage_commit_tx(self, frames: dict[str, DataFrame],
                        watermarks: dict[str, str] | None = None) -> str:
        """Iceberg's WRITE-AUDIT-PUBLISH, step 1: stage the batches
        exactly as :meth:`commit_tx` would, but record them in a
        PENDING file instead of the tx log — invisible to every
        reader until :meth:`publish_tx`. Returns the audit token.
        A crash leaves only the pending file + staged dirs (both
        inert; :meth:`abort_tx` or vacuum-after-abort clean up)."""
        import json
        import uuid

        for table in frames:
            if self._has_manifest(table):
                raise ValueError(
                    f"table {table} is manifest-managed (append_commit)")
        staged: dict[str, list[str]] = {}
        for table, df in frames.items():
            df = self._to_physical(df, self._tx_fields(table))
            c_cols = self._cluster_cols(table)
            if c_cols:
                df = df.sortWithinPartitions(*c_cols)
            staged[table] = self._stage_batch(df, table)
        token = uuid.uuid4().hex
        pend = {"tables": staged, "watermarks": dict(watermarks or {})}
        with open(os.path.join(self.root, f"_PENDING.{token}.json"),
                  "w") as f:
            json.dump(pend, f)
        return token

    def _read_pending(self, token: str) -> dict:
        import json

        p = os.path.join(self.root, f"_PENDING.{token}.json")
        if not os.path.exists(p):
            raise ValueError(f"no pending stage {token}")
        with open(p) as f:
            return json.load(f)

    def read_staged_tx(self, table: str, token: str) -> DataFrame:
        """The AUDIT view: committed contents plus the staged batch —
        what the table WILL look like if ``publish_tx(token)`` runs.
        Quality jobs (constraint dry-runs, row-count diffs, PSI
        drift) read this; nothing else can see the stage."""
        pend = self._read_pending(token)
        cur = self.read_committed_tx(table)
        rels = pend["tables"].get(table, [])
        if not rels:
            return cur
        fields = self._tx_fields(table)
        staged = self._to_logical(
            self.spark.read.schema(self._physical_schema(fields))
            .parquet(*[os.path.join(self.path(table), rel)
                       for rel in rels]),
            fields)
        return cur.unionByName(staged)

    def publish_tx(self, token: str) -> None:
        """WAP step 3: validate the staged batches against the LIVE
        CHECK constraints (they may have changed since the stage),
        then publish stage + watermarks as ONE tx record — the same
        atomic visibility commit_tx gives, decoupled from the write.
        The record carries the token, so a crash between the publish
        and the pending-file removal is safe: re-running publish_tx
        sees the token already in the log and only removes the stale
        pending file (exactly-once publish, the same rerun contract
        commit_tx has)."""
        pend = self._read_pending(token)
        pend_path = os.path.join(self.root, f"_PENDING.{token}.json")
        if any(tx.get("wap") == token
               or token in tx.get("wap_tokens", [])
               for tx in self._read_txlog()["txs"]):
            os.remove(pend_path)   # crash-rerun: already published
            return
        validated = {
            table: (self._validate_staged(table, rels,
                                          self._tx_fields(table), None),
                    rels)
            for table, rels in pend["tables"].items()}
        self._append_tx_record(pend["tables"], pend["watermarks"],
                               wap=token,
                               validated_constraints=validated)
        os.remove(pend_path)

    def abort_tx(self, token: str) -> None:
        """Drop a pending stage: remove its staged batch dirs and the
        pending file; the log never saw it."""
        pend = self._read_pending(token)
        for table, rels in pend["tables"].items():
            for d in {rel.split(os.sep)[0] for rel in rels}:
                shutil.rmtree(os.path.join(self.path(table), d),
                              ignore_errors=True)
        os.remove(os.path.join(self.root, f"_PENDING.{token}.json"))

    def _validate_staged(self, table: str, staged: list[str],
                         fields, txs) -> dict[str, str]:
        """Validate a STAGED batch against the table's live CHECK
        constraints in one scan of the staged files (never a
        recompute of the caller's plan — API extracts are not
        idempotent). On violation the staged dirs are removed and the
        commit raises; the table is untouched (the record never
        published). Returns the constraint state validated against,
        which the caller passes to :meth:`_append_tx_record` as its
        CONSTRAINT READ SET — the CAS loop re-validates if a
        concurrent ``add_constraint_tx`` published in between.

        ``fields`` is the ``_tx_fields`` list the batch was staged
        with — files hold PHYSICAL names; constraint exprs speak
        logical."""
        cons = self._tx_constraints(table, txs)
        if not cons or not staged:
            return cons
        df = self._to_logical(
            self.spark.read.schema(self._physical_schema(fields))
            .parquet(*[os.path.join(self.path(table), rel)
                       for rel in staged]),
            fields)
        counts = df.agg(*[
            F.sum(F.when(~F.coalesce(F.expr(expr), F.lit(True)), 1)
                  .otherwise(0)).alias(name)
            for name, expr in cons.items()]).first()
        bad = {name: counts[name] for name in cons
               if counts[name] and counts[name] > 0}
        if bad:
            for d in {rel.split(os.sep)[0] for rel in staged}:
                shutil.rmtree(os.path.join(self.path(table), d),
                              ignore_errors=True)
            raise ValueError(
                f"commit to {table} rejected by CHECK constraint(s): "
                + ", ".join(f"{n} ({cons[n]}): {c} row(s)"
                            for n, c in sorted(bad.items())))
        return cons

    @staticmethod
    def _cast_to(df: DataFrame, schema) -> DataFrame:
        """Project ``df`` onto ``schema``: present columns cast,
        absent columns fill NULL (the add-column evolution
        contract)."""
        have = set(df.columns)
        return df.select([
            F.col(f.name).cast(f.dataType) if f.name in have
            else F.lit(None).cast(f.dataType).alias(f.name)
            for f in schema.fields
        ])

    def committed_watermark_tx(self, key: str,
                               default: str = "1970-01-01T00:00:00",
                               as_of_version: int | None = None) -> str:
        """The last committed value of ``key`` across the tx history —
        by construction the watermark that published WITH its data.
        ``as_of_version`` reads the watermark as of that version."""
        txs = self._effective_txs(self._read_txlog())
        self._check_retained(as_of_version, txs)
        val = default
        for v, tx in txs:
            if as_of_version is not None and v > as_of_version:
                break
            if key in tx["watermarks"]:
                val = tx["watermarks"][key]
        return val

    def table_changes(self, table: str, from_version: int,
                      to_version: int | None = None,
                      keys: list[str] | None = None,
                      branch: str | None = None) -> DataFrame:
        """Row-level diff between two committed versions — Delta's
        change-data-feed analog, computed from the time-travel reads
        (no per-commit change files needed): rows present at
        ``to_version`` but not ``from_version`` are ``insert``s, the
        reverse are ``delete``s; with ``keys``, a key on both sides
        whose non-key columns changed surfaces as an
        ``update_preimage``/``update_postimage`` pair instead of a
        delete+insert. Output: the table's columns plus
        ``_change_type``.

        Both versions must be within the retained window
        (:meth:`expire_snapshots`); the diff is two anti-joins (or
        one full-outer with ``keys``) over the two snapshots — at
        scale this reads only the two file lists, never the log
        history between them. ``branch`` diffs within a branch
        lineage — e.g. fork-version → branch head is exactly 'what
        would fast_forward publish', the audit view of WAP-on-branch."""
        new = self.read_committed_tx(table, as_of_version=to_version,
                                     branch=branch)
        old = self.read_committed_tx(table, as_of_version=from_version,
                                     branch=branch)
        cols = new.columns
        if keys:
            val_cols = [c for c in cols if c not in keys]
            changed = F.lit(False)
            for c in val_cols:
                changed = changed | ~F.col(f"n.{c}").eqNullSafe(
                    F.col(f"o.{c}"))
            # presence flags: NULL sentinel = that side has no row
            # (a value column could be legitimately NULL)
            n = (new.withColumn("_pn", F.lit(True)).alias("n")
                 .join(old.withColumn("_po", F.lit(True)).alias("o"),
                       keys, "full_outer"))
            ins = n.filter(F.col("_po").isNull()).select(
                *[F.col(f"n.{c}").alias(c) for c in cols],
                F.lit("insert").alias("_change_type"))
            dele = n.filter(F.col("_pn").isNull()).select(
                *[F.col(f"o.{c}").alias(c) if c not in keys
                  else F.col(c) for c in cols],
                F.lit("delete").alias("_change_type"))
            both = n.filter(F.col("_pn").isNotNull()
                            & F.col("_po").isNotNull()).filter(changed)
            pre = both.select(
                *[F.col(f"o.{c}").alias(c) if c not in keys
                  else F.col(c) for c in cols],
                F.lit("update_preimage").alias("_change_type"))
            post = both.select(
                *[F.col(f"n.{c}").alias(c) if c not in keys
                  else F.col(c) for c in cols],
                F.lit("update_postimage").alias("_change_type"))
            return ins.unionByName(dele).unionByName(pre) \
                .unionByName(post)
        ins = new.join(old, cols, "left_anti").select(
            "*", F.lit("insert").alias("_change_type"))
        dele = old.join(new, cols, "left_anti").select(
            "*", F.lit("delete").alias("_change_type"))
        return ins.unionByName(dele)

    def restore_tx(self, table: str, to_version: int) -> None:
        """Delta's ``RESTORE TABLE ... TO VERSION`` / Iceberg
        rollback: make the table's CURRENT contents equal its state
        at ``to_version`` by publishing a REWRITE record that
        references the historical batch files — zero data copy, one
        metadata commit. History is preserved (the restore is a NEW
        version; the versions in between stay time-travel-readable
        until expiry), and the restored record re-references the old
        batch dirs, so vacuum keeps them live. ``to_version`` must be
        within the retained window; the table's schema stays at its
        CURRENT evolution (restored files predating an added column
        read it as NULL, same as any old file)."""
        txs = self._effective_txs(self._read_txlog())
        self._check_retained(to_version, txs)
        files = self._replay_files(txs, table, to_version)
        read_set = {table: (self._replay_files(txs, table),
                            self._replay_dvs(txs, table))}
        dvs_at = self._replay_dvs(txs, table, to_version)
        if dvs_at:
            # deletion vectors were live at the target version: a
            # file-list-only record can't express "those files minus
            # the DV keys", so materialize the target snapshot (the
            # restore doubles as a compaction of that version). The
            # materialization stays in PHYSICAL names end to end —
            # physical identity is stable across renames, so restored
            # data lines up with the current schema byte-for-byte.
            f_at = self._tx_fields(table, txs, to_version)
            snap = self._read_with_dvs(
                table, txs, self._physical_schema(f_at), dvs_at,
                to_version)
            have = set(snap.columns)
            cur_fields = self._tx_fields(table, txs)
            snap = snap.select(*[
                (F.col(ph).cast(dt) if ph in have
                 else F.lit(None).cast(dt)).alias(ph)
                for _, ph, dt in cur_fields])
            files = self._stage_batch(snap, table)
        self._append_tx_record({table: files}, replaces=[table],
                               expect_files=read_set)

    def history(self) -> DataFrame:
        """Delta's ``DESCRIBE HISTORY`` for the warehouse tx log: one
        row per retained record — ``(version, operation, tables,
        n_files, watermarks, schema_adds)``. Operation is ``commit``
        (plain append tx), ``rewrite`` (compaction / merge /
        restore), or ``snapshot`` (checkpoint fold). Driver-local
        frame: the log is metadata, never corpus-sized."""
        rows = []
        for v, tx in self._effective_txs(self._read_txlog()):
            if tx.get("snapshot"):
                op = "snapshot"
            elif tx.get("replaces"):
                op = "rewrite"
            elif tx.get("dv"):
                op = "merge_mor"
            elif tx.get("tag_add") or tx.get("tag_drop"):
                op = "tag"
            else:
                op = "commit"
            rows.append((
                v, op, sorted(tx["tables"]),
                sum(len(f) for f in tx["tables"].values()),
                dict(tx.get("watermarks", {})),
                {t: [a[0] for a in adds]
                 for t, adds in tx.get("schema_add", {}).items()},
            ))
        return self.spark.createDataFrame(
            rows,
            "version long, operation string, tables array<string>, "
            "n_files long, watermarks map<string,string>, "
            "schema_adds map<string,array<string>>")

    def current_tx_version(self) -> int:
        """The latest committed version (0 = empty log) — the handle a
        caller snapshots BEFORE a batch of maintenance/ingest to read
        consistent pre-state afterwards."""
        txs = self._effective_txs(self._read_txlog())
        return txs[-1][0] if txs else 0

    def _table_in_txlog(self, table: str) -> bool:
        """True once any tx references ``table`` — its committed
        contents are then DEFINED by the tx log, so the plain
        directory-reasoning paths (append/overwrite/compact/vacuum)
        must route through (or refuse on) the log."""
        if not os.path.exists(self._txlog_path()):
            return False
        return any(table in tx["tables"]
                   or table in tx.get("schema_add", {})
                   or table in tx.get("schema_drop", {})
                   or table in tx.get("schema_rename", {})
                   or table in tx.get("constraint_add", {})
                   for tx in self._read_txlog()["txs"])

    def checkpoint_txlog(self, retain_last: int = 0) -> int:
        """Fold tx history older than the last ``retain_last`` records
        into ONE snapshot record and publish it through the same CAS
        metadata-generation protocol ``commit_tx`` uses; returns the
        number of txs folded.

        ``commit_tx`` rewrites the full log on every commit and the
        readers rescan every historical tx, so an unbounded log makes
        commit cost grow with ingest age — the manifest tables got
        ``_compact_committed`` and this is the tx analog (Iceberg's
        snapshot expiration / Delta's checkpoint). Folding preserves
        CURRENT-reader semantics exactly (replaying the snapshot +
        retained tail equals replaying the full history), while
        ``retain_last`` keeps a time-travel window: every version in
        the retained tail stays reconstructible via
        ``read_committed_tx(as_of_version=...)``; versions folded
        into the snapshot are expired and raise."""
        for _ in range(50):
            log = self._read_txlog()
            eff = self._effective_txs(log)
            cut = max(0, len(eff) - max(0, retain_last))
            # a fold flattens every folded file to the snapshot's
            # version, so it must not swallow a LIVE deletion vector:
            # DV application compares file version < dv version, and
            # flattening a still-live DV's base files to the snapshot
            # version would stop (or wrongly start) its application.
            # Folding is safe exactly up to the last prefix position
            # where no table has a live DV (a later REWRITE — compact,
            # restore, cow merge — clears DVs and re-opens folding).
            live_dv: set = set()
            safe = 0
            for i, (_, tx) in enumerate(eff[:cut]):
                for t in tx.get("replaces", []):
                    live_dv.discard(t)
                live_dv.update(tx.get("dv", {}))
                if not live_dv:
                    safe = i + 1
            cut = safe
            # a live TAG pins its version (Iceberg refs retain
            # snapshots): the fold's snapshot version must not exceed
            # the oldest tagged version, or read(as_of_tag=...) dies
            tags = self._tx_tags(eff)
            if tags:
                vmin = min(tags.values())
                while cut > 0 and eff[cut - 1][0] > vmin:
                    cut -= 1
            # a live BRANCH pins its FORK the same way: the branch
            # lineage reads main as of the fork, and its own records
            # (version > fork) must stay in the raw tail un-folded
            raw = self._all_txs(log)
            branches, _ = self._branch_state(raw)
            if branches:
                vmin = min(fork for _, fork in branches.values())
                while cut > 0 and eff[cut - 1][0] > vmin:
                    cut -= 1
            fold, keep = eff[:cut], eff[cut:]
            if len(fold) <= 1:
                return len(fold)
            snap = self._fold_txs([tx for _, tx in fold])
            snap["version"] = fold[-1][0]
            snap["snapshot"] = True
            # the retained tail is the RAW log above the snapshot
            # version: live-branch records survive (their versions
            # exceed every live fork, hence the snapshot version);
            # records of DROPPED, never-published lineages below the
            # cut are garbage-collected here — main never saw them
            tail = [tx for v, tx in raw if v > snap["version"]]
            try:
                self._publish_txlog({"txs": [snap] + tail})
                return len(fold)
            except FileExistsError:
                continue  # a commit landed mid-fold: refold over it
        raise RuntimeError(
            "tx checkpoint failed after 50 CAS retries")

    def expire_snapshots(self, retain_last: int = 0) -> tuple[int, int]:
        """Iceberg's ``expireSnapshots`` + ``removeOrphanFiles`` as one
        maintenance call: fold history past the retention window, then
        drop batch directories no retained record references (files a
        compaction REWRITE superseded become orphans exactly when the
        last snapshot that could read them expires). Returns
        (txs folded, batch dirs removed)."""
        tables = {t for tx in self._read_txlog()["txs"]
                  for t in tx["tables"]}
        folded = self.checkpoint_txlog(retain_last)
        return folded, self.vacuum_uncommitted_tx(sorted(tables))

    @staticmethod
    def _fold_txs(txs: list[dict]) -> dict:
        """(replayed per-table file lists, last-writer-wins
        watermarks) — the reader-equivalent single-tx snapshot. A
        REWRITE record's ``replaces`` resets that table's list, same
        as the live reader's replay. Schema evolution folds to its
        NET state vs the base schema (drop → rename → add entries,
        the order :meth:`_replay_fields` applies within one record),
        and every ever-dropped physical name survives in
        ``schema_retired`` so a post-fold re-add still binds a fresh
        physical column."""
        tables: dict[str, list[str]] = {}
        watermarks: dict[str, str] = {}
        schema_tables: set = set()
        tags_net: dict[str, int] = {}
        branches_net: dict[str, int] = {}
        cluster_net: dict[str, str | None] = {}
        retired: dict[str, set] = {}
        cons: dict[str, dict[str, str]] = {}
        wap_tokens: list[str] = []
        stats: dict[str, dict] = {}
        blooms: dict[str, list] = {}
        clone_base: dict[str, str] = {}
        for tx in txs:
            clone_base.update(tx.get("clone_base", {}))
            if tx.get("wap"):
                wap_tokens.append(tx["wap"])
            wap_tokens.extend(tx.get("wap_tokens", []))
            for t, per_file in tx.get("stats", {}).items():
                stats.setdefault(t, {}).update(per_file)
            for t, entries in tx.get("bloom", {}).items():
                blooms.setdefault(t, []).extend(entries)
            for t in tx.get("replaces", []):
                tables[t] = []
            for t, rels in tx["tables"].items():
                tables.setdefault(t, []).extend(rels)
            watermarks.update(tx["watermarks"])
            for k in ("schema_add", "schema_drop", "schema_rename"):
                schema_tables.update(tx.get(k, {}))
            tags_net.update(tx.get("tag_add", {}))
            for n in tx.get("tag_drop", []):
                tags_net.pop(n, None)
            # live-branch net state: a create record folding at the
            # boundary must not kill its branch; the snapshot re-emits
            # {name: fork} and _branch_state re-scopes the lineage at
            # the snapshot version (strictly below every live-branch
            # record by the fold clamp, so scoping is preserved).
            # Published windows never need carrying: a publish record
            # folds only when every record it published folds with it.
            branches_net.update(tx.get("branch_create", {}))
            for n in tx.get("branch_drop", []):
                branches_net.pop(n, None)
            # clustering spec: last writer wins, explicit None kept
            # (unclustered is a state, not an absence)
            cluster_net.update(tx.get("cluster_spec", {}))
            for t, names in tx.get("schema_retired", {}).items():
                retired.setdefault(t, set()).update(names)
            for t, entries in tx.get("schema_drop", {}).items():
                retired.setdefault(t, set()).update(
                    e[1] for e in entries if isinstance(e, list))
            # net CHECK constraints: adds minus later drops survive
            for t, adds in tx.get("constraint_add", {}).items():
                cons.setdefault(t, {}).update(adds)
            for t, names in tx.get("constraint_drop", {}).items():
                for n in names:
                    cons.get(t, {}).pop(n, None)
        schema_add: dict[str, list] = {}
        schema_drop: dict[str, list] = {}
        schema_rename: dict[str, list] = {}
        for t in schema_tables:
            net = Warehouse._replay_fields(t, txs)
            net_physicals = {ph for _, ph, _ in net}
            base_fields = schemas.WAREHOUSE_TABLES[
                Warehouse._clone_base_of(t, txs)].fields
            for f in base_fields:
                if f.name not in net_physicals:
                    schema_drop.setdefault(t, []).append(
                        [f.name, f.name])
            base_physicals = {f.name for f in base_fields}
            for ln, ph, dt in net:
                if ph in base_physicals:
                    if ln != ph:
                        schema_rename.setdefault(t, []).append([ph, ln])
                else:
                    schema_add.setdefault(t, []).append([ln, dt, ph])
        snap = {"tables": tables, "watermarks": watermarks}
        if schema_add:
            snap["schema_add"] = schema_add
        if schema_drop:
            snap["schema_drop"] = schema_drop
        if schema_rename:
            snap["schema_rename"] = schema_rename
        live_retired = {t: sorted(s) for t, s in retired.items() if s}
        if live_retired:
            snap["schema_retired"] = live_retired
        if tags_net:
            snap["tag_add"] = tags_net
        if branches_net:
            snap["branch_create"] = branches_net
        if cluster_net:
            snap["cluster_spec"] = cluster_net
        live_cons = {t: [[n, e] for n, e in d.items()]
                     for t, d in cons.items() if d}
        if live_cons:
            snap["constraint_add"] = live_cons
        if wap_tokens:
            # published WAP tokens survive the fold so a crashed
            # publish_tx rerun stays exactly-once across checkpoints
            snap["wap_tokens"] = wap_tokens
        # per-file stats survive the fold for files still referenced
        # (dropped stats would only mean footer fallback, but keeping
        # them keeps merges metadata-only across checkpoints)
        live_stats = {
            t: {rel: st for rel, st in per_file.items()
                if rel in set(tables.get(t, []))}
            for t, per_file in stats.items()}
        live_stats = {t: pf for t, pf in live_stats.items() if pf}
        if live_stats:
            snap["stats"] = live_stats
        # bloom-index entries survive the fold for files still
        # referenced (same contract as stats: dropping them would
        # only cost pruning power, but point lookups should stay
        # O(matching files) across checkpoints). An entry's "files"
        # list is carried VERBATIM — the sidecar's _fi column indexes
        # that list positionally, so filtering it would renumber the
        # mapping; stale rels in it are harmless (lookups go by the
        # CURRENT file list). Entries with no live file drop, freeing
        # their sidecar for vacuum.
        live_blooms: dict[str, list] = {}
        for t, entries in blooms.items():
            livef = set(tables.get(t, []))
            kept = [e for e in entries
                    if any(rel in livef for rel in e["files"])]
            if kept:
                live_blooms[t] = kept
        if live_blooms:
            snap["bloom"] = live_blooms
        if clone_base:
            # a clone's base-schema binding must survive every fold
            # or the snapshot's schema replay loses its base table
            snap["clone_base"] = clone_base
        return snap

    def _compact_committed_tx(self, table: str, target_file_bytes: int,
                              zorder_by: list[str] | None,
                              zorder_bits: int,
                              where: str | None = None
                              ) -> tuple[int, int]:
        """Compact a tx-managed table: rewrite its committed rows into
        one right-sized batch, then APPEND a REWRITE record whose
        ``replaces`` marker resets the table's file list going
        forward (Iceberg's rewrite-data-files snapshot) with the tx
        log's own atomic rename. Superseded batches stay on disk —
        still referenced by the historical records, so pre-compaction
        versions remain time-travel-readable until
        :meth:`expire_snapshots` moves the retention window past
        them. A crash at any point leaves the old log (and its
        files) live; the staged rewrite is garbage
        ``vacuum_uncommitted_tx`` collects."""
        eff = self._effective_txs(self._read_txlog())
        old_files = self._replay_files(eff, table)
        if not old_files:
            return 0, 0
        root = self.path(table)
        keep: list[str] = []
        if where is not None:
            # OPTIMIZE ... WHERE: rewrite only the files holding
            # matching rows; the predicate selects FILES, never
            # filters rows. Live DVs widen the rewrite set to the
            # DV-affected files (same shape as the row-level ops):
            # the REWRITE record clears the DVs, which is safe
            # exactly because every file holding a DV-hidden row is
            # materialized here — hot-slice maintenance no longer
            # blocks on a full compact.
            fields = self._tx_fields(table, eff)
            dvs = self._replay_dvs(eff, table)
            keep, touched = self._touched_by_predicate(
                table, fields, old_files, where)
            if not touched:
                return 0, 0   # nothing matches: no-op, no version
            if dvs:
                affected = self._dv_affected_files(
                    table, fields, eff, dvs, keep)
                touched += [rel for rel in keep if rel in affected]
                keep = [rel for rel in keep if rel not in affected]
                df = self._to_logical(
                    self._read_with_dvs(table, eff,
                                        self._physical_schema(fields),
                                        dvs, None, only=touched),
                    fields)
            else:
                df = self._read_files_logical(table, fields, touched)
            rewriting = touched
        else:
            df = self.read_committed_tx(table)
            rewriting = old_files
        total = sum(os.path.getsize(os.path.join(root, rel))
                    for rel in rewriting)
        if zorder_by:
            df = self._with_zorder_key(df, zorder_by, zorder_bits)
        n = max(1, math.ceil(total / target_file_bytes))
        if zorder_by:
            out = (df.repartitionByRange(n, "_zkey")
                   .sortWithinPartitions("_zkey").drop("_zkey"))
        else:
            out = df.repartition(n)
        new_files = self._stage_batch(
            self._to_physical(out, self._tx_fields(table, eff)), table)
        self._append_tx_record(
            {table: keep + new_files}, replaces=[table],
            expect_files={table: (old_files,
                                  self._replay_dvs(eff, table))})
        return len(rewriting), len(new_files)

    def _stage_batch(self, df: DataFrame, table: str) -> list[str]:
        """Write ``df`` under an invisible batch dir of ``table`` and
        return the relative file list — staged, not yet committed."""
        import uuid

        batch_dir = f"batch-{uuid.uuid4().hex}"
        out = os.path.join(self.path(table), batch_dir)
        df.write.mode("overwrite").parquet(out)
        return sorted(
            os.path.join(batch_dir, fn) for fn in os.listdir(out)
            if fn.endswith(".parquet"))

    def _staged_rows(self, table: str, rels: list[str]) -> int:
        """Total row count of staged files, from parquet footers
        driver-side — the no-op checks of the row-level ops read this
        off the batch they just wrote instead of running a whole
        ``isEmpty`` Spark job against the pre-staging plan."""
        import pyarrow.parquet as pq

        root = self.path(table)
        return sum(
            pq.ParquetFile(os.path.join(root, rel)).metadata.num_rows
            for rel in rels)

    def _discard_staged(self, table: str, rels: list[str]) -> None:
        """Remove the batch dir(s) of never-committed staged files
        (the no-op path of a row-level op)."""
        root = self.path(table)
        for d in {os.path.dirname(rel) for rel in rels}:
            shutil.rmtree(os.path.join(root, d), ignore_errors=True)

    # cap on distinct update-key tuples collected to the driver for
    # exact per-file pruning; above it, pruning falls back to the
    # per-column min/max envelope (one tiny agg job)
    _MERGE_PRUNE_MAX_KEYS = 100_000

    # cap on update-key tuples bloom-tested per candidate file at
    # merge time (driver-side bit tests are O(files × tuples × k);
    # above it, stats-based pruning stands alone). 10k keys × 100
    # candidate files × 5 probes ≈ 5M bit tests ≈ well under a second
    _BLOOM_PRUNE_MAX_KEYS = 10_000

    def _footer_stats(self, table: str, rel: str,
                      cols: list[str]) -> dict | None:
        """One file's footer min/max for ``cols`` —
        ``{col: (lo, hi) | None}`` (None = no non-null values), or
        ``None`` when the footer is unusable."""
        import pyarrow.parquet as pq

        try:
            md = pq.ParquetFile(
                os.path.join(self.path(table), rel)).metadata
            ranges: dict = {}
            for c in cols:
                idx = None
                for j in range(md.num_columns):
                    if md.row_group(0).column(j).path_in_schema == c:
                        idx = j
                        break
                if idx is None:
                    ranges[c] = None
                    continue
                lo = hi = None
                for rg in range(md.num_row_groups):
                    col = md.row_group(rg).column(idx)
                    st = col.statistics
                    if st is None or not st.has_min_max:
                        if (st is not None and st.null_count
                                == md.row_group(rg).num_rows):
                            continue  # all-NULL row group
                        raise ValueError("no stats")
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
                ranges[c] = None if lo is None else (lo, hi)
            return ranges
        except Exception:
            return None

    @staticmethod
    def _log_stats(txs: list[tuple[int, dict]], table: str) -> dict:
        """Per-file column stats recorded on commit (``stats_cols``
        opt-in): ``{rel: {col: (lo, hi) | None}}``. Stale rels (from
        superseded records) are harmless — lookups are by the CURRENT
        file list."""
        out: dict = {}
        for _, tx in txs:
            for rel, cols in tx.get("stats", {}).get(table, {}).items():
                out[rel] = {c: (None if v is None else tuple(v))
                            for c, v in cols.items()}
        return out

    # ---------------------------------------- bloom filter indexes

    def _index_staged_blooms(self, tables: dict[str, list[str]]
                             ) -> dict[str, list[dict]]:
        """Build the per-file bloom index for every ``bloom_cols``
        table in this commit: ONE distributed job per table computes,
        for each (staged file, indexed column), the set words of a
        ``bloom_bits``-bit / ``bloom_hashes``-hash bloom over the
        column's non-null values, and writes them SPARSE — one
        ``(_fi, _ci, _w, _v)`` row per set 64-bit word, file and
        column as positional int ids — as a parquet sidecar staged
        like any batch. Nothing is collected to the driver (at deploy
        scale a commit can stage thousands of files; the bitmaps flow
        executor → sidecar parquet directly). Measured cost: ~one
        partial-aggregated pass over n·k exploded rows per commit
        (~1.4 s for a 500k-row batch on local[32]) — the price the
        opt-in buys point lookups with. Returns the tx-record
        entries ``{table: [{"m", "k", "cols", "files", "sidecar"}]}``
        where ``files``/``cols`` are the id→name mappings the
        sidecar's ``_fi``/``_ci`` index into (so the lists must never
        be reordered or filtered — the fold carries them verbatim).

        Files already covered by an earlier record's index (a REWRITE
        re-listing kept files) are skipped — their sidecars remain
        valid because a committed file's bytes never change."""
        out: dict[str, list[dict]] = {}
        for t, rels in tables.items():
            cols = self.bloom_cols.get(t)
            if not cols or not rels:
                continue
            fields = self._tx_fields(t)
            p_of = {ln: ph for ln, ph, _ in fields}
            pcols = sorted({p_of.get(c, c) for c in cols})
            covered = set()
            for e in self._bloom_entries(
                    self._all_txs(self._read_txlog()), t):
                covered.update(e["files"])
            new = [rel for rel in rels if rel not in covered]
            if not new:
                continue
            m, k = self.bloom_bits, self.bloom_hashes
            root = self.path(t)
            pschema = self._physical_schema(fields)
            present = [c for c in pcols if c in pschema.fieldNames()]
            if not present:
                continue
            # Per-file INT ids via a union of single-file scans, and
            # int column ids: the hot path (n·k exploded rows through
            # the partial-agg exchange) carries only ints — tagging
            # with input_file_name() and string column names measured
            # ~2× the job cost, and the URI mapping was the fragile
            # part. The sidecar speaks (_fi, _ci) resolved through
            # the entry's "files"/"cols" lists. Reads carry the known
            # key schema explicitly: no footer-inference job per
            # staged file, and a kept file from before an add-column
            # (missing the physical column) reads as all-NULL, so its
            # bloom is legitimately empty for that column — the same
            # semantics the old per-file column check spelled out.
            read_schema = StructType([pschema[c] for c in present])
            df = None
            for fi, rel in enumerate(new):
                part = (self.spark.read.schema(read_schema)
                        .parquet(os.path.join(root, rel))
                        .select(F.lit(fi).alias("_fi"), *present))
                df = part if df is None else df.unionByName(part)
            probes = [F.struct(
                F.lit(ci).alias("_ci"),
                F.when(F.col(c).isNotNull(),
                       F.pmod(F.xxhash64(F.col(c), F.lit(s)),
                              F.lit(m))).alias("_p"))
                for ci, c in enumerate(present) for s in range(k)]
            # FLAT (_fi, _ci, _w, _v) rows — one row per SET word.
            # A per-file map column would be n·k entries in one cell
            # (measured 10× the commit cost at 500k-row batches);
            # flat rows ride ONE partial-aggregated exchange (the
            # map-side bit_or caps rows at words-per-file), write
            # vectorized, and let the read side filter to just the
            # probed word indexes.
            words = (df
                     .select("_fi", F.explode(F.array(*probes))
                             .alias("e"))
                     .filter(F.col("e._p").isNotNull())
                     .select("_fi", F.col("e._ci").alias("_ci"),
                             # 64-bit words: half the rows of 32-bit
                             (F.col("e._p") / 64).cast("int")
                             .alias("_w"),
                             # SQL expr: the Python shiftleft binding
                             # only takes a literal shift count
                             F.expr("shiftleft(1L, "
                                    "cast(e._p % 64 as int))")
                             .alias("_b"))
                     .groupBy("_fi", "_ci", "_w")
                     .agg(F.bit_or("_b").alias("_v")))
            import uuid
            side_dir = f"batch-bloom-{uuid.uuid4().hex}"
            words.write.mode("overwrite").parquet(
                os.path.join(root, side_dir))
            sidecar = sorted(
                os.path.join(side_dir, fn)
                for fn in os.listdir(os.path.join(root, side_dir))
                if fn.endswith(".parquet"))
            out[t] = [{"m": m, "k": k, "cols": present,
                       "files": new, "sidecar": sidecar}]
        return out

    @staticmethod
    def _bloom_entries(txs: list[tuple[int, dict]],
                       table: str) -> list[dict]:
        """Every bloom-index entry any retained record carries for
        ``table``, in commit order. Entries for superseded files are
        harmless — lookups are by the CURRENT file list."""
        return [e for _, tx in txs
                for e in tx.get("bloom", {}).get(table, [])]

    def _bloom_for_files(self, table: str, txs, files: list[str],
                         pcols: list[str], words: set) -> dict:
        """``{rel: (m, k, {pcol: {word_idx: word}})}`` for the subset
        of ``files`` whose commit indexed every column in ``pcols``
        under the warehouse's CURRENT ``bloom_bits``/``bloom_hashes``
        config (entries built under another config are skipped — the
        caller's probe positions wouldn't match; those files simply
        stay candidates). Sidecars are read driver-side with pyarrow
        FILTERED to the probe's ``words`` (the word indexes its hash
        positions land in) — a point probe touches k·|cols| words, so
        the read materializes a handful of rows however large the
        index is. A probed word absent from the filtered read is a
        genuinely zero word (the filter enumerated it), so the sparse
        missing=0 contract holds."""
        import pyarrow.compute as pc
        import pyarrow.dataset as ds

        want = set(files)
        root = self.path(table)
        out: dict = {}
        wlist = sorted(words)
        for e in self._bloom_entries(txs, table):
            if (e["m"] != self.bloom_bits
                    or e["k"] != self.bloom_hashes
                    or not set(pcols) <= set(e["cols"])):
                continue
            hit = [rel for rel in e["files"] if rel in want]
            if not hit:
                continue
            rows: dict = {}
            tbl = (ds.dataset([os.path.join(root, rel)
                               for rel in e["sidecar"]])
                   .to_table(filter=pc.field("_w").isin(wlist)))
            for fi, ci, w, v in zip(tbl.column("_fi").to_pylist(),
                                    tbl.column("_ci").to_pylist(),
                                    tbl.column("_w").to_pylist(),
                                    tbl.column("_v").to_pylist()):
                rows.setdefault(fi, {}).setdefault(ci, {})[w] = v
            fi_of = {rel: fi for fi, rel in enumerate(e["files"])}
            ci_of = {c: ci for ci, c in enumerate(e["cols"])}
            for rel in hit:
                per_col = rows.get(fi_of[rel], {})
                # a covered file with no surviving rows had no set
                # bits at the probed words (or no non-null values at
                # all) — its bloom rejects the probe
                out[rel] = (e["m"], e["k"],
                            {c: per_col.get(ci_of[c], {})
                             for c in pcols})
        return out

    def _bloom_probe_positions(self, pairs: list) -> list[list[int]]:
        """Bloom positions for probe values, with the SAME ``xxhash64``
        the index build used. Long/int/string probes hash DRIVER-SIDE
        through the bit-exact Python port below (pinned against
        Spark's ``xxhash64`` by pytest over value/seed/length grids) —
        a point lookup then costs zero Spark jobs for hashing. Any
        other type falls back to the original one-row Spark job, which
        is definitionally bit-exact. ``pairs`` is
        ``[(value, DataType)]``; each value is hashed at its table
        column's type because ``xxhash64`` is type-sensitive."""
        from pyspark.sql.types import (ByteType, IntegerType, LongType,
                                       ShortType, StringType)

        m, k = self.bloom_bits, self.bloom_hashes
        out: list = [None] * len(pairs)
        spark_side = []
        for i, (v, dt) in enumerate(pairs):
            # F.xxhash64(value, lit(s)) is Spark's MULTI-column hash
            # at its fixed default seed 42: the value's hash becomes
            # the seed for hashing the IntegerType literal ``s``.
            # The fast path is taken ONLY when the Python type matches
            # the column type exactly (type(v) is int/str — note bool
            # is an int subclass, so ``type is`` excludes it): a
            # coercing int(v)/str(v) would diverge from the Spark-side
            # ``F.lit(v).cast(dt)`` the index build used (str(True) =
            # 'True' vs Spark 'true'; str(1e-07) = '1e-07' vs
            # '1.0E-7'; int('5.8') raises), and a divergent hash makes
            # the bloom silently prune files that DO contain the rows.
            # Everything else routes to the Spark fallback, which is
            # bit-exact by construction.
            # Range guard mirrors ANSI cast bounds: the Python
            # routines mask-wrap where Spark's cast would raise, so an
            # out-of-range probe must take the Spark path too.
            _rng = {LongType: 63, IntegerType: 31,
                    ShortType: 15, ByteType: 7}.get(type(dt))
            _in_rng = (type(v) is int and _rng is not None
                       and -(1 << _rng) <= v < (1 << _rng))
            if _in_rng and isinstance(dt, LongType):
                out[i] = [_xxh64_int(s, _xxh64_long(v, 42)) % m
                          for s in range(k)]
            elif _in_rng and isinstance(
                    dt, (IntegerType, ShortType, ByteType)):
                # sub-long integrals hash through the 4-byte path
                out[i] = [_xxh64_int(s, _xxh64_int(v, 42)) % m
                          for s in range(k)]
            elif type(v) is str and isinstance(dt, StringType):
                out[i] = [_xxh64_int(
                    s, _xxh64_bytes(v.encode("utf-8"), 42)) % m
                    for s in range(k)]
            else:
                spark_side.append(i)
        if spark_side:
            row = self.spark.range(1).select(*[
                F.array(*[F.pmod(
                    F.xxhash64(F.lit(pairs[i][0]).cast(pairs[i][1]),
                               F.lit(s)), F.lit(m))
                    for s in range(k)]).alias(f"_p{i}")
                for i in spark_side]).first()
            for i in spark_side:
                out[i] = list(row[f"_p{i}"])
        return out

    @staticmethod
    def _bloom_might_contain(bits: dict, positions: list[int]) -> bool:
        """True unless some probe position's bit is unset (sparse
        64-bit word map: missing word = all-zero; Python's arithmetic
        shift reads the right bit even when the stored int64 pattern
        is negative)."""
        return all((bits.get(p >> 6, 0) >> (p & 63)) & 1
                   for p in positions)

    def _file_key_stats(self, table: str, files: list[str],
                        keys: list[str]) -> dict:
        """Per-file min/max of the merge ``keys`` — from the TX LOG
        when the file's commit recorded them (``stats_cols`` opt-in:
        pure metadata, no I/O), else from the parquet footer
        driver-side (exact, the no-log-format-change fallback; fine
        locally, an O(files) round-trip cost on object storage).
        Returns ``{rel: {col: (lo, hi) | None}}`` — ``None`` for a
        column with no non-null values in the file (can never match a
        join key), and ``{rel: None}`` for a file whose stats are
        unusable (treated as touched). Parquet stat truncation only
        WIDENS ranges (truncated min is a prefix ≤ real min; writers
        bump the last byte of a truncated max), so pruning on them is
        conservative-correct."""
        txs = self._effective_txs(self._read_txlog())
        logged = self._log_stats(txs, table)
        # stats (log + footers) are keyed by PHYSICAL column name;
        # merge keys arrive logical — translate both ways
        p_of = {ln: ph for ln, ph, _ in self._tx_fields(table, txs)}
        pkeys = {k: p_of.get(k, k) for k in keys}
        out: dict = {}
        for rel in files:
            rec = logged.get(rel)
            if rec is not None and all(p in rec
                                       for p in pkeys.values()):
                out[rel] = {k: rec[p] for k, p in pkeys.items()}
                continue
            fs = self._footer_stats(table, rel, list(pkeys.values()))
            out[rel] = (None if fs is None
                        else {k: fs[p] for k, p in pkeys.items()})
        return out

    def _prune_merge_files(self, table: str, files: list[str],
                           keys: list[str], updates: DataFrame
                           ) -> tuple[list[str], list[str]]:
        """Split the committed ``files`` into ``(keep, touched)`` for
        a merge of ``updates`` on ``keys``: a file is KEPT (referenced
        untouched by the new REWRITE record, not rewritten) when its
        footer key ranges prove no update key can match a row in it.
        Exact per-tuple containment when the update key set is small
        (the CDC norm — collected once, ≤ ``_MERGE_PRUNE_MAX_KEYS``);
        per-column min/max envelope overlap otherwise. Conservative
        everywhere: unusable stats or incomparable types ⇒ touched.

        When the table carries a bloom index on the merge keys
        (``bloom_cols``), files the min/max envelope can't clear are
        re-tested against their per-file blooms: a file none of the
        update keys can be in moves back to ``keep``. This is the
        decisive tier when the merge key is NOT the clustering column
        — every file then spans nearly the full key domain and stats
        alone rewrite the whole table. The probe positions ride the
        same collect job as the key tuples (one extra projected
        column per key, no extra job)."""
        stats = self._file_key_stats(table, files, keys)
        bloom_keys = [c for c in keys
                      if c in (self.bloom_cols.get(table) or [])]
        probe = updates.select(*keys).distinct() \
            .limit(self._MERGE_PRUNE_MAX_KEYS + 1)
        if bloom_keys:
            dt_of = {ln: dt for ln, ph, dt in self._tx_fields(table)}
            m, k = self.bloom_bits, self.bloom_hashes
            probe = probe.select(*keys, *[
                F.array(*[F.pmod(F.xxhash64(F.col(c).cast(dt_of[c]),
                                            F.lit(s)), F.lit(m))
                          for s in range(k)]).alias(f"_bp_{c}")
                for c in bloom_keys])
        rows = probe.collect()
        if len(rows) > self._MERGE_PRUNE_MAX_KEYS:
            b = updates.agg(*[
                f for c in keys
                for f in (F.min(c).alias(f"_lo_{c}"),
                          F.max(c).alias(f"_hi_{c}"))]).first()
            # SQL NULL never equals a key: a NULL envelope means the
            # updates have no non-null values for that column
            ukeys = None
            env = {c: (b[f"_lo_{c}"], b[f"_hi_{c}"]) for c in keys}
        else:
            # tuples with a NULL component can never match (join
            # equality), drop them from the probe set
            ukeys, upos = [], []
            for r in rows:
                t = tuple(r[c] for c in keys)
                if all(v is not None for v in t):
                    ukeys.append(t)
                    if bloom_keys:
                        upos.append({c: list(r[f"_bp_{c}"])
                                     for c in bloom_keys})
            env = None
        keep: list[str] = []
        touched: list[str] = []
        for rel in files:
            st = stats.get(rel)
            if st is None:
                touched.append(rel)
                continue
            try:
                if any(st[c] is None for c in keys):
                    keep.append(rel)  # a key col is all-NULL here
                    continue
                if ukeys is not None:
                    hit = any(
                        all(st[c][0] <= t[i] <= st[c][1]
                            for i, c in enumerate(keys))
                        for t in ukeys)
                else:
                    hit = all(
                        env[c][0] is not None
                        and not (env[c][1] < st[c][0]
                                 or env[c][0] > st[c][1])
                        for c in keys)
            except TypeError:
                hit = True  # incomparable stat/value types: rewrite
            (touched if hit else keep).append(rel)
        if (bloom_keys and ukeys and touched
                and len(ukeys) <= self._BLOOM_PRUNE_MAX_KEYS):
            p_of = {ln: ph for ln, ph, _ in self._tx_fields(table)}
            pb_cols = [p_of.get(c, c) for c in bloom_keys]
            words = {p >> 6 for up in upos
                     for ps in up.values() for p in ps}
            blooms = self._bloom_for_files(
                table, self._effective_txs(self._read_txlog()),
                touched, pb_cols, words)
            still = []
            for rel in touched:
                ent = blooms.get(rel)
                if ent is None:        # no (matching) index: rewrite
                    still.append(rel)
                    continue
                _, _, bits = ent
                if any(all(self._bloom_might_contain(bits[pc], up[c])
                           for c, pc in zip(bloom_keys, pb_cols))
                       for up in upos):
                    still.append(rel)
                else:
                    keep.append(rel)   # provably holds no update key
            touched = still
        return keep, touched

    def merge_tx(self, table: str, updates: DataFrame, keys: list[str],
                 delete_col: str | None = None,
                 prune: bool = True, mode: str = "cow",
                 branch: str | None = None) -> None:
        """MERGE INTO a tx-managed table (Delta's ``MERGE`` /
        Iceberg's copy-on-write row-level update): rewrite ONLY the
        committed files whose footer key ranges intersect the update
        batch (:meth:`_prune_merge_files` — Delta/Iceberg MERGE file
        pruning); every other file is re-referenced untouched by the
        new REWRITE record. Matched rows are replaced, tombstoned
        rows deleted, new keys inserted
        (:func:`~zolo_spark.ops.merge.merge_upsert`); the rewritten
        subset stages as ONE batch and publishes with the log's
        atomic rename, carrying the snapshot's file list as the READ
        SET — a concurrent commit to the same table between the
        snapshot read and the publish raises
        :class:`ConcurrentWriteError` instead of silently dropping
        its rows. A crash before the rename leaves the table
        unchanged (the staged batch is vacuum-collectable garbage);
        pre-merge versions stay time-travel-readable until
        :meth:`expire_snapshots`. At 100 TB this is THE difference
        between a CDC micro-batch costing O(matched files) and
        O(table): a key-clustered table (commit-time
        ``sortWithinPartitions`` / z-order compaction) localizes each
        batch to a handful of files.

        ``mode="mor"`` is MERGE-ON-READ (Delta deletion vectors /
        Iceberg merge-on-read / Hudi MOR): the merge writes ONLY the
        postimage batch plus a key-list deletion vector — zero data
        files rewritten, commit cost O(update batch) regardless of how
        many files the keys touch. Readers apply the DV as a broadcast
        anti-filter (:meth:`_read_with_dvs`); :meth:`compact` (or a
        later cow-mode merge) materializes the DVs away. Choose mor
        for update-heavy hot tables between compactions, cow for
        read-heavy ones — the read result is bit-identical either
        way (pinned by the mor/cow twin test)."""
        from .ops.merge import merge_upsert

        if self._has_manifest(table):
            raise ValueError(
                f"table {table} is manifest-managed (append_commit); "
                "merge through the manifest subsystem instead")
        if mode not in ("cow", "mor"):
            raise ValueError(f"merge_tx mode must be cow|mor, got {mode}")
        txs = self._effective_txs(self._read_txlog(), branch)
        fields = self._tx_fields(table, txs)
        want = self._tx_schema(table, txs)
        p_of = {ln: ph for ln, ph, _ in fields}
        files = self._replay_files(txs, table)
        dvs = self._replay_dvs(txs, table)
        # cast updates onto the evolved schema (absent added columns
        # fill NULL) while carrying the tombstone column through
        have = set(updates.columns)
        sel = [F.col(f.name).cast(f.dataType) if f.name in have
               else F.lit(None).cast(f.dataType).alias(f.name)
               for f in want.fields]
        if delete_col is not None:
            sel.append(F.col(delete_col))
        # Materialize the update batch ONCE (Delta's MERGE source
        # materialization): every consumer below — file pruning, the
        # DV key list, the postimage batch, the merge itself — must
        # see the SAME rows, but a non-idempotent source (the API-
        # extract hazard _validate_staged documents) can yield
        # different keys on each plan evaluation, so a 'kept' file
        # could still hold a key the second evaluation introduced
        # (r12 ADVICE item 2). localCheckpoint truncates the lineage:
        # one evaluation, every reader shares it.
        updates = updates.select(sel).localCheckpoint()
        sel = updates.columns
        if mode == "mor":
            upd = updates.select(sel)
            # the DV lists EVERY update key (tombstoned or not): a
            # matched key's old row must stop being visible whether it
            # was updated or deleted; an unmatched key's DV entry
            # matches nothing (the anti-join no-op, same as cow)
            # the sidecar stores keys under their PHYSICAL names, so
            # the read-time anti-join stays valid across later renames
            dv_df = upd.select(*[F.col(k).alias(p_of[k])
                                 for k in keys]).distinct()
            data = (upd.filter(~F.coalesce(F.col(delete_col),
                                           F.lit(False))).drop(delete_col)
                    if delete_col is not None else upd)
            # key-sorted postimage batch: tight footers for the cow
            # pruning that runs when a later merge materializes
            data = self._to_physical(data, fields) \
                .sortWithinPartitions(*[p_of[k] for k in keys])
            new_files = self._stage_batch(data, table)
            # the postimage batch honors CHECK constraints (the DV
            # sidecar is metadata, not rows — exempt)
            cons = self._validate_staged(table, new_files, fields, txs)
            dv_files = self._stage_batch(dv_df, table)
            self._append_tx_record({table: new_files},
                                   dv={table: dv_files},
                                   dv_keys={table: [p_of[k]
                                                    for k in keys]},
                                   expect_files={table: (files, dvs)},
                                   validated_constraints={
                                       table: (cons, new_files)},
                                   branch=branch)
            if (self.auto_compact_dvs is not None and branch is None
                    and len(dvs) + 1 >= self.auto_compact_dvs):
                self.compact(table)   # materialize the DV stack
            return
        if dvs:
            # live DVs: the rewrite set widens to (key-matched ∪
            # DV-affected) files read through the DV-resolved subset
            # path — same O(matched files) pruning as delete_tx/
            # update_tx under live DVs (the REWRITE record clears the
            # DVs, safe because every file holding a DV-hidden row is
            # materialized here); pre-r14 this branch rewrote the
            # whole table
            keep, touched = (self._prune_merge_files(
                table, files, keys, updates.select(sel))
                if prune and files else ([], list(files)))
            affected = self._dv_affected_files(
                table, fields, txs, dvs, keep)
            touched += [rel for rel in keep if rel in affected]
            keep = [rel for rel in keep if rel not in affected]
            cur = self._to_logical(
                self._read_with_dvs(table, txs,
                                    self._physical_schema(fields),
                                    dvs, None, only=touched),
                fields) if touched else \
                self.spark.createDataFrame([], want)
        else:
            keep, touched = (self._prune_merge_files(
                table, files, keys, updates.select(sel))
                if prune and files else ([], list(files)))
            if touched:
                cur = self._to_logical(
                    self.spark.read
                    .schema(self._physical_schema(fields))
                    .parquet(*[os.path.join(self.path(table), rel)
                               for rel in touched]),
                    fields)
            else:
                cur = self.spark.createDataFrame([], want)
        merged = merge_upsert(cur, updates.select(sel), keys,
                              delete_col=delete_col)
        # keep the rewritten batch key-sorted within each task so its
        # parquet footers stay TIGHT on the merge key — repeated
        # merges would otherwise widen every file's key range and
        # erode the pruning this method depends on (zero extra
        # shuffle; commit_tx does the same for the _dt slice column)
        merged = self._to_physical(merged, fields) \
            .sortWithinPartitions(*[p_of[k] for k in keys])
        new_files = self._stage_batch(merged, table)
        cons = self._validate_staged(table, new_files, fields, txs)
        self._append_tx_record({table: keep + new_files},
                               replaces=[table],
                               expect_files={table: (files, dvs)},
                               validated_constraints={
                                   table: (cons, new_files)},
                               branch=branch)

    def _read_files_logical(self, table: str, fields,
                            rels: list[str]) -> DataFrame:
        """Logical-named frame over an explicit committed-file subset
        (no DV application — callers handle DVs)."""
        return self._to_logical(
            self.spark.read.schema(self._physical_schema(fields))
            .parquet(*[os.path.join(self.path(table), rel)
                       for rel in rels]),
            fields)

    def _touched_by_predicate(self, table: str, fields,
                              files: list[str], condition: str
                              ) -> tuple[list[str], list[str]]:
        """Split committed ``files`` into (keep, touched) for a
        row-level DELETE/UPDATE: touched = files holding ≥1 row
        matching ``condition`` — found with ONE predicate-pushed scan
        collecting distinct file names (Delta's DELETE/UPDATE scan
        phase). Parquet row-group stats make the scan skip
        non-matching row groups, and only file NAMES come back, so at
        100 TB this costs one pushed-down scan, never a shuffle; the
        rewrite phase then touches O(matched files), not O(table)."""
        df = self._read_files_logical(table, fields, files)
        # filter BEFORE tagging the file name: input_file_name() is
        # nondeterministic and blocks pushdown past its project, so
        # the other order would scan every row group of every file
        hits = {r["_f"] for r in
                df.filter(F.expr(condition))
                .withColumn("_f", F.input_file_name())
                .select("_f").distinct().collect()}
        root = self.path(table)
        uri_of = {rel: self._file_uri(os.path.join(root, rel))
                  for rel in files}
        touched = [rel for rel in files if uri_of[rel] in hits]
        keep = [rel for rel in files if uri_of[rel] not in hits]
        return keep, touched

    @staticmethod
    def _file_uri(path: str) -> str:
        """Canonical ``file:`` URI for a local path, matching what
        ``input_file_name()`` reports (URL-encoded). Raw
        ``'file://' + abspath`` miscompares the moment the warehouse
        root holds a space or any percent-encodable character — every
        file would classify as 'keep' and the row-level op would
        silently no-op."""
        from pathlib import Path

        return Path(os.path.abspath(path)).as_uri()

    def _dv_affected_files(self, table: str, fields, txs, dvs,
                           rels: list[str]) -> set:
        """The subset of committed files ``rels`` holding ≥1 row
        hidden by a live deletion vector — the files a REWRITE record
        must materialize before it may clear the DVs. One
        column-pruned scan per distinct DV key set (reads ONLY the
        key columns), broadcast-joined against the stacked DV key
        lists with each file's commit version ``_fv`` scoped per DV
        (``_fv < v_dv``), returning file NAMES only — never a shuffle
        of the base table, same scale shape as
        :meth:`_touched_by_predicate`."""
        if not dvs or not rels:
            return set()
        root = self.path(table)
        want = set(rels)
        segs = [(v, [rel for rel in fl if rel in want])
                for v, fl in self._replay_file_versions(txs, table)]
        segs = [(v, fl) for v, fl in segs if fl]
        if not segs:
            return set()
        pschema = self._physical_schema(fields)
        by_keys: dict[tuple, list] = {}
        for v_dv, keys, dv_files in dvs:
            by_keys.setdefault(tuple(keys), []).append((v_dv, dv_files))
        uri_of = {rel: self._file_uri(os.path.join(root, rel))
                  for rel in want}
        affected: set = set()
        for keys, entries in by_keys.items():
            # explicit key schema: skip the per-DV footer-inference
            # job (same as the _read_with_dvs read path)
            dv_schema = StructType(
                [pschema[k] for k in keys
                 if k in pschema.fieldNames()])
            dvk = None
            for v_dv, dv_files in entries:
                reader = self.spark.read
                if len(dv_schema) == len(keys):
                    reader = reader.schema(dv_schema)
                part = (reader
                        .parquet(*[os.path.join(root, rel)
                                   for rel in dv_files])
                        .select(*keys)
                        .withColumn("_dvv", F.lit(v_dv)))
                dvk = part if dvk is None else dvk.unionByName(part)
            # envelope prefilter: only rows inside the stacked DV
            # keys' per-column min/max can survive the equality join,
            # and the filter sits BEFORE the nondeterministic
            # input_file_name tag, so it pushes into the scan as
            # row-group skipping — key-clustered DVs (the CDC norm)
            # cost O(affected files), not a full key-column scan
            row = dvk.agg(*[f for k in keys
                            for f in (F.min(k).alias(f"_lo_{k}"),
                                      F.max(k).alias(f"_hi_{k}"))]
                          ).collect()[0]
            env = None
            for k in keys:
                lo, hi = row[f"_lo_{k}"], row[f"_hi_{k}"]
                if lo is None:
                    continue   # all-NULL key column: no row joins
                c = (F.col(k) >= F.lit(lo)) & (F.col(k) <= F.lit(hi))
                env = c if env is None else env & c
            raw = None
            for v, fl in segs:
                part = (self.spark.read.schema(pschema)
                        .parquet(*[os.path.join(root, rel)
                                   for rel in fl])
                        .select(*keys))
                if env is not None:
                    part = part.filter(env)
                part = (part
                        .withColumn("_f", F.input_file_name())
                        .withColumn("_fv", F.lit(v)))
                raw = part if raw is None else raw.unionByName(part)
            hits = {r["_f"] for r in
                    raw.join(F.broadcast(dvk), list(keys), "inner")
                    .filter(F.col("_fv") < F.col("_dvv"))
                    .select("_f").distinct().collect()}
            affected.update(rel for rel in want if uri_of[rel] in hits)
        return affected

    def delete_tx(self, table: str, condition: str,
                  keys: list[str] | None = None,
                  mode: str = "cow",
                  branch: str | None = None) -> None:
        """Delta's ``DELETE FROM table WHERE condition`` on a
        tx-managed table. SQL WHERE semantics: a row whose predicate
        evaluates NULL is NOT deleted.

        ``mode="cow"``: one predicate-pushed scan finds the files
        holding matching rows; ONLY those are rewritten (filtered),
        every other file is re-referenced untouched — O(matched
        files), the same pruning shape merge_tx has. A predicate
        aligned with the table's clustering (the commit-time sort /
        z-order) touches a handful of files at any scale. No matching
        rows → no new version (Delta's no-op DELETE).

        ``mode="mor"``: zero rewrites — the matching rows' ``keys``
        land in a deletion-vector sidecar (Delta's DV DELETE);
        readers anti-join it until compaction. Requires ``keys``
        (the engine's DVs are key-lists, not row indexes).

        Either mode publishes through the optimistic-concurrency
        protocol with the snapshot's (files, DVs) read set."""
        if self._has_manifest(table):
            raise ValueError(
                f"table {table} is manifest-managed (append_commit)")
        if mode not in ("cow", "mor"):
            raise ValueError(f"delete_tx mode must be cow|mor, got {mode}")
        txs = self._effective_txs(self._read_txlog(), branch)
        fields = self._tx_fields(table, txs)
        files = self._replay_files(txs, table)
        dvs = self._replay_dvs(txs, table)
        if mode == "mor":
            if not keys:
                raise ValueError(
                    "delete_tx(mode='mor') needs keys: the deletion "
                    "vector is a key-list sidecar")
            p_of = {ln: ph for ln, ph, _ in fields}
            matched = (self.read_committed_tx(table, branch=branch)
                       .filter(F.expr(condition))
                       .select(*[F.col(k).alias(p_of[k]) for k in keys])
                       .distinct())
            dv_files = self._stage_batch(matched, table)
            if self._staged_rows(table, dv_files) == 0:
                # no match: no-op, matching the cow contract (an empty
                # DV sidecar would cost every later read a dead
                # anti-join and count toward auto_compact_dvs) — the
                # check reads the staged footers, not an isEmpty job
                self._discard_staged(table, dv_files)
                return
            self._append_tx_record({table: []},
                                   dv={table: dv_files},
                                   dv_keys={table: [p_of[k]
                                                    for k in keys]},
                                   expect_files={table: (files, dvs)},
                                   branch=branch)
            if (self.auto_compact_dvs is not None and branch is None
                    and len(dvs) + 1 >= self.auto_compact_dvs):
                self.compact(table)
            return
        if not files:
            return
        keep, touched = self._touched_by_predicate(
            table, fields, files, condition)
        if not touched:
            return   # no row matches: no-op, no new version
        if dvs:
            # live DVs: the rewrite set widens to (condition-matched
            # ∪ DV-affected) files — the REWRITE record clears the
            # DVs, which is safe exactly because every file holding a
            # DV-hidden row is materialized here; every other file is
            # re-referenced untouched. Still O(matched files), never
            # O(table) (the pre-r14 branch rewrote everything).
            affected = self._dv_affected_files(
                table, fields, txs, dvs, keep)
            touched += [rel for rel in keep if rel in affected]
            keep = [rel for rel in keep if rel not in affected]
            remain = self._to_logical(
                self._read_with_dvs(table, txs,
                                    self._physical_schema(fields),
                                    dvs, None, only=touched),
                fields).filter(
                ~F.coalesce(F.expr(condition), F.lit(False)))
        else:
            remain = self._read_files_logical(
                table, fields, touched).filter(
                ~F.coalesce(F.expr(condition), F.lit(False)))
        staged = self._to_physical(remain, fields)
        c_cols = self._cluster_cols(table, txs)
        if c_cols:
            staged = staged.sortWithinPartitions(*c_cols)
        new_files = self._stage_batch(staged, table)
        cons = self._validate_staged(table, new_files, fields, txs)
        self._append_tx_record({table: keep + new_files},
                               replaces=[table],
                               expect_files={table: (files, dvs)},
                               validated_constraints={
                                   table: (cons, new_files)},
                               branch=branch)

    def update_tx(self, table: str, assignments: dict[str, str],
                  condition: str, keys: list[str] | None = None,
                  mode: str = "cow",
                  branch: str | None = None) -> None:
        """Delta's ``UPDATE table SET col = expr, ... WHERE
        condition``. SQL semantics: a NULL predicate leaves the row
        unchanged; assignment expressions see the PRE-update row
        (simultaneous assignment, not sequential).

        ``mode="cow"`` rewrites only the files holding matching rows
        (one predicate-pushed scan, same O(matched files) shape as
        delete_tx/merge_tx). ``mode="mor"`` writes the updated rows
        as a postimage batch plus a key-list deletion vector hiding
        their old images — zero rewrites until compaction; requires
        ``keys``."""
        if self._has_manifest(table):
            raise ValueError(
                f"table {table} is manifest-managed (append_commit)")
        if mode not in ("cow", "mor"):
            raise ValueError(f"update_tx mode must be cow|mor, got {mode}")
        txs = self._effective_txs(self._read_txlog(), branch)
        fields = self._tx_fields(table, txs)
        logical = [ln for ln, _, _ in fields]
        bad = sorted(set(assignments) - set(logical))
        if bad:
            raise ValueError(
                f"update_tx: no column(s) {bad} on {table}")
        hit = F.coalesce(F.expr(condition), F.lit(False))

        def apply_set(df: DataFrame, only_matched: bool) -> DataFrame:
            cols = []
            for ln in logical:
                if ln in assignments:
                    new = F.expr(assignments[ln])
                    cols.append((new if only_matched else
                                 F.when(hit, new).otherwise(F.col(ln)))
                                .alias(ln))
                else:
                    cols.append(F.col(ln))
            return df.select(*cols)

        files = self._replay_files(txs, table)
        dvs = self._replay_dvs(txs, table)
        if mode == "mor":
            if not keys:
                raise ValueError(
                    "update_tx(mode='mor') needs keys: the deletion "
                    "vector is a key-list sidecar")
            p_of = {ln: ph for ln, ph, _ in fields}
            matched = self.read_committed_tx(table, branch=branch) \
                .filter(hit) \
                .localCheckpoint()   # one evaluation: DV == postimage
            post = self._to_physical(apply_set(matched, True), fields) \
                .sortWithinPartitions(*[p_of[k] for k in keys])
            new_files = self._stage_batch(post, table)
            if self._staged_rows(table, new_files) == 0:
                # no match: no-op, matching the cow contract — read
                # off the staged footers, not a separate isEmpty job
                self._discard_staged(table, new_files)
                return
            dv_df = matched.select(
                *[F.col(k).alias(p_of[k]) for k in keys]).distinct()
            cons = self._validate_staged(table, new_files, fields, txs)
            dv_files = self._stage_batch(dv_df, table)
            self._append_tx_record({table: new_files},
                                   dv={table: dv_files},
                                   dv_keys={table: [p_of[k]
                                                    for k in keys]},
                                   expect_files={table: (files, dvs)},
                                   validated_constraints={
                                       table: (cons, new_files)},
                                   branch=branch)
            if (self.auto_compact_dvs is not None and branch is None
                    and len(dvs) + 1 >= self.auto_compact_dvs):
                self.compact(table)
            return
        if not files:
            return
        keep, touched = self._touched_by_predicate(
            table, fields, files, condition)
        if not touched:
            return   # no row matches: no-op, no new version
        if dvs:
            # live DVs: same pruned-rewrite shape as delete_tx — the
            # rewrite set is (condition-matched ∪ DV-affected) files,
            # materializing the DVs the REWRITE record clears
            affected = self._dv_affected_files(
                table, fields, txs, dvs, keep)
            touched += [rel for rel in keep if rel in affected]
            keep = [rel for rel in keep if rel not in affected]
            rewritten = apply_set(self._to_logical(
                self._read_with_dvs(table, txs,
                                    self._physical_schema(fields),
                                    dvs, None, only=touched),
                fields), False)
        else:
            rewritten = apply_set(
                self._read_files_logical(table, fields, touched), False)
        staged = self._to_physical(rewritten, fields)
        c_cols = self._cluster_cols(table, txs)
        if c_cols:
            staged = staged.sortWithinPartitions(*c_cols)
        new_files = self._stage_batch(staged, table)
        cons = self._validate_staged(table, new_files, fields, txs)
        self._append_tx_record({table: keep + new_files},
                               replaces=[table],
                               expect_files={table: (files, dvs)},
                               validated_constraints={
                                   table: (cons, new_files)},
                               branch=branch)

    def vacuum_uncommitted_tx(self, tables: list[str]) -> int:
        """Remove staged batch directories under ``tables`` that no tx
        references (crash leftovers); returns the number removed."""
        import json as _json

        def live_key(t: str, rel: str) -> tuple[str, str]:
            # resolve ..-relative references (shallow clones) to the
            # OWNING table's batch dir, so a source file stays pinned
            # while any clone's retained history references it —
            # without this, cloning then vacuuming the source would
            # delete the clone's shared bytes (Delta documents
            # exactly that hazard; this engine's GC is clone-aware)
            parts = os.path.normpath(os.path.join(t, rel)).split(os.sep)
            return (parts[0], parts[1])

        live: set[tuple[str, str]] = set()
        for tx in self._read_txlog()["txs"]:
            for t, rels in tx["tables"].items():
                live.update(live_key(t, rel) for rel in rels)
            for t, rels in tx.get("dv", {}).items():
                # deletion-vector sidecars are committed files too
                live.update(live_key(t, rel) for rel in rels)
            for t, entries in tx.get("bloom", {}).items():
                # bloom-index sidecars likewise
                for e in entries:
                    live.update(live_key(t, rel)
                                for rel in e["sidecar"])
        # write-audit-publish stages are live until published/aborted
        for fn in os.listdir(self.root):
            if fn.startswith("_PENDING.") and fn.endswith(".json"):
                try:
                    with open(os.path.join(self.root, fn)) as f:
                        pend = _json.load(f)
                    for t, rels in pend.get("tables", {}).items():
                        live.update(live_key(t, rel) for rel in rels)
                except (OSError, ValueError):
                    pass  # racing publish/abort removed it mid-scan
        removed = 0
        for t in tables:
            root = self.path(t)
            if not os.path.isdir(root):
                continue
            for entry in os.listdir(root):
                if entry.startswith("batch-") and (t, entry) not in live:
                    shutil.rmtree(os.path.join(root, entry))
                    removed += 1
        return removed

    def vacuum_uncommitted(self, table: str) -> int:
        """Remove staged batch directories no manifest references
        (crash leftovers); returns the number removed. Safe at any
        time: committed files are exactly the manifest's list. A
        tx-managed table routes to :meth:`vacuum_uncommitted_tx` —
        reading the (absent) manifest's empty default here would
        delete every committed batch the tx log references (r10
        ADVICE)."""
        if self._table_in_txlog(table):
            return self.vacuum_uncommitted_tx([table])
        man = self._read_manifest(table)
        live = {rel.split(os.sep)[0] for rel in man["files"]}
        removed = 0
        root = self.path(table)
        for entry in os.listdir(root):
            if entry.startswith("batch-") and entry not in live:
                shutil.rmtree(os.path.join(root, entry))
                removed += 1
        return removed

    def _with_zorder_key(self, df: DataFrame, zorder_by: list[str],
                         bits: int) -> DataFrame:
        """Append ``_zkey``: Morton interleave of the z-order columns
        after equi-width binning into ``2^bits`` buckets. The only
        driver exchange is the 2-doubles-per-column bounds row."""
        from .ops.partitioning import zorder_key

        bounds = df.agg(*[
            f for c in zorder_by
            for f in (F.min(F.col(c).cast("double")).alias(f"_lo_{c}"),
                      F.max(F.col(c).cast("double")).alias(f"_hi_{c}"))
        ]).first()
        n_bins = 1 << bits
        bin_cols = []
        for c in zorder_by:
            lo, hi = bounds[f"_lo_{c}"], bounds[f"_hi_{c}"]
            if lo is None or hi is None or hi == lo:
                bin_cols.append(F.lit(0))
                continue
            width = (hi - lo) / n_bins
            bin_cols.append(F.greatest(
                F.least(F.floor((F.col(c).cast("double") - lo) / width)
                        .cast("long"), F.lit(n_bins - 1)),
                F.lit(0).cast("long")))
        return df.withColumn("_zkey", zorder_key(bin_cols, bits))

    def overwrite(self, df: DataFrame, table: str,
                  jdbc_url: str | None = None) -> None:
        """S8: ``to_sql(..., if_exists='replace')`` analog
        (``qb_customers_ETL.py:190``). ``jdbc_url`` routes to an
        external RDBMS (see :meth:`append`)."""
        if jdbc_url is None and self._has_manifest(table):
            raise ValueError(
                f"table {table} is manifest-managed (append_commit); a "
                "plain overwrite would delete _MANIFEST.json and reset "
                "the committed watermark to epoch — rebuild through "
                "append_commit, or remove the manifest explicitly first"
            )
        if jdbc_url is None and self._table_in_txlog(table):
            raise ValueError(
                f"table {table} is tx-managed (commit_tx); a plain "
                "overwrite would delete committed batches the tx log "
                "references, leaving the log pointing at missing files "
                "— rewrite through compact or a new tx instead"
            )
        if jdbc_url is not None:
            self._write_jdbc(df, table, "overwrite", jdbc_url)
        else:
            self._write(df, table, mode="overwrite")

    def read_jdbc(self, jdbc_url: str, table: str) -> DataFrame:
        """Read a warehouse table back from a JDBC destination.

        Raises ``AnalysisException`` if the table does not exist
        (normalized from the driver's SQLException so callers can
        treat 'missing table' uniformly across sinks). At scale,
        prefer ``partitionColumn``/``numPartitions`` bounds via
        ``spark.read.jdbc`` directly — a plain JDBC read is one
        executor task per table."""
        try:
            return self.spark.read.format("jdbc").options(
                url=jdbc_url, dbtable=table
            ).load()
        except Exception as exc:  # driver-specific SQLException classes
            msg = str(exc)
            if ("does not exist" in msg or "not found" in msg
                    or "42X05" in msg or "42S02" in msg):
                raise AnalysisException(
                    f"[TABLE_OR_VIEW_NOT_FOUND] JDBC table {table} "
                    f"does not exist at {jdbc_url}"
                ) from exc
            raise

    def _write_jdbc(self, df: DataFrame, table: str, mode: str,
                    jdbc_url: str) -> None:
        want = schemas.WAREHOUSE_TABLES[table]
        df = df.select([F.col(f.name).cast(f.dataType) for f in want.fields])
        (df.write.mode(mode)
         .option("truncate", "true")  # overwrite: keep DDL, replace rows
         .format("jdbc").options(url=jdbc_url, dbtable=table).save())

    def _write(self, df: DataFrame, table: str, mode: str) -> None:
        want = schemas.WAREHOUSE_TABLES[table]
        df = df.select([F.col(f.name).cast(f.dataType) for f in want.fields])
        part_col = _PARTITIONED.get(table)
        if part_col is not None and part_col in df.columns:
            df = df.withColumn("_dt", F.to_date(F.col(part_col)))
        writer = df.write.mode(mode)
        if "_dt" in df.columns:
            writer = writer.partitionBy("_dt")
        if self._is_bucketed(table):
            key = _BUCKETED[table]
            (writer.bucketBy(self.buckets, key).sortBy(key)
             .option("path", self.path(table))
             .saveAsTable(self._qualified(table)))
        else:
            writer.parquet(self.path(table))


TESTDATA_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# (sf_dir, table) -> DataFrame. A DataFrame is just a plan; caching it
# avoids re-reading parquet footers for every one of the ~45 registered
# queries (10 tables x 45 queries of fixed-cost file listing otherwise).
_testdata_cache: dict[tuple[int, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    key = (id(spark), sf_dir, name)
    df = _testdata_cache.get(key)
    if df is None:
        if name == "events":
            # events.parquet carries a TIMESTAMP(NANOS) column, which
            # Spark's parquet reader rejects unless nanosAsLong is on.
            # The conf is runtime-settable, and callers (the driver's
            # verify harness in particular) hand us sessions that were
            # NOT built by zolo_spark.session.get_spark, so set it here
            # at the single read choke point rather than relying on
            # builder-time configuration.
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        if name == "events":
            ts_type = dict(df.dtypes)["ts"]
            if ts_type == "bigint":
                # events.ts is TIMESTAMP(NANOS) in parquet, surfaced as
                # long nanos under spark.sql.legacy.parquet.nanosAsLong;
                # convert to a timestamp truncated to micros (DuckDB's
                # truncation).
                df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
            elif ts_type == "timestamp_ntz":
                # micros-encoded parquet (isAdjustedToUTC=false) reads
                # as TIMESTAMP_NTZ; session tz is pinned UTC, so the
                # cast is value-preserving and keeps every downstream
                # operator on one timestamp type.
                df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        _testdata_cache[key] = df
    return df


class _LazyTables(dict):
    """dict-like view that reads a table's plan on first access."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        super().__init__()
        self._spark = spark
        self._sf_dir = sf_dir

    def __missing__(self, name: str) -> DataFrame:
        if name not in TESTDATA_TABLES:
            raise KeyError(name)
        df = load_table(self._spark, self._sf_dir, name)
        self[name] = df
        return df

    def items(self):
        for n in TESTDATA_TABLES:
            yield n, self[n]


def load_testdata(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Lazy view of the driver-provided synthetic tables (TESTDATA.md):
    a table's parquet footer is read on first access only."""
    return _LazyTables(spark, sf_dir)


def register_testdata(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load and register the testdata tables as temp views."""
    dfs = load_testdata(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
