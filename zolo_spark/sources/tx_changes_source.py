"""Spark 4 Python streaming DataSource over the warehouse tx log —
the CDC *source* completing the round trip the sinks started
(``streaming/cdc.upsert_sink`` writes a table through ``merge_tx``;
this reads any tx table's changes back out as a stream).

Offsets ARE tx versions: each micro-batch covers the commits
``(start, end]``, so the stream is exactly-once by construction —
Structured Streaming checkpoints the version, a restart resumes from
it, and replaying an offset range is deterministic (the log is
immutable history).

Per-record change rows:

* a plain COMMIT record appends files — its changes are just those
  files' rows as ``insert`` (no diff computed; the append-only fast
  path that makes tailing an ingest table O(new data));
* a REWRITE record (compaction / cow merge / restore) or a
  MERGE-ON-READ record (deletion vector + postimage batch) replaces
  rows — its changes are the full-row set difference of the two
  DV-APPLIED snapshots (``delete`` + ``insert``), computed
  driver-side with pyarrow (``_snapshot_rows`` mirrors
  ``Warehouse._read_with_dvs``). Compactions therefore emit NO rows
  (same rows, new files); cow and mor merges emit exactly the same
  row-level effect. This mirrors Delta CDF without change files:
  appends are free, rewrites pay a snapshot diff — fine at dimension
  scale, which is the CDC use case (the same caveat
  ``streaming/cdc.py`` documents for SCD2).

The reader runs on the driver (``SimpleDataSourceStreamReader``) and
reads parquet with pyarrow — no SparkSession, no executors; the
returned rows flow into the micro-batch like any source rows.

Register + read::

    spark.dataSource.register(TxChangesDataSource)
    (spark.readStream.format("tx_changes")
        .schema("product_name string, ..., _change_type string, "
                "_commit_version long")
        .option("root", wh.root).option("table", "items").load())

The schema is the table's columns plus ``_change_type`` and
``_commit_version`` (both appended by the reader).
"""

from __future__ import annotations

import json
import os
import re
from collections import Counter

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader


def _read_log(root: str) -> dict:
    gens = []
    if os.path.isdir(root):
        for fn in os.listdir(root):
            m = re.fullmatch(r"_TXLOG\.(\d+)\.json", fn)
            if m:
                gens.append((int(m.group(1)), os.path.join(root, fn)))
    legacy = os.path.join(root, "_TXLOG.json")
    if os.path.exists(legacy):
        gens.append((0, legacy))
    if not gens:
        return {"txs": []}
    with open(sorted(gens)[-1][1]) as f:
        return json.load(f)


def _effective(log: dict) -> list[tuple[int, dict]]:
    out, v = [], 0
    for tx in log["txs"]:
        v = tx.get("version", v + 1)
        out.append((v, tx))
    return out


def _key_tuples(root: str, table: str, files: list[str]) -> set[tuple]:
    """The key tuples of a deletion-vector sidecar (its columns ARE
    the merge keys, in order)."""
    import pyarrow.parquet as pq

    out: set[tuple] = set()
    for rel in files:
        t = pq.read_table(os.path.join(root, table, rel))
        cols = [t.column(i).to_pylist() for i in range(t.num_columns)]
        out.update(zip(*cols) if cols else [])
    return out


def _snapshot_rows(root: str, table: str, txs, version: int,
                   n_cols: int, col_names: list[str]) -> "Counter":
    """DV-applied row multiset at ``version`` — the pyarrow mirror of
    ``Warehouse._read_with_dvs``: files keep their commit version, and
    a deletion vector at v drops key-matching rows only from files
    committed strictly before v."""
    segs: list[tuple[int, list[str]]] = []   # (commit version, files)
    dvs: list[tuple[int, list[str], list[str]]] = []
    for v, tx in txs:
        if v > version:
            break
        if table in tx.get("replaces", []):
            segs = [(v, list(tx["tables"].get(table, [])))]
            dvs = []
        elif tx["tables"].get(table):
            segs.append((v, list(tx["tables"][table])))
        if tx.get("dv", {}).get(table):
            dvs.append((v, list(tx["dv_keys"][table]),
                        list(tx["dv"][table])))
    tagged = [(fv, r) for fv, fl in segs
              for r in _rows(root, table, fl, n_cols)]
    for v_dv, keys, dv_files in dvs:
        kidx = [col_names.index(k) for k in keys]
        kset = _key_tuples(root, table, dv_files)
        tagged = [(fv, r) for fv, r in tagged
                  if not (fv < v_dv
                          and tuple(r[i] for i in kidx) in kset)]
    return Counter(r for _, r in tagged)


def _rows(root: str, table: str, files: list[str],
          n_cols: int) -> list[tuple]:
    import pyarrow.parquet as pq

    out: list[tuple] = []
    for rel in files:
        t = pq.read_table(os.path.join(root, table, rel))
        cols = [t.column(i).to_pylist() for i in range(min(n_cols,
                                                           t.num_columns))]
        # files written before a schema add lack trailing columns —
        # fill None, the same NULL backfill the batch reader gets
        cols += [[None] * t.num_rows] * (n_cols - len(cols))
        out.extend(zip(*cols) if cols else [])
    return out


class TxChangesStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, schema, options):
        self.root = options["root"]
        self.table = options["table"]
        self.start_version = int(options.get("start_version", "0"))
        # table columns = declared schema minus the 2 metadata cols
        self.n_cols = len(schema.fields) - 2
        self.col_names = [f.name for f in schema.fields[:self.n_cols]]

    def initialOffset(self) -> dict:
        return {"version": self.start_version}

    def read(self, start: dict):
        end_v = (_effective(_read_log(self.root)) or [(0, None)])[-1][0]
        end = {"version": max(end_v, start["version"])}
        return iter(self.readBetweenOffsets(start, end)), end

    def readBetweenOffsets(self, start: dict, end: dict):
        txs = _effective(_read_log(self.root))
        rows: list[tuple] = []
        prev_v = start["version"]
        for v, tx in txs:
            if v <= start["version"] or v > end["version"]:
                continue
            if tx.get("snapshot"):
                # checkpoint_txlog folded history PAST this stream's
                # checkpointed offset: the snapshot is not a change,
                # it's the whole table — emitting it would replay
                # every row as an insert (silent full-table
                # duplication). Mirror Warehouse._check_retained /
                # Delta CDF's out-of-retention error instead.
                raise RuntimeError(
                    f"tx_changes: offset version {start['version']} of "
                    f"table '{self.table}' was expired by "
                    f"checkpoint_txlog (history folded into snapshot "
                    f"version {v}); restart the stream from a fresh "
                    f"checkpoint with start_version >= {v}")
            if (self.table in tx.get("replaces", [])
                    or tx.get("dv", {}).get(self.table)):
                # rewrite OR merge-on-read: full-row multiset diff of
                # the two DV-applied snapshots. For a mor record the
                # diff is exactly (new postimage rows as inserts,
                # DV-hit prior rows as deletes); compactions still
                # emit nothing (same rows, new files).
                before = _snapshot_rows(self.root, self.table, txs,
                                        prev_v, self.n_cols,
                                        self.col_names)
                after = _snapshot_rows(self.root, self.table, txs, v,
                                       self.n_cols, self.col_names)
                for r, n in (after - before).items():
                    rows.extend([(*r, "insert", v)] * n)
                for r, n in (before - after).items():
                    rows.extend([(*r, "delete", v)] * n)
            else:
                for r in _rows(self.root, self.table,
                               tx["tables"].get(self.table, []),
                               self.n_cols):
                    rows.append((*r, "insert", v))
            prev_v = v
        return iter(rows)

    def commit(self, end: dict) -> None:
        pass  # offsets are immutable history; nothing to release


class TxChangesDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "tx_changes"

    def simpleStreamReader(self, schema):
        return TxChangesStreamReader(schema, self.options)
