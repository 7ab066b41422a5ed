"""Incremental watermark state (SURVEY §2.1 S10).

The reference keeps per-source watermarks in ``config.yml``: read
``last_update_<src>`` as the extract lower bound, write
``end = utcnow().isoformat()`` back after a successful load
(``square_ETL.py:20-22,53-56``). Crash between load and commit ⇒ the
next run re-extracts the window ⇒ duplicate appended rows:
**at-least-once**, preserved here as the default and documented.

For exactly-once the engine offers idempotent append: pass the
natural key to :meth:`zolo_spark.warehouse.Warehouse.append` consumers
via an anti-join on already-loaded keys (see pipelines' ``dedupe_on``
option) — the Structured Streaming variant gets this from checkpoints
instead.
"""

from __future__ import annotations

import datetime as dt
import os

import yaml


class WatermarkStore:
    """YAML-file-backed watermark map (config.yml analog)."""

    def __init__(self, path: str):
        self.path = path

    def _read(self) -> dict:
        if not os.path.exists(self.path):
            return {}
        with open(self.path) as f:
            return yaml.safe_load(f) or {}

    def get(self, key: str, default: str = "1970-01-01T00:00:00") -> str:
        return self._read().get(key, default)

    def commit(self, key: str, value: str) -> None:
        cfg = self._read()
        cfg[key] = value
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            yaml.safe_dump(cfg, f, default_flow_style=False)
        os.replace(tmp, self.path)

    @staticmethod
    def now_iso() -> str:
        return dt.datetime.now(dt.timezone.utc).replace(tzinfo=None).isoformat()


def extract_window(store: WatermarkStore, key: str) -> tuple[str, str]:
    """[start, end) for this run (``square_ETL.py:20-22``)."""
    return store.get(key), WatermarkStore.now_iso()
