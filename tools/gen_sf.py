"""Scale-rehearsal data generator (ROADMAP item 8).

Synthesizes a larger scale factor locally by replicating the driver's
read-only sf0.1 tables K times with key-shifting, so the engine's
partition-sizing knobs can be validated beyond sf0.1 without touching
/root/testdata. Fact keys are shifted per replica so join fan-out and
group cardinality scale the way a real sf1 would (orderkeys disjoint
across replicas; dims unchanged so dim joins stay broadcast-able).

Usage: python tools/gen_sf.py [--k 10] [--out /tmp/sf1]

DuckDB does the heavy lifting (vectorized, no JVM); ~6M lineitem rows
write in seconds.
"""

from __future__ import annotations

import argparse
import os

import duckdb

SRC = "/root/testdata/sf0.1"

# (table, shift_cols, stride) — stride is the key-space width of one replica.
FACTS = [
    ("orders", ["o_orderkey"], 150_000),
    ("lineitem", ["l_orderkey"], 150_000),
    ("events", ["event_id"], 100_000),
    ("documents", ["doc_id"], 5_000),
    ("embeddings", ["vec_id"], 2_000),
]
DIMS = ["region", "nation", "customer", "supplier", "part"]


COMPLETE_MARKER = "_COMPLETE"


def generate(out: str, k: int = 10) -> None:
    """Materialize a K-replica scale-up of sf0.1 into ``out``.

    Writes ``_COMPLETE`` (containing ``k``) only after every table
    lands, so an interrupted run is distinguishable from a finished
    one — consumers must check the marker, not table existence."""
    os.makedirs(out, exist_ok=True)
    marker = os.path.join(out, COMPLETE_MARKER)
    if os.path.exists(marker):
        os.remove(marker)
    con = duckdb.connect()

    for t in DIMS:
        con.sql(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")

    for t, shift_cols, stride in FACTS:
        cols = [r[0] for r in con.sql(f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()]
        sel = ", ".join(
            f"{c} + r.i * {stride} AS {c}" if c in shift_cols else c for c in cols
        )
        con.sql(
            f"COPY (SELECT {sel} FROM '{SRC}/{t}.parquet', range({k}) r(i)) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 500000)"
        )
        n = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")

    with open(marker, "w") as f:
        f.write(str(k))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--out", default="/tmp/sf1")
    args = ap.parse_args()
    generate(args.out, args.k)


if __name__ == "__main__":
    main()
