"""Local simulation of the driver's correctness gate.

Runs each registered query with a VANILLA SparkSession (none of the
confs that ``zolo_spark.session.get_spark`` sets at build time — the
driver hands us its own session, so any conf we rely on must be set at
runtime by library code, not by our builder) and compares against the
DuckDB oracle the same way the driver does: sort columns by name, then
row count + schema + order-insensitive values.

Usage: python tools/driver_sim.py [sf_dir] [first_n]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

from zolo_spark.parity_queries import REGISTRY
from zolo_spark.warehouse import TESTDATA_TABLES
from tests.oracle_util import compare


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    first_n = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    only = sys.argv[3].split(",") if len(sys.argv) > 3 else None

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    duck = duckdb.connect()
    for t in TESTDATA_TABLES:
        duck.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    names = list(REGISTRY.keys())[:first_n]
    if only:
        names = [n for n in names if n in only]
    n_pass = n_fail = n_rows_only = 0
    for name in names:
        spec = REGISTRY[name]
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir)
            if spec.oracle is None:
                rows = sdf.count()
                print(f"ROWS_ONLY {name}: {rows} rows ({time.time()-t0:.1f}s)")
                n_rows_only += 1
                continue
            problems = compare(sdf, duck.sql(spec.oracle), name)
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: {type(exc).__name__}: {exc}")
            n_fail += 1
            continue
        if problems:
            print(f"FAIL {name} ({time.time()-t0:.1f}s)")
            for p in problems[:3]:
                print(f"   {p}")
            n_fail += 1
        else:
            print(f"pass {name} ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail / {n_rows_only} rows-only "
          f"of {len(names)}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
