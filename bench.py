"""Benchmark harness (driver contract).

Runs every registered query at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: ``{"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}``.

Each query is materialized with the ``noop`` sink so the full plan
(including all projected columns) executes without sink I/O skewing
the numbers. The first run's numbers on this machine establish
BASELINE (BASELINE.md): no published reference numbers exist.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from zolo_spark import parity_queries  # noqa: E402
from zolo_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("zolo_spark_bench")

    timings: dict[str, float] = {}
    for name, spec in sorted(parity_queries.REGISTRY.items()):
        df = spec.fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # warm (JIT, file listing)
        spark.catalog.clearCache()  # warm run may have persisted intermediates
        t0 = time.perf_counter()
        spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 4)
    print(json.dumps({
        "metric": "zolo_spark query suite wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
