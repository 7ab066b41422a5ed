"""Driver-gate emulation: every registered query vs its DuckDB oracle.

This is the same check the driver performs (CORRECTNESS_r{N}.json) run
locally at sf0.001 so regressions surface before a round ends.
"""

from __future__ import annotations

import pytest

from zolo_spark import parity_queries

from .conftest import SF_DIR
from .oracle_util import compare


def _names():
    return sorted(parity_queries.REGISTRY)


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(name, spark, duck):
    spec = parity_queries.REGISTRY[name]
    sdf = spec.fn(spark, SF_DIR)
    assert sdf is not None
    if spec.oracle is None:
        # rows-only check, mirroring the driver's weaker gate
        assert sdf.count() >= 0
        return
    problems = compare(sdf, duck.sql(spec.oracle), name)
    assert not problems, "\n".join(problems)


def test_window_rotation_covers_every_oracled_query():
    """Window-governance automation (r4 VERDICT item 6): the driver
    grades only the first 50 registered queries, so an oracled query
    that is neither already green in some recorded CORRECTNESS round
    nor scheduled in ``_GRADING_PRIORITY`` would never be graded —
    exactly the round-4 miss (probes built, never pointed at the
    target). This fails the suite the moment such a query exists."""
    import glob
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    green: set[str] = set()
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        for name, row in json.load(open(path)).items():
            if row.get("hash_match") is True:
                green.add(name)

    window = set(parity_queries._GRADING_PRIORITY)
    assert len(parity_queries._GRADING_PRIORITY) == 50, (
        "the driver grades exactly the first 50 registered queries; "
        f"priority list has {len(parity_queries._GRADING_PRIORITY)}"
    )
    unscheduled = [
        n for n, spec in parity_queries.REGISTRY.items()
        if spec.oracle is not None and n not in green and n not in window
    ]
    assert not unscheduled, (
        "oracled queries with no green CORRECTNESS row and no slot in "
        f"_GRADING_PRIORITY (rotate them in): {unscheduled}"
    )
