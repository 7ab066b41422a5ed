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
