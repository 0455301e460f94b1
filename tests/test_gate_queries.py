"""Every registered driver-gate query must hash-match its DuckDB oracle at
sf0.01 — the same check the driver's verify runs (CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_CORRECTNESS
from tests.oracle_utils import compare_spark_duckdb


def _pairs():
    from tally_database_loader_spark import plans
    return sorted(plans.QUERIES)


@pytest.mark.parametrize("name", _pairs())
def test_gate_query_matches_oracle(name, spark, duck):
    from tally_database_loader_spark.plans import gate
    df = gate.QUERIES[name](spark, SF_CORRECTNESS)
    if name not in gate.ORACLES:
        assert df.count() >= 0  # rows-only check, like the driver
        return
    ok, msg = compare_spark_duckdb(df, duck, gate.ORACLES[name])
    assert ok, f"{name}: {msg}"
