"""Every registered query must match its DuckDB oracle exactly.

This mirrors the driver's correctness gate (CORRECTNESS_r{N}.json) at
sf0.001 so regressions surface locally before a round ends.
"""

from __future__ import annotations

import pytest

from kcidb_spark.queries import REGISTRY
from tests.oracle_harness import compare, duck_connection

SF = "/root/testdata/sf0.001"

_ORACLE_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)


@pytest.fixture(scope="module")
def duck():
    return duck_connection(SF)


@pytest.mark.parametrize("name", _ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    q = REGISTRY[name]
    duck_df = duck.execute(q.oracle).df()
    res = compare(name, q.spark(spark, SF), duck_df)
    assert res.ok, res.detail


def test_registry_nonempty():
    assert len(REGISTRY) >= 20


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(e.oracle_sql()) <= set(e.queries())
