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
    from kcidb_spark.cache import release_persisted

    q = REGISTRY[name]
    duck_df = duck.execute(q.oracle).df()
    try:
        res = compare(name, q.spark(spark, SF), duck_df)
    finally:
        release_persisted()
    assert res.ok, res.detail


def test_no_leaked_caches_after_dedup_family(spark):
    """Scoped persists must be released: after running the dedup family
    plus release_persisted(), the JVM cache manager is empty."""
    from kcidb_spark.cache import release_persisted

    # Start from a clean cache manager — earlier tests in the shared
    # session may hold their own (legitimate, fixture-scoped) caches.
    spark.catalog.clearCache()
    for name in ("lsh_candidate_pairs", "jaccard_verify_pairs",
                 "jaccard_estimate_minhash", "dedup_cluster_components"):
        REGISTRY[name].spark(spark, SF).write.format("noop").mode(
            "overwrite"
        ).save()
        release_persisted()
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_registry_nonempty():
    assert len(REGISTRY) >= 20


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(e.oracle_sql()) <= set(e.queries())
