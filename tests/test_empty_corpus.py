"""Empty-corpus sweep: EVERY registry query must execute (not crash)
on zero-row inputs with its schema intact.

Production reality at any scale: a partition-pruned read, a fresh
deployment, or a filter that matches nothing hands every operator an
empty frame — quantile boundaries, broadcast 1-row totals, LSH
band joins, streaming drains, iterative fixpoints all hit their
degenerate case.  A query that NPEs or emits a different schema on
empty input corrupts downstream unions and sinks silently.
"""

from __future__ import annotations

import pytest

from kcidb_spark.cache import release_persisted
from kcidb_spark.queries.registry import REGISTRY
from kcidb_spark.tables import TABLES


@pytest.fixture(scope="module")
def empty_sf(spark, tmp_path_factory):
    """Zero-row copies of every synthetic table, schemas preserved
    (events keeps its nanos-as-long read so the layout sniff still
    dispatches)."""
    out = tmp_path_factory.mktemp("empty_sf")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        for t in TABLES:
            df = spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet")
            df.limit(0).write.mode("overwrite").parquet(
                str(out / f"{t}.parquet")
            )
    finally:
        spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    return str(out)


def test_every_query_survives_empty_corpus(spark, empty_sf):
    failures = []
    for name, q in sorted(REGISTRY.items()):
        try:
            df = q.spark(spark, empty_sf)
            df.write.mode("overwrite").format("noop").save()
        except Exception as ex:  # noqa: BLE001 — collecting the sweep
            failures.append(f"{name}: {str(ex).splitlines()[0][:160]}")
        finally:
            release_persisted()
    assert not failures, "\n".join(failures)
