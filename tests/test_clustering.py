"""Property tests for the iterative Lloyd k-means operator
(operators/clustering.py) — the non-hash-gate half of the clustering
story (the deterministic assignment/prune queries are oracle-checked
in queries/ranking.py)."""

import pytest
from pyspark.sql import functions as F

from kcidb_spark.operators.clustering import kmeans_lloyd


def _blob(center, n, spread=0.05):
    """Deterministic 'Gaussian-ish' blob: n points on a tiny fixed
    lattice around center — no RNG, so runs are reproducible."""
    pts = []
    for i in range(n):
        off = ((i % 5) - 2) * spread, ((i // 5) % 5 - 2) * spread
        pts.append([center[0] + off[0], center[1] + off[1], center[2]])
    return pts


@pytest.fixture(scope="module")
def blobs(spark):
    pts = (
        _blob([0.0, 0.0, 0.0], 25)
        + _blob([10.0, 10.0, 1.0], 25)
        + _blob([-10.0, 5.0, 2.0], 25)
    )
    return spark.createDataFrame(
        [(i, [float(x) for x in p]) for i, p in enumerate(pts)],
        "vec_id long, embedding array<double>",
    )


def test_kmeans_recovers_separated_blobs(blobs):
    assign, cents, converged = kmeans_lloyd(blobs, k=3, max_iter=15)
    assert converged
    rows = assign.collect()
    assert len(rows) == 75
    # Points of one blob (ids 0-24 / 25-49 / 50-74) share one label,
    # and the three labels are distinct.
    labels = {}
    for r in rows:
        labels.setdefault(r["vec_id"] // 25, set()).add(r["cluster"])
    assert all(len(s) == 1 for s in labels.values())
    assert len({next(iter(s)) for s in labels.values()}) == 3
    # Centroids converged to the blob means (lattice mean == center).
    got = sorted(
        [round(x, 6) for x in r["centroid"]] for r in cents.collect()
    )
    assert got == sorted(
        [[-10.0, 5.0, 2.0], [0.0, 0.0, 0.0], [10.0, 10.0, 1.0]]
    )


def test_kmeans_labels_every_row_and_releases_cache(spark, blobs):
    spark.catalog.clearCache()
    assign, _, _ = kmeans_lloyd(blobs, k=2, max_iter=10)
    assert assign.count() == blobs.count()
    assert assign.filter(F.col("cluster").isNull()).count() == 0
    # The operator's scratch persists are released on exit; only the
    # localCheckpointed results (not tracked by the cache manager's
    # persisted-DF list) remain.
    jcm = spark._jsparkSession.sharedState().cacheManager()
    assert jcm.isEmpty()


def test_kmeans_k_exceeding_rows(blobs):
    small = blobs.filter(F.col("vec_id") < 2)
    assign, cents, converged = kmeans_lloyd(small, k=5, max_iter=5)
    assert converged
    assert assign.count() == 2
    assert cents.count() <= 5
