"""Tests for the two-phase distributed prefix scan (operators/scan.py)."""

from pyspark.sql import functions as F

from kcidb_spark.operators.scan import distributed_cumsum


def test_cumsum_matches_sequential(spark):
    rows = [(i, (i * 7919) % 100) for i in range(1000)]
    df = spark.createDataFrame(rows, "k long, v long")
    got = {
        r["k"]: r["c"]
        for r in distributed_cumsum(df, "k", "v", out_col="c").collect()
    }
    run = 0
    for k, v in rows:
        run += v
        assert got[k] == run
    assert len(got) == 1000


def test_cumsum_sparse_and_negative_keys(spark):
    rows = [(-500, 1), (-3, 2), (0, 3), (7, 4), (99999, 5)]
    df = spark.createDataFrame(rows, "k long, v long")
    got = {
        r["k"]: r["c"]
        for r in distributed_cumsum(df, "k", "v", out_col="c").collect()
    }
    assert got == {-500: 1, -3: 3, 0: 6, 7: 10, 99999: 15}


def test_cumsum_window_is_bucket_partitioned(spark):
    """The corpus-sized window must be PARTITIONED (by _bkt); the only
    unpartitioned window may be the <= n_buckets offset prefix."""
    df = spark.createDataFrame([(i, 1) for i in range(100)], "k long, v long")
    plan = (
        distributed_cumsum(df, "k", "v")
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    # The in-bucket scan window carries _bkt in its partition spec.
    assert "windowspecdefinition(_bkt" in plan


def test_cumsum_property(spark):
    """Hypothesis-style randomized check (fixed seeds for CI
    determinism): arbitrary unique keys incl. negatives and gaps,
    arbitrary values incl. zeros/negatives, several bucket counts."""
    import random

    for seed in (1, 2, 3):
        rng = random.Random(seed)
        n = rng.randrange(1, 300)
        keys = rng.sample(range(-10_000, 10_000), n)
        rows = [(k, rng.randrange(-50, 50)) for k in keys]
        df = spark.createDataFrame(rows, "k long, v long")
        nb = rng.choice([1, 7, 64])
        got = {
            r["k"]: r["c"]
            for r in distributed_cumsum(
                df, "k", "v", out_col="c", n_buckets=nb
            ).collect()
        }
        run = 0
        for k, v in sorted(rows):
            run += v
            assert got[k] == run, (seed, nb, k)
