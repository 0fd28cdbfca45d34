"""Accuracy contracts for the sketch rollups (no DuckDB oracle —
sketch internals are engine-specific, so the correctness claim is an
error BOUND against the exact answer, not a hash match)."""

from __future__ import annotations

from kcidb_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def test_hll_distinct_error_bound(spark):
    rows = REGISTRY["sketch_distinct_users"].spark(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["exact_users"] > 0
        # rsd=2%: 5 sigma is a generous but non-vacuous bound.
        assert (
            abs(r["approx_users"] - r["exact_users"]) / r["exact_users"]
            <= 0.10
        ), r


def test_quantile_sketch_rank_error(spark):
    rows = REGISTRY["sketch_value_quantiles"].spark(spark, SF).collect()
    assert rows
    for r in rows:
        # GK with 1/eps=10000 at sf0.001 group sizes is near-exact on
        # actual data points; allow a loose relative slack.
        for a, e in ((r["approx_p50"], r["exact_p50"]),
                     (r["approx_p95"], r["exact_p95"])):
            denom = max(abs(e), 1.0)
            assert abs(a - e) / denom <= 0.10, r


def test_hll_union_rollup_lossless_and_bounded(spark):
    """The explicit stored-rollup path (sketch_hll_union_rollup):
    union-of-daily-partials must equal the single-shot sketch EXACTLY
    (HLL union at equal lgConfigK is lossless — a routing/merge bug
    breaks equality immediately), and both must sit within the error
    envelope of the exact distinct count.

    Precondition for the EXACT equality (diagnosis aid if this ever
    flakes): DataSketches answers with the HIP estimator for a sketch
    that never passed through a union, but with the composite
    estimator once merged.  Both sides here DO merge — Spark's
    hash-agg always combines per-partition partials through the HLL
    union, on the multi-partition inputs this query reads — so both
    estimates come off the composite path and compare exactly.  If a
    future engine change ever planned the direct side as a single
    partial (no merge step), this assert would compare HIP vs
    composite and could legitimately differ by a few counts; that is
    an estimator-path change, not a data-loss bug."""
    rows = REGISTRY["sketch_hll_union_rollup"].spark(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["union_users"] == r["direct_users"], r
        assert r["exact_users"] > 0
        assert (
            abs(r["union_users"] - r["exact_users"]) / r["exact_users"]
            <= 0.10
        ), r


def test_hll_is_mergeable_across_partitions(spark):
    """The scale claim: the sketch agg partial-aggregates (map-side
    combine) — its physical plan must show a partial aggregation, not
    a single global task."""
    df = REGISTRY["sketch_distinct_users"].spark(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_approx_count_distinct" in plan or "HashAggregate" in plan
