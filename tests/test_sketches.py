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


def test_topk_exact_regime_and_rollup(spark):
    """Frequent-items sketch (approx_top_k family): with capacity
    above the distinct-item count nothing is ever evicted, so (a)
    every estimated count equals the exact count, and (b) the
    stored-rollup path (per-day accumulate → combine → estimate)
    equals both the single-shot sketch and the exact map — the
    lossless configuration a daily pipeline runs in."""
    rows = REGISTRY["sketch_top_items"].spark(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["exact_count"] is not None, r
        assert r["est_count"] == r["exact_count"], r
    roll = REGISTRY["sketch_topk_union_rollup"].spark(spark, SF).collect()
    assert roll
    for r in roll:
        assert r["union_eq_direct"] and r["union_eq_exact"], r
        assert r["n_items"] > 0


def test_topk_under_capacity_overcount_bound(spark):
    """Under capacity pressure the sketch keeps the SpaceSaving
    guarantee: estimated counts only OVERcount, by at most the
    smallest tracked count (≤ N/capacity), and every true heavy
    hitter above that bound is still reported."""
    from pyspark.sql import functions as F

    n, cap, k = 20_000, 64, 10
    # Zipf-ish: item i appears ~ n/(i+1) times over a long tail.
    df = spark.range(n).select(
        F.floor(
            F.pow(F.lit(2.0), (F.col("id") % 14).cast("double"))
            * F.rand(seed=7)
        ).cast("long").alias("item")
    )
    est = {
        r["e"]["item"]: r["e"]["count"]
        for r in df.agg(
            F.expr(f"approx_top_k(item, {k}, {cap})").alias("top")
        )
        .select(F.explode("top").alias("e"))
        .collect()
    }
    exact = {
        r["item"]: r["cnt"]
        for r in df.groupBy("item")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert len(exact) > cap  # capacity pressure is real
    bound = n // cap  # SpaceSaving: error ≤ N/capacity
    for item, c in est.items():
        assert c >= exact[item], (item, c, exact[item])  # never under
        assert c - exact[item] <= bound, (item, c, exact[item], bound)
    # Every true top item whose count clears the error bound by a
    # margin must be present in the sketch's top-k report.
    kth = sorted(exact.values(), reverse=True)[k - 1]
    for item, c in exact.items():
        if c > kth + bound:
            assert item in est, (item, c)
