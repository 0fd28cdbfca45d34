"""DSIR importance weighting: direction, budget, and plan shape.

Cross-engine value parity is covered by test_oracle_parity; these pin
the semantics the hash can't see — that the weight actually points
toward the target distribution — and the plan contract.
"""

from __future__ import annotations

from kcidb_spark.queries import REGISTRY
from kcidb_spark.queries.dsir import _TARGET_LANG

SF = "/root/testdata/sf0.001"


def test_target_slice_outweighs_pool(spark):
    """Mean importance weight of target-language docs must exceed the
    non-target mean — the whole point of the weight.  (Per-doc overlap
    means individual docs may cross over; the means may not.)"""
    rows = REGISTRY["dsir_importance_weights"].spark(spark, SF).collect()
    tgt = [r.weight_micros for r in rows if r.lang == _TARGET_LANG]
    rest = [r.weight_micros for r in rows if r.lang != _TARGET_LANG]
    assert tgt and rest
    assert sum(tgt) / len(tgt) > sum(rest) / len(rest)


def test_selection_budget_per_source(spark):
    """Each source contributes exactly ⌊n_source/5⌋ selected docs —
    the per-domain budget that keeps any one domain from dominating."""
    weights = REGISTRY["dsir_importance_weights"].spark(spark, SF)
    pool = {
        r.source: r.n
        for r in weights.groupBy("source").count()
        .withColumnRenamed("count", "n").collect()
    }
    picked: dict[str, int] = {}
    for r in REGISTRY["dsir_select_per_source"].spark(spark, SF).collect():
        picked[r.source] = picked.get(r.source, 0) + 1
    for src, n in pool.items():
        assert picked.get(src, 0) == n // 5, src


def test_model_join_broadcasts(spark):
    """The ≤4096-row log-ratio model must reach the scoring join as a
    broadcast — a shuffled model join would drag the exploded corpus
    through an Exchange keyed on bucket id."""
    df = REGISTRY["dsir_importance_weights"].spark(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
