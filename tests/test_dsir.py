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


def test_gumbel_selection_tracks_weights(spark):
    """The Gumbel-top-k key must select ∝ weight: on a skewed fixture
    (one doc with 4× the importance weight of each of two rivals,
    i.e. +2e6 micro-bits in log2 space), the heavy doc wins the
    per-seed argmax ≈ 4/(4+1+1) = 2/3 of the time.  300 seeds in ONE
    job (seed swept as an exploded column); deterministic, so the
    bound is a pin, not a flake."""
    from pyspark.sql import functions as F

    from kcidb_spark.queries.dsir import gumbel_keys

    n_seeds = 300
    docs = spark.createDataFrame(
        [("heavy", 2_000_000), ("light_a", 0), ("light_b", 0)],
        "doc_id string, weight_micros long",
    )
    seeds = F.array([F.lit(f"s{i}") for i in range(n_seeds)])
    swept = docs.withColumn("seed", F.explode(seeds))
    keyed = gumbel_keys(swept, F.col("seed"))
    wins = {
        r["doc_id"]: r["wins"]
        for r in keyed.groupBy("seed")
        .agg(F.max_by("doc_id", F.struct("gumbel_micros", "doc_id")).alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("wins"))
        .collect()
    }
    heavy = wins.get("heavy", 0)
    # E[heavy] = 200/300; a ±3σ band (σ ≈ 8.2) spans ~176–224.
    assert 170 <= heavy <= 230, wins
    assert heavy > max(
        wins.get("light_a", 0), wins.get("light_b", 0)
    ) * 2


def test_gumbel_same_seed_reproduces(spark):
    """Same seed → byte-identical sample; different seed → a different
    perturbation (the resample axis)."""
    from kcidb_spark.queries.dsir import gumbel_keys

    scored = REGISTRY["dsir_importance_weights"].spark(spark, SF)
    a = sorted(gumbel_keys(scored, "x").collect())
    b = sorted(gumbel_keys(scored, "x").collect())
    c = sorted(gumbel_keys(scored, "y").collect())
    assert a == b
    assert a != c


def test_model_join_broadcasts(spark):
    """The ≤4096-row log-ratio model must reach the scoring join as a
    broadcast — a shuffled model join would drag the exploded corpus
    through an Exchange keyed on bucket id."""
    df = REGISTRY["dsir_importance_weights"].spark(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_gumbel_key_matches_pure_python_reference(spark):
    """Third-party witness for engine-exactness: replicate the Gumbel
    key in pure Python (hashlib md5 + math.log2 + HALF_UP decimal
    rounding, the semantics of Spark ROUND) over 300 random ids and
    weights — Spark, DuckDB (the oracle gate) and this reference must
    all agree bit-for-bit."""
    import hashlib
    import math
    import random
    from decimal import ROUND_HALF_UP, Decimal

    from pyspark.sql import functions as F

    from kcidb_spark.queries.dsir import _U_DENOM, gumbel_keys

    rng = random.Random(99)
    rows = [
        (f"doc{rng.randrange(10**9)}", rng.randrange(-5_000_000, 5_000_000))
        for _ in range(300)
    ]
    df = spark.createDataFrame(rows, "doc_id string, weight_micros long")
    got = {
        r["doc_id"]: r["gumbel_micros"]
        for r in gumbel_keys(df, "fuzz").collect()
    }

    def ref(doc_id, w):
        h = int(hashlib.md5(f"fuzz:{doc_id}".encode()).hexdigest()[:6], 16)
        u = (h + 1) / _U_DENOM
        x = math.log2(-math.log2(u)) * 1_000_000.0
        g = int(
            Decimal(repr(x)).quantize(Decimal("1"), rounding=ROUND_HALF_UP)
        )
        return w - g

    for doc_id, w in rows:
        assert got[doc_id] == ref(doc_id, w), (doc_id, w)
