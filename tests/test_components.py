"""Connected components (dedup clustering) operator."""

from __future__ import annotations

from kcidb_spark.operators.components import cluster_summary, connected_components


def test_chain_and_islands(spark):
    # Components: {1,2,3,4} (a chain — needs propagation rounds),
    # {10,11}, and {20,21,22} (a triangle).
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "a long, b long",
    )
    comp = {r["node"]: r["cluster"] for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}

    summary = {
        r["cluster_id"]: (r["n_members"], r["keeper_id"], r["max_member"])
        for r in cluster_summary(connected_components(pairs)).collect()
    }
    assert summary == {1: (4, 1, 4), 10: (2, 10, 11), 20: (3, 20, 22)}


def test_long_chain_converges(spark):
    # A 12-node path: min-label needs several rounds to reach the end.
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 112)], "a long, b long"
    )
    comp = connected_components(pairs).collect()
    assert {r["cluster"] for r in comp} == {100}
    assert len(comp) == 13


def test_star_matches_minlabel_random(spark):
    import random

    from kcidb_spark.operators.components import connected_components_star

    rng = random.Random(7)
    nodes = list(range(60))
    edges = {(min(a, b), max(a, b))
             for a, b in (rng.sample(nodes, 2) for _ in range(45))}
    pairs = spark.createDataFrame(
        [(a, b) for a, b in edges], "a long, b long"
    )
    ml = {r["node"]: r["cluster"]
          for r in connected_components(pairs).collect()}
    st = {r["node"]: r["cluster"]
          for r in connected_components_star(pairs).collect()}
    assert st == ml


def test_star_long_chain_few_rounds(spark):
    """A 200-node chain (diameter 199) must close in O(log n) rounds —
    min-label would need 199."""
    from kcidb_spark.operators.components import connected_components_star

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(199)], "a long, b long"
    )
    comp = connected_components_star(pairs, max_iter=12).collect()
    assert len(comp) == 200
    assert {r["cluster"] for r in comp} == {0}


def test_leakage_safe_split_never_straddles(spark):
    """split_leakage_safe's contract the value hash can't state: no
    LSH candidate pair may have its two documents in different
    splits (that pair IS the train→val contamination channel), and
    both splits must be non-trivially populated."""
    from pyspark.sql import functions as F

    from kcidb_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from kcidb_spark.queries import REGISTRY
    from kcidb_spark.tables import table

    sf = "/root/testdata/sf0.01"
    split = REGISTRY["split_leakage_safe"].spark(spark, sf)
    docs = table(spark, sf, "documents", spread=True)
    sig = minhash_signatures(docs, n_hashes=8)
    pairs = lsh_candidate_pairs(sig, n_hashes=8, n_bands=2)
    sa = split.select(
        F.col("doc_id").alias("a"), F.col("split").alias("split_a")
    )
    sb = split.select(
        F.col("doc_id").alias("b"), F.col("split").alias("split_b")
    )
    straddling = (
        pairs.join(sa, "a").join(sb, "b")
        .filter(F.col("split_a") != F.col("split_b"))
        .count()
    )
    assert pairs.count() > 0  # the guard is exercised, not vacuous
    assert straddling == 0
    by_split = {r["split"]: r["n"] for r in
                split.groupBy("split").agg(F.count(F.lit(1)).alias("n"))
                .collect()}
    assert set(by_split) == {"train", "val"}
    n = sum(by_split.values())
    assert 0.6 < by_split["train"] / n < 0.9  # ~75/25 by the hex rule
