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
