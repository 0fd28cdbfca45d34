"""Connected components over near-duplicate pair graphs.

The last stage of a dedup pipeline: candidate/verified pairs form an
undirected graph; each connected component is one duplicate cluster,
and the keeper is the minimum id in the component (deterministic).

Algorithm: iterative min-label propagation — every node repeatedly
adopts the smallest label among itself and its neighbors, converging
in O(component diameter) rounds.  Each round is one join + one
aggregation (both partial-aggregable), so a round costs O(|E|)
shuffle; near-dup components are overwhelmingly tiny and flat, so
3–5 rounds close almost any real corpus.  For adversarially long
chains at extreme scale, the large-star/small-star variant
(Kiveris et al., "Connected Components in MapReduce", SoCC'14) halves
diameters per round — same join primitives, drop-in replacement.

This is a genuinely iterative operator (not SQL-expressible as one
query in Spark), but DuckDB's recursive CTE can replay the same
fixpoint — so the registry entry stays hash-verified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, cluster) for every node appearing in ``pairs``;
    ``cluster`` is the minimum node id of the component.

    Only nodes that occur in at least one pair appear — singletons
    (documents with no near-dup) are by definition their own keeper
    and never enter the graph.
    """
    edges = (
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .unionByName(pairs.select(F.col(b_col).alias("u"), F.col(a_col).alias("v")))
        .distinct()
        .persist()
    )
    # Each round MUST truncate lineage (localCheckpoint), not merely
    # cache: round N's plan references round N-1's twice (the join and
    # the convergence check), so without truncation the logical plan
    # doubles every iteration and analysis itself OOMs around round ~20.
    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("cluster"))
        .localCheckpoint()
    )
    converged = False
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.v == labels.node)
            .groupBy("u")
            .agg(F.min("cluster").alias("n_min"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.u, "left")
            .select(
                "node",
                F.least(
                    F.col("cluster"), F.coalesce(F.col("n_min"), F.col("cluster"))
                ).alias("cluster"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), on="node")
            .filter(F.col("n.cluster") != F.col("o.cluster"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    edges.unpersist()
    if not converged:
        # Unconverged labels are silently WRONG clusters (a chain longer
        # than max_iter keeps distinct labels) — fail loudly instead.
        raise RuntimeError(
            f"connected_components did not converge within max_iter={max_iter} "
            "rounds; the graph has a component with diameter > max_iter. "
            "Raise max_iter or switch to the large-star/small-star variant."
        )
    return labels


def cluster_summary(components: DataFrame) -> DataFrame:
    """(cluster_id, n_members, keeper_id, max_member) per duplicate
    cluster — the dedup decision table (keep keeper, drop the rest)."""
    return components.groupBy(F.col("cluster").alias("cluster_id")).agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min("node").alias("keeper_id"),
        F.max("node").alias("max_member"),
    )
