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
chains at extreme scale, :func:`connected_components_star`
(Kiveris et al., "Connected Components in MapReduce", SoCC'14) is the
drop-in replacement with O(log n) rounds — property-tested equal to
min-label on random graphs (test_components.py).

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
    # Hash-partition the (persisted) edge frame on the per-round join
    # key ONCE: every propagation round joins edges.v == labels.node,
    # and a persisted frame carries its outputPartitioning into each
    # round's plan — so only the (small) label frame exchanges per
    # round, not the |E|-sized edge frame.  Measured at 100× sf0.1
    # duplicate-dense (500 k docs): total shuffle 2.58 GB → see
    # SCALE.md components row.
    edges = (
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .unionByName(pairs.select(F.col(b_col).alias("u"), F.col(a_col).alias("v")))
        .distinct()
        .repartition("v")
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
        # The convergence flag rides the label update itself (guide
        # §2.4): the old shape re-joined new labels against old ones —
        # a second |V|⋈|V| join per round — to learn what this row
        # already knows (the label moved iff a neighbor's minimum beat
        # it).  The check is now a filter over the checkpointed frame.
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.u, "left")
            .select(
                "node",
                F.least(
                    F.col("cluster"), F.coalesce(F.col("n_min"), F.col("cluster"))
                ).alias("cluster"),
                (
                    F.col("n_min").isNotNull()
                    & (F.col("n_min") < F.col("cluster"))
                ).alias("_moved"),
            )
            .localCheckpoint()
        )
        changed = new_labels.filter(F.col("_moved")).limit(1).count()
        labels = new_labels.drop("_moved")
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
            "Raise max_iter or switch to connected_components_star "
            "(O(log n) rounds)."
        )
    return labels


def connected_components_star(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, cluster) via alternating large-star/small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — O(log n) rounds regardless of component diameter, the
    scale upgrade over min-label propagation's O(diameter).

    Each round halves path lengths by pointing nodes directly at the
    locally-smallest reachable id:

    * large-star: every node ``v`` strictly larger than a neighbor
      ``u`` re-attaches to ``min(Γ⁺(u))`` — long chains collapse
      toward their minimum from every interior point at once;
    * small-star: each node and its smaller neighbors attach to the
      neighborhood minimum, canonicalizing into star shape.

    Both phases are one groupBy-min plus one join on the edge frame —
    the same shuffle primitives as a round of min-label, but the
    round COUNT is logarithmic, so a 1M-long chain needs ~20 rounds
    instead of 1M.  The fixpoint is "edge set unchanged"; at that
    point edges are exactly (node → component-min root).
    """
    edges = (
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .distinct()
        .localCheckpoint()
    )
    for _ in range(max_iter):
        # --- large-star: (v, min(Γ⁺(u))) for neighbors v > u --------
        sym = edges.unionByName(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        large = (
            sym.join(mins, on="u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        # --- small-star on the large-star output (big→small edges) --
        dir_e = (
            large.filter(F.col("u") != F.col("v"))
            .select(
                F.greatest("u", "v").alias("u"),
                F.least("u", "v").alias("v"),
            )
            .distinct()
        )
        smins = dir_e.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            dir_e.join(smins, on="u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(smins.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .select(
                F.greatest("u", "v").alias("u"),
                F.least("u", "v").alias("v"),
            )
            .distinct()
            .localCheckpoint()
        )
        stable = (
            small.exceptAll(edges).limit(1).count() == 0
            and edges.exceptAll(small).limit(1).count() == 0
        )
        edges = small
        if stable:
            break
    else:
        raise RuntimeError(
            f"connected_components_star did not stabilize in {max_iter} "
            "rounds — at O(log n) rounds this means n > 2^"
            f"{max_iter}; raise max_iter."
        )
    roots = edges.select(F.col("v").alias("node")).distinct().select(
        "node", F.col("node").alias("cluster")
    )
    return (
        edges.select(F.col("u").alias("node"), F.col("v").alias("cluster"))
        .unionByName(roots)
        .distinct()
    )


def cluster_summary(components: DataFrame) -> DataFrame:
    """(cluster_id, n_members, keeper_id, max_member) per duplicate
    cluster — the dedup decision table (keep keeper, drop the rest)."""
    return components.groupBy(F.col("cluster").alias("cluster_id")).agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min("node").alias("keeper_id"),
        F.max("node").alias("max_member"),
    )
