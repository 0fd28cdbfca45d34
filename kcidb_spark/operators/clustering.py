"""Iterative Lloyd k-means over an embedding column.

The clustering primitive behind IVF coarse quantization
(queries/advanced.ann_ivf_topk uses fixed centroids as a stand-in)
and SemDeDup-style semantic pruning (queries/ranking.semdedup_prune).

Scale design:
* centroids are control-plane-sized (k × dim doubles) and live on the
  driver between rounds — the one place a ``collect()`` is the RIGHT
  call, exactly like every distributed k-means (Spark MLlib included);
* each round is: broadcast-join assignment (zero corpus shuffle) →
  per-(cluster, dim) partial-agg mean (one exchange keyed by at most
  k·dim values — salt-free because k·dim ≪ partitions is the normal
  regime; for tiny k on huge data the partial aggregation already
  reduces each partition to ≤ k·dim rows before the shuffle);
* the corpus DataFrame is persisted once and re-scanned per round;
  lineage stays shallow because every round restarts from it, so no
  checkpointing is needed (contrast operators/components.py, whose
  frontier is itself iterative state).

The assignment step is deterministic (squared-distance argmin, ties
to the lowest cluster id); the mean update is floating-point and
therefore engine-ordering-dependent — which is why the oracle-checked
registry queries use either fixed centroids (ann_ivf_topk,
semdedup_prune) or integer outputs, and the full iterative loop is
proven by property tests (tests/test_clustering.py) instead of the
hash gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kcidb_spark.localrel import local_df
from kcidb_spark.operators.similarity import dot_expr

_D2_INT_TMPL = (
    "aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)),"
    " cast(0 as bigint), (acc, x) -> acc + x)"
)


def d2_int_expr(a: str, b: str) -> str:
    """SQL text: squared L2 distance of two array<bigint> columns —
    pure BIGINT arithmetic, so the value is engine-exact (the float
    mean update below is why the ITERATIVE trainer can't be
    hash-gated; this integer form is how ann_ivf_kmeans_topk can)."""
    return _D2_INT_TMPL.format(a=a, b=b)


def _int_array_sql(vals) -> str:
    """SQL text: array<bigint> literal."""
    return (
        "array("
        + ", ".join(f"cast({int(x)} as bigint)" for x in vals)
        + ")"
    )


def _tdiv(s: int, n: int) -> int:
    """Integer division truncating toward ZERO — exactly Spark's
    ``div`` (and DuckDB's integer ``//``) on a possibly-negative
    numerator; Python's ``//`` floors, which differs for s < 0."""
    return s // n if s >= 0 else -((-s) // n)


def _argmin_centroid_sql(cents, vec_col: str = "q") -> str:
    """SQL text: nearest-centroid id over driver-held integer
    centroids as ONE per-row expression — min(struct(d2, c_id)).c_id,
    exactly the ``min_by(c_id, struct(d2, c_id))`` the grouped form
    computes, with zero exchanges (the centroid table is
    control-plane-sized, so the expression is bounded by k·dim)."""
    entries = [
        f"struct({d2_int_expr(vec_col, _int_array_sql(cq))} as d,"
        f" cast({int(c_id)} as bigint) as c)"
        for c_id, cq in cents
    ]
    if not entries:
        # Empty model → NULL assignment via a TYPED empty array (a
        # bare array() is VOID and the .c extraction errors at
        # analysis).  Reachable only with empty data alongside (init
        # takes the k lowest ids), where the old crossJoin+groupBy
        # form also produced zero assignments — the empty-corpus
        # sweep (tests/test_empty_corpus.py) pins this.
        return (
            "array_min(cast(array() as"
            " array<struct<d: bigint, c: bigint>>)).c"
        )
    return f"array_min(array({', '.join(entries)})).c"


def kmeans_centroids_exact(
    vecs: DataFrame, k: int, rounds: int
) -> list[tuple[int, list[int]]]:
    """Fixed-round Lloyd over INTEGER-quantized vectors; returns the
    final centroids driver-held as ``[(c_id, [coord, ...]), ...]``.

    ``vecs``: (id, q array<bigint>) — quantize non-negatively before
    calling (translation doesn't change L2 argmins and keeps the
    integer mean's truncation sign-free: Spark ``div`` truncates
    toward zero, DuckDB ``//`` likewise for integers).  Every step is
    exact BIGINT arithmetic — assignment is argmin of ``d2_int_expr``
    with c_id tie-break, the mean update is ``sum(x) div count`` per
    (cluster, dim) — so an oracle unrolling the same ``rounds`` in SQL
    reproduces the centroids bit-for-bit (VERDICT r8 ask #2; contrast
    :func:`kmeans_lloyd`, whose float means are ordering-dependent).

    Init: the k lowest-id vectors.  Per round: one broadcast-join
    assignment + one partial-agg mean over the persisted corpus —
    centroids (k·dim BIGINTs) live on the driver between rounds, the
    sanctioned control-plane collect (module docstring).  Clusters
    that lose all members drop out, same as a grouped agg in any
    engine."""
    cents = [
        (r["id"], list(r["q"]))
        for r in vecs.filter(F.col("id") < k).collect()
    ]
    if not cents:
        # Empty init can only stay empty (the old crossJoin rounds
        # ran against an empty centroid table and collected nothing);
        # the in-row expression below needs >= 1 literal entry.
        return cents
    for _ in range(rounds):
        # In-row argmin over the driver-held centroids (they are
        # literals between rounds anyway): one per-row expression
        # replaces the crossJoin+groupBy(min_by) shape, removing the
        # id-keyed exchange that carried ``q`` once per round (guide
        # §2.4) — at scale each Lloyd round now shuffles only the
        # ≤ k·dim mean partials.  Identical argmin: min(struct(d2,
        # c_id)) == min_by(c_id, struct(d2, c_id)).
        assign = vecs.select(
            "id", "q",
            F.expr(_argmin_centroid_sql(cents)).alias("c_id"),
        )
        # Mean update as ONE c_id-keyed partial aggregation of per-dim
        # sums + a count (guide §2.4): the old posexplode ×dim inflated
        # the frame dim-fold and paid a second (c_id)-keyed exchange
        # plus a collect_list/sort reassembly just to regroup what one
        # agg row already holds.  The truncating division moves to the
        # driver over exact BIGINTs — `Spark div` truncates toward
        # zero, replicated below — so the centroids are bit-identical.
        dim = len(cents[0][1])
        rows = (
            assign.groupBy("c_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[
                    F.sum(F.expr(f"q[{i}]")).alias(f"s{i}")
                    for i in range(dim)
                ],
            )
        ).collect()
        cents = sorted(
            (
                r["c_id"],
                [_tdiv(int(r[f"s{i}"]), int(r["n"])) for i in range(dim)],
            )
            for r in rows
        )
    return cents


def pq_codebooks_exact(
    subs: DataFrame, m: int, rounds: int
) -> list[tuple[int, int, list[int]]]:
    """Per-subspace integer Lloyd — PQ codebook TRAINING (Jégou et
    al. 2011 §II.C run with :func:`kmeans_centroids_exact`'s
    engine-exact arithmetic): all subspaces train in the SAME jobs,
    grouped by ``s``, instead of one driver loop per subspace.

    ``subs``: (s, id, q array<bigint>) — the id-th vector's s-th
    subvector, integer-quantized.  SIGNED inputs are supported and
    in-repo: ivf_pq_residual_adc_topk trains on residuals (x −
    centroid), which are signed.  This is safe because every distance
    is a SQUARE (sign-free) and the mean update is truncating
    division toward zero in BOTH engines (Spark ``div`` and DuckDB
    ``//`` agree on negatives; no shift arithmetic is used anywhere
    in the trainer) — verified in ADVICE r10.  Note the usual Lloyd
    behavior on a round with no assignments: a codeword that loses
    all members drops out of the book.  Returns the trained
    codebooks driver-held as ``[(s, m, [coord, ...]), ...]`` —
    S·M·D BIGINTs, control-plane-sized.  Init: codeword m of
    subspace s is vector m's s-th subvector (id < m) — exactly the
    static codebook ivf_pq_adc_topk searches with, so Lloyd's
    monotone-distortion property makes "trained beats static"
    testable (tests/test_ann_recall.py).  Per round: one broadcast
    join + argmin per (s, id) and one partial-agg integer mean per
    (s, m, dim); every step BIGINT, so an oracle unrolling the same
    rounds per subspace reproduces the books bit-for-bit."""
    books = sorted(
        (r["s"], r["id"], list(r["q"]))
        for r in subs.filter(F.col("id") < m).collect()
    )
    if not books:
        # Same early-out as kmeans_centroids_exact: an empty init
        # stayed empty under the old join rounds; the in-row CASE
        # needs >= 1 branch.
        return books
    for _ in range(rounds):
        # In-row per-subspace argmin (same rationale as
        # kmeans_centroids_exact): a CASE on ``s`` dispatches to that
        # subspace's literal codewords, replacing the broadcast join +
        # (s, id)-keyed exchange that carried ``q`` every round.  Rows
        # whose subspace has no codewords (a fully-dropped book) get
        # NULL and are filtered — exactly the rows the inner join
        # dropped.  Identical argmin: min(struct(d2, m)).
        by_s: dict[int, list] = {}
        for s_, m_, bq_ in books:
            by_s.setdefault(int(s_), []).append((int(m_), bq_))
        branches = []
        for s_ in sorted(by_s):
            entries = [
                f"struct({d2_int_expr('q', _int_array_sql(bq_))} as d,"
                f" cast({m_} as bigint) as m)"
                for m_, bq_ in sorted(by_s[s_])
            ]
            branches.append(
                f"WHEN s = {s_} THEN"
                f" array_min(array({', '.join(entries)})).m"
            )
        m_sql = "CASE " + " ".join(branches) + " END"
        assign = subs.select(
            "s", "id", "q", F.expr(m_sql).alias("m")
        ).filter(F.col("m").isNotNull())
        # Same one-exchange mean update as kmeans_centroids_exact:
        # per-dim sums + count keyed (s, m), truncating division on
        # the driver (toward zero — matches Spark `div` on the SIGNED
        # residual inputs too).
        subdim = len(books[0][2])
        rows = (
            assign.groupBy("s", "m")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[
                    F.sum(F.expr(f"q[{i}]")).alias(f"v{i}")
                    for i in range(subdim)
                ],
            )
        ).collect()
        books = sorted(
            (
                r["s"],
                r["m"],
                [
                    _tdiv(int(r[f"v{i}"]), int(r["n"]))
                    for i in range(subdim)
                ],
            )
            for r in rows
        )
    return books


def ivf_kmeans_topk(
    vecs: DataFrame,
    n_centroids: int,
    rounds: int,
    n_queries: int,
    k: int,
    nprobe: int,
    centroids: list | None = None,
) -> DataFrame:
    """IVF top-k with a k-means-trained coarse quantizer — the
    composed train → index → probe path, integer-exact end to end.

    ``vecs``: (id, q array<bigint>) quantized non-negative, persisted
    by the caller (training and search both re-scan it).  Returns
    (q_id, n_id, d2) — quantized squared-L2 distances (FAISS IVF's
    native metric), BIGINT so cross-engine hashes match.  Search is
    O(nprobe·cluster): the trained centroid table and the query probe
    list broadcast; assignment is a map-side min_by partial agg.
    ``centroids`` lets the caller pass an already-trained list (the
    train-once session cache in queries/advanced.py); training is
    deterministic integer Lloyd, so precomputed == retrained."""
    from pyspark.sql import Window as W

    from kcidb_spark.operators.ivf import coarse_probes, coarse_score

    spark = vecs.sparkSession
    cents = (
        centroids
        if centroids is not None
        else kmeans_centroids_exact(vecs, n_centroids, rounds)
    )
    cdf = local_df(spark, cents, "c_id bigint, cq array<bigint>")
    probes = coarse_probes(
        coarse_score(vecs, cdf, carry=("q",)), n_queries, nprobe,
        carry=("q",),
    ).withColumnRenamed("q", "qq")
    # Corpus assignment IN-ROW over the driver-held centroids (guide
    # §2.4) — identical argmin/tie-break to coarse_assign's
    # min_by(c_id, struct(d2, c_id)), without the id-keyed exchange
    # that shuffled every vector payload just to collapse the ×k
    # candidate rows (the one corpus-keyed exchange this search had).
    m = vecs.select(
        F.col("id").alias("n_id"),
        F.expr(_argmin_centroid_sql(cents)).alias("c_id"),
        F.col("q").alias("nq"),
    )
    w_rank = W.partitionBy("q_id").orderBy("d2", "n_id")
    return (
        m.join(F.broadcast(probes), "c_id")
        .filter(F.col("n_id") != F.col("q_id"))
        .select(
            "q_id", "n_id", F.expr(d2_int_expr("qq", "nq")).alias("d2")
        )
        .withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") <= k)
        .select("q_id", "n_id", "d2")
    )


def _assign(vecs: DataFrame, cents: DataFrame) -> DataFrame:
    """(id, c_id) nearest-centroid assignment: broadcast cross join +
    in-group argmin via min_by (partial-agg friendly — map-side the
    k candidate rows per vector collapse back to one before any
    exchange)."""
    d2 = F.expr(
        f"{dot_expr('v', 'v')} - 2 * {dot_expr('v', 'cv')}"
        f" + {dot_expr('cv', 'cv')}"
    )
    return (
        vecs.crossJoin(F.broadcast(cents))
        .select("id", "c_id", d2.alias("d2"))
        .groupBy("id")
        .agg(F.min_by("c_id", F.struct("d2", "c_id")).alias("c_id"))
    )


def kmeans_lloyd(
    df: DataFrame,
    k: int = 8,
    max_iter: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame, bool]:
    """Lloyd's algorithm; returns (assignment, centroids, converged).

    * assignment: (id_col, cluster) — every input row labelled;
    * centroids: (cluster, centroid array<double>) — final means;
    * converged: True iff an iteration left every label unchanged
      before ``max_iter`` ran out (callers should treat False like
      connected_components' failure — raise or widen max_iter).

    Init is deterministic: the k lowest-id vectors seed the clusters,
    so repeated runs (and test re-runs) agree without a seed channel.
    """
    vecs = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).persist()
    try:
        cents = (
            vecs.orderBy("id").limit(k)
            .select(F.col("id").alias("c_id"), F.col("v").alias("cv"))
        )
        prev: DataFrame | None = None
        converged = False
        for _ in range(max_iter):
            assign = _assign(vecs, cents).persist()
            if prev is not None:
                changed = (
                    assign.alias("a")
                    .join(prev.alias("p"), on="id")
                    .filter(F.col("a.c_id") != F.col("p.c_id"))
                    .limit(1)
                    .count()
                )
                prev.unpersist()
                if changed == 0:
                    prev = assign
                    converged = True
                    break
            prev = assign
            # Mean update: explode to (cluster, dim, value), partial-agg
            # average, re-assemble the array ordered by dim.
            cents = (
                assign.join(vecs, on="id")
                .select("c_id", F.posexplode("v").alias("pos", "x"))
                .groupBy("c_id", "pos")
                .agg(F.avg("x").alias("m"))
                .groupBy("c_id")
                .agg(F.collect_list(F.struct("pos", "m")).alias("pm"))
                .select(
                    "c_id",
                    F.expr(
                        "transform(array_sort(pm), s -> s.m)"
                    ).alias("cv"),
                )
            ).localCheckpoint(eager=True)
        assignment = prev.select(F.col("id").alias(id_col),
                                 F.col("c_id").alias("cluster"))
        centroids = cents.select(F.col("c_id").alias("cluster"),
                                 F.col("cv").alias("centroid"))
        # Materialize before releasing the inputs.
        assignment = assignment.localCheckpoint(eager=True)
        centroids = centroids.localCheckpoint(eager=True)
        if prev is not None:
            prev.unpersist()
        return assignment, centroids, converged
    finally:
        vecs.unpersist()
