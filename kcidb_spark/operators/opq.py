"""OPQ — Optimized Product Quantization (Ge et al., CVPR 2013).

The learned orthogonal rotation completing the PQ family
(queries/advanced.py: raw / trained / residual / rotated-fixed): PQ
assumes the d dimensions split into independent subspaces, and a
rotation R chosen to MINIMIZE quantization distortion makes that
assumption much closer to true than any fixed rotation.  OPQ's
non-parametric trainer alternates:

1. **PQ step** — fix R, train per-subspace codebooks on the rotated
   vectors (Lloyd; float variant of
   :func:`operators.clustering.pq_codebooks_exact`);
2. **Procrustes step** — fix the codes' reconstructions Y, solve the
   orthogonal-Procrustes problem ``min_R ||rot_R(X) − Y||_F`` in
   closed form from the SVD of the d×d cross-Gram ``C = Xᵀ Y``.

A LEARNED matrix cannot be replayed by a static SQL oracle (the same
reason BPE/unigram training is rows-only), so this ships under the
property harness in tests/test_opq.py instead of the hash gate:
orthogonality of R, distortion ≤ the fixed 3-4-5 Givens rotation's
(guaranteed by Givens-initialized keep-best), and recall@k vs exact.

Scale contract (how FAISS trains OPQ too):
* training runs on a BOUNDED SAMPLE the caller passes (FAISS default
  ~2^16 vectors) — at 100 TB you never alternate over the corpus;
* within an iteration every data-sized step is distributed: rotation
  is a per-row projection against the broadcast d×d matrix (zero
  shuffle), Lloyd assignment is a broadcast join + min_by partial
  agg, the codebook mean and the cross-Gram are partial-agg shuffles
  keyed by ≤ S·M·subdim and d² values respectively;
* only d×d matrices ever sit on the driver (the SVD input/output and
  the centroid books — control-plane, like every k-means);
* the FULL corpus is touched once, after training, by the encode
  pass (rotate + assign) — same shape as the fixed-rotation entry.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from kcidb_spark.localrel import local_df

#: Float squared-L2 over two array<double> columns.
_D2F_TMPL = (
    "aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)),"
    " cast(0 as double), (acc, x) -> acc + x)"
)


def d2_float_expr(a: str, b: str) -> str:
    return _D2F_TMPL.format(a=a, b=b)


def givens_rotation(d: int, c: float = 0.6, s: float = 0.8) -> list:
    """The fixed 3-4-5 two-layer Givens rotation as a d×d row-major
    matrix — the SAME map queries/advanced._rot_expr applies (layer 1
    rotates even 0-indexed pairs (0,1),(2,3)…; layer 2 rotates
    (1,2),(3,4)…, endpoints fixed).  Used as OPQ's init so keep-best
    GUARANTEES the learned rotation never quantizes worse than the
    hash-certified fixed one."""
    import numpy as np

    l1 = np.eye(d)
    for i in range(0, d - 1, 2):
        l1[i, i], l1[i, i + 1] = c, -s
        l1[i + 1, i], l1[i + 1, i + 1] = s, c
    l2 = np.eye(d)
    for i in range(1, d - 1, 2):
        l2[i, i], l2[i, i + 1] = c, -s
        l2[i + 1, i], l2[i + 1, i + 1] = s, c
    return (l2 @ l1).tolist()


def rotate(
    df: DataFrame, r_rows: list, vec_col: str, out_col: str
) -> DataFrame:
    """Append ``out_col`` = R·x: the d×d matrix rides in as ONE
    broadcast row (its d row-vectors), the projection is a JVM-side
    array transform — per-row compute, zero shuffle, codegen-friendly
    (no Python boundary)."""
    spark = df.sparkSession
    rdf = local_df(
        spark,
        [([list(map(float, row)) for row in r_rows],)],
        "_rrows array<array<double>>",
    )
    return (
        df.crossJoin(F.broadcast(rdf))
        .withColumn(
            out_col,
            F.expr(
                f"transform(_rrows, rr -> aggregate("
                f"zip_with({vec_col}, rr, (a, b) -> a * b),"
                f" cast(0 as double), (acc, v) -> acc + v))"
            ),
        )
        .drop("_rrows")
    )


def pq_codebooks_float(
    subs: DataFrame, m: int, rounds: int
) -> List[Tuple[int, int, List[float]]]:
    """Per-subspace float Lloyd — the double-precision sibling of
    :func:`operators.clustering.pq_codebooks_exact` (same jobs, same
    broadcast/partial-agg shapes, float mean instead of integer div).
    Float means are ordering-dependent, which is exactly why OPQ is
    rows-only — see the module docstring.  Init: codeword m is vector
    m's subvector.  Returns [(s, m, [coord, …])] driver-held."""
    spark = subs.sparkSession
    schema = "s bigint, m bigint, bq array<double>"
    books = sorted(
        (int(r["s"]), int(r["id"]), [float(x) for x in r["q"]])
        for r in subs.filter(F.col("id") < m).collect()
    )
    for _ in range(rounds):
        bdf = local_df(spark, books, schema)
        assign = (
            subs.join(F.broadcast(bdf), on="s")
            .select(
                "s", "id", "q", "m",
                F.expr(d2_float_expr("q", "bq")).alias("d2"),
            )
            .groupBy("s", "id")
            .agg(
                F.min_by("m", F.struct("d2", "m")).alias("m"),
                F.first("q").alias("q"),
            )
        )
        rows = (
            assign.select("s", "m", F.posexplode("q").alias("pos", "x"))
            .groupBy("s", "m", "pos")
            .agg(F.avg("x").alias("v"))
            .groupBy("s", "m")
            .agg(
                F.sort_array(
                    F.collect_list(F.struct("pos", "v"))
                ).alias("pm")
            )
            .select("s", "m", F.expr("transform(pm, p -> p.v)").alias("bq"))
        ).collect()
        books = sorted(
            (int(r["s"]), int(r["m"]), [float(x) for x in r["bq"]])
            for r in rows
        )
    return books


def _reconstructions(subs: DataFrame, books: list) -> DataFrame:
    """(id, s, q, bq): each rotated subvector next to its nearest
    codeword — the E-step output both the distortion measurement and
    the Procrustes Y are read from."""
    spark = subs.sparkSession
    bdf = local_df(
        spark, books, "s bigint, m bigint, bq array<double>"
    )
    assign = (
        subs.join(F.broadcast(bdf), on="s")
        .select(
            "s", "id", "q", "m",
            F.expr(d2_float_expr("q", "bq")).alias("d2"),
        )
        .groupBy("s", "id")
        .agg(
            F.min_by("m", F.struct("d2", "m")).alias("m"),
            F.first("q").alias("q"),
        )
    )
    return assign.join(F.broadcast(bdf), on=["s", "m"]).select(
        "id", "s", "q", "bq"
    )


def opq_train(
    vecs: DataFrame,
    n_subs: int,
    subdim: int,
    m_codes: int,
    lloyd_rounds: int = 2,
    iters: int = 3,
    r_init: Optional[Sequence[Sequence[float]]] = None,
) -> Tuple[list, list, List[float]]:
    """Alternating OPQ on a TRAINING SAMPLE ``vecs`` (id, x
    array<double>; persist it — every iteration re-scans).  Returns
    ``(R, books, history)``: the best (R, codebooks) by measured mean
    distortion across iterations (keep-best — with ``r_init`` the
    fixed Givens rotation, learned distortion provably ≤ fixed), and
    the per-iteration distortion history (history[0] is the init
    rotation's own distortion, the comparison baseline).

    Each iteration: distributed rotate → float Lloyd → distortion
    (one scalar agg) → cross-Gram C = Xᵀ·Y (posexplode → d²-key
    partial agg, collected as d² rows) → SVD on the driver →
    next R = V·Uᵀ (the closed-form orthogonal-Procrustes argmin for
    this row-convention)."""
    import numpy as np

    from kcidb_spark.operators.ivf import subvectors

    d = n_subs * subdim
    r_cur = (
        np.array(r_init, dtype=float)
        if r_init is not None
        else np.eye(d)
    )
    best: Optional[Tuple[list, list, float]] = None
    history: List[float] = []
    for it in range(iters):
        xr = rotate(vecs, r_cur.tolist(), "x", "q").select("id", "q")
        subs = subvectors(xr, ("id",), "q", n_subs, subdim).persist()
        try:
            books = pq_codebooks_float(subs, m_codes, lloyd_rounds)
            rec = _reconstructions(subs, books)
            raw = (
                rec.groupBy("id")
                .agg(
                    F.sum(F.expr(d2_float_expr("q", "bq"))).alias("e")
                )
                .agg(F.avg("e"))
                .collect()[0][0]
            )
            # Empty training sample (partition-pruned read, fresh
            # deployment): distortion degenerates to 0 and the init
            # rotation is returned unchanged.
            dist = float(raw) if raw is not None else 0.0
            history.append(dist)
            if best is None or dist < best[2]:
                best = (r_cur.tolist(), books, dist)
            if it == iters - 1:
                break
            # Procrustes step.  Y = per-id concat of codewords in
            # subspace order; C[i][j] = Σ_id x_i · y_j.
            y = (
                rec.groupBy("id")
                .agg(
                    F.sort_array(
                        F.collect_list(F.struct("s", "bq"))
                    ).alias("sb")
                )
                .select(
                    "id",
                    F.expr("flatten(transform(sb, p -> p.bq))").alias(
                        "y"
                    ),
                )
            )
            xi = vecs.join(y, on="id").select(
                "y", F.posexplode("x").alias("i", "xi")
            )
            gram_rows = (
                xi.select("i", "xi", F.posexplode("y").alias("j", "yj"))
                .groupBy("i", "j")
                .agg(F.sum(F.col("xi") * F.col("yj")).alias("c"))
                .collect()
            )
            c_mat = np.zeros((d, d))
            for r in gram_rows:
                c_mat[r["i"], r["j"]] = r["c"]
            u, _, vh = np.linalg.svd(c_mat)
            # xr = R·x row-convention ⇒ maximize tr(R·C): R = V·Uᵀ.
            r_cur = vh.T @ u.T
        finally:
            subs.unpersist()
    assert best is not None
    return best[0], best[1], history
