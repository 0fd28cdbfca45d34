"""ANN recall contract (VERDICT r7 #1): the one quality dimension of
the similarity surface no hash check can see.  IVF probing loses true
neighbors that quantize across a Voronoi boundary; the loss must (a)
shrink monotonically as nprobe grows, (b) vanish exactly when every
cluster is probed (nprobe = n_centroids ≡ exhaustive search), and
(c) stay above measured floors at the operating points.  The sf0.01
embeddings and the deterministic first-N centroids make every number
below exactly reproducible — the floors are measured values with
margin, not aspirations (measured curve: nprobe 1/2/4/8/16 →
0.680/0.730/0.805/0.920/1.000; recorded in SCALE.md §ANN recall).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from kcidb_spark.operators.similarity import cosine_topk, ivf_topk, lsh_topk
from kcidb_spark.tables import table
from tests.conftest import SF_CORRECT

_NQ = 20  # queries
_K = 10  # neighbors per query
_NC = 16  # coarse centroids


def _topk_sets(df) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r["q_id"], set()).add(r["n_id"])
    return out


def _recall(bf: dict[int, set[int]], got: dict[int, set[int]]) -> float:
    return sum(
        len(bf[q] & got.get(q, set())) / len(bf[q]) for q in bf
    ) / len(bf)


def test_ivf_recall_curve(spark):
    emb = table(spark, SF_CORRECT, "embeddings")
    vecs = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    bf = _topk_sets(
        cosine_topk(emb.filter(F.col("vec_id") < _NQ), emb, k=_K)
    )
    assert len(bf) == _NQ and all(len(s) == _K for s in bf.values())

    recalls = {
        nprobe: _recall(
            bf, _topk_sets(ivf_topk(vecs, _NC, _NQ, _K, nprobe=nprobe))
        )
        for nprobe in (1, 2, 4, 8, _NC)
    }
    # (a) monotone non-decreasing in nprobe.
    curve = [recalls[n] for n in (1, 2, 4, 8, _NC)]
    assert curve == sorted(curve), f"recall not monotone: {recalls}"
    # (b) probing every cluster IS brute force.
    assert recalls[_NC] == 1.0, recalls
    # (c) measured floors with margin (deterministic data + centroids,
    # so these are stable; a probe-routing bug craters them).
    assert recalls[1] >= 0.5, recalls
    assert recalls[4] >= 0.7, recalls
    assert recalls[8] >= 0.85, recalls


def test_lsh_multiprobe_recall_curve(spark):
    """Same contract for the hyperplane family: recall@10 must rise
    monotonically with the number of Hamming-1 probes (each probe
    recovers neighbors that fell on the other side of one
    hyperplane), and the measured floors hold.  LSH trades much more
    recall for speed than IVF at equal candidate budget — the curve
    being LOW is expected and honest (4 planes, 16 buckets, ~31
    candidates/probe over ~500 vectors); what must never happen is
    multiprobe *reducing* recall."""
    emb = table(spark, SF_CORRECT, "embeddings")
    vecs = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    bf = _topk_sets(
        cosine_topk(emb.filter(F.col("vec_id") < _NQ), emb, k=_K)
    )
    recalls = {
        mp: _recall(
            bf,
            _topk_sets(
                lsh_topk(vecs, _NQ, _K, multiprobe=mp, n_planes=4)
            ),
        )
        for mp in (0, 1, 2, 4)
    }
    curve = [recalls[m] for m in (0, 1, 2, 4)]
    assert curve == sorted(curve), f"recall not monotone: {recalls}"
    # Measured on the sf0.01 embeddings (deterministic planes):
    # 0 probes ≈ single-bucket baseline; 4 probes must beat it by the
    # boundary-neighbor margin.
    assert recalls[4] > recalls[0], recalls
    assert recalls[4] >= 0.3, recalls


def _quantized(emb):
    from kcidb_spark.queries.advanced import _KM_SCALE

    return emb.select(
        F.col("vec_id").alias("id"),
        F.expr(
            "transform(cast(embedding as array<double>),"
            f" x -> cast(floor((x + 1.0D) * {_KM_SCALE}.0D) as bigint))"
        ).alias("q"),
    )


def test_ivf_kmeans_recall_curve(spark):
    """Recall contract for the k-means-TRAINED coarse quantizer (the
    static-centroid curve above doesn't transfer: trained Voronoi
    cells have different boundary loss).  Brute force here is exact
    top-k under the SAME quantized-L2 metric the trained path ranks
    by, so nprobe = n_centroids must reproduce it row-for-row."""
    from kcidb_spark.operators.clustering import (
        d2_int_expr,
        ivf_kmeans_topk,
    )

    emb = table(spark, SF_CORRECT, "embeddings")
    vecs = _quantized(emb).persist()
    try:
        q = vecs.filter(F.col("id") < _NQ).select(
            F.col("id").alias("q_id"), F.col("q").alias("qq")
        )
        w = F.row_number().over(
            W.partitionBy("q_id").orderBy("d2", "n_id")
        )
        bf_df = (
            vecs.select(F.col("id").alias("n_id"), F.col("q").alias("nq"))
            .crossJoin(F.broadcast(q))
            .filter(F.col("n_id") != F.col("q_id"))
            .select(
                "q_id", "n_id",
                F.expr(d2_int_expr("qq", "nq")).alias("d2"),
            )
            .withColumn("rn", w)
            .filter(F.col("rn") <= _K)
            .select("q_id", "n_id", "d2")
        )
        bf = _topk_sets(bf_df)
        assert len(bf) == _NQ and all(len(s) == _K for s in bf.values())
        recalls = {
            nprobe: _recall(
                bf,
                _topk_sets(
                    ivf_kmeans_topk(vecs, _NC, 3, _NQ, _K, nprobe=nprobe)
                ),
            )
            for nprobe in (1, 2, 4, _NC)
        }
        curve = [recalls[n] for n in (1, 2, 4, _NC)]
        assert curve == sorted(curve), f"recall not monotone: {recalls}"
        # Probing every trained cluster IS exhaustive search — rows,
        # not just sets, must match (same metric, same tie-breaks).
        full = {
            (r["q_id"], r["n_id"], r["d2"])
            for r in ivf_kmeans_topk(
                vecs, _NC, 3, _NQ, _K, nprobe=_NC
            ).collect()
        }
        assert full == {
            (r["q_id"], r["n_id"], r["d2"]) for r in bf_df.collect()
        }
        # Measured floors on the sf0.01 embeddings (deterministic
        # quantization + init, so stable).
        assert recalls[1] >= 0.5, recalls
        assert recalls[4] >= 0.7, recalls
    finally:
        vecs.unpersist()


def test_ivf_nprobe_full_equals_bruteforce_rows(spark):
    """At nprobe = n_centroids the per-query result ROWS (ids and
    rounded sims, not just the id sets) must equal the brute-force
    top-k — same ranking window, same tie-breaks."""
    emb = table(spark, SF_CORRECT, "embeddings")
    vecs = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    bf = {
        (r["q_id"], r["n_id"], r["sim"])
        for r in cosine_topk(
            emb.filter(F.col("vec_id") < _NQ), emb, k=_K
        ).collect()
    }
    iv = {
        (r["q_id"], r["n_id"], r["sim"])
        for r in ivf_topk(vecs, _NC, _NQ, _K, nprobe=_NC).collect()
    }
    assert bf == iv


def test_stored_ivf_prunes_unprobed_partitions(spark, tmp_path):
    """The persisted inverted file must enforce O(nprobe·cluster) at
    STORAGE: with 16 cluster directories and one query probing 2, the
    scan plans exactly 2 partitions — and the stored-probe answer
    equals the in-DAG ivf_topk answer row-for-row."""
    import re

    from kcidb_spark.operators.similarity import (
        ivf_parts,
        ivf_rank,
        ivf_topk,
    )

    vecs = spark.range(400).selectExpr(
        "id AS vec_id",
        # (id+1): id=0 would be the all-zero vector (norm 0).
        "transform(sequence(1, 8), i ->"
        " cast(sin((id + 1) * i * 0.7) as double)) AS v",
    )
    n_cents, n_q, k, nprobe = 16, 1, 3, 2
    assign, q_probe = ivf_parts(vecs, n_cents, n_q, nprobe)
    store = str(tmp_path / "ivf")
    assign.write.mode("overwrite").partitionBy("c_id").parquet(store)
    probed = sorted(
        r["c_id"] for r in q_probe.select("c_id").distinct().collect()
    )
    assert len(probed) == nprobe
    members = (
        spark.read.parquet(store)
        .filter(F.col("c_id").isin(probed))
        .select(
            F.col("vec_id").alias("n_id"),
            F.col("c_id").cast("long").alias("c_id"),
            F.col("v").alias("nv"),
            F.col("nrm").alias("nn"),
        )
    )
    got = ivf_rank(members, q_probe, k)
    # The store really has one directory per cluster…
    import os

    dirs = [d for d in os.listdir(store) if d.startswith("c_id=")]
    assert len(dirs) == n_cents
    # …and the scan carries a PARTITION filter (directory-level, not
    # row-level) listing exactly the probed ids — Spark's partition
    # pruning then lists only those directories.
    plan = got._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[c_id#\d+ IN \(([0-9,]+)\)", plan)
    assert m, plan[:2000]
    assert sorted(int(x) for x in m.group(1).split(",")) == probed
    want = {
        tuple(r)
        for r in ivf_topk(vecs, n_cents, n_q, k, nprobe=nprobe).collect()
    }
    assert {tuple(r) for r in got.collect()} == want


def test_pq_trained_codebooks_beat_static_distortion(spark):
    """Lloyd's monotone-distortion guarantee, measured: the trained
    codebooks' total quantization distortion (Σ over (vec, s) of the
    BIGINT d2 to the assigned codeword) must not exceed the STATIC
    codebook's — which is exactly the trainer's round-0 init (the
    first M vectors' subvectors), so this is the distortion row
    VERDICT r9 asked for: trained vs static on the same corpus."""
    from kcidb_spark.operators.clustering import (
        d2_int_expr,
        pq_codebooks_exact,
    )
    from kcidb_spark.queries.advanced import (
        _KM_SCALE,
        _PQK_CODES,
        _PQK_ROUNDS,
        _PQK_SUBDIM,
        _PQK_SUBS,
    )

    emb = table(spark, SF_CORRECT, "embeddings")
    vecs = emb.select(
        F.col("vec_id").alias("id"),
        F.expr(
            "transform(cast(embedding as array<double>),"
            f" x -> cast(floor((x + 1.0D) * {_KM_SCALE}.0D) as bigint))"
        ).alias("q"),
    )
    subs = vecs.select(
        "id",
        F.explode(F.expr(f"sequence(0, {_PQK_SUBS - 1})")).alias("s"),
        "q",
    ).select(
        F.col("s").cast("bigint").alias("s"),
        "id",
        F.expr(f"slice(q, s * {_PQK_SUBDIM} + 1, {_PQK_SUBDIM})").alias("q"),
    ).persist()

    def distortion(books) -> int:
        bdf = spark.createDataFrame(
            books, "s bigint, m bigint, bq array<bigint>"
        )
        return (
            subs.join(F.broadcast(bdf), on="s")
            .select(
                "s", "id", F.expr(d2_int_expr("q", "bq")).alias("d2")
            )
            .groupBy("s", "id")
            .agg(F.min("d2").alias("d2"))
            .agg(F.sum("d2").alias("t"))
            .collect()[0]["t"]
        )

    try:
        static = sorted(
            (r["s"], r["id"], list(r["q"]))
            for r in subs.filter(F.col("id") < _PQK_CODES).collect()
        )
        trained = pq_codebooks_exact(subs, _PQK_CODES, _PQK_ROUNDS)
        d_static = distortion(static)
        d_trained = distortion(trained)
    finally:
        subs.unpersist()
    assert d_trained <= d_static, (d_trained, d_static)
    # And training actually moved the books (the corpus isn't already
    # at a fixed point of its own first-M init).
    assert trained != static
    assert d_trained < d_static


def test_residual_pq_reconstructs_better_than_raw(spark):
    """Why FAISS defaults IVFPQ to residual encoding, measured: total
    reconstruction distortion Σ min-d2 over (vec, subspace) with
    codebooks trained on RESIDUALS (x̂ = centroid + codeword) must
    beat codebooks trained on RAW vectors (x̂ = codeword) — the
    coarse quantizer has already explained the cluster-level
    structure, so residual codewords spend their resolution on the
    remaining displacement.  All BIGINT arithmetic."""
    from kcidb_spark.operators.clustering import (
        d2_int_expr,
        kmeans_centroids_exact,
        pq_codebooks_exact,
    )
    from kcidb_spark.queries.advanced import (
        _IVF_CENTROIDS,
        _KM_ROUNDS,
        _KM_SCALE,
        _PQK_CODES,
        _PQK_ROUNDS,
        _PQK_SUBDIM,
        _PQK_SUBS,
    )

    emb = table(spark, SF_CORRECT, "embeddings")
    vecs = emb.select(
        F.col("vec_id").alias("id"),
        F.expr(
            "transform(cast(embedding as array<double>),"
            f" x -> cast(floor((x + 1.0D) * {_KM_SCALE}.0D) as bigint))"
        ).alias("q"),
    ).persist()

    def subspaces(frame, col):
        return frame.select(
            "id",
            F.explode(F.expr(f"sequence(0, {_PQK_SUBS - 1})")).alias("s"),
            col,
        ).select(
            F.col("s").cast("bigint").alias("s"),
            "id",
            F.expr(
                f"slice({col}, s * {_PQK_SUBDIM} + 1, {_PQK_SUBDIM})"
            ).alias("q"),
        )

    def distortion(subs) -> int:
        books = pq_codebooks_exact(subs, _PQK_CODES, _PQK_ROUNDS)
        bdf = spark.createDataFrame(
            books, "s bigint, m bigint, bq array<bigint>"
        )
        return (
            subs.join(F.broadcast(bdf), on="s")
            .select("s", "id", F.expr(d2_int_expr("q", "bq")).alias("d2"))
            .groupBy("s", "id")
            .agg(F.min("d2").alias("d2"))
            .agg(F.sum("d2").alias("t"))
            .collect()[0]["t"]
        )

    try:
        cents = kmeans_centroids_exact(vecs, _IVF_CENTROIDS, _KM_ROUNDS)
        cdf = spark.createDataFrame(cents, "c_id bigint, cq array<bigint>")
        assign = (
            vecs.crossJoin(F.broadcast(cdf))
            .select(
                "id", "q", "cq",
                F.expr(d2_int_expr("q", "cq")).alias("d2"),
                "c_id",
            )
            .groupBy("id")
            .agg(
                F.min_by("cq", F.struct("d2", "c_id")).alias("cq"),
                F.first("q").alias("q"),
            )
        )
        res = assign.select(
            "id", F.expr("zip_with(q, cq, (a, b) -> a - b)").alias("r")
        )
        raw_subs = subspaces(vecs, "q").persist()
        res_subs = subspaces(res, "r").persist()
        d_raw = distortion(raw_subs)
        d_res = distortion(res_subs)
    finally:
        vecs.unpersist()
    assert d_res < d_raw, (d_res, d_raw)


def test_sq8_adc_tracks_exact_ranking(spark):
    """SQ8's asymmetric distance must track the exact integer distance
    closely enough that the per-cluster top-k barely moves: recall of
    the SQ8 ADC top-k against the EXACT top-k over the SAME candidate
    set (identical probes — isolates quantization loss from IVF loss)
    must clear a measured floor, and dequantization error is bounded
    by construction (|q − c·UP| < UP per dim)."""
    from kcidb_spark.operators.ivf import (
        coarse_assign,
        coarse_probes,
        coarse_score,
    )
    from kcidb_spark.queries.advanced import _SQ_SCALE, _SQ_UP, _KM_SCALE

    emb = table(spark, SF_CORRECT, "embeddings")
    vecs = _quantized(emb).withColumn(
        "c",
        F.expr(
            "transform(cast(q as array<double>),"
            f" x -> cast(floor(x / {_SQ_UP}.0D) as bigint))"
        ),
    )
    # NOTE: codes derived from the fine grid here (floor(q/UP)) equal
    # the registry's floor((x+1)·SQ_SCALE) exactly because the grids
    # nest: floor(floor((x+1)·2^20) / 2^13) = floor((x+1)·2^7).
    cdf = vecs.filter(F.col("id") < _NC).select(
        F.col("id").alias("c_id"), F.col("q").alias("cq")
    )
    scored = coarse_score(vecs, cdf, carry=("q", "c"))
    assign = coarse_assign(scored, carry=("q", "c"))
    probes = coarse_probes(scored, _NQ, 2, carry=("q",))
    cand = (
        assign.select(
            F.col("id").alias("n_id"), "c_id",
            F.col("q").alias("nq"), "c",
        )
        .join(F.broadcast(probes), on="c_id")
        .filter(F.col("n_id") != F.col("q_id"))
    )
    from kcidb_spark.operators.clustering import d2_int_expr

    adc = F.expr(
        f"aggregate(zip_with(q, c, (x, y) -> (x - y * {_SQ_UP})"
        f" * (x - y * {_SQ_UP})), cast(0 as bigint), (acc, x) -> acc + x)"
    )
    w_a = W.partitionBy("q_id").orderBy("adc_d2", "n_id")
    w_e = W.partitionBy("q_id").orderBy("d2", "n_id")
    got_sq = _topk_sets(
        cand.select("q_id", "n_id", adc.alias("adc_d2"))
        .withColumn("rn", F.row_number().over(w_a))
        .filter(F.col("rn") <= _K)
    )
    got_exact = _topk_sets(
        cand.select(
            "q_id", "n_id", F.expr(d2_int_expr("q", "nq")).alias("d2")
        )
        .withColumn("rn", F.row_number().over(w_e))
        .filter(F.col("rn") <= _K)
    )
    r = _recall(got_exact, got_sq)
    # Measured 0.995 on the sf0.01 corpus; 8-bit scalar codes lose
    # almost nothing at k=10 (the reason IVF,SQ8 is FAISS's first
    # suggestion) — floor with margin.
    assert r >= 0.9, r
    assert _SQ_SCALE * _SQ_UP == _KM_SCALE  # the grid-nesting contract


def test_prefix_rerank_recovers_prefix_loss(spark):
    """The Matryoshka shortlist contract: reranking the prefix-dim
    top-R by exact full-dim distance must recover most of what
    prefix-only top-k loses — recall(rerank) ≥ recall(prefix-only),
    strictly greater on this corpus, and rerank's ordering of its
    candidate set is exactly the full-dim ordering (by construction —
    pinned on values, not plans)."""
    from kcidb_spark.operators.clustering import d2_int_expr
    from kcidb_spark.queries.advanced import _MRL_PREFIX

    emb = table(spark, SF_CORRECT, "embeddings")
    vecs = _quantized(emb).withColumn(
        "qp", F.expr(f"slice(q, 1, {_MRL_PREFIX})")
    )
    queries = vecs.filter(F.col("id") < _NQ).select(
        F.col("id").alias("q_id"),
        F.col("q").alias("qq"),
        F.col("qp").alias("qqp"),
    )
    joined = (
        vecs.crossJoin(F.broadcast(queries))
        .filter(F.col("id") != F.col("q_id"))
        .select(
            "q_id", F.col("id").alias("n_id"), "q", "qq",
            F.expr(d2_int_expr("qqp", "qp")).alias("d2p"),
            F.expr(d2_int_expr("qq", "q")).alias("d2f"),
        )
    )
    w_p = W.partitionBy("q_id").orderBy("d2p", "n_id")
    w_f = W.partitionBy("q_id").orderBy("d2f", "n_id")
    exact = _topk_sets(
        joined.withColumn("rn", F.row_number().over(w_f))
        .filter(F.col("rn") <= _K)
    )
    prefix_only = _topk_sets(
        joined.withColumn("rn", F.row_number().over(w_p))
        .filter(F.col("rn") <= _K)
    )
    # Rerank: prefix top-5K shortlist, full-dim top-K inside it.
    shortlist = joined.withColumn(
        "rn", F.row_number().over(w_p)
    ).filter(F.col("rn") <= 5 * _K)
    rerank = _topk_sets(
        shortlist.withColumn("rk", F.row_number().over(w_f))
        .filter(F.col("rk") <= _K)
    )
    r_prefix = _recall(exact, prefix_only)
    r_rerank = _recall(exact, rerank)
    assert r_rerank >= r_prefix, (r_rerank, r_prefix)
    assert r_rerank > r_prefix  # measured: strict on this corpus
    # Honest context for the absolute level: the synthetic embeddings
    # are ISOTROPIC random vectors — the worst case for prefix
    # truncation (each dim carries 1/64 of the variance, so a 16-dim
    # prefix explains 25% of distance).  MRL-TRAINED embeddings
    # front-load variance and sit near 0.95+ at this R; here the
    # measured points are prefix-only 0.135 → rerank@50 0.49, and the
    # pin is the RECOVERY property plus a floor with margin, not a
    # trained-embedding aspiration.
    assert r_rerank >= 0.35, r_rerank  # measured 0.49


def test_rotation_is_orthogonal(spark):
    """The rotated-PQ entry's two Givens layers must preserve L2
    norms (orthogonality — each 2x2 block is a 3-4-5 rotation), so
    distances in the rotated space ARE the true distances and the
    PQ approximation quality claim carries over unchanged."""
    from kcidb_spark.queries.advanced import _rot_expr

    emb = table(spark, SF_CORRECT, "embeddings")
    layer2, layer1 = _rot_expr("_e0")
    checked = (
        emb.select(
            F.expr("cast(embedding as array<double>)").alias("_e0")
        )
        .withColumn("_e1", F.expr(layer1))
        .withColumn("_e2", F.expr(layer2))
        .select(
            F.expr(
                "aggregate(_e0, 0.0D, (a, x) -> a + x * x)"
            ).alias("n0"),
            F.expr(
                "aggregate(_e2, 0.0D, (a, x) -> a + x * x)"
            ).alias("n2"),
        )
        .select(F.max(F.abs(F.col("n0") - F.col("n2"))).alias("err"))
        .collect()[0]["err"]
    )
    assert checked < 1e-12, checked
