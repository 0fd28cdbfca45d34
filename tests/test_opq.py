"""OPQ property harness (VERDICT r11 #7): what the hash gate cannot
check about a LEARNED rotation, pinned as properties instead —
exactly the reference-trainer-equivalence posture of the BPE/unigram
entries.

* the learned matrix is orthogonal (a Procrustes solve returns U·Vᵀ;
  a bug in the Gram accumulation or the SVD orientation breaks this
  first);
* distortion is measured per iteration and keep-best GUARANTEES the
  learned rotation never quantizes worse than its init — the fixed
  3-4-5 Givens rotation the hash-certified ivf_pq_rotated entry uses
  (operators/opq.givens_rotation is bit-compatible with
  queries/advanced._rot_expr, pinned below);
* on this corpus the alternation actually LEARNS (strict distortion
  improvement over the fixed rotation — the trained<static precedent
  of test_ann_recall.py);
* recall@k of the end-to-end registered entry vs the exact L2 oracle
  holds a measured floor (rotations preserve L2, so raw-space exact
  top-k is the right baseline for rotated-space ADC).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from kcidb_spark.operators.opq import givens_rotation, opq_train, rotate
from kcidb_spark.tables import table
from tests.conftest import SF_SMOKE

_SUBS, _SUBDIM, _CODES, _ROUNDS = 8, 8, 8, 2
_D = _SUBS * _SUBDIM


def _vecs(spark):
    emb = table(spark, SF_SMOKE, "embeddings")
    return emb.select(
        F.col("vec_id").alias("id"),
        F.expr("cast(embedding as array<double>)").alias("x"),
    )


@pytest.fixture(scope="module")
def trained(spark):
    vecs = _vecs(spark).persist()
    try:
        return opq_train(
            vecs, _SUBS, _SUBDIM, _CODES,
            lloyd_rounds=_ROUNDS, iters=3,
            r_init=givens_rotation(_D),
        )
    finally:
        vecs.unpersist()


def test_givens_matrix_matches_certified_rotation_expr(spark):
    """The matrix form of the fixed rotation must reproduce the SQL
    expression the hash-certified ivf_pq_rotated entry applies — it
    is the comparison baseline, so drift here voids the distortion
    guarantee."""
    from kcidb_spark.queries.advanced import _rot_expr

    vecs = _vecs(spark).limit(5)
    layer2, layer1 = _rot_expr("x")
    sql = {
        r["id"]: np.array(r["r"])
        for r in vecs.withColumn("_e1", F.expr(layer1))
        .withColumn("r", F.expr(layer2))
        .select("id", "r")
        .collect()
    }
    mat = rotate(vecs, givens_rotation(_D), "x", "xr").select(
        "id", "xr"
    ).collect()
    for r in mat:
        assert np.abs(sql[r["id"]] - np.array(r["xr"])).max() < 1e-12


def test_learned_rotation_is_orthogonal(trained):
    r_learned, _books, _hist = trained
    rn = np.array(r_learned)
    assert np.abs(rn @ rn.T - np.eye(_D)).max() < 1e-9


def test_distortion_never_worse_than_fixed_and_actually_learns(trained):
    """history[0] IS the fixed Givens rotation's distortion (same
    float Lloyd, same rounds); keep-best bounds the learned result by
    it unconditionally, and on this corpus the Procrustes alternation
    must deliver a strict measurable win (measured ~11% at sf0.001 —
    pinned at ≥3% so a silently broken Gram/SVD step fails loudly
    while noise doesn't)."""
    _r, _books, hist = trained
    assert len(hist) == 3
    best = min(hist)
    assert best <= hist[0]
    assert best < 0.97 * hist[0], hist


def test_codebooks_shape(trained):
    _r, books, _hist = trained
    assert {(s, m) for s, m, _ in books} == {
        (s, m) for s in range(_SUBS) for m in range(_CODES)
    }
    assert all(len(bq) == _SUBDIM for _, _, bq in books)


def test_registered_entry_shape(spark):
    """The rows-only registry entry's stable contract: declared
    schema, exactly queries × k rows, ranks 1..k per query."""
    from kcidb_spark.cache import release_persisted
    from kcidb_spark.queries import REGISTRY
    from kcidb_spark.queries.advanced import _IVF_K, _IVF_QUERIES

    got = REGISTRY["opq_adc_topk"].spark(spark, SF_SMOKE)
    try:
        rows = got.collect()
    finally:
        release_persisted()
    assert got.columns == ["q_id", "n_id", "rk"]
    assert len(rows) == _IVF_QUERIES * _IVF_K
    per_q: dict[int, list[int]] = {}
    for r in rows:
        per_q.setdefault(r["q_id"], []).append(r["rk"])
    assert set(per_q) == set(range(_IVF_QUERIES))
    assert all(
        sorted(rks) == list(range(1, _IVF_K + 1)) for rks in per_q.values()
    )


def _exact_l2_sets(spark, vecs, nq: int, k: int) -> dict[int, set[int]]:
    q = vecs.filter(F.col("id") < nq).select(
        F.col("id").alias("q_id"), F.col("x").alias("qx")
    )
    d2 = (
        "aggregate(zip_with(x, qx, (a, b) -> (a - b) * (a - b)),"
        " cast(0 as double), (acc, v) -> acc + v)"
    )
    w = W.partitionBy("q_id").orderBy("d2", "n_id")
    rows = (
        vecs.crossJoin(F.broadcast(q))
        .filter(F.col("id") != F.col("q_id"))
        .select("q_id", F.col("id").alias("n_id"), F.expr(d2).alias("d2"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .collect()
    )
    out: dict[int, set[int]] = {}
    for r in rows:
        out.setdefault(r["q_id"], set()).add(r["n_id"])
    return out


def _adc_sets(spark, vecs, r_mat, books, nq: int, k: int):
    from kcidb_spark.operators.ivf import pq_assign_codes, subvectors
    from kcidb_spark.operators.opq import d2_float_expr

    xr = rotate(vecs, r_mat, "x", "q").select("id", "q")
    subs = subvectors(xr, ("id",), "q", _SUBS, _SUBDIM)
    bdf = spark.createDataFrame(books, "s bigint, m bigint, bq array<double>")
    scored = subs.join(F.broadcast(bdf), on="s").select(
        "s", "id", "q", "m",
        F.expr(d2_float_expr("q", "bq")).alias("d2"),
    ).persist()
    try:
        codes = pq_assign_codes(scored)
        dt = scored.filter(F.col("id") < nq).select(
            F.col("id").alias("q_id"), "s", "m", F.col("d2").alias("d")
        )
        w = W.partitionBy("q_id").orderBy("adc", "n_id")
        rows = (
            codes.withColumnRenamed("id", "n_id")
            .join(F.broadcast(dt), on=["s", "m"])
            .filter(F.col("n_id") != F.col("q_id"))
            .groupBy("q_id", "n_id")
            .agg(F.sum("d").alias("adc"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .collect()
        )
    finally:
        scored.unpersist()
    out: dict[int, set[int]] = {}
    for r in rows:
        out.setdefault(r["q_id"], set()).add(r["n_id"])
    return out


def test_recall_vs_exact_holds_and_learned_not_worse(spark, trained):
    """Recall@10 vs the exact squared-L2 oracle (rotations preserve
    L2, so raw-space exact top-k is the right baseline for
    rotated-space ADC).  8 codes × 8 subspaces is a deliberately
    coarse quantizer — measured: fixed 0.30, learned 0.34 at
    sf0.001 — so the pins are (a) a floor with margin and (b) the
    OPQ-specific claim: the LEARNED rotation's recall never craters
    below the fixed rotation it initialized from (small slack for
    float-ordering rank ties near the k boundary)."""
    from kcidb_spark.operators.opq import pq_codebooks_float
    from kcidb_spark.operators.ivf import subvectors

    nq, k = 5, 10
    r_learned, books_l, _hist = trained
    vecs = _vecs(spark).persist()
    try:
        exact = _exact_l2_sets(spark, vecs, nq, k)
        r0 = givens_rotation(_D)
        subs0 = subvectors(
            rotate(vecs, r0, "x", "q").select("id", "q"),
            ("id",), "q", _SUBS, _SUBDIM,
        ).persist()
        try:
            books_0 = pq_codebooks_float(subs0, _CODES, _ROUNDS)
        finally:
            subs0.unpersist()

        def recall(got):
            return sum(
                len(exact[qid] & got.get(qid, set())) / len(exact[qid])
                for qid in exact
            ) / len(exact)

        rec_fixed = recall(_adc_sets(spark, vecs, r0, books_0, nq, k))
        rec_learned = recall(
            _adc_sets(spark, vecs, r_learned, books_l, nq, k)
        )
    finally:
        vecs.unpersist()
    assert rec_learned >= 0.2, (rec_learned, rec_fixed)
    assert rec_learned >= rec_fixed - 0.1, (rec_learned, rec_fixed)
