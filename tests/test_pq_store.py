"""PQ-compressed serving store lifecycle (VERDICT r13 "Next round"
#1) — the raw store's pins ported to the compressed domain:

* PROBE INVARIANCE MID-SWAP: a retrain that crashes before its
  manifest publish leaves every probe byte-identical — old codes, old
  centroids, old CODEBOOKS (the swap covers two quantizers, not one);
* deletes hide a vector from the codes probe at the delete's
  watermark; as_of replays historical visibility; replay of the
  retrain is idempotent and an OLDER replay is rejected;
* probes NEVER read the cold raw tier (plan-asserted);
* GC reclaims folded batch subtrees in BOTH tiers plus superseded
  generations.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row

from kcidb_spark.queries.streaming_exec import (
    delete_vec_batch_txn,
    ingest_pq_batch_txn,
    init_pq_store,
    probe_pq_topk,
    read_serve_manifest,
    retrain_pq_store_txn,
    serve_store_gc,
)

#: 2-D toy geometry on the integer grid: 2 subspaces of 1 dim each.
SUBS, SUBDIM = 2, 1
#: Generation-0 coarse routing table: the axes.
INIT_CENTS = [(0, [100, 0]), (1, [0, 100])]
#: Generation-0 codebooks: per-subspace codewords {0, 100}-ish.
INIT_BOOKS = [
    (0, 0, [100]), (0, 1, [0]),
    (1, 0, [0]), (1, 1, [100]),
]

POINTS = {0: (90, 10), 1: (10, 90), 2: (95, 5), 3: (5, 95), 4: (80, 20)}


def _qvecs(spark, ids_and_points):
    return spark.createDataFrame(
        [
            Row(vec_id=i, q=[int(x), int(y)])
            for i, (x, y) in ids_and_points
        ],
        "vec_id long, q array<bigint>",
    )


def _probe(spark, store, qs=((100, (100, 10)),), k=4, as_of=None):
    return sorted(
        (r["probe_round"], r["q_id"], r["n_id"], r["adc_micro"], r["rk"])
        for r in probe_pq_topk(
            _qvecs(spark, qs), store, k, as_of=as_of
        ).collect()
    )


def _build(spark, store):
    init_pq_store(store, INIT_CENTS, INIT_BOOKS, SUBS, SUBDIM)
    ingest_pq_batch_txn(
        _qvecs(spark, [(0, POINTS[0]), (1, POINTS[1]), (3, POINTS[3])]),
        store, 0,
    )
    ingest_pq_batch_txn(
        _qvecs(spark, [(2, POINTS[2]), (4, POINTS[4])]), store, 1
    )


def test_pq_probe_serves_codes_not_raw(spark, tmp_path):
    """Candidates score by codeword distance (ADC), and the probe's
    plan never touches the cold raw tier."""
    store = str(tmp_path / "store")
    _build(spark, store)
    df = probe_pq_topk(_qvecs(spark, [(100, (100, 10))]), store, 4)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert f"{os.sep}raw" not in plan
    rows = _probe(spark, store)
    # x-axis-ish vectors 0,2,4 all encode to codeword (100, 0):
    # identical codes => identical ADC distance, rank ties by n_id.
    by_rank = [r[2] for r in sorted(rows, key=lambda r: r[4])]
    assert by_rank[:3] == [0, 2, 4]
    d = {r[2]: r[3] for r in rows}
    assert d[0] == d[2] == d[4]


def test_pq_retrain_mid_swap_invariance_and_replay(spark, tmp_path):
    store = str(tmp_path / "store")
    _build(spark, store)
    before = _probe(spark, store)

    # Crash before the publish: generation dir exists, probes serve
    # the OLD model and codes byte-identically.
    retrain_pq_store_txn(spark, store, 2, 2, 2,
                         fail_before_manifest=True)
    assert os.path.isdir(os.path.join(store, "gen_pq_1"))
    assert _probe(spark, store) == before
    man = read_serve_manifest(store)
    assert man.get("compacted_upto", -1) == -1
    assert man["centroid_gen"] == 0

    # Replay completes: model gen advances, fold point = wm, and the
    # probe now serves the re-encoded generation.
    retrain_pq_store_txn(spark, store, 2, 2, 2)
    man = read_serve_manifest(store)
    assert man["centroid_gen"] == 1
    assert man["compacted_upto"] == 1
    assert man["compacted_dir"] == "gen_pq_1"
    after = _probe(spark, store)
    assert {r[2] for r in after} <= set(POINTS)

    # Idempotent replay: same transaction, same results.
    retrain_pq_store_txn(spark, store, 2, 2, 2)
    assert _probe(spark, store) == after
    assert read_serve_manifest(store)["centroid_gen"] == 2  # replay
    # (the re-run is a NEW retrain over identical visibility — the
    # generation is re-derived, so results must not move)


def test_pq_tail_after_retrain_and_deletes(spark, tmp_path):
    store = str(tmp_path / "store")
    _build(spark, store)
    retrain_pq_store_txn(spark, store, 2, 2, 2)

    # A batch ingested AFTER the retrain is encoded under the NEW
    # model and served alongside the generation.
    ingest_pq_batch_txn(_qvecs(spark, [(7, (85, 15))]), store, 2)
    rows = _probe(spark, store, k=6)
    assert 7 in {r[2] for r in rows}

    # One delete transaction hides the vector at its watermark...
    ids = spark.createDataFrame([Row(vec_id=0)], "vec_id long")
    delete_vec_batch_txn(spark, ids, store, 3)
    now = _probe(spark, store, k=6)
    assert 0 not in {r[2] for r in now}
    # ...and an as_of read BEFORE the delete still serves it.
    past = _probe(spark, store, k=6, as_of=2)
    assert 0 in {r[2] for r in past}


def test_pq_as_of_before_fold_raises(spark, tmp_path):
    store = str(tmp_path / "store")
    _build(spark, store)
    retrain_pq_store_txn(spark, store, 2, 2, 2)
    with pytest.raises(ValueError, match="predates the compacted"):
        _probe(spark, store, as_of=0)
    with pytest.raises(ValueError, match="exceeds the committed"):
        _probe(spark, store, as_of=9)


def test_pq_gc_reclaims_both_tiers(spark, tmp_path):
    store = str(tmp_path / "store")
    _build(spark, store)
    retrain_pq_store_txn(spark, store, 2, 2, 2)
    before = _probe(spark, store)
    deleted = serve_store_gc(store)
    assert any(os.sep + "data" + os.sep in d for d in deleted)
    assert any(os.sep + "raw" + os.sep in d for d in deleted)
    assert not os.path.isdir(os.path.join(store, "data", "batch_id=0"))
    assert not os.path.isdir(os.path.join(store, "raw", "batch_id=1"))
    assert _probe(spark, store) == before

    # A second retrain supersedes gen_pq_1; GC reclaims it.
    ingest_pq_batch_txn(_qvecs(spark, [(7, (85, 15))]), store, 2)
    retrain_pq_store_txn(spark, store, 2, 2, 2)
    deleted = serve_store_gc(store)
    assert os.path.join(store, "gen_pq_1") in deleted
    assert not os.path.isdir(os.path.join(store, "gen_pq_1"))


def test_pq_reingest_serves_newest_copy(spark, tmp_path):
    """Last-write-wins in the compressed domain: a re-ingested vector
    consumes ONE candidate slot and serves its newest codes."""
    store = str(tmp_path / "store")
    _build(spark, store)
    # vec 0 moves to the y-cluster in batch 2 (changed vector).
    ingest_pq_batch_txn(_qvecs(spark, [(0, (10, 90))]), store, 2)
    rows = _probe(spark, store, qs=((100, (10, 95)),), k=6)
    seen = [r[2] for r in rows]
    assert seen.count(0) == 1
    d = {r[2]: r[3] for r in rows}
    # The y-cluster query now finds vec 0 at the y-codeword's
    # distance — equal to the other y-members' (1, 3), not the old
    # x-copy's.
    assert d[0] == d[1] == d[3]


def test_retrain_empty_store_is_noop_and_degenerate_raises(spark, tmp_path):
    """An empty store retrains as a NO-OP (nothing visible to
    re-encode; the old model keeps serving — born-empty contract); a
    NON-empty corpus whose sample can't seed the trainers (no ids
    < k — the oracle-replayable init rule) must raise rather than
    publish an empty model that bricks every probe."""
    from pyspark.sql import Row

    def _qvecs(rows):
        return spark.createDataFrame(
            [Row(vec_id=i, q=list(map(int, p))) for i, p in rows],
            "vec_id long, q array<bigint>",
        )

    store = str(tmp_path / "empty")
    init_pq_store(store, INIT_CENTS, INIT_BOOKS, SUBS, SUBDIM)
    before = read_serve_manifest(store)
    retrain_pq_store_txn(spark, store, 2, 2, 2)  # no-op, no raise
    after = read_serve_manifest(store)
    assert after["centroids"] == before["centroids"]
    assert after.get("centroid_gen", 0) == before.get("centroid_gen", 0)

    deg = str(tmp_path / "degenerate")
    init_pq_store(deg, INIT_CENTS, INIT_BOOKS, SUBS, SUBDIM)
    ingest_pq_batch_txn(_qvecs([(10, (90, 10)), (11, (10, 90))]), deg, 0)
    with pytest.raises(ValueError, match="degenerate"):
        retrain_pq_store_txn(spark, deg, 2, 2, 2)
    # The store still serves under the OLD model after the refusal.
    assert "centroids" in read_serve_manifest(deg)


def test_pq_compact_folds_tombstones_and_gc(spark, tmp_path):
    """PQ compaction (VERDICT r14 #1): fold batches + tombstones into
    one code generation WITHOUT re-encoding — probes are byte-
    invariant across the crash window, the swap, and GC; spent
    tombstone subtrees are reclaimed."""
    from kcidb_spark.queries.streaming_exec import compact_pq_store_txn

    store = str(tmp_path / "store")
    _build(spark, store)
    ids = spark.createDataFrame([Row(vec_id=0)], "vec_id long")
    delete_vec_batch_txn(spark, ids, store, 2)
    before = _probe(spark, store, k=6)
    assert 0 not in {r[2] for r in before}

    # Crash before the swap: generation dir exists, probes unchanged,
    # manifest untouched.
    compact_pq_store_txn(spark, store, 2, fail_before_manifest=True)
    assert os.path.isdir(os.path.join(store, "gen_pqc_2", "codes"))
    assert _probe(spark, store, k=6) == before
    assert read_serve_manifest(store).get("compacted_upto", -1) == -1

    # Replay completes: fold point advances, model untouched
    # (compaction never touches the quantizers), probes unchanged.
    compact_pq_store_txn(spark, store, 2)
    man = read_serve_manifest(store)
    assert man["compacted_upto"] == 2
    assert man["compacted_dir"] == "gen_pqc_2"
    assert man["centroid_gen"] == 0
    assert _probe(spark, store, k=6) == before

    # GC reclaims folded batches in BOTH tiers AND the spent
    # tombstone subtree; probes still unchanged.
    deleted = serve_store_gc(store)
    assert any(os.sep + "tombstones" + os.sep in d for d in deleted)
    assert not os.path.isdir(os.path.join(store, "data", "batch_id=0"))
    assert not os.path.isdir(os.path.join(store, "raw", "batch_id=1"))
    assert not os.path.isdir(
        os.path.join(store, "tombstones", "batch_id=2")
    )
    assert _probe(spark, store, k=6) == before

    # The folded generation serves re-ingests last-write-wins: a new
    # tail batch over the generation still resolves newest-copy.
    ingest_pq_batch_txn(_qvecs(spark, [(2, (10, 90))]), store, 3)
    rows = _probe(spark, store, qs=((100, (10, 95)),), k=6)
    d = {r[2]: r[3] for r in rows}
    assert d[2] == d[1] == d[3]  # vec 2 now at the y codeword


def test_pq_compact_then_compact_supersedes_generation(spark, tmp_path):
    """A second PQ compaction folds {previous generation + tail} and
    GC reclaims the superseded generation dir."""
    from kcidb_spark.queries.streaming_exec import compact_pq_store_txn

    store = str(tmp_path / "store")
    _build(spark, store)
    compact_pq_store_txn(spark, store, 1)
    ingest_pq_batch_txn(_qvecs(spark, [(7, (85, 15))]), store, 2)
    before = _probe(spark, store, k=6)
    assert 7 in {r[2] for r in before}
    compact_pq_store_txn(spark, store, 2)
    assert _probe(spark, store, k=6) == before
    deleted = serve_store_gc(store)
    assert os.path.join(store, "gen_pqc_1") in deleted
    assert not os.path.isdir(os.path.join(store, "gen_pqc_1"))
    assert _probe(spark, store, k=6) == before


def test_pq_compact_older_replay_rejected(spark, tmp_path):
    """An OLDER compaction replay (fold point behind the manifest) is
    skipped wholesale — the torn-replay guard covers the PQ fold."""
    from kcidb_spark.queries.streaming_exec import compact_pq_store_txn

    store = str(tmp_path / "store")
    _build(spark, store)
    compact_pq_store_txn(spark, store, 1)
    before = _probe(spark, store, k=6)
    compact_pq_store_txn(spark, store, 0)  # stale replay
    man = read_serve_manifest(store)
    assert man["compacted_upto"] == 1
    assert man["compacted_dir"] == "gen_pqc_1"
    assert _probe(spark, store, k=6) == before
