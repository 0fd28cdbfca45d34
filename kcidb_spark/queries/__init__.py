"""Oracle-checked query registry.

Each query is registered with a Spark implementation plus (usually) an
equivalent DuckDB-runnable ANSI SQL oracle.  The driver's correctness
gate runs both at sf=0.01 and compares row count + schema + an
order-insensitive value hash — so every implementation here is written
for *bit-identical* results across engines (see ``_exact``).
"""

from __future__ import annotations

from kcidb_spark.queries.registry import REGISTRY, Query, register  # noqa: F401

# Importing the modules populates REGISTRY via @register decorators.
from kcidb_spark.queries import relational  # noqa: F401,E402
from kcidb_spark.queries import pipeline  # noqa: F401,E402
from kcidb_spark.queries import advanced  # noqa: F401,E402
from kcidb_spark.queries import temporal  # noqa: F401,E402
from kcidb_spark.queries import kcidb_domain  # noqa: F401,E402
from kcidb_spark.queries import coverage  # noqa: F401,E402
from kcidb_spark.queries import ranking  # noqa: F401,E402
from kcidb_spark.queries import mixing  # noqa: F401,E402
from kcidb_spark.queries import integrity  # noqa: F401,E402
from kcidb_spark.queries import lm  # noqa: F401,E402
from kcidb_spark.queries import dsir  # noqa: F401,E402
from kcidb_spark.queries import streaming_exec  # noqa: F401,E402


#: Queries the driver gate should certify first this round (never yet
#: hash-certified in any CORRECTNESS_r*.json); the rest follow so the
#: 50-row gate window rotates across rounds until every query has a
#: driver-certified row.
_GATE_PRIORITY = (
    # Round-11 additions — never yet certified by the driver gate.
    "ann_ivf_sq8_adc_topk",
    "ann_prefix_rerank_topk",
    "ivf_pq_rotated_adc_topk",
    "dedup_incremental_neardup",
    "pipeline_ingest_corpus",
    "corpus_unimax_budget",
    "t19_stream_ann_probe",
    "t20_stream_ivf_ingest",
    "dedup_soft_weights",
    # Earlier priority tail (kept for the uncertified filter).
    "ivf_pq_kmeans_adc_topk",
    "t18_stream_join_rocksdb",
    "hilbert_key_assign",
    "ivf_pq_residual_adc_topk",
    "t11_stream_tumbling",
    "t12_stream_dedup",
    "t13_stream_stream_join",
    "q7_nation_volume",
    "q13_order_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q17_small_quantity",
    "q18_large_volume",
    "q22_idle_customers",
    "f_array_hof",
    "u4_multiset_ops",
    "u5_union_by_name",
    "w_lead_lag_gaps",
    "w_ntile_quartiles",
    "w_value_picks",
    "w_rank_ratios",
    "w_range_frame_sum",
    "tfidf_top_terms",
    "semdedup_prune",
    "ivf_pq_adc_topk",
    "seq_pack_windows",
    "pipeline_assemble_corpus",
    "multimodal_features",
)


#: Certified queries whose implementation changed since their last
#: gate-of-record row — force a re-check at the head of the next gate
#: window instead of waiting for the rotation to come around.
_GATE_RECHECK = (
    # Round 11, block 1 — implementations CHANGED this round and must
    # re-certify: the six selection gates moved onto the FUSED
    # single-aggregation rank plan with tie-aware hot-bucket
    # sub-splitting (operators/rank.py, VERDICT r10 #1a/#5), and
    # lm_surprisal_filter / pipeline_select_corpus additionally share
    # the session-keyed doc_surprisal score cache (#1b).
    "lm_surprisal_filter",
    "quality_percentile_filter",
    "dsir_select_per_source",
    "dsir_gumbel_sample",
    "pipeline_select_corpus",
    "pipeline_assemble_corpus",
    # t15 gained the map-side (user, time-bucket) transition
    # pre-reduction (the hot-key mitigation, VERDICT r10 #3).
    "t15_stream_status_transitions",
    # The three trained-ANN entries now reuse a session-cached coarse
    # quantizer (#2), and the stored-probe/fingerprint indexes moved
    # to full-path-hash store keys (ADVICE r10).
    "ann_ivf_kmeans_topk",
    "ivf_pq_kmeans_adc_topk",
    "ivf_pq_residual_adc_topk",
    "ann_ivf_stored_probe",
    "fpindex_build",
    "dedup_incremental_indexed",
    # Block 2 — the STALEST certified slice (gate-of-record rows from
    # r4/r5/r7: the pattern chain, the early streaming family, the r4
    # scalar-function goldens), so nothing stays certified-but-
    # unchecked for more than ~4 rounds (VERDICT r10 #6).
    "j4_pattern_chain",
    "t11_stream_tumbling",
    "t12_stream_dedup",
    "t13_stream_stream_join",
    "t14_stream_dedup_watermarked",
    "a5_object_counts",
    "a13_distinct_rollup",
    "a14_culprit_partition",
    "f6_uri_encode_golden",
    "f13_notification_id",
    "f16_nul_guard",
)


def _certified_names() -> tuple[set[str], int]:
    """(names hash-certified by any prior driver run, #correctness files).

    The driver's gate caps at 50 rows per round; sorting uncertified
    queries first makes the window rotate so every registry entry
    eventually gets a gate-of-record row.  The file count doubles as a
    deterministic per-round rotation index for re-checking certified
    queries (see ``_gate_order``).
    """
    import json
    from pathlib import Path

    root = Path(__file__).resolve().parents[2]
    seen: set[str] = set()
    paths = sorted(root.glob("CORRECTNESS_r*.json"))
    for path in paths:
        try:
            rows = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if isinstance(row, dict) and row.get("hash_match") is True:
                seen.add(name)
    return seen, len(paths)


def _gate_order() -> list[str]:
    """Registry names: uncertified first (priority set leading), then
    the already-certified queries ROTATED by round so the tail of the
    50-row gate window re-verifies a different certified slice each
    round (a certified query is not immune to regression — e.g. a
    shared-helper change can silently break a query last checked
    rounds ago)."""
    certified, n_rounds = _certified_names()
    names = list(REGISTRY)
    prio = [n for n in _GATE_PRIORITY if n in REGISTRY and n not in certified]
    recheck = [
        n
        for n in _GATE_RECHECK
        if n in REGISTRY and n in certified and n not in prio
    ]
    rest_new = [n for n in names if n not in certified and n not in prio]
    done = [n for n in names if n in certified and n not in recheck]
    if done:
        # ~37 certified re-checks fit per 50-row window; stepping by 37
        # per correctness file cycles the whole certified set in ~3
        # rounds.  Deterministic: depends only on committed artifacts.
        off = (n_rounds * 37) % len(done)
        done = done[off:] + done[:off]
    return prio + recheck + rest_new + done


def spark_queries():
    """name -> callable(spark, sf_dir) -> DataFrame, for __spark_entry__."""
    return {name: REGISTRY[name].spark for name in _gate_order()}


def oracle_sqls():
    """name -> DuckDB SQL string, for __spark_entry__ (SQL-expressible only)."""
    return {
        name: REGISTRY[name].oracle
        for name in _gate_order()
        if REGISTRY[name].oracle is not None
    }
