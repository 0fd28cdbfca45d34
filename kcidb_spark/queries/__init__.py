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
from kcidb_spark.queries import quality_clf  # noqa: F401,E402


#: Queries the driver gate should certify first this round (never yet
#: hash-certified in any CORRECTNESS_r*.json); the rest follow so the
#: 50-row gate window rotates across rounds until every query has a
#: driver-certified row.
_GATE_PRIORITY = (
    # Round-15 additions — never yet certified by the driver gate.
    # (r14's ten priority entries all certified in the r14 window;
    # the satisfied head is pruned each round — VERDICT r11 #8.)
    "ivfpq_store_serve_with_deletes",
    "opq_store_serve",
    "ivfpq_store_compact_serve",
)


#: Certified queries whose implementation changed since their last
#: gate-of-record row — force a re-check at the head of the next gate
#: window instead of waiting for the rotation to come around.
#: Since r13 this list is COMPUTED from implementation hashes
#: (see :func:`_stale_certified` / kcidb_spark/queries/impl_hash.py);
#: the manual tuple remains as an escape hatch for semantic staleness
#: no source hash can see (e.g. an input-data contract change).
_GATE_RECHECK = (
    # Round 15: the ENTIRE pre-r10 gate-of-record tail (VERDICT r14
    # "Next round" #3) — 29 r8-certified entries first, then the 17
    # r9 slice, so after this window every entry's gate-of-record is
    # ≤5 rounds old.  r14's nine-entry slice all re-certified in the
    # r14 window (judge-verified) and is pruned.
    # r8-certified:
    "a16_unpivot",
    "a17_grouping_sets",
    "a18_robust_stats",
    "ann_ivf_nprobe_topk",
    "f_agg_predicates",
    "f_array_hof",
    "ivf_pq_adc_nprobe_topk",
    "j6_full_outer_reconcile",
    "o7_null_semantics",
    "p5_empty_idset",
    "p8_map_explode",
    "q10_returned_items",
    "q13_order_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q17_small_quantity",
    "q18_large_volume",
    "q1_pricing_summary",
    "q22_idle_customers",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q7_nation_volume",
    "shard_global_shuffle",
    "u4_multiset_ops",
    "u5_union_by_name",
    "w_ntile_quartiles",
    "w_range_frame_sum",
    "w_rank_ratios",
    "w_value_picks",
    # r9-certified:
    "a11_cube_rollup",
    "a1_revision_rollup",
    "a9_pivot_status",
    "ann_lsh_multiprobe_topk",
    "constraints_check",
    "f12_regex_extract",
    "f8_date_extract",
    "f_scalar_suite",
    "j2_not_exists_anti",
    "j3_closure_parents_children",
    "o3_topk_orders",
    "q6_forecast_revenue",
    "split_leakage_safe",
    "u3_except",
    "w_running_total",
    "w_sessionize",
    "zorder_key_assign",
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


def _stale_certified(
    certified: set[str], recorded: dict | None = None
) -> list[str]:
    """Certified queries whose CURRENT implementation hash differs
    from the hash recorded at their last certification
    (GATE_HASHES.json, refreshed each round by
    tools/update_gate_hashes.py) — auto-detected gate staleness
    (VERDICT r12 #5).  Ordered: own-function-body changes first, then
    module/helper-neighborhood changes; names absent from the record
    (never hashed) sort last within their class.  Failure mode is
    safe-side: a missing/corrupt record or an over-broad module edit
    only ADDS re-check rows."""
    import json
    from pathlib import Path

    from kcidb_spark.queries.impl_hash import impl_hashes

    if recorded is None:
        rec_path = (
            Path(__file__).resolve().parents[2] / "GATE_HASHES.json"
        )
        try:
            recorded = json.loads(rec_path.read_text())
        except (OSError, ValueError):
            return []
    fn_changed, env_changed, unrecorded = [], [], []
    for name in REGISTRY:
        if name not in certified:
            continue
        if name not in recorded:
            # Certified but never hashed (tool not run / crashed
            # before the write): flag SAFE-SIDE, last within the
            # stale class — otherwise a later edit to such a query
            # would be invisible to auto-detection.
            unrecorded.append(name)
            continue
        fn_h, env_h = impl_hashes(REGISTRY[name].spark)
        if recorded[name].get("fn") != fn_h:
            fn_changed.append(name)
        elif recorded[name].get("env") != env_h:
            env_changed.append(name)
    return fn_changed + env_changed + unrecorded


def _stale_strong(certified: set[str]) -> list[str]:
    """Only the OWN-FUNCTION-BODY hash mismatches — the high-signal
    stale class (the query's own code changed).  Module-neighborhood
    (env) mismatches over-flag entire modules on any edit; when a
    round edits a 40-entry module, ranking all of them ahead of the
    curated recheck slice starves the explicitly-wanted rows out of
    the 50-row window (round 14's lesson: 93 env-stale entries)."""
    import json
    from pathlib import Path

    from kcidb_spark.queries.impl_hash import impl_hashes

    rec_path = Path(__file__).resolve().parents[2] / "GATE_HASHES.json"
    try:
        recorded = json.loads(rec_path.read_text())
    except (OSError, ValueError):
        return []
    out = []
    for name in REGISTRY:
        if name not in certified or name not in recorded:
            continue
        fn_h, _ = impl_hashes(REGISTRY[name].spark)
        if recorded[name].get("fn") != fn_h:
            out.append(name)
    return out


def _gate_order() -> list[str]:
    """Registry names: uncertified first (priority set leading), then
    hash-detected stale certified queries, then the manual re-check
    escape hatch, then the already-certified queries ROTATED by round
    so the tail of the 50-row gate window re-verifies a different
    certified slice each round (a certified query is not immune to
    regression — e.g. a shared-helper change can silently break a
    query last checked rounds ago)."""
    certified, n_rounds = _certified_names()
    names = list(REGISTRY)
    prio = [n for n in _GATE_PRIORITY if n in REGISTRY and n not in certified]
    seen = set(prio)
    recheck = []
    # Own-body hash changes (high signal: the query's own code moved)
    # outrank the curated _GATE_RECHECK slice, which outranks the
    # env-hash class (module-neighborhood edits over-flag entire
    # modules; they re-certify across rounds via this ordering plus
    # the rotation instead of starving the window in one round).
    strong = _stale_strong(certified)
    for n in strong + [
        n for n in _GATE_RECHECK if n in REGISTRY and n in certified
    ] + _stale_certified(certified):
        if n not in seen:
            recheck.append(n)
            seen.add(n)
    rest_new = [n for n in names if n not in certified and n not in seen]
    done = [n for n in names if n in certified and n not in seen]
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
