"""Physical-plan regression tests: the scale-critical plan properties
(.explain audit) must survive refactors.

These assert the *declared* plan shape on sf0.001 inputs.  AQE may
re-plan at runtime (e.g. SMJ→BHJ when a side turns out tiny) — these
tests check the static plan, which is what survives a 100× scale-up.
"""

from __future__ import annotations

import pytest

from kcidb_spark.queries import REGISTRY
from tests.conftest import SF_SMOKE


def _formatted(spark, name: str) -> str:
    df = REGISTRY[name].spark(spark, SF_SMOKE)
    jqe = df._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return jqe.explainString(mode)


@pytest.mark.parametrize(
    "name,needles",
    [
        # Timestamp window reaches the parquet scan (raw nanos column).
        ("s2_scan_ts_window", ["GreaterThan(ts,", "LessThanOrEqual(ts,"]),
        # Date filters push down on TPC-H-shaped scans.
        ("q1_pricing_summary", ["PushedFilters: [IsNotNull(l_shipdate)"]),
        # Q6: every predicate (date range + bounds) reaches the scan.
        (
            "q6_forecast_revenue",
            [
                "GreaterThanOrEqual(l_shipdate,1996-01-01T00:00)",
                "LessThanOrEqual(l_discount,0.07)",
                "LessThan(l_quantity,24.0)",
            ],
        ),
        # Dimension joins broadcast; id-set predicates are semi-joins.
        ("q5_local_supplier_volume", ["BroadcastHashJoin"]),
        ("p4_idset_semijoin", ["LeftSemi"]),
        ("j1_exists_semi", ["LeftSemi"]),
        ("j2_not_exists_anti", ["LeftAnti"]),
        # Brute-force knn broadcasts the query side (no shuffle of corpus).
        ("knn_cosine_bruteforce", ["BroadcastNestedLoopJoin"]),
        # Top-k compiles to TakeOrdered, not global sort.
        ("q3_shipping_priority", ["TakeOrderedAndProject"]),
        ("token_freq_topk", ["TakeOrderedAndProject"]),
        # Per-group top-k: rank filter rewritten to a map-side k-heap.
        ("o6_topk_per_group", ["WindowGroupLimit"]),
        ("group_sample_topn", ["WindowGroupLimit"]),
        # IVF-PQ: tiny sides broadcast; final top-k is a k-heap.
        ("ivf_pq_adc_topk", ["WindowGroupLimit", "BroadcastHashJoin"]),
        # Incremental dedup is an anti-join on fingerprints.
        ("dedup_incremental", ["LeftAnti"]),
        # GROUPING SETS is one Expand + one agg, not N unioned scans.
        ("a17_grouping_sets", ["Expand"]),
        # Q22: scalar threshold broadcasts; no-order check is anti-join.
        ("q22_idle_customers", ["LeftAnti", "BroadcastNestedLoopJoin"]),
        # BPE pair top-k never global-sorts.
        ("bpe_adjacent_pairs", ["TakeOrderedAndProject"]),
        # Z-order key assignment is a pure projection: one scan, the
        # interleave entirely inside a codegen stage.
        ("zorder_key_assign", ["codegen id"]),
        # Gumbel resampling keeps the bounded-model broadcast (the
        # per-source window's limit is a column — cnt div 5 — so the
        # WindowGroupLimit rewrite can't apply; the window itself is
        # partition-bounded, swept by test_no_unpartitioned_corpus_windows).
        ("dsir_gumbel_sample", ["BroadcastHashJoin"]),
    ],
)
def test_plan_shape(spark, name, needles):
    plan = _formatted(spark, name)
    for needle in needles:
        assert needle in plan, f"{name}: {needle!r} not in plan\n{plan[:3000]}"


def test_column_pruning(spark):
    """A narrow projection must not scan all columns."""
    plan = _formatted(spark, "q1_pricing_summary")
    # lineitem has l_comment-like wide columns in real TPC-H; here check
    # the ReadSchema holds only the referenced columns.
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan[:2000]
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols <= {
        "l_returnflag",
        "l_linestatus",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_shipdate",
    }, cols


def test_zorder_no_exchange(spark):
    """The layout KEY is free: assigning Morton keys must add no
    Exchange — the one shuffle the layout pays is the writer's
    repartitionByRange, priced separately in zorder_layout."""
    plan = _formatted(spark, "zorder_key_assign")
    assert "Exchange" not in plan, plan[:2000]


def test_a8_single_events_scan(spark):
    """a8's share is a window total over the post-agg counts — the
    events table must be scanned exactly once (no driver-side count()
    second scan; VERDICT r1 §3)."""
    plan = _formatted(spark, "a8_status_histogram")
    assert plan.count("events.parquet") == 1, plan[:3000]


def test_no_cartesian_products(spark):
    """No accidental CartesianProduct anywhere (broadcast NL joins for
    the deliberate small-side cross joins are fine)."""
    for name in REGISTRY:
        plan = _formatted(spark, name)
        assert "CartesianProduct" not in plan, name


# Queries where an UNPARTITIONED window is deliberate and bounded:
# the two-phase prefix scan's offsets window runs over <= n_buckets
# rows (operators/scan.py step 3) — the corpus-sized scan window is
# bucket-partitioned and separately asserted in test_scan.py.
_GLOBAL_WINDOW_OK = {
    "seq_pack_windows",
    "pipeline_assemble_corpus",
    # UniMax waterfilling: every window (row_number / prefix sum /
    # count) runs over the PER-LANGUAGE aggregate — ≤ |langs| rows by
    # construction, stated in the entry's docstring; the corpus is
    # touched only by the partial-agg token count.
    "corpus_unimax_budget",
    # Same posture (r12): the largest-remainder apportionment windows
    # run over the PER-SOURCE aggregate — ≤ |sources| rows; the
    # corpus is touched only by the one partial-agg count scan.
    "corpus_temperature_mix",
}


def test_no_unpartitioned_corpus_windows(spark):
    """No registry query may run a window over the whole input in one
    task ("No Partition Defined for Window" — the worst scale trap).
    Every windowspecdefinition in every optimized plan must open with
    a partition column, except the whitelisted tiny-domain windows."""
    import re

    bad = []
    for name, q in REGISTRY.items():
        if name in _GLOBAL_WINDOW_OK:
            continue
        if "stream" in name:
            continue  # streaming plans can't be built statically here
        plan = (
            q.spark(spark, SF_SMOKE)
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        # windowspecdefinition(part..., order... ) — unpartitioned
        # specs start directly with the ORDER BY expr + frame, i.e.
        # there is no comma-separated partition list before the
        # ordering spec's ASC/DESC marker appears.
        for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
            args = m.group(1)
            head = args.split(",")[0].strip()
            if " ASC" in head or " DESC" in head:
                bad.append((name, args[:80]))
                break
        from kcidb_spark.cache import release_persisted

        release_persisted()
    assert not bad, bad
