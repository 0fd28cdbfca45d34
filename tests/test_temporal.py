"""Unit + plan tests for the temporal join operators.

Semantics are pinned on tiny in-memory frames; full-table parity with
DuckDB ASOF / inequality joins is covered by test_oracle_parity.py
(j_asof_last_click, j_range_follow_clicks).  The plan tests assert
the scale properties: as-of compiles to a window (ZERO Join nodes),
the range join to an equi-join (no nested loop).
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from kcidb_spark.operators.temporal import asof_join, interval_bucket_join
from kcidb_spark.queries import REGISTRY
from tests.conftest import SF_SMOKE

UTC = datetime.timezone.utc


def _t(s: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1, tzinfo=UTC) + datetime.timedelta(seconds=s)


def _frames(spark):
    left = spark.createDataFrame(
        [("u1", _t(10), "a"), ("u1", _t(20), "b"), ("u2", _t(5), "c")],
        "k string, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [("u1", _t(10), 100), ("u1", _t(15), 150), ("u3", _t(1), 999)],
        "k string, ts timestamp, v int",
    )
    return left, right


def test_asof_backward_inclusive(spark):
    left, right = _frames(spark)
    out = {
        r["tag"]: (r["asof_v"], r["asof_ts"])
        for r in asof_join(left, right, on="k").collect()
    }
    assert out["a"][0] == 100  # equal-timestamp right row matches (inclusive)
    assert out["b"][0] == 150  # nearest at-or-before, not first
    assert out["c"] == (None, None)  # no match for the key → NULLs


def test_asof_forward(spark):
    left, right = _frames(spark)
    out = {
        r["tag"]: r["asof_v"]
        for r in asof_join(left, right, on="k", direction="forward").collect()
    }
    assert out["a"] == 100  # inclusive at equal ts
    assert out["b"] is None  # nothing at-or-after 20
    assert out["c"] is None


def test_interval_bucket_join_boundaries(spark):
    # Interval (0, 300]; probes at 0 (excluded), 299 (next bucket,
    # included — catches the cross-bucket case), 300 (included), 301
    # (excluded).
    left = spark.createDataFrame(
        [("u1", _t(0), _t(300))], "k string, t0 timestamp, t1 timestamp"
    )
    right = spark.createDataFrame(
        [("u1", _t(0)), ("u1", _t(299)), ("u1", _t(300)), ("u1", _t(301)),
         ("u2", _t(100))],
        "k string, ev_ts timestamp",
    )
    got = sorted(
        r["ev_ts"].second + 60 * r["ev_ts"].minute
        for r in interval_bucket_join(
            left, right, on="k", left_start="t0", left_end="t1",
            right_ts="ev_ts", bucket_s=300,
        ).collect()
    )
    assert got == [299, 300]


def _plan(spark, name: str) -> str:
    df = REGISTRY[name].spark(spark, SF_SMOKE)
    jqe = df._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return jqe.explainString(mode)


def test_asof_plan_has_no_join(spark):
    """The as-of query must compile join-free: union + window, one
    shuffle on the key — the property that makes it 100 TB-safe."""
    plan = _plan(spark, "j_asof_last_click")
    assert "Window" in plan
    assert "Join" not in plan, plan[:3000]


def test_range_join_plan_is_equi(spark):
    """The interval join must be an equi-join on (key, bucket) —
    never a broadcast nested loop / cartesian product."""
    plan = _plan(spark, "j_range_follow_clicks")
    assert "BroadcastNestedLoopJoin" not in plan, plan[:3000]
    assert "CartesianProduct" not in plan, plan[:3000]
