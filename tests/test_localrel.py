"""local_df (Arrow-backed literal frames) value fidelity, and the
in-row float probe routing's equivalence to the window form it
replaced (r16 optimization: guide §2.4/§4)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window as W

from kcidb_spark.localrel import _plain_value, local_df


def _rows_set(df):
    def norm(v):
        return tuple(norm(x) for x in v) if isinstance(v, list) else v

    return sorted(tuple(norm(v) for v in r) for r in df.collect())


@pytest.mark.parametrize(
    "rows, schema",
    [
        (
            [(1, 2, [0.1, 2.5e-324, -1.7e308], 0.25), (2, 3, [1.0], 0.5)],
            "q_id long, c_id bigint, qv array<double>, qn double",
        ),
        ([(1, "a b", 7), (2, "", 0)], "q_id long, w string, wb bigint"),
        ([([[1.0, 2.0], [3.0, 4.0]],)], "_rrows array<array<double>>"),
        ([(0, 0.0), (1, -0.0), (2, float("inf"))], "f bigint, wt double"),
    ],
)
def test_local_df_bit_identical_to_row_path(spark, rows, schema):
    fast = local_df(spark, rows, schema)
    slow = spark.createDataFrame(rows, schema)
    assert fast.schema == slow.schema
    assert _rows_set(fast) == _rows_set(slow)


def test_local_df_falls_back_on_none_and_nan(spark):
    # None and NaN take the stock row path (pandas/Arrow would coerce
    # them) — results must still match createDataFrame exactly.
    rows = [(1, None), (2, float("nan")), (3, 1.5)]
    schema = "id long, x double"
    fast = local_df(spark, rows, schema)
    slow = spark.createDataFrame(rows, schema)
    got = {r["id"]: r["x"] for r in fast.collect()}
    want = {r["id"]: r["x"] for r in slow.collect()}
    assert got[1] is None and want[1] is None
    assert got[2] != got[2] and want[2] != want[2]  # NaN preserved
    assert got[3] == 1.5
    assert not _plain_value(None) and not _plain_value(float("nan"))


def test_local_df_empty(spark):
    schema = "q_id long, c_id bigint"
    df = local_df(spark, [], schema)
    assert df.schema == spark.createDataFrame([], schema).schema
    assert df.count() == 0


def test_route_float_probe_matches_window_form(spark):
    """The in-row slice(array_sort(struct(-sim, c_id))) routing must
    reproduce row_number() OVER (ORDER BY sim DESC, c_id ASC) ≤ nprobe
    exactly — including rounding-induced ties broken by c_id."""
    from kcidb_spark.operators.similarity import dot_expr
    from kcidb_spark.queries.streaming_exec import _route_float_probe

    # Centroids engineered so several share the same rounded cosine
    # with some queries (scaled copies → identical cosine → tie).
    cents_v = [
        [1.0, 0.0, 0.0, 0.0],
        [2.0, 0.0, 0.0, 0.0],   # tie with c0 for every query
        [0.0, 1.0, 0.0, 0.0],
        [0.0, 3.0, 0.0, 0.0],   # tie with c2
        [1.0, 1.0, 0.0, 0.0],
        [0.3, 0.77, 0.13, 0.41],
    ]
    import math

    cents = [
        (i, v, math.sqrt(sum(x * x for x in v)))
        for i, v in enumerate(cents_v)
    ]
    qrows = [
        (10, [1.0, 1.0, 1.0, 1.0]),
        (11, [0.5, 0.25, 0.125, 0.0625]),
        (12, [1e-9, 1e9, -1e-9, 0.0]),
        (13, [-1.0, -1.0, 0.0, 0.0]),
    ]
    batch = spark.createDataFrame(qrows, "vec_id long, v array<double>")
    for nprobe in (1, 2, 3, 6):
        cdf = spark.createDataFrame(
            cents, "c_id bigint, cv array<double>, cn double"
        )
        q = batch.withColumn(
            "qn", F.expr(f"sqrt({dot_expr('v', 'v')})")
        ).select(
            F.col("vec_id").alias("q_id"), F.col("v").alias("qv"), "qn"
        )
        c_sim = F.expr(f"round({dot_expr('qv', 'cv')} / (qn * cn), 4)")
        w_probe = W.partitionBy("q_id").orderBy(
            F.desc("c_sim"), F.asc("c_id")
        )
        old = (
            q.crossJoin(F.broadcast(cdf))
            .select("q_id", "qv", "qn", "c_id", c_sim.alias("c_sim"))
            .withColumn("rn", F.row_number().over(w_probe))
            .filter(F.col("rn") <= nprobe)
            .select("q_id", "c_id", "qv", "qn")
        )
        new, probed = _route_float_probe(batch, cents, nprobe)
        assert _rows_set(new) == _rows_set(old), f"nprobe={nprobe}"
        assert probed == sorted({r["c_id"] for r in old.collect()})


def test_route_float_probe_empty_model(spark):
    from kcidb_spark.queries.streaming_exec import _route_float_probe

    batch = spark.createDataFrame(
        [(1, [1.0, 2.0])], "vec_id long, v array<double>"
    )
    q_probe, probed = _route_float_probe(batch, [], 2)
    assert q_probe.count() == 0 and probed == []
