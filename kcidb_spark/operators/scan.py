"""Distributed prefix scan (cumulative sum) over a keyed DataFrame.

The naive Spark formulation — ``sum().over(Window.orderBy(key))`` with
no partition key — collapses the whole table into ONE task (Catalyst
warns: "No Partition Defined for Window operation"), which is the
single worst scale trap in window-function code.  This operator is the
classic two-phase scan instead:

1. bucket rows by key range (a pure projection — ``floor(key·P/N)``
   against a broadcast 1-row (min, max, count) aggregate; no sampling,
   no shuffle-for-partitioning nondeterminism);
2. in-bucket cumsum via a window PARTITIONED by bucket (parallel);
3. bucket totals (≤P rows) get their own prefix in one tiny window —
   P is the only sequential domain, and P ≈ thousands at most;
4. broadcast the per-bucket offsets back and add.

Total cost: one shuffle on the bucket key + one broadcast of P rows.
Every value is integer-summed, so results are deterministic under any
physical ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def distributed_cumsum(
    df: DataFrame,
    key_col: str,
    value_col: str,
    out_col: str = "cumsum",
    n_buckets: int = 64,
) -> DataFrame:
    """Add ``out_col`` = inclusive cumulative sum of ``value_col`` in
    ``key_col`` order.  Keys must be unique (the scan order must be
    total for the result to be well-defined across engines).

    The input is scoped-persisted: it fans out to three consumers
    (min/max stats, the in-bucket window, the bucket totals), and the
    caller's upstream is typically an expensive projection (e.g. a
    tokenize) that must not re-run per consumer.
    """
    from kcidb_spark.cache import scoped_persist

    df = scoped_persist(df)
    stats = df.agg(
        F.min(key_col).alias("_kmin"),
        F.max(key_col).alias("_kmax"),
    )
    # Bucket by key range: span/n_buckets keys per bucket (last bucket
    # ragged).  Integer arithmetic only — deterministic, no sampling.
    bucketed = df.crossJoin(F.broadcast(stats)).withColumn(
        "_bkt",
        F.floor(
            (F.col(key_col) - F.col("_kmin"))
            * n_buckets
            / (F.col("_kmax") - F.col("_kmin") + 1)
        ).cast("long"),
    ).drop("_kmin", "_kmax")
    w_in = (
        W.partitionBy("_bkt")
        .orderBy(key_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    local = bucketed.withColumn("_local", F.sum(value_col).over(w_in))
    totals = bucketed.groupBy("_bkt").agg(F.sum(value_col).alias("_tot"))
    w_pfx = (
        W.orderBy("_bkt")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    offsets = totals.select(
        "_bkt",
        (F.sum("_tot").over(w_pfx) - F.col("_tot")).alias("_offset"),
    )
    return (
        local.join(F.broadcast(offsets), on="_bkt")
        .withColumn(out_col, F.col("_local") + F.col("_offset"))
        .drop("_bkt", "_local", "_offset")
    )
