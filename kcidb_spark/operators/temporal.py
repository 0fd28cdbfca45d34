"""Temporal joins Spark lacks natively: as-of join and interval
(range) join, built from shuffle-linear primitives.

The reference generates equi-joins only (SURVEY §2.3 — no
outer/theta/range/as-of joins exist in kcidb, see
`kcidb/db/postgresql/v04_00.py:832-866`); these are scale-path
extensions in the spirit of pandas ``merge_asof`` and DuckDB
``ASOF JOIN``, designed so NO step is quadratic:

* ``asof_join`` — union both sides, then a partitioned running
  ``last(ignorenulls)`` window over a packed right-row struct: ONE
  shuffle on the key and ZERO Join nodes in the physical plan
  (asserted by tests/test_plans.py).  The naive formulation — a join
  on ``l.key = r.key AND r.ts <= l.ts`` plus a per-left-row max — is
  a non-equi join Spark can only execute as broadcast-nested-loop:
  O(|L|·|R|) at any scale.  The window form is O((|L|+|R|) log p)
  and scales with executors.
* ``interval_bucket_join`` — equi-join on (key, time-bucket) after
  exploding each left interval into the buckets it covers, then an
  exact containment filter.  Shuffle volume is rows ×
  buckets-per-interval (≤ 2 when the bucket width ≥ the interval
  width), never |L|×|R|.  Hot buckets are split by AQE skew-join.

Both return plain DataFrames and compose with the rest of the
engine; results are deterministic provided the right side of
``asof_join`` is unique per (key, timestamp) — pre-aggregate ties
(e.g. ``groupBy(key, ts).agg(max(...))``) as the callers do.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
    prefix: str = "asof_",
) -> DataFrame:
    """For every left row, attach the single right row with the
    nearest ``right_ts`` at-or-before (``backward``) / at-or-after
    (``forward``) the left row's ``left_ts``, per key.  Left rows
    with no match keep NULLs (left-outer semantics, like
    ``merge_asof`` / DuckDB ``ASOF LEFT JOIN``).

    Output: every left column, plus ``{prefix}ts`` (the matched
    right timestamp) and ``{prefix}<col>`` for each right non-key,
    non-timestamp column.

    The right side must be unique per (key, right_ts) for the result
    to be deterministic; ties at equal (ts, key) resolve inclusively
    (a right row AT the left timestamp matches).
    """
    keys = [on] if isinstance(on, str) else list(on)
    payload = [c for c in right.columns if c not in keys and c != right_ts]

    r2 = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        F.struct(
            F.col(right_ts).alias("ts"), *[F.col(c) for c in payload]
        ).alias("__r"),
    )
    l2 = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
    )
    # Align the two sides for the union with typed NULL struct columns.
    l2 = l2.withColumn("__r", F.lit(None).cast(r2.schema["__r"].dataType))
    r2 = r2.withColumn("__l", F.lit(None).cast(l2.schema["__l"].dataType))

    if direction == "backward":
        order = [F.col("__t").asc(), F.col("__side").asc()]
    elif direction == "forward":
        order = [F.col("__t").desc(), F.col("__side").asc()]
    else:
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    # Right rows sort before left rows at equal __t (side 0 < 1), so the
    # running last-non-null sees an equal-timestamp right row: inclusive.
    # The whole right row travels as ONE struct — per-column last() would
    # mix fields from different right rows when payload columns are NULL.
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l2.unionByName(r2.select(*l2.columns))
        .withColumn("__m", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    return matched.select(
        "__l.*",
        F.col("__m.ts").alias(f"{prefix}ts"),
        *[F.col(f"__m.{c}").alias(f"{prefix}{c}") for c in payload],
    )


def interval_bucket_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_start: str,
    left_end: str,
    right_ts: str = "ts",
    bucket_s: int = 300,
) -> DataFrame:
    """Inner-join right rows into left intervals: rows where
    ``right_ts`` ∈ (``left_start``, ``left_end``] and the keys match.

    Implementation: both sides are mapped to ``bucket_s``-second time
    buckets (left intervals explode into every bucket they cover —
    pure metadata arithmetic, no data growth beyond the bucket
    count), the join is a plain equi-join on (keys, bucket), and the
    exact half-open containment predicate filters afterwards.  Pick
    ``bucket_s`` ≥ the typical interval width so each interval covers
    ≤ 2 buckets.

    Output: all left columns + right columns minus the join keys;
    the caller renames collisions beforehand.
    """
    keys = [on] if isinstance(on, str) else list(on)
    w_us = int(bucket_s) * 1_000_000
    l2 = left.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.expr(f"unix_micros({left_start}) div {w_us}"),
                F.expr(f"unix_micros({left_end}) div {w_us}"),
            )
        ),
    )
    r2 = right.withColumn("__b", F.expr(f"unix_micros({right_ts}) div {w_us}"))
    contained: Column = (F.col(right_ts) > F.col(left_start)) & (
        F.col(right_ts) <= F.col(left_end)
    )
    return l2.join(r2, on=keys + ["__b"]).filter(contained).drop("__b")
