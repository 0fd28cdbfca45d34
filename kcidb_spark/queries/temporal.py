"""Temporal-join queries over the events stream table.

Two operator families the reference lacks (SURVEY §2.3: equi-joins
only) but a large-scale event/training-data pipeline needs, each
oracle-checked against DuckDB's native temporal joins:

* as-of join  — DuckDB ``ASOF LEFT JOIN`` is the oracle;
* range join  — DuckDB's inequality (IE) join is the oracle.

Both Spark implementations avoid the nested-loop trap (see
operators/temporal.py for the scale argument).
"""

from __future__ import annotations

from textwrap import dedent

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcidb_spark.operators.temporal import asof_join, interval_bucket_join
from kcidb_spark.queries.registry import register
from kcidb_spark.tables import table


@register(
    "j_asof_last_click",
    oracle=dedent("""
        WITH errors AS (
            SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
        ),
        clicks AS (
            SELECT user_id, ts,
                   max(event_id) AS click_event_id,
                   max(value) AS click_value
            FROM events WHERE event_type = 'click'
            GROUP BY user_id, ts
        )
        SELECT e.event_id, e.user_id, c.click_event_id, c.click_value,
               CAST(date_diff('microsecond', c.ts, e.ts) AS BIGINT) AS age_us
        FROM errors e ASOF LEFT JOIN clicks c
          ON e.user_id = c.user_id AND e.ts >= c.ts
    """),
    tags=("J", "temporal", "asof"),
)
def j_asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each error event joined to the same user's most recent
    at-or-before click (how long had the user been idle when the
    error hit?).  The click side is pre-aggregated to one row per
    (user, ts) so ties are deterministic in both engines.
    """
    ev = table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(
            F.max("event_id").alias("click_event_id"),
            F.max("value").alias("click_value"),
        )
    )
    j = asof_join(errors, clicks, on="user_id")
    return j.select(
        "event_id",
        "user_id",
        F.col("asof_click_event_id").alias("click_event_id"),
        F.col("asof_click_value").alias("click_value"),
        (F.unix_micros("ts") - F.unix_micros("asof_ts"))
        .cast("long")
        .alias("age_us"),
    )


@register(
    "j_range_follow_clicks",
    oracle=dedent("""
        WITH errors AS (
            SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
        ),
        clicks AS (
            SELECT user_id, ts, value FROM events WHERE event_type = 'click'
        )
        SELECT e.event_id, e.user_id,
               CAST(count(c.user_id) AS BIGINT) AS n_follow_clicks,
               max(c.value) AS max_click_value
        FROM errors e
        LEFT JOIN clicks c
          ON c.user_id = e.user_id
         AND c.ts > e.ts
         AND c.ts <= e.ts + INTERVAL 5 MINUTE
        GROUP BY e.event_id, e.user_id
    """),
    tags=("J", "temporal", "range"),
)
def j_range_follow_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-error activity: per error event, how many clicks the same
    user made in the 5 minutes after it (exclusive-start, inclusive-
    end), and the largest click value.  Count/max only — no
    double-typed sums — so values hash-match across engines.
    """
    ev = table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id",
        "user_id",
        F.col("ts").alias("t0"),
        F.timestamp_micros(F.unix_micros("ts") + 300_000_000).alias("t1"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("click_ts"),
        F.col("value").alias("click_value"),
    )
    matches = interval_bucket_join(
        errors, clicks, on="user_id",
        left_start="t0", left_end="t1",
        right_ts="click_ts", bucket_s=300,
    )
    agg = matches.groupBy("event_id", "user_id").agg(
        F.count(F.lit(1)).alias("__n"),
        F.max("click_value").alias("max_click_value"),
    )
    return (
        errors.join(agg, on=["event_id", "user_id"], how="left")
        .select(
            "event_id",
            "user_id",
            F.coalesce("__n", F.lit(0)).cast("long").alias("n_follow_clicks"),
            "max_click_value",
        )
    )
