"""Relational operator queries over the synthetic star schema.

Each query demonstrates one or more operators from SURVEY.md §2 (the
reference's operator inventory), re-expressed as idiomatic DataFrame
plans, and carries a DuckDB oracle.  Reference citations are to
/root/reference (kernelci/kcidb).

Scale notes (100 TB design intent, verified locally via .explain):
  * region/nation joins are broadcast — bounded dims, no shuffle;
  * id-set predicates become broadcast semi-joins, never OR-chains
    (the reference's inline-VALUES trick, postgresql/v04_00.py:672-680);
  * every aggregation is expressed so Catalyst plans partial (map-side)
    aggregation before the shuffle;
  * all money sums are scaled-integer-exact (see _exact) — which also
    makes them associative, i.e. AQE re-planning cannot change results.
"""

from __future__ import annotations

from textwrap import dedent

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kcidb_spark.queries._exact import as_money, exact_avg, int_sum, oracle_int_sum
from kcidb_spark.queries.registry import register
from kcidb_spark.tables import events_in_window, table


def _utc(spark: SparkSession) -> None:
    """Pin session TZ so timestamp literals parse as UTC instants
    regardless of the calling session's default (oracle parity)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")


# ---------------------------------------------------------------------------
# TPC-H-shaped headline queries (scan → filter → join → agg → sort)
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle=dedent(f"""
        SELECT l_returnflag, l_linestatus,
               {oracle_int_sum('l_quantity', 100)} / 100.0 AS sum_qty,
               {oracle_int_sum('l_extendedprice', 100)} / 100.0 AS sum_base_price,
               {oracle_int_sum('l_extendedprice * (1 - l_discount)', 10000)} / 10000.0 AS sum_disc_price,
               {oracle_int_sum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 1000000)} / 1000000.0 AS sum_charge,
               {oracle_int_sum('l_quantity', 100)} / (100.0 * count(*)) AS avg_qty,
               {oracle_int_sum('l_extendedprice', 100)} / (100.0 * count(*)) AS avg_price,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """),
    tags=("A", "S2", "P3"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: wide aggregation with map-side partial aggs.

    Reference analog: status/count rollups (SURVEY §2.4); the plan is a
    single scan → partial agg → 4-row exchange → final agg, the minimal
    shuffle for a global group-by at any scale.
    """
    _utc(spark)
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    g = li.groupBy("l_returnflag", "l_linestatus").agg(
        int_sum(F.col("l_quantity"), 100).alias("_sq"),
        int_sum(F.col("l_extendedprice"), 100).alias("_sbp"),
        int_sum(disc_price, 10_000).alias("_sdp"),
        int_sum(charge, 1_000_000).alias("_sc"),
        F.count(F.lit(1)).alias("count_order"),
    )
    return g.select(
        "l_returnflag",
        "l_linestatus",
        as_money(F.col("_sq"), 100).alias("sum_qty"),
        as_money(F.col("_sbp"), 100).alias("sum_base_price"),
        as_money(F.col("_sdp"), 10_000).alias("sum_disc_price"),
        as_money(F.col("_sc"), 1_000_000).alias("sum_charge"),
        exact_avg(F.col("_sq"), F.col("count_order"), 100).alias("avg_qty"),
        exact_avg(F.col("_sbp"), F.col("count_order"), 100).alias("avg_price"),
        "count_order",
    )


@register(
    "q3_shipping_priority",
    oracle=dedent(f"""
        WITH rev AS (
            SELECT l_orderkey,
                   o_orderpriority,
                   {oracle_int_sum('l_extendedprice * (1 - l_discount)', 10000)} / 10000.0 AS revenue
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
              AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
            GROUP BY l_orderkey, o_orderpriority
        )
        SELECT l_orderkey, o_orderpriority, revenue
        FROM rev
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """),
    tags=("J4", "A", "O3"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective chain join then top-k.

    Reference analog: ORM pattern chain join J4
    (postgresql/v04_00.py:832-866) — each level joins child to parent.
    Filters sit on the scans so Catalyst pushes them into parquet.
    """
    _utc(spark)
    cust = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    rev = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderpriority")
        .agg(int_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10_000).alias("_r"))
        .select("l_orderkey", "o_orderpriority", as_money(F.col("_r"), 10_000).alias("revenue"))
    )
    return rev.orderBy(F.desc("revenue"), F.asc("l_orderkey")).limit(10)


@register(
    "q5_local_supplier_volume",
    oracle=dedent(f"""
        SELECT n_name,
               {oracle_int_sum('l_extendedprice * (1 - l_discount)', 10000)} / 10000.0 AS revenue
        FROM region
        JOIN nation ON n_regionkey = r_regionkey
        JOIN customer ON c_nationkey = n_nationkey
        JOIN orders ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY n_name
    """),
    tags=("J4", "A", "broadcast"),
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: star join with explicitly broadcast dimensions.

    region/nation/supplier are bounded dims → F.broadcast removes three
    shuffles; the only exchange left is orders⋈lineitem on orderkey.
    """
    _utc(spark)
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = table(spark, sf_dir, "nation")
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")

    asian_nations = nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    cust_n = cust.join(F.broadcast(asian_nations), cust.c_nationkey == asian_nations.n_nationkey)
    joined = (
        orders.join(cust_n, orders.o_custkey == cust_n.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (supp.s_nationkey == cust_n.c_nationkey),
        )
    )
    return (
        joined.groupBy("n_name")
        .agg(int_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10_000).alias("_r"))
        .select("n_name", as_money(F.col("_r"), 10_000).alias("revenue"))
    )


@register(
    "q10_returned_items",
    oracle=dedent(f"""
        WITH agg AS (
            SELECT c_custkey, c_name, n_name,
                   {oracle_int_sum('l_extendedprice * (1 - l_discount)', 10000)} / 10000.0 AS revenue
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN orders ON o_custkey = c_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            WHERE l_returnflag = 'R'
            GROUP BY c_custkey, c_name, n_name
        )
        SELECT c_custkey, c_name, n_name, revenue
        FROM agg
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """),
    tags=("J4", "A", "O3"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: filter → join → agg → top-k with tie-break."""
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    agg = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(orders, orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(int_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10_000).alias("_r"))
        .select("c_custkey", "c_name", "n_name", as_money(F.col("_r"), 10_000).alias("revenue"))
    )
    return agg.orderBy(F.desc("revenue"), F.asc("c_custkey")).limit(20)


# ---------------------------------------------------------------------------
# Scans / predicates (SURVEY §2.1, §2.2)
# ---------------------------------------------------------------------------


@register(
    "s2_scan_ts_window",
    oracle=dedent(f"""
        SELECT event_type,
               count(*) AS n_events,
               count(DISTINCT user_id) AS n_users,
               {oracle_int_sum('value', 100)} / 100.0 AS sum_value
        FROM events
        WHERE ts > TIMESTAMP '2024-01-10 00:00:00'
          AND ts <= TIMESTAMP '2024-01-20 00:00:00'
        GROUP BY event_type
    """),
    tags=("S2", "P3"),
)
def s2_scan_ts_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dump-style scan with an (after, until] timestamp window.

    Reference: kcidb/db/sql/schema.py:331-343 renders `_timestamp > ?
    AND _timestamp <= ?`.  The window is applied to the RAW nanos
    column via events_in_window so it is genuinely pushed into the
    parquet scan — verified in the plan as PushedFilters:
    GreaterThan(ts,…),LessThanOrEqual(ts,…).
    """
    import datetime

    _utc(spark)
    ev = events_in_window(
        spark,
        sf_dir,
        after=datetime.datetime(2024, 1, 10, tzinfo=datetime.timezone.utc),
        until=datetime.datetime(2024, 1, 20, tzinfo=datetime.timezone.utc),
    )
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        as_money(int_sum(F.col("value"), 100), 100).alias("sum_value"),
    )


_P4_IDS = (3, 7, 42, 101, 555, 1021)


@register(
    "p4_idset_semijoin",
    oracle=dedent(f"""
        SELECT o_orderpriority, count(*) AS n_orders,
               {oracle_int_sum('o_totalprice', 100)} / 100.0 AS sum_price
        FROM orders
        WHERE o_custkey IN {_P4_IDS!r}
        GROUP BY o_orderpriority
    """),
    tags=("P4", "J1"),
)
def p4_idset_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ID-set predicate as a broadcast semi-join, never an OR-chain.

    Reference: inline-VALUES id table, postgresql/v04_00.py:667-680.
    The id set arrives as a DataFrame → broadcast left-semi join, which
    scales to arbitrarily large id sets (an IN-list literal does not).
    """
    ids = spark.createDataFrame([(i,) for i in _P4_IDS], "o_custkey bigint")
    orders = table(spark, sf_dir, "orders")
    return (
        orders.join(F.broadcast(ids), "o_custkey", "left_semi")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            as_money(int_sum(F.col("o_totalprice"), 100), 100).alias("sum_price"),
        )
    )


@register(
    "p5_empty_idset",
    oracle="SELECT o_orderkey, o_totalprice FROM orders WHERE FALSE",
    tags=("P5",),
    bench=False,
)
def p5_empty_idset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empty-id-set guard: empty set ≠ no filter — match *nothing*.

    Reference: WHERE FALSE / LIMIT 0 rendering,
    postgresql/v04_00.py:826-830, bigquery/v04_00.py:1060-1064.
    """
    orders = table(spark, sf_dir, "orders")
    return orders.select("o_orderkey", "o_totalprice").where(F.lit(False))


@register(
    "p6_status_case_map",
    oracle=dedent("""
        SELECT CASE o_orderstatus
                   WHEN 'F' THEN 'PASS'
                   WHEN 'O' THEN 'MISS'
                   ELSE 'DONE'
               END AS status,
               count(*) AS n
        FROM orders
        GROUP BY 1
    """),
    tags=("P6", "F1"),
)
def p6_status_case_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE status mapping (reference: valid→status CASE,
    postgresql/v04_00.py:346-350)."""
    orders = table(spark, sf_dir, "orders")
    status = (
        F.when(F.col("o_orderstatus") == "F", "PASS")
        .when(F.col("o_orderstatus") == "O", "MISS")
        .otherwise("DONE")
        .alias("status")
    )
    return orders.select(status).groupBy("status").agg(F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------------------
# Joins (SURVEY §2.3)
# ---------------------------------------------------------------------------


@register(
    "j1_exists_semi",
    oracle=dedent("""
        SELECT c_mktsegment, count(*) AS n_customers
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY c_mktsegment
    """),
    tags=("J1",),
)
def j1_exists_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as left-semi join (no fan-out, no dedup needed)."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").select("o_custkey")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "j2_not_exists_anti",
    oracle=dedent("""
        SELECT c_custkey, c_name
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """),
    tags=("J1",),
)
def j2_not_exists_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as left-anti join."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").select("o_custkey")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


_CLOSURE_ROOTS = (1, 2, 3, 42, 100)


@register(
    "j3_closure_parents_children",
    oracle=dedent(f"""
        WITH roots AS (SELECT * FROM orders WHERE o_orderkey IN {_CLOSURE_ROOTS!r})
        SELECT 'order' AS obj_type, o_orderkey AS id FROM roots
        UNION ALL
        SELECT 'customer' AS obj_type, c_custkey AS id
        FROM customer
        WHERE c_custkey IN (SELECT DISTINCT o_custkey FROM roots)
        UNION ALL
        SELECT 'lineitem' AS obj_type, l_orderkey * 10 + l_linenumber AS id
        FROM lineitem
        WHERE l_orderkey IN (SELECT o_orderkey FROM roots)
    """),
    tags=("J2", "J3", "U1"),
)
def j3_closure_parents_children(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational closure: explicit roots → parents (via FK, bottom-up)
    and children (top-down), unioned.

    Reference: add_parents/add_children closure,
    postgresql/v04_00.py:682-740 — the object graph is static and
    shallow, so the closure is unrolled joins, not recursion.  Parent
    ids are derived from the child's FK column (no join), then the
    parent table is semi-joined; children are semi-joined on the FK.
    """
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    li = table(spark, sf_dir, "lineitem")
    roots = orders.filter(F.col("o_orderkey").isin(*_CLOSURE_ROOTS))

    root_rows = roots.select(F.lit("order").alias("obj_type"), F.col("o_orderkey").alias("id"))
    parent_ids = roots.select(F.col("o_custkey").alias("c_custkey")).distinct()
    parent_rows = cust.join(F.broadcast(parent_ids), "c_custkey", "left_semi").select(
        F.lit("customer").alias("obj_type"), F.col("c_custkey").alias("id")
    )
    child_keys = roots.select(F.col("o_orderkey").alias("l_orderkey"))
    child_rows = li.join(F.broadcast(child_keys), "l_orderkey", "left_semi").select(
        F.lit("lineitem").alias("obj_type"),
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("id"),
    )
    return root_rows.unionByName(parent_rows).unionByName(child_rows)


# ---------------------------------------------------------------------------
# Aggregations (SURVEY §2.4)
# ---------------------------------------------------------------------------


@register(
    "a1_revision_rollup",
    oracle=dedent("""
        SELECT n_nationkey AS nationkey, c_mktsegment AS segment,
               count(*) AS n_customers,
               min(c_name) AS first_name,
               CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_acctbal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_nationkey, c_mktsegment
    """),
    tags=("A1", "A2"),
)
def a1_revision_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-key rollup with a representative-value aggregate.

    Reference: revision rollup GROUP BY (git_commit_hash,
    patchset_hash) + FIRST(...) (postgresql/v04_00.py:277-291).  The
    reference's FIRST is any-value; we use min() so the chosen
    representative is deterministic across engines and runs.
    """
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_nationkey").alias("nationkey"), F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.min("c_name").alias("first_name"),
            as_money(int_sum(F.col("c_acctbal"), 100), 100).alias("sum_acctbal"),
        )
    )


@register(
    "a3_dedup_latest",
    oracle=dedent("""
        SELECT user_id, event_id, event_type, value
        FROM (
            SELECT user_id, event_id, event_type, value,
                   row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY ts DESC, event_id DESC
                   ) AS rn
            FROM events
        )
        WHERE rn = 1
    """),
    tags=("A3", "A12", "window"),
)
def a3_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-row-per-key dedup via ranking window.

    Reference: BigQuery dedup view ANY_VALUE…GROUP BY id
    (bigquery/v04_00.py:619-644) and latest-issue-version
    (kcidb/oo/__init__.py:624-636).  row_number over (key, ts desc)
    is the Spark-native form; one shuffle on the key, no join.
    """
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "value")
    )


@register(
    "a8_status_histogram",
    oracle=dedent("""
        SELECT event_type, count(*) AS n,
               count(*) / (1.0 * (SELECT count(*) FROM events)) AS share
        FROM events
        GROUP BY event_type
    """),
    tags=("A8",),
)
def a8_status_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram with exact share (integer count ratio → bit-stable).

    Reference: status histograms, kcidb/oo/__init__.py:145-154.
    """
    ev = table(spark, sf_dir, "events")
    counts = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    # Single pass: the global total is a window sum over the (tiny,
    # post-agg) counts frame — no second scan of events and no blocking
    # driver-side .count() action (VERDICT.md r1 "What's wrong" §3).
    total = F.sum("n").over(W.partitionBy())
    return counts.select(
        "event_type", "n", (F.col("n") / (1.0 * total)).alias("share")
    )


@register(
    "a9_pivot_status",
    oracle=dedent("""
        SELECT o_orderpriority,
               CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
               CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
               CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending
        FROM orders
        GROUP BY o_orderpriority
    """),
    tags=("A9",),
)
def a9_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Architecture×status-histogram analog: conditional-agg pivot.

    Reference: kcidb/oo/__init__.py:156-175.  Written as SUM(CASE…)
    rather than .pivot() so the plan is a single pass and the oracle is
    plain ANSI.
    """
    orders = table(spark, sf_dir, "orders")
    def n_of(s: str):
        return F.sum(F.when(F.col("o_orderstatus") == s, 1).otherwise(0)).cast("long")
    return orders.groupBy("o_orderpriority").agg(
        n_of("O").alias("n_open"),
        n_of("F").alias("n_finished"),
        n_of("P").alias("n_pending"),
    )


@register(
    "a4_first_last_modified",
    oracle=dedent("""
        SELECT 'orders' AS tbl, min(o_orderdate) AS first_ts, max(o_orderdate) AS last_ts FROM orders
        UNION ALL
        SELECT 'lineitem' AS tbl, min(l_shipdate) AS first_ts, max(l_shipdate) AS last_ts FROM lineitem
        UNION ALL
        SELECT 'events' AS tbl, min(ts) AS first_ts, max(ts) AS last_ts FROM events
    """),
    tags=("A4", "F8", "F11"),
)
def a4_first_last_modified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last-modified per table, unioned.

    Reference: kcidb/db/sql/schema.py:346-396 (MIN/MAX(_timestamp)
    UNION ALL across tables).
    """
    _utc(spark)
    def mm(name: str, ts_col: str) -> DataFrame:
        return (
            table(spark, sf_dir, name)
            .agg(F.min(ts_col).alias("first_ts"), F.max(ts_col).alias("last_ts"))
            .select(F.lit(name).alias("tbl"), "first_ts", "last_ts")
        )
    return (
        mm("orders", "o_orderdate")
        .unionByName(mm("lineitem", "l_shipdate"))
        .unionByName(mm("events", "ts"))
    )


# ---------------------------------------------------------------------------
# Windows, sorts, sessionization (SURVEY §2.5, §2.6)
# ---------------------------------------------------------------------------


@register(
    "w_running_total",
    oracle=dedent("""
        SELECT event_id, user_id,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) / 100.0 AS running_value
        FROM events
        WHERE user_id <= 20
    """),
    tags=("window",),
)
def w_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per key — integer-scaled so the window frame
    aggregation is associative (DuckDB's segment-tree evaluation and
    Spark's incremental frame agg then agree exactly)."""
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") <= 20)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    running = F.sum(F.round(F.col("value") * 100).cast("long")).over(w)
    return ev.select(
        "event_id", "user_id", (running / F.lit(100.0)).alias("running_value")
    )


@register(
    "w_sessionize",
    oracle=dedent("""
        WITH flagged AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                             OR date_diff('second',
                                          lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                                          ts) > 1800
                        THEN 1 ELSE 0 END AS new_session
            FROM events
        )
        SELECT user_id,
               CAST(SUM(new_session) AS BIGINT) AS n_sessions,
               count(*) AS n_events
        FROM flagged
        GROUP BY user_id
    """),
    tags=("window", "sessionize"),
)
def w_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: lag + 30-minute gap threshold.

    Classic Spark pattern (lag → gap flag → cumulative session ids);
    here we count sessions per user.  All-integer arithmetic.
    """
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    gap_s = F.unix_timestamp("ts") - F.unix_timestamp(prev_ts)
    new_session = F.when(prev_ts.isNull() | (gap_s > 1800), 1).otherwise(0)
    return (
        ev.withColumn("new_session", new_session)
        .groupBy("user_id")
        .agg(
            F.sum("new_session").cast("long").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@register(
    "o3_topk_orders",
    oracle=dedent("""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10
    """),
    tags=("O3",),
)
def o3_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject — per-partition
    top-k then a k-row merge on the driver, no full sort at scale."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Set operations (SURVEY §2.7)
# ---------------------------------------------------------------------------


@register(
    "u1_union_distinct",
    oracle=dedent("""
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey AS nationkey FROM supplier
    """),
    tags=("U1",),
)
def u1_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION with dedup (reference: UNION of id sources,
    postgresql/v04_00.py:697-703)."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@register(
    "u2_intersect",
    oracle=dedent("""
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey AS nationkey FROM supplier
    """),
    tags=("U2",),
)
def u2_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (beyond the reference, which has none — SURVEY §2.7)."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "u3_except",
    oracle=dedent("""
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT
        SELECT s_nationkey AS nationkey FROM supplier
    """),
    tags=("U3",),
)
def u3_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set minus; subtract() is EXCEPT DISTINCT)."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)


# ---------------------------------------------------------------------------
# Scalar functions (SURVEY §2.8)
# ---------------------------------------------------------------------------


@register(
    "f12_regex_extract",
    oracle=dedent("""
        SELECT regexp_extract(p_type, '^(\\w+)', 1) AS type_head,
               count(*) AS n_parts,
               min(p_retailprice) AS min_price,
               max(p_retailprice) AS max_price
        FROM part
        GROUP BY 1
    """),
    tags=("F12",),
)
def f12_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex extraction + rollup (reference: log-error regex extraction,
    kcidb/oo/__init__.py:558-586).  min/max of raw doubles are
    order-insensitive, so no scaling needed."""
    part = table(spark, sf_dir, "part")
    return (
        part.select(F.regexp_extract("p_type", r"^(\w+)", 1).alias("type_head"), "p_retailprice")
        .groupBy("type_head")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.min("p_retailprice").alias("min_price"),
            F.max("p_retailprice").alias("max_price"),
        )
    )


@register(
    "f_scalar_suite",
    oracle=dedent("""
        SELECT p_partkey,
               concat(p_brand, '#', p_type) AS brand_type,
               coalesce(nullif(p_brand, 'Brand#1'), 'OTHER') AS brand_or_other,
               greatest(p_size, 25) AS size_floor,
               least(p_size, 25) AS size_cap,
               upper(p_name) AS name_upper,
               length(p_name) AS name_len
        FROM part
        WHERE p_partkey <= 50
    """),
    tags=("F2", "F3", "F10"),
)
def f_scalar_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COALESCE / GREATEST / LEAST / CONCAT / string funcs in one
    projection (reference F2/F3/F10, kcidb/db/sql/schema.py:271-282)."""
    part = table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 50)
    return part.select(
        "p_partkey",
        F.concat(F.col("p_brand"), F.lit("#"), F.col("p_type")).alias("brand_type"),
        F.coalesce(F.nullif(F.col("p_brand"), F.lit("Brand#1")), F.lit("OTHER")).alias(
            "brand_or_other"
        ),
        F.greatest(F.col("p_size"), F.lit(25)).alias("size_floor"),
        F.least(F.col("p_size"), F.lit(25)).alias("size_cap"),
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").cast("long").alias("name_len"),
    )


@register(
    "a11_cube_rollup",
    oracle=dedent(f"""
        SELECT l_returnflag, l_linestatus,
               count(*) AS n_items,
               {oracle_int_sum('l_quantity', 100)} / 100.0 AS sum_qty
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """),
    tags=("A", "cube"),
)
def a11_cube_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping (all 4 grouping sets in one pass — beyond the
    reference, which has no grouping sets; SURVEY §2.4).  Spark plans
    an Expand + single aggregation; the exact integer sums stay
    associative through the expansion."""
    li = table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        as_money(int_sum(F.col("l_quantity"), 100), 100).alias("sum_qty"),
    )


@register(
    "f8_date_extract",
    oracle=dedent(f"""
        SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
               CAST(month(o_orderdate) AS INTEGER) AS o_month,
               count(*) AS n_orders,
               {oracle_int_sum('o_totalprice', 100)} / 100.0 AS sum_price
        FROM orders
        GROUP BY 1, 2
    """),
    tags=("F8",),
)
def f8_date_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part extraction + monthly rollup (reference F8 ISO-8601
    handling, kcidb/misc.py:204-229)."""
    _utc(spark)
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").alias("o_year"), F.month("o_orderdate").alias("o_month")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            as_money(int_sum(F.col("o_totalprice"), 100), 100).alias("sum_price"),
        )
    )


@register(
    "q6_forecast_revenue",
    oracle=dedent(f"""
        SELECT {oracle_int_sum('l_extendedprice * l_discount', 10000)} / 10000.0
                   AS revenue,
               count(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """),
    tags=("A", "P3"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: selective filter → global scalar aggregate.

    All three predicates push to the parquet scan (range on shipdate,
    bounds on discount/quantity — row-group stats skip most of the
    file), and the aggregate is a partial-agg → single-row exchange:
    the cheapest possible plan, dominated entirely by scan pruning
    at 100 TB.
    """
    _utc(spark)
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        as_money(int_sum(F.col("l_extendedprice") * F.col("l_discount"), 10_000),
                 10_000).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


# ---------------------------------------------------------------------------
# TPC-H classic shapes, round 7: the subquery/decorrelation family
# (EXISTS, NOT EXISTS, correlated scalar, global-scalar HAVING,
# disjunctive pushdown, distinct-count with NOT-IN) — the optimizer
# features the earlier q1-q22 set did not yet exercise.
# ---------------------------------------------------------------------------


@register(
    "q2_top_supplier_per_nation",
    oracle=dedent("""
        SELECT n_name, s_name, s_acctbal
        FROM supplier s JOIN nation ON s_nationkey = n_nationkey
        WHERE s_acctbal = (SELECT max(s2.s_acctbal) FROM supplier s2
                           WHERE s2.s_nationkey = s.s_nationkey)
    """),
    tags=("J", "subquery"),
)
def q2_top_supplier_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated scalar subquery (the per-group MIN
    supply cost) — here the per-nation MAX account balance.  The
    decorrelated Spark plan is the per-group aggregate joined back
    BROADCAST (25 nations → 25-row build side); the equality compares
    a stored double against a MAX over the same stored doubles, so it
    is exact in both engines."""
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    mx = supp.groupBy("s_nationkey").agg(F.max("s_acctbal").alias("_mx"))
    return (
        supp.join(F.broadcast(mx), on="s_nationkey")
        .filter(F.col("s_acctbal") == F.col("_mx"))
        .join(F.broadcast(nation),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("n_name", "s_name", "s_acctbal")
    )


@register(
    "q4_priority_exists",
    oracle=dedent("""
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
    """),
    tags=("J1", "subquery"),
)
def q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS over a correlated inequality
    (commitdate<receiptdate in the original; ship-after-order here) →
    LEFT SEMI join with a composite condition.  The semi join
    deduplicates before the count, so no DISTINCT pass is needed, and
    the priority rollup is a 5-group partial agg."""
    _utc(spark)
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    matched = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return matched.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@register(
    "q8_market_share",
    oracle=dedent(f"""
        WITH vol AS (
            SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                   CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT) AS v,
                   sn.n_name AS supp_nation
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation sn ON s_nationkey = sn.n_nationkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation cn ON c_nationkey = cn.n_nationkey
            JOIN region ON cn.n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
        )
        SELECT o_year,
               CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN v ELSE 0 END)
                    AS BIGINT) / 10000.0 AS nation_volume,
               CAST(SUM(v) AS BIGINT) / 10000.0 AS total_volume,
               CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN v ELSE 0 END) AS DOUBLE)
                   / CAST(SUM(v) AS DOUBLE) AS mkt_share
        FROM vol GROUP BY o_year
    """),
    tags=("J4", "A", "broadcast"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: national market share inside one region per
    year — conditional aggregation over a 6-table star join with
    every dimension broadcast.  The share is a ratio of two
    exact scaled-integer sums (one IEEE division at the end, same
    quotient in both engines)."""
    _utc(spark)
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    cust = table(spark, sf_dir, "customer")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")

    cn = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select(F.col("n_nationkey").alias("cn_key"))
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
            ).cast("long").alias("v"),
            "supp_nation",
        )
    )
    is_n3 = F.when(F.col("supp_nation") == "NATION_3", F.col("v")).otherwise(F.lit(0))
    return vol.groupBy("o_year").agg(
        as_money(F.sum(is_n3), 10_000).alias("nation_volume"),
        as_money(F.sum("v"), 10_000).alias("total_volume"),
        (F.sum(is_n3).cast("double") / F.sum("v").cast("double")).alias("mkt_share"),
    )


@register(
    "q9_product_profit",
    oracle=dedent(f"""
        SELECT sn.n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
               {oracle_int_sum('l_extendedprice * (1 - l_discount)', 10000)} / 10000.0 AS profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        WHERE p_type = 'PROMO'
        GROUP BY sn.n_name, year(o_orderdate)
    """),
    tags=("J4", "A", "broadcast"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: product-line profit by supplier nation and
    year.  The part filter lands in the broadcast build side, so the
    big lineitem⋈orders exchange is the only shuffle; profit is a
    scaled-integer sum."""
    _utc(spark)
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    part = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(
            int_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10_000)
            .alias("_p")
        )
        .select("nation", "o_year", as_money(F.col("_p"), 10_000).alias("profit"))
    )


@register(
    "q11_important_parts",
    oracle=dedent(f"""
        WITH pv AS (
            SELECT l_partkey,
                   {oracle_int_sum('l_extendedprice * (1 - l_discount)', 10000)} AS v
            FROM lineitem GROUP BY l_partkey
        )
        SELECT l_partkey, v / 10000.0 AS value
        FROM pv
        WHERE v * 1000 > (SELECT CAST(SUM(v) AS BIGINT) FROM pv)
    """),
    tags=("A", "subquery"),
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: keep groups whose value exceeds a fraction of
    the GLOBAL total — a HAVING against a scalar subquery.  The total
    is a 1-row broadcast (cross join), and the 0.1% threshold compares
    scaled integers (v·1000 > total), so the cut is exact — no
    float-boundary flakes between engines."""
    li = table(spark, sf_dir, "lineitem")
    pv = li.groupBy("l_partkey").agg(
        int_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10_000)
        .alias("v")
    )
    total = pv.agg(F.sum("v").alias("_t"))
    return (
        pv.crossJoin(F.broadcast(total))
        .filter(F.col("v") * 1000 > F.col("_t"))
        .select("l_partkey", as_money(F.col("v"), 10_000).alias("value"))
    )


@register(
    "q12_late_priority",
    oracle=dedent("""
        SELECT l_returnflag,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= o_orderdate + INTERVAL 60 DAY
        GROUP BY l_returnflag
    """),
    tags=("J", "A"),
)
def q12_late_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: two conditional counts per category over
    late-shipped lines (shipmode → returnflag, commit/receipt →
    ship-60-days-after-order on this schema).  One join, one 3-group
    partial agg; the interval predicate stays JVM-side."""
    _utc(spark)
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    late = li.join(orders, li.l_orderkey == orders.o_orderkey).filter(
        F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return late.groupBy("l_returnflag").agg(
        F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
    )


@register(
    "q16_supplier_variety",
    oracle=dedent("""
        SELECT p_brand, p_size,
               CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_type <> 'PROMO' AND p_size <= 10
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                WHERE s_acctbal < 0)
        GROUP BY p_brand, p_size
    """),
    tags=("A13", "subquery"),
)
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part attribute,
    excluding a NOT-IN supplier set (complaints → negative balance).
    The exclusion is a broadcast LEFT ANTI, the part filter a
    broadcast inner — both map-side; the only exchange is the
    distinct-count's partial aggregation."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(
        (F.col("p_type") != "PROMO") & (F.col("p_size") <= 10)
    )
    bad = table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q19_disjunctive_revenue",
    oracle=dedent(f"""
        SELECT {oracle_int_sum('l_extendedprice * (1 - l_discount)', 10000)} / 10000.0 AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20 AND 30)
    """),
    tags=("P", "pushdown"),
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs across both join sides.  Catalyst
    factors the common l_quantity bounds below the join and keeps the
    per-brand conjuncts as the join's residual condition; the common
    quantity range (1..30) is pushed INTO the lineitem scan so
    row-group stats prune before any join work."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    q = F.col("l_quantity")
    sz = F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#12") & sz.between(1, 5) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#13") & sz.between(1, 10) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#14") & sz.between(1, 15) & q.between(20, 30))
    )
    return j.filter(cond).agg(
        as_money(
            int_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10_000),
            10_000,
        ).alias("revenue")
    )


@register(
    "q20_dominant_part_suppliers",
    oracle=dedent("""
        WITH ps AS (
            SELECT l_partkey, l_suppkey,
                   CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sq
            FROM lineitem GROUP BY l_partkey, l_suppkey
        ), tot AS (
            SELECT l_partkey, CAST(SUM(sq) AS BIGINT) AS tq FROM ps GROUP BY l_partkey
        )
        SELECT DISTINCT s_suppkey, s_name
        FROM ps JOIN tot USING (l_partkey)
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE 2 * sq > tq
    """),
    tags=("J", "A", "subquery"),
)
def q20_dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers holding more than half of a part's
    shipped volume (excess-stock in the original).  Two-level
    aggregation over the SAME grouping prefix — the per-part total
    reuses the (partkey, suppkey) partial rollup, so the second agg
    is exchange-free — and the half threshold compares scaled
    integers (2·sq > tq), exact in both engines."""
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        int_sum(F.col("l_quantity"), 100).alias("sq")
    )
    tot = ps.groupBy("l_partkey").agg(F.sum("sq").alias("tq"))
    return (
        ps.join(tot, on="l_partkey")
        .filter(2 * F.col("sq") > F.col("tq"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select("s_suppkey", "s_name")
        .distinct()
    )


@register(
    "q21_waiting_suppliers",
    oracle=dedent("""
        SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        FROM lineitem l1
        JOIN supplier ON l1.l_suppkey = s_suppkey
        WHERE l1.l_returnflag = 'R'
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_returnflag = 'R')
        GROUP BY s_name
    """),
    tags=("J1", "J2", "subquery"),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the only-supplier-at-fault pattern — an EXISTS
    and a NOT EXISTS against the same table with inequality
    correlation, i.e. a LEFT SEMI and a LEFT ANTI stacked on one scan.
    Both probes reuse the same (orderkey)-keyed exchange; the final
    rollup is small (one group per supplier)."""
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    l1 = li.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_suppkey"
    )
    l2 = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    )
    out = (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("o2")) & (F.col("l_suppkey") != F.col("s2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("o3")) & (F.col("l_suppkey") != F.col("s3")),
            "left_anti",
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
    )
    return out.groupBy("s_name").agg(F.count(F.lit(1)).alias("numwait"))
