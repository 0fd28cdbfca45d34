"""Data-integrity audit queries: declarative constraint checking and
wide→long reshaping.

``constraints_check`` is the deequ-style data-quality gate a corpus
pipeline runs before promoting a snapshot: primary-key uniqueness,
referential integrity, null and range rules — each a violation COUNT
so the output is all-integer (exact across engines) and the pass/fail
bit derives from it.
"""

from __future__ import annotations

from textwrap import dedent

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kcidb_spark.queries.registry import register
from kcidb_spark.tables import table
import os

# ---------------------------------------------------------------------------
# Declarative constraint audit
# ---------------------------------------------------------------------------


@register(
    "constraints_check",
    oracle=dedent("""
        SELECT 'orders_pk_unique' AS constraint_name,
               CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
                   AS violations
        FROM orders
        UNION ALL
        SELECT 'orders_custkey_fk',
               CAST(count(*) AS BIGINT)
        FROM orders o WHERE NOT EXISTS (
            SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        UNION ALL
        SELECT 'lineitem_orderkey_fk',
               CAST(count(*) AS BIGINT)
        FROM lineitem l WHERE NOT EXISTS (
            SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        UNION ALL
        SELECT 'documents_scan_rules',
               CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END)
                    + sum(CASE WHEN n_chars < 0 THEN 1 ELSE 0 END)
                    + sum(CASE WHEN length(text) != n_chars
                          THEN 1 ELSE 0 END) AS BIGINT)
        FROM documents
        UNION ALL
        SELECT 'events_ts_nonnull',
               CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        FROM events
    """),
    tags=("pipeline", "integrity"),
)
def constraints_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-promotion data-quality gate: one row per declared
    constraint with its violation count — PK uniqueness, two foreign
    keys, per-row scan rules (nullability, range, n_chars==length
    consistency), event-time presence.

    Scale shape: per-row rules for one table FUSE into a single scan
    (one agg computing every CASE sum — 'documents_scan_rules' is
    three rules in one pass, the pattern to extend per table); FK
    checks are LEFT ANTI joins that only shuffle the key column; the
    PK check is count vs count-distinct in one partial agg.  Each
    branch is independently prunable — at 100 TB you run the cheap
    scans nightly and the FK anti-joins weekly.
    """
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    lineitem = table(spark, sf_dir, "lineitem")
    docs = table(spark, sf_dir, "documents")
    events = table(spark, sf_dir, "events")

    def one(name: str, agg) -> DataFrame:
        return agg.select(
            F.lit(name).alias("constraint_name"),
            F.col("violations").cast("long").alias("violations"),
        )

    pk = one(
        "orders_pk_unique",
        orders.agg(
            (F.count(F.lit(1)) - F.count_distinct(F.col("o_orderkey")))
            .alias("violations")
        ),
    )
    fk_orders = one(
        "orders_custkey_fk",
        orders.join(
            customer,
            orders["o_custkey"] == customer["c_custkey"],
            "left_anti",
        ).agg(F.count(F.lit(1)).alias("violations")),
    )
    fk_lineitem = one(
        "lineitem_orderkey_fk",
        lineitem.join(
            orders,
            lineitem["l_orderkey"] == orders["o_orderkey"],
            "left_anti",
        ).agg(F.count(F.lit(1)).alias("violations")),
    )
    doc_rules = one(
        "documents_scan_rules",
        docs.agg(
            (
                F.sum(F.when(F.col("text").isNull(), 1).otherwise(0))
                + F.sum(F.when(F.col("n_chars") < 0, 1).otherwise(0))
                + F.sum(
                    F.when(
                        F.length("text") != F.col("n_chars"), 1
                    ).otherwise(0)
                )
            ).alias("violations")
        ),
    )
    ev_rule = one(
        "events_ts_nonnull",
        events.agg(
            F.sum(F.when(F.col("ts").isNull(), 1).otherwise(0))
            .alias("violations")
        ),
    )
    return (
        pk.unionByName(fk_orders)
        .unionByName(fk_lineitem)
        .unionByName(doc_rules)
        .unionByName(ev_rule)
    )


# ---------------------------------------------------------------------------
# A16 — unpivot (wide → long melt)
# ---------------------------------------------------------------------------


@register(
    "a16_unpivot",
    oracle=dedent("""
        WITH wide AS (
            SELECT lang,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                   CAST(max(n_chars) AS BIGINT) AS max_chars
            FROM documents GROUP BY lang
        )
        SELECT lang, 'n_docs' AS metric, n_docs AS value FROM wide
        UNION ALL
        SELECT lang, 'sum_chars', sum_chars FROM wide
        UNION ALL
        SELECT lang, 'max_chars', max_chars FROM wide
    """),
    tags=("A", "reshape"),
)
def a16_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): per-language aggregate columns reshaped to
    (lang, metric, value) rows — the inverse of a9's pivot, via the
    ``stack`` generator.  The reshape is a pure projection (each input
    row fans out to 3 in the same task, no shuffle beyond the source
    agg) — at scale melt is always preferable to N self-unions, which
    would scan the aggregate N times.
    """
    wide = (
        table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )
    return wide.select(
        "lang",
        F.expr(
            "stack(3, 'n_docs', n_docs, 'sum_chars', sum_chars,"
            " 'max_chars', max_chars)"
        ).alias("metric", "value"),
    )


# ---------------------------------------------------------------------------
# W — ntile bucketing (balanced quantile assignment)
# ---------------------------------------------------------------------------


@register(
    "w_ntile_quartiles",
    oracle=dedent("""
        SELECT o_orderkey, o_orderpriority,
               CAST(ntile(4) OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY o_totalprice, o_orderkey
               ) AS BIGINT) AS tile
        FROM orders
    """),
    tags=("W",),
)
def w_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced quartile assignment per priority class via ntile(4) —
    the window primitive behind equal-size curriculum/price banding
    (both engines define ntile identically: ⌈n/4⌉-or-⌊n/4⌋ balanced
    buckets in frame order, integer output, no float quantile edge).
    One shuffle on the partition key; the per-key sort feeds the same
    exchange any same-key rollup reuses."""
    orders = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey", "o_orderpriority",
        F.ntile(4).over(w).cast("long").alias("tile"),
    )


# ---------------------------------------------------------------------------
# A17 — GROUPING SETS (disjoint rollup axes in one pass)
# ---------------------------------------------------------------------------


@register(
    "a17_grouping_sets",
    oracle=dedent("""
        SELECT lang, source,
               CAST(2 * grouping(lang) + grouping(source) AS BIGINT) AS gid,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM documents
        GROUP BY GROUPING SETS ((lang), (source), ())
    """),
    tags=("A", "rollup"),
)
def a17_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — per-language totals, per-source
    totals, and the grand total in ONE scan (cube/rollup's general
    form, a11's complement: disjoint axes instead of the full
    lattice).  ``gid`` disambiguates which axis produced a row from
    the NULLs grouping introduces (2·grouping(lang)+grouping(source),
    spelled identically in both engines).  Spark expands the sets
    into one Expand + single partial-agg exchange — never N scans
    UNION ALLed.
    """
    path = os.path.join(sf_dir, "documents.parquet")
    return spark.sql(f"""
        SELECT lang, source,
               CAST(2 * grouping(lang) + grouping(source) AS BIGINT) AS gid,
               count(*) AS n_docs,
               sum(n_chars) AS sum_chars
        FROM parquet.`{path}`
        GROUP BY GROUPING SETS ((lang), (source), ())
    """)


# ---------------------------------------------------------------------------
# Q13/Q15 — order-count distribution and top supplier
# ---------------------------------------------------------------------------


@register(
    "q13_order_distribution",
    oracle=dedent("""
        SELECT n_orders, CAST(count(*) AS BIGINT) AS n_customers
        FROM (
            SELECT c_custkey,
                   CAST(count(o_orderkey) AS BIGINT) AS n_orders
            FROM customer LEFT JOIN orders ON o_custkey = c_custkey
            GROUP BY c_custkey
        )
        GROUP BY n_orders
    """),
    tags=("A", "J"),
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: the customer order-count distribution —
    LEFT join so zero-order customers keep their 0 bucket
    (count(o_orderkey) counts non-NULLs; an inner join would silently
    drop the most interesting bucket), then a second tiny groupBy
    over the per-customer counts.  First agg shuffles on custkey
    (AQE-coalesced), second on ≤ max-orders distinct values."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, orders["o_custkey"] == cust["c_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


@register(
    "q15_top_supplier",
    oracle=dedent("""
        WITH rev AS (
            SELECT l_suppkey,
                   CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
                                       * 10000) AS BIGINT)) AS BIGINT)
                       AS total_rev
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_rev / 10000.0 AS total_revenue
        FROM supplier JOIN rev ON s_suppkey = l_suppkey
        WHERE total_rev = (SELECT max(total_rev) FROM rev)
        ORDER BY s_suppkey
    """),
    tags=("A", "J", "O3"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: quarterly revenue per supplier, keep the
    maximum (ALL ties, not top-1 — the reason this is a max-equality
    filter against a 1-row broadcast aggregate, not row_number()=1
    which would break ties arbitrarily and non-portably).  The
    revenue view computes once and feeds both the max and the filter
    via scoped persist; supplier joins broadcast-side."""
    from kcidb_spark.cache import scoped_persist
    from kcidb_spark.queries.relational import _utc as _utc_rel

    _utc_rel(spark)
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate")
         >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate")
           < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")
    rev = scoped_persist(
        li.groupBy("l_suppkey").agg(F.sum(cents).alias("total_rev"))
    )
    mx = rev.agg(F.max("total_rev").alias("mx"))
    supp = table(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("mx"))
        .join(supp, supp["s_suppkey"] == rev["l_suppkey"])
        .select(
            "s_suppkey", "s_name",
            (F.col("total_rev").cast("long") / 10000.0)
            .alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q7/Q18 — nation-pair volume and large-volume customers
# ---------------------------------------------------------------------------


@register(
    "q7_nation_volume",
    oracle=dedent("""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS BIGINT) AS yr,
               CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
                                   * 10000) AS BIGINT)) AS BIGINT)
                   / 10000.0 AS revenue
        FROM lineitem
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation n1 ON n1.n_nationkey = s_nationkey
        JOIN nation n2 ON n2.n_nationkey = c_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        GROUP BY supp_nation, cust_nation, yr
    """),
    tags=("A", "J"),
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between a nation pair, per
    direction per year — the five-way join chain with a symmetric
    pair predicate.  Both nation sides broadcast (bounded dimension,
    tables.BROADCAST_TABLES); customer/supplier join hash-keyed; the
    pair disjunction prunes AFTER the nation joins resolve names —
    Catalyst pushes each branch's equality into the respective
    broadcast hash probe.  Revenue stays scaled-integer."""
    from kcidb_spark.queries.relational import _utc as _utc_rel

    _utc_rel(spark)
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    rev = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")
    pair = (
        (F.col("supp_nation") == "NATION_1")
        & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2")
        & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("long").alias("yr"),
        )
        .agg((F.sum(rev).cast("long") / 10000.0).alias("revenue"))
    )


@register(
    "q18_large_volume",
    oracle=dedent("""
        SELECT c_custkey, o_orderkey, o_totalprice,
               CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        FROM customer
        JOIN orders   ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
        GROUP BY c_custkey, o_orderkey, o_totalprice
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 20
    """),
    tags=("A", "J1", "O3"),
)
def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-volume orders via HAVING + IN-subquery
    (Catalyst rewrites the IN to a LEFT SEMI against the pre-filtered
    aggregate — the subquery's own groupBy shuffle is the only extra
    exchange, reused nowhere), then the customer/order rollup and a
    TakeOrdered top-k.  Quantities are integral so their sum is exact
    under any order."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 250)
        .select("l_orderkey")
    )
    return (
        cust.join(orders, orders["o_custkey"] == cust["c_custkey"])
        .join(li, li["l_orderkey"] == orders["o_orderkey"])
        .join(
            big.withColumnRenamed("l_orderkey", "big_key"),
            F.col("o_orderkey") == F.col("big_key"),
            "left_semi",
        )
        .groupBy("c_custkey", "o_orderkey", "o_totalprice")
        .agg(F.sum("l_quantity").cast("long").alias("sum_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# J6 — FULL OUTER reconciliation of two snapshots
# ---------------------------------------------------------------------------


@register(
    "j6_full_outer_reconcile",
    oracle=dedent("""
        WITH a AS (
            SELECT lang, source, CAST(count(*) AS BIGINT) AS n_a
            FROM documents
            WHERE CAST(substring(source, 4) AS BIGINT) < 10
            GROUP BY lang, source
        ),
        b AS (
            SELECT lang, source, CAST(count(*) AS BIGINT) AS n_b
            FROM documents
            WHERE CAST(substring(source, 4) AS BIGINT) >= 5
            GROUP BY lang, source
        )
        SELECT lang, source, n_a, n_b,
               CASE WHEN n_a IS NULL THEN 'right_only'
                    WHEN n_b IS NULL THEN 'left_only'
                    ELSE 'both' END AS status
        FROM a FULL JOIN b USING (lang, source)
    """),
    tags=("J", "U3"),
)
def j6_full_outer_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation via FULL OUTER join — the diff-report
    shape (report merge U3's verification twin): two overlapping
    source slices aggregated per (lang, source), full-outer joined so
    rows present in only one side survive with NULLs, classified
    both / left_only / right_only.  Join keys passed as a name list
    coalesce automatically (≡ SQL USING).  Full-outer cannot
    broadcast (both sides must be complete) — it hash-partitions both
    on the key, which is exactly right: at scale the reconcile key
    is the partition key and the join is co-located."""
    docs = table(spark, sf_dir, "documents")
    src_num = F.substring("source", 4, 10).cast("long")
    a = (
        docs.filter(src_num < 10)
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("n_a"))
    )
    b = (
        docs.filter(src_num >= 5)
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("n_b"))
    )
    return a.join(b, on=["lang", "source"], how="full_outer").select(
        "lang", "source", "n_a", "n_b",
        F.when(F.col("n_a").isNull(), "right_only")
        .when(F.col("n_b").isNull(), "left_only")
        .otherwise("both")
        .alias("status"),
    )


# ---------------------------------------------------------------------------
# P8 — MapType: JSON → map column → member explode
# ---------------------------------------------------------------------------


@register(
    "p8_map_explode",
    oracle=dedent("""
        SELECT event_id, k,
               CAST(json_extract(props, '$.' || k) AS BIGINT) AS v
        FROM (
            SELECT event_id, props, unnest(json_keys(props)) AS k
            FROM events WHERE user_id <= 20
        )
    """),
    tags=("P7", "map"),
)
def p8_map_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON object → MapType column → one row per member — the
    schema-on-read path for property bags whose keys are NOT known at
    query-author time (p7 extracts a named field; this enumerates
    whatever keys the data carries).  ``from_json`` to
    map<string,bigint> parses once per row; the map generator
    explodes in-task (no shuffle) — at 100 TB the parse cost is the
    scan cost, and key-cardinality skew lands in the downstream agg,
    not here."""
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") <= 20)
    return ev.select(
        "event_id",
        F.explode(
            F.from_json(F.col("props"), "map<string,bigint>")
        ).alias("k", "v"),
    )


# ---------------------------------------------------------------------------
# F — higher-order array functions (SQL-text lambdas, JVM-side)
# ---------------------------------------------------------------------------


@register(
    "f_array_hof",
    oracle=dedent("""
        WITH base AS (
            SELECT doc_id,
                   generate_series(1, CAST(doc_id % 7 AS BIGINT) + 1)
                       AS arr
            FROM documents
        )
        SELECT doc_id,
               CAST(length(arr) AS BIGINT) AS n,
               CAST(list_reduce(arr, (a, x) -> a + x) AS BIGINT)
                   AS sum_x,
               CAST(list_reduce(list_transform(arr, x -> x * 2),
                                (a, x) -> a + x) AS BIGINT)
                   AS sum_doubled,
               CAST(length(list_filter(arr, x -> x % 2 = 0)) AS BIGINT)
                   AS n_even,
               CAST(list_max(list_transform(
                        generate_series(1, length(arr)),
                        i -> arr[i] * arr[length(arr) + 1 - i]))
                    AS BIGINT) AS max_zip
        FROM base
    """),
    tags=("F", "hof"),
)
def f_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The higher-order-function family as first-class driver-checked
    operators: transform / filter / aggregate / zip_with over a
    per-row integer array, all via SQL-TEXT lambdas — compiled JVM
    expressions inside whole-stage codegen.  (A Python
    ``lambda`` passed to ``F.transform`` runs interpreted, measured
    ~50× slower — the single most common HOF performance mistake;
    every HOF in this package is SQL-text for that reason.)  Pure
    integer arithmetic → hash-exact against DuckDB's list_* twins.
    """
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.expr("sequence(1, (doc_id % 7) + 1)").alias("arr"),
    ).select(
        "doc_id",
        F.size("arr").cast("long").alias("n"),
        F.expr(
            "aggregate(arr, 0L, (a, x) -> a + x)"
        ).cast("long").alias("sum_x"),
        F.expr(
            "aggregate(transform(arr, x -> x * 2), 0L, (a, x) -> a + x)"
        ).cast("long").alias("sum_doubled"),
        F.expr(
            "size(filter(arr, x -> x % 2 = 0))"
        ).cast("long").alias("n_even"),
        F.expr(
            "array_max(zip_with(arr, reverse(arr), (a, b) -> a * b))"
        ).cast("long").alias("max_zip"),
    )


# ---------------------------------------------------------------------------
# Q17/Q22 — correlated subqueries (scalar and anti-join + global agg)
# ---------------------------------------------------------------------------


@register(
    "q17_small_quantity",
    oracle=dedent("""
        SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) / 700.0 AS avg_yearly,
               CAST(count(*) AS BIGINT) AS n_items
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#13'
          AND l_quantity < (
              SELECT 0.2 * avg(l2.l_quantity)
              FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """),
    tags=("A", "J"),
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: a CORRELATED SCALAR SUBQUERY (per-part 20%%
    of average quantity) filtering the outer join — Catalyst
    decorrelates it into an aggregate + equi-join, never a per-row
    re-execution (the naive reading would rescan lineitem once per
    outer row; the decorrelated plan scans it exactly twice).
    ``avg(l_quantity)`` is portable here because quantities are
    integral — double addition of integers is exact (no rounding
    until 2^53), so the sum is order-independent and the avg one
    division.  The revenue sum stays scaled-integer.
    """
    from kcidb_spark.queries.relational import _utc as _utc_rel

    _utc_rel(spark)
    li = os.path.join(sf_dir, "lineitem.parquet")
    pt = os.path.join(sf_dir, "part.parquet")
    return spark.sql(f"""
        -- 700.0D: Spark SQL parses a bare decimal literal as DECIMAL
        -- (DataFrame lit()s are doubles) — the D suffix keeps the
        -- division an IEEE double op matching the oracle.
        SELECT SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 700.0D
                   AS avg_yearly,
               count(*) AS n_items
        FROM parquet.`{li}` JOIN parquet.`{pt}` ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#13'
          AND l_quantity < (
              SELECT 0.2 * avg(l2.l_quantity)
              FROM parquet.`{li}` l2 WHERE l2.l_partkey = p_partkey)
    """)


@register(
    "q22_idle_customers",
    oracle=dedent("""
        WITH thresh AS (
            SELECT CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT))
                        AS BIGINT)
                   / (100.0 * count(*)) AS t
            FROM customer WHERE c_acctbal > 0
        )
        SELECT c_nationkey,
               CAST(count(*) AS BIGINT) AS n_custs,
               CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT))
                    AS BIGINT) / 100.0 AS total_acctbal
        FROM customer CROSS JOIN thresh
        WHERE c_acctbal > thresh.t
          AND NOT EXISTS (
              SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY c_nationkey
    """),
    tags=("A", "J2"),
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: rich-but-idle customers — balance above the
    positive-balance average (an uncorrelated scalar broadcast as a
    1-row frame, NEVER a driver-side collect) who have placed no
    orders (anti-join), rolled up per nation.  The threshold average
    is spelled as an exact integer sum over 100·count so both
    engines divide identical operands — a bare ``avg(double)`` would
    hash-mismatch on aggregation order.
    """
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    thresh = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(
            (F.sum(cents) / (F.lit(100.0) * F.count(F.lit(1)))).alias("t")
        )
    )
    rich = (
        cust.crossJoin(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("t"))
    )
    idle = rich.join(
        orders, rich["c_custkey"] == orders["o_custkey"], "left_anti"
    )
    return idle.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_custs"),
        (F.sum(cents).cast("long") / 100.0).alias("total_acctbal"),
    )


# ---------------------------------------------------------------------------
# U4/U5 — multiset set-ops and union-by-name
# ---------------------------------------------------------------------------


@register(
    "u4_multiset_ops",
    oracle=dedent("""
        WITH a AS (SELECT lang FROM documents WHERE n_chars >= 200),
             b AS (SELECT lang FROM documents WHERE source = 'src1')
        SELECT 'intersect_all' AS op, lang,
               CAST(count(*) AS BIGINT) AS n
        FROM (SELECT lang FROM a INTERSECT ALL SELECT lang FROM b)
        GROUP BY lang
        UNION ALL
        SELECT 'except_all', lang, CAST(count(*) AS BIGINT)
        FROM (SELECT lang FROM a EXCEPT ALL SELECT lang FROM b)
        GROUP BY lang
    """),
    tags=("U",),
)
def u4_multiset_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL / EXCEPT ALL — the *multiset* set operations
    (u2/u3 cover the distinct forms): duplicates carry multiplicity,
    so ``a EXCEPT ALL b`` keeps max(count_a − count_b, 0) copies per
    value.  Spark lowers both to a single count-aggregate + generate
    (one shuffle each), never a join per duplicate."""
    docs = table(spark, sf_dir, "documents")
    a = docs.filter(F.col("n_chars") >= 200).select("lang")
    b = docs.filter(F.col("source") == "src1").select("lang")
    inter = (
        a.intersectAll(b)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("intersect_all").alias("op"), "lang", "n")
    )
    exc = (
        a.exceptAll(b)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("except_all").alias("op"), "lang", "n")
    )
    return inter.unionByName(exc)


@register(
    "u5_union_by_name",
    oracle=dedent("""
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n,
               CAST(count(n_chars) AS BIGINT) AS with_chars,
               CAST(count(src) AS BIGINT) AS with_src
        FROM (
            SELECT lang, n_chars, NULL AS src FROM documents
            WHERE doc_id % 2 = 0
            UNION ALL BY NAME
            SELECT source AS src, lang FROM documents
            WHERE doc_id % 2 = 1
        )
        GROUP BY lang
    """),
    tags=("U",),
)
def u5_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union by NAME with missing columns — schema-evolution-tolerant
    concatenation (two report generations with different column sets
    align by name, absent columns become NULL) — Spark's
    ``unionByName(allowMissingColumns=True)`` ≡ DuckDB's
    ``UNION ALL BY NAME``.  Positional UNION here would silently pair
    lang with src — by-name is the only safe form once schemas
    drift."""
    docs = table(spark, sf_dir, "documents")
    old_gen = docs.filter(F.col("doc_id") % 2 == 0).select(
        "lang", "n_chars"
    )
    new_gen = docs.filter(F.col("doc_id") % 2 == 1).select(
        F.col("source").alias("src"), "lang"
    )
    both = old_gen.unionByName(new_gen, allowMissingColumns=True)
    return both.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("n_chars").alias("with_chars"),
        F.count("src").alias("with_src"),
    )


# ---------------------------------------------------------------------------
# W — value-picking window functions (first/last/nth, IGNORE NULLS)
# ---------------------------------------------------------------------------


@register(
    "w_value_picks",
    oracle=dedent("""
        SELECT doc_id, lang,
               first_value(doc_id) OVER w AS shortest_doc,
               last_value(doc_id) OVER (
                   PARTITION BY lang ORDER BY n_chars, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND UNBOUNDED FOLLOWING
               ) AS longest_doc,
               nth_value(doc_id, 2) OVER (
                   PARTITION BY lang ORDER BY n_chars, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND UNBOUNDED FOLLOWING
               ) AS second_shortest
        FROM documents
        WINDOW w AS (PARTITION BY lang ORDER BY n_chars, doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING
                     AND UNBOUNDED FOLLOWING)
    """),
    tags=("W",),
)
def w_value_picks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value with EXPLICIT full-frame
    bounds — the classic trap is the default frame (RANGE UNBOUNDED
    PRECEDING → CURRENT ROW), under which last_value degenerates to
    the current row on every engine; spelling ROWS UNBOUNDED
    PRECEDING/FOLLOWING is the only portable form.  One partition
    exchange serves all three picks."""
    docs = table(spark, sf_dir, "documents")
    full = (
        W.partitionBy("lang")
        .orderBy("n_chars", "doc_id")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return docs.select(
        "doc_id", "lang",
        F.first("doc_id").over(full).alias("shortest_doc"),
        F.last("doc_id").over(full).alias("longest_doc"),
        F.nth_value("doc_id", 2).over(full).alias("second_shortest"),
    )


# ---------------------------------------------------------------------------
# W — rank-ratio window functions (percent_rank / cume_dist / dense_rank)
# ---------------------------------------------------------------------------


@register(
    "w_rank_ratios",
    oracle=dedent("""
        SELECT doc_id, lang,
               CAST(rank() OVER w AS BIGINT) AS rk,
               CAST(dense_rank() OVER w AS BIGINT) AS drk,
               percent_rank() OVER w AS prk,
               cume_dist() OVER w AS cd
        FROM documents
        WINDOW w AS (PARTITION BY lang ORDER BY n_chars, doc_id)
    """),
    tags=("W",),
)
def w_rank_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-function family in one window: rank,
    dense_rank, percent_rank, cume_dist.  The two ratio functions ARE
    cross-engine hashable despite being doubles: percent_rank is
    (rank−1)/(n−1) and cume_dist is peers≤current/n — single IEEE
    divisions of identical integers, bit-stable everywhere (contrast
    a *sum* of doubles, which is not).  All four share one
    lang-partitioned exchange and sort."""
    docs = table(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy("n_chars", "doc_id")
    return docs.select(
        "doc_id", "lang",
        F.rank().over(w).cast("long").alias("rk"),
        F.dense_rank().over(w).cast("long").alias("drk"),
        F.percent_rank().over(w).alias("prk"),
        F.cume_dist().over(w).alias("cd"),
    )


# ---------------------------------------------------------------------------
# F — predicate aggregates (count_if / bool_and / bool_or)
# ---------------------------------------------------------------------------


@register(
    "f_agg_predicates",
    oracle=dedent("""
        SELECT event_type,
               CAST(count(*) FILTER (WHERE value > 50) AS BIGINT)
                   AS n_high,
               bool_and(value >= 0) AS all_nonneg,
               bool_or(value > 99) AS any_gt99
        FROM events
        GROUP BY event_type
    """),
    tags=("F", "A"),
)
def f_agg_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate aggregates — conditional count and boolean
    conjunction/disjunction rollups (count_if / bool_and / bool_or,
    spelled COUNT(*) FILTER / bool_and / bool_or in ANSI), the
    assertion-rollup primitives constraints_check builds on.  All
    three partial-aggregate: booleans merge with AND/OR map-side, so
    the exchange carries one row per (partition, type)."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count_if(F.col("value") > 50).alias("n_high"),
        F.bool_and(F.col("value") >= 0).alias("all_nonneg"),
        F.bool_or(F.col("value") > 99).alias("any_gt99"),
    )


# ---------------------------------------------------------------------------
# Sketch aggregations — the 100 TB approximate-rollup family
# ---------------------------------------------------------------------------
#
# HLL++/quantile sketches are mergeable partial aggregates — THE
# mechanism for distinct-counts and quantiles at 100 TB (exact
# count-distinct shuffles every key; a sketch ships ~1.5 KB per
# partition).  Sketch internals differ between engines, so these two
# register WITHOUT a DuckDB oracle (the driver records a rows-only
# check); their accuracy contract is property-tested against exact
# answers in test_sketches.py instead.


@register(
    "sketch_distinct_users",
    oracle=None,
    tags=("A", "sketch"),
    schema="event_type string, approx_users bigint, exact_users bigint,"
    " rel_err_pct double",
)
def sketch_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type via HyperLogLog++
    (``approx_count_distinct``, rsd=2%) next to the exact count —
    at scale the sketch column replaces the exact one and the rollup
    becomes re-aggregable across days/partitions (HLL union is the
    merge).  test_sketches.py pins the relative error ≤ 5·rsd."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias(
                "approx_users"
            ),
            F.count_distinct(F.col("user_id")).alias("exact_users"),
        )
        .withColumn(
            "rel_err_pct",
            F.round(
                100.0
                * F.abs(F.col("approx_users") - F.col("exact_users"))
                / F.col("exact_users"),
                2,
            ),
        )
    )


@register(
    "sketch_hll_union_rollup",
    oracle=None,
    tags=("A", "sketch"),
    schema="event_type string, union_users bigint, direct_users bigint,"
    " exact_users bigint",
)
def sketch_hll_union_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STORED-ROLLUP path behind the sketches' 100 TB claim, made
    explicit: per-(type, day) HLL sketches (Apache DataSketches,
    ``hll_sketch_agg``) are built as binary columns — the shape a
    daily rollup table persists — then merged across days with
    ``hll_union_agg`` AFTER a repartition (the storage/stage boundary
    a real rollup crosses), so re-aggregation never rescans raw
    events.  Emits the union-of-partials estimate next to the
    single-shot sketch estimate and the exact count: union == direct
    EXACTLY (HLL union at equal lgConfigK is lossless), both inside
    the error envelope vs exact (test_sketches.py pins both claims;
    SCALE.md measures them at 100x)."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.hll_sketch_agg("user_id", F.lit(12)).alias("sk"))
    unioned = (
        daily.repartition("event_type")
        .groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(
                F.hll_union_agg("sk", F.lit(False))
            ).alias("union_users")
        )
    )
    direct = ev.groupBy("event_type").agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg("user_id", F.lit(12))
        ).alias("direct_users"),
        F.count_distinct(F.col("user_id")).alias("exact_users"),
    )
    return unioned.join(direct, on="event_type").select(
        "event_type", "union_users", "direct_users", "exact_users"
    )


#: Heavy-hitter sketch capacity.  Above the distinct-user count of the
#: test corpora, so the sketch is provably EXACT there (a frequent-
#:items sketch with no evictions reports true counts) — the regime
#: where equality assertions are legitimate; under-capacity behavior
#: (count error ≤ εN) is property-tested separately.
_TOPK_TRACKED = 4096


@register(
    "sketch_top_items",
    oracle=None,
    tags=("A", "sketch"),
    schema="event_type string, item bigint, est_count bigint,"
    " exact_count bigint",
)
def sketch_top_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters per event type via the frequent-items sketch
    (``approx_top_k``: Spark's SpaceSaving-family aggregate) — the
    third leg of the approximate-rollup family (HLL = distinct,
    KLL/GK = quantiles, this = frequency).  At 100 TB this is 'top
    domains / top users / top tokens' without a full groupBy: the
    sketch partial-aggregates map-side at ``maxItemsTracked`` entries
    per partition and merges in the exchange, so the shuffle carries
    sketches, not keys.  Each estimated item is emitted next to its
    exact count; with capacity above the corpus's distinct-user count
    the sketch evicts nothing and est == exact (test_sketches.py pins
    that, plus the ≤ εN overcount guarantee when capacity is forced
    below the heavy tail).  Rows-only under the gate: tie order at
    the k-th rank is sketch-internal, so values may permute while the
    row count stays fixed."""
    ev = table(spark, sf_dir, "events")
    est = (
        ev.groupBy("event_type")
        .agg(
            F.expr(
                f"approx_top_k(user_id, 5, {_TOPK_TRACKED})"
            ).alias("top")
        )
        .select(
            "event_type",
            F.explode("top").alias("e"),
        )
        .select(
            "event_type",
            F.col("e.item").alias("item"),
            F.col("e.count").alias("est_count"),
        )
    )
    exact = ev.groupBy("event_type", F.col("user_id").alias("item")).agg(
        F.count(F.lit(1)).alias("exact_count")
    )
    return est.join(exact, on=["event_type", "item"], how="left").select(
        "event_type", "item", "est_count", "exact_count"
    )


@register(
    "sketch_topk_union_rollup",
    oracle=None,
    tags=("A", "sketch"),
    schema="event_type string, n_items bigint, union_eq_direct boolean,"
    " union_eq_exact boolean",
)
def sketch_topk_union_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stored-rollup path for the FREQUENCY sketch, mirroring
    sketch_hll_union_rollup: per-(type, day) frequent-items states
    (``approx_top_k_accumulate`` — the binary-state shape a daily
    rollup table persists) merged across days with
    ``approx_top_k_combine`` after a repartition boundary, then
    estimated.  In the exact regime (capacity ≥ distinct items, no
    evictions) the combined estimate must equal both the single-shot
    sketch and the exact per-item counts AS MAPS — set-compared here
    (sort_array over (item, count) structs) because rank order among
    equal counts is sketch-internal.  Under capacity pressure the
    merge keeps the ≤ εN guarantee but equality becomes approximate;
    this entry pins the lossless-rollup configuration, the one a real
    daily pipeline should run in for its actual heavy hitters."""
    ev = table(spark, sf_dir, "events")
    k = _TOPK_TRACKED  # estimate everything tracked: full-map compare
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.expr(
            f"approx_top_k_accumulate(user_id, {_TOPK_TRACKED})"
        ).alias("sk")
    )
    unioned = (
        daily.repartition("event_type")
        .groupBy("event_type")
        .agg(
            F.expr(
                f"approx_top_k_estimate("
                f"approx_top_k_combine(sk, {_TOPK_TRACKED}), {k})"
            ).alias("union_top")
        )
    )
    direct = ev.groupBy("event_type").agg(
        F.expr(
            f"approx_top_k_estimate("
            f"approx_top_k_accumulate(user_id, {_TOPK_TRACKED}), {k})"
        ).alias("direct_top")
    )
    exact = (
        ev.groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("event_type")
        .agg(
            F.collect_list(
                F.struct(
                    F.col("user_id").alias("item"),
                    F.col("cnt").alias("count"),
                )
            ).alias("exact_top")
        )
    )
    def canon(col: str):
        # Canonical sorted array<struct<item:bigint,count:bigint>> so
        # the equality compares values, not sketch-internal rank order
        # or the engines' int-vs-bigint count typing.
        return F.sort_array(
            F.expr(
                f"transform({col}, e -> struct("
                "CAST(e.item AS BIGINT) AS item,"
                " CAST(e.count AS BIGINT) AS count))"
            )
        )

    return (
        unioned.join(direct, "event_type")
        .join(exact, "event_type")
        .select(
            "event_type",
            F.size("union_top").cast("long").alias("n_items"),
            (canon("union_top") == canon("direct_top")).alias(
                "union_eq_direct"
            ),
            (canon("union_top") == canon("exact_top")).alias(
                "union_eq_exact"
            ),
        )
    )


@register(
    "sketch_value_quantiles",
    oracle=None,
    tags=("A", "sketch"),
    schema="event_type string, approx_p50 double, approx_p95 double,"
    " exact_p50 double, exact_p95 double",
)
def sketch_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type value quantiles via the Greenwald-Khanna sketch
    (``percentile_approx``, accuracy 1/ε=10000) — the re-aggregable
    alternative to a15's exact per-group sort at extreme group
    cardinality.  Each output row carries the approx p50/p95 and the
    exact ones; test_sketches.py pins the rank error."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.percentile_approx("value", [0.5, 0.95], 10000).alias("approx_q"),
        F.percentile(F.col("value"), F.lit(0.5)).alias("exact_p50"),
        F.percentile(F.col("value"), F.lit(0.95)).alias("exact_p95"),
    ).select(
        "event_type",
        F.col("approx_q")[0].alias("approx_p50"),
        F.col("approx_q")[1].alias("approx_p95"),
        "exact_p50",
        "exact_p95",
    )


# ---------------------------------------------------------------------------
# W — RANGE frame window (interval-bounded running aggregate)
# ---------------------------------------------------------------------------


@register(
    "w_range_frame_sum",
    oracle=dedent("""
        SELECT event_id, user_id,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER (
                   PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL 30 MINUTES PRECEDING
                   AND CURRENT ROW
               ) AS BIGINT) / 100.0 AS rolling_30m
        FROM events
        WHERE user_id <= 20
    """),
    tags=("W",),
)
def w_range_frame_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute rolling sum per user — a RANGE frame bounded by
    event-time distance, not row count (ROWS frames count neighbors;
    RANGE frames look back an interval, the correct semantics for
    irregular event streams).  Spark expresses interval RANGE frames
    over the epoch-seconds ordering column; DuckDB writes the same
    frame natively over the timestamp — identical row sets, and the
    scaled-integer sum keeps the frame aggregation order-proof.  Ties
    (equal ts) are IN the frame together on both engines — RANGE
    includes peers, which is exactly why no ROWS formulation can
    mimic it."""
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") <= 20)
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-1800, 0)
    )
    rolling = F.sum(F.round(F.col("value") * 100).cast("long")).over(w)
    return ev.select(
        "event_id", "user_id",
        (rolling.cast("long") / 100.0).alias("rolling_30m"),
    )


# ---------------------------------------------------------------------------
# Q14 — promo revenue share (conditional-aggregate ratio + broadcast dim)
# ---------------------------------------------------------------------------


@register(
    "q14_promo_revenue",
    oracle=dedent("""
        SELECT 100.0 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                   THEN CAST(ROUND(l_extendedprice * (1 - l_discount)
                                   * 10000) AS BIGINT)
                   ELSE 0 END) AS BIGINT)
               / CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
                                     * 10000) AS BIGINT)) AS BIGINT)
                   AS promo_revenue_pct,
               CAST(count(*) AS BIGINT) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1995-10-01 00:00:00'
    """),
    tags=("A", "J1"),
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: one-month shipdate slice (pushed to the scan)
    joined to the part dimension, then a conditional-aggregate ratio —
    promo revenue as a percentage of total.  Both sums are
    scaled-integer exact; the percentage is
    ``100.0 · promo / total`` — int-to-double conversions are exact,
    the multiply and divide are single correctly-rounded IEEE ops in
    the same order on both engines.  The part side joins broadcast
    (dimension-sized), so the plan is scan → BHJ → partial agg →
    1-row exchange.
    """
    from kcidb_spark.queries.relational import _utc as _utc_rel

    _utc_rel(spark)
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate")
         >= F.lit("1995-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate")
           < F.lit("1995-10-01 00:00:00").cast("timestamp"))
    )
    part = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")
    joined = li.join(
        F.broadcast(part), li["l_partkey"] == part["p_partkey"]
    )
    return joined.agg(
        (
            F.lit(100.0)
            * F.sum(
                F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(0)
            ).cast("long")
            / F.sum(rev).cast("long")
        ).alias("promo_revenue_pct"),
        F.count(F.lit(1)).alias("n_items"),
    )


# ---------------------------------------------------------------------------
# O7 — null semantics: ordering, grouping, null-safe equality
# ---------------------------------------------------------------------------


@register(
    "o7_null_semantics",
    oracle=dedent("""
        WITH d AS (
            SELECT doc_id, source, NULLIF(lang, 'zh') AS lang_n
            FROM documents
        ),
        grp AS (
            SELECT lang_n AS lang_g, CAST(count(*) AS BIGINT) AS grp_n
            FROM d GROUP BY lang_n
        )
        SELECT d.doc_id, d.lang_n,
               CAST(row_number() OVER (
                   PARTITION BY d.source
                   ORDER BY d.lang_n ASC NULLS FIRST, d.doc_id
               ) AS BIGINT) AS rk_nf,
               CAST(row_number() OVER (
                   PARTITION BY d.source
                   ORDER BY d.lang_n DESC NULLS LAST, d.doc_id
               ) AS BIGINT) AS rk_nl,
               grp.grp_n
        FROM d JOIN grp ON d.lang_n IS NOT DISTINCT FROM grp.lang_g
    """),
    tags=("O", "nulls"),
)
def o7_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The null-semantics minefield, pinned down cross-engine: window
    ordering with EXPLICIT null placement (Spark defaults NULLS FIRST
    on ASC, DuckDB defaults NULLS LAST — relying on either default is
    a silent cross-engine divergence), NULL as a first-class GROUP BY
    key, and a null-safe equi-join (``eqNullSafe`` / IS NOT DISTINCT
    FROM — a plain ``=`` join silently DROPS the null group).  Nulls
    are synthesized via NULLIF since the synthetic corpus has none.

    Plan: both rank windows share the source-partitioned exchange;
    the group-count side is a broadcast; null-safe equality still
    hash-partitions correctly (null hashes like any key) so nothing
    degenerates to a nested loop.
    """
    docs = table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", "source", F.expr("nullif(lang, 'zh')").alias("lang_n")
    )
    grp = d.groupBy(F.col("lang_n").alias("lang_g")).agg(
        F.count(F.lit(1)).alias("grp_n")
    )
    w_nf = W.partitionBy("source").orderBy(
        F.asc_nulls_first("lang_n"), F.asc("doc_id")
    )
    w_nl = W.partitionBy("source").orderBy(
        F.desc_nulls_last("lang_n"), F.asc("doc_id")
    )
    return (
        d.withColumn("rk_nf", F.row_number().over(w_nf).cast("long"))
        .withColumn("rk_nl", F.row_number().over(w_nl).cast("long"))
        .join(F.broadcast(grp), d["lang_n"].eqNullSafe(grp["lang_g"]))
        .select("doc_id", "lang_n", "rk_nf", "rk_nl", "grp_n")
    )


# ---------------------------------------------------------------------------
# A18 — robust statistics: trimmed mean + median + MAD per group
# ---------------------------------------------------------------------------


@register(
    "a18_robust_stats",
    oracle=dedent("""
        WITH ranked AS (
            SELECT lang, n_chars,
                   row_number() OVER (PARTITION BY lang
                                      ORDER BY n_chars, doc_id) AS rk,
                   count(*) OVER (PARTITION BY lang) AS cnt
            FROM documents
        ),
        trimmed AS (
            SELECT lang,
                   CAST(count(*) AS BIGINT) AS n_kept,
                   CAST(sum(n_chars) AS BIGINT) AS kept_sum
            FROM ranked
            WHERE rk > cnt // 10 AND rk <= cnt - cnt // 10
            GROUP BY lang
        ),
        med AS (
            SELECT lang,
                   quantile_cont(n_chars, 0.5) AS med
            FROM documents GROUP BY lang
        ),
        mad AS (
            SELECT d.lang,
                   quantile_cont(abs(d.n_chars - med.med), 0.5) AS mad
            FROM documents d JOIN med ON d.lang = med.lang
            GROUP BY d.lang
        )
        SELECT t.lang, t.n_kept, t.kept_sum,
               t.kept_sum / CAST(t.n_kept AS DOUBLE) AS trimmed_mean,
               med.med AS median, mad.mad AS mad
        FROM trimmed t
        JOIN med ON t.lang = med.lang
        JOIN mad ON t.lang = mad.lang
    """),
    tags=("A", "robust"),
)
def a18_robust_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier-resistant per-group statistics — the robust triple a
    quality pipeline prefers over mean/stddev on heavy-tailed length
    distributions: 10%-trimmed mean (drop ⌊n/10⌋ from each tail —
    integer rank boundaries, exact integer sum, ONE final IEEE
    division), median, and median-absolute-deviation (both via
    ``percentile``, which interpolates bit-identically to DuckDB's
    ``quantile_cont`` — probed in round 1).

    Plan: rank+count windows share one lang-keyed exchange with the
    trimmed rollup; the MAD pass joins the broadcast per-lang medians
    back and re-aggregates — two scans total, both partial-agg
    shuffles on the same low-cardinality key.
    """
    docs = table(spark, sf_dir, "documents")
    w_rank = W.partitionBy("lang").orderBy("n_chars", "doc_id")
    w_all = W.partitionBy("lang")
    ranked = docs.select(
        "lang", "n_chars",
        F.row_number().over(w_rank).alias("rk"),
        F.count(F.lit(1)).over(w_all).alias("cnt"),
    )
    trimmed = (
        ranked.filter(
            (F.col("rk") > F.floor(F.col("cnt") / 10))
            & (F.col("rk") <= F.col("cnt") - F.floor(F.col("cnt") / 10))
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").alias("kept_sum"),
        )
    )
    med = docs.groupBy("lang").agg(
        F.percentile(F.col("n_chars"), F.lit(0.5)).alias("med")
    )
    mad = (
        docs.join(F.broadcast(med), on="lang")
        .groupBy("lang")
        .agg(
            F.percentile(
                F.abs(F.col("n_chars") - F.col("med")), F.lit(0.5)
            ).alias("mad")
        )
    )
    return (
        trimmed.join(F.broadcast(med), on="lang")
        .join(F.broadcast(mad), on="lang")
        .select(
            "lang", "n_kept", "kept_sum",
            (F.col("kept_sum") / F.col("n_kept").cast("double"))
            .alias("trimmed_mean"),
            F.col("med").alias("median"),
            "mad",
        )
    )
