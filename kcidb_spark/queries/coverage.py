"""Driver-checked coverage queries for operator IDs that were
pytest-only in round 1 (VERDICT r1: A5, A13, F6-full, F16).

Each converts an API-shaped operator into a single-DataFrame registry
query so the driver's DuckDB-oracle gate records a green row for the
operator's semantics, not just the local suite.
"""

from __future__ import annotations

from textwrap import dedent

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcidb_spark.queries.registry import register
from kcidb_spark.tables import TABLES, table


@register(
    "a5_object_counts",
    oracle=" UNION ALL ".join(
        f"SELECT '{t}' AS tbl, CAST(count(*) AS BIGINT) AS n FROM {t}"
        for t in TABLES
    ),
    tags=("A5",),
)
def a5_object_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Object count per table (A5 — reference io count,
    kcidb/io schema count used by kcidb-count; schema/io.py:33 is the
    report-level twin).  Ten zero-column scans + partial counts; at
    100 TB each count is metadata-cheap (no columns read)."""
    out = None
    for t in TABLES:
        c = (
            table(spark, sf_dir, t)
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.lit(t).alias("tbl"), F.col("n"))
        )
        out = c if out is None else out.unionByName(c)
    return out


@register(
    "a13_distinct_rollup",
    oracle=dedent("""
        SELECT c_nationkey AS nationkey,
               array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',')
                   AS segments,
               CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS n_segments
        FROM customer
        GROUP BY c_nationkey
    """),
    tags=("A13",),
)
def a13_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-set rollup per group (A13 — the reference's
    architecture/config distinct-set rollups, kcidb/oo/__init__.py
    summaries).  collect_set + sort_array makes the set deterministic;
    serialization keeps the driver harness array-free.  Partial-agg
    friendly: sets merge associatively map-side."""
    cust = table(spark, sf_dir, "customer")
    return cust.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.array_join(F.sort_array(F.collect_set("c_mktsegment")), ",").alias(
            "segments"
        ),
        F.countDistinct("c_mktsegment").cast("long").alias("n_segments"),
    )


#: (raw, expected-encodeURIComponent) golden pairs — reference
#: behavior of the custom SQL function (postgresql/v04_05.py:10-32):
#: unreserved set verbatim, everything else percent-encoded per UTF-8
#: byte (multi-byte and astral-plane safe).
_URI_GOLDEN = (
    ("hello world", "hello%20world"),
    ("a+b=c&d", "a%2Bb%3Dc%26d"),
    ("café", "caf%C3%A9"),
    ("100%", "100%25"),
    ("~-_.!*'()", "~-_.!*'()"),
    ("slash/colon:", "slash%2Fcolon%3A"),
    ("\U0001f642", "%F0%9F%99%82"),
    ("ab\ncd", "ab%0Acd"),
    ("q?x=1#frag", "q%3Fx%3D1%23frag"),
)


@register(
    "f6_uri_encode_golden",
    oracle="SELECT * FROM (VALUES "
    + ", ".join(
        "('" + raw.replace("'", "''") + "', '" + enc.replace("'", "''") + "')"
        for raw, enc in _URI_GOLDEN
    )
    + ") AS t(raw, encoded)",
    tags=("F6",),
    bench=False,  # golden-values semantics proof, not a data-scale query
)
def f6_uri_encode_golden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """encodeURIComponent parity beyond the %20 core: reserved chars,
    multi-byte UTF-8, an astral-plane emoji (surrogate-pair safe),
    control chars.  Spark COMPUTES the encoding (JVM expression,
    functions/__init__.py:44); the oracle pins the expected bytes."""
    from kcidb_spark.functions import encode_uri_component

    df = spark.createDataFrame([(r,) for r, _ in _URI_GOLDEN], "raw string")
    return df.select("raw", encode_uri_component("raw").alias("encoded"))


@register(
    "f16_nul_guard",
    oracle=dedent("""
        WITH t(id, s) AS (
            SELECT 1, concat('ab', chr(0), 'cd')
            UNION ALL SELECT 2, 'clean string'
            UNION ALL SELECT 3, concat(chr(0), 'leading')
            UNION ALL SELECT 4, ''
        )
        SELECT id,
               CAST(contains(s, chr(0)) AS BOOLEAN) AS has_nul,
               replace(s, chr(0), '') AS cleaned
        FROM t
    """),
    tags=("F16",),
    bench=False,  # golden-values semantics proof
)
def f16_nul_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NUL-character detection/strip as a column expression (F16 —
    the reference walks values in Python before MQ publish,
    kcidb/mq/__init__.py:448-466; functions.reject_nul is the
    driver-side twin).  Engine-side form lets a 100 TB sanitization
    pass run as a projection instead of a driver loop."""
    rows = [
        (1, "ab\x00cd"),
        (2, "clean string"),
        (3, "\x00leading"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "id int, s string")
    return df.select(
        "id",
        F.expr("contains(s, chr(0))").alias("has_nul"),
        F.expr("replace(s, chr(0), '')").alias("cleaned"),
    )


#: (subscription, obj_type, obj_id, message_id) golden inputs — unicode
#: and separator characters included (the b64 wrapping is exactly what
#: makes ':'-joined ids unambiguous).
_NOTIF_ROWS = (
    ("failed-builds", "build", "o:b1", "<msg@example.org>"),
    ("all", "test", "o:t/path?q=1", "msg-α"),
    ("s", "checkout", "", ""),
)


@register(
    "f13_notification_id",
    oracle="SELECT subscription, obj_type, "
    "subscription || ':' || obj_type || ':' || to_base64(encode(obj_id))"
    " || ':' || to_base64(encode(message_id)) AS nid FROM (VALUES "
    + ", ".join(
        "('" + "', '".join(v) + "')" for v in (
            (s.replace("'", "''"), t, o.replace("'", "''"),
             m.replace("'", "''"))
            for s, t, o, m in _NOTIF_ROWS
        )
    )
    + ") AS t(subscription, obj_type, obj_id, message_id)",
    tags=("F13", "T6"),
    bench=False,  # golden-values semantics proof
)
def f13_notification_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic notification ids (F13 — reference
    kcidb/monitor/output.py:162-174): ``sub:type:b64(obj):b64(msg)``,
    standard base64 in both engines (UTF-8 bytes, padded, unchunked).
    This id is the spool's MERGE-dedup key (T6), so cross-engine
    byte-equality is what makes redelivery dedup portable."""
    from kcidb_spark.functions import notification_id

    df = spark.createDataFrame(
        list(_NOTIF_ROWS),
        "subscription string, obj_type string, obj_id string, message_id string",
    )
    return df.select(
        "subscription",
        "obj_type",
        notification_id(
            "subscription", "obj_type", "obj_id", "message_id"
        ).alias("nid"),
    )


_NOTIF_STATUSES = (("O", "✅"), ("F", "❌"), ("P", "❓"))


@register(
    "notif_emoji_count_table",
    oracle=dedent(f"""
        WITH per AS (
            SELECT o_orderpriority AS pr,
                   {", ".join(
                       f"count(*) FILTER (WHERE o_orderstatus = '{s}') AS n{i}"
                       for i, (s, _) in enumerate(_NOTIF_STATUSES))}
            FROM orders GROUP BY 1
        ),
        tot AS (
            SELECT {", ".join(
                f"CAST(SUM(n{i}) AS BIGINT) AS t{i}"
                for i in range(len(_NOTIF_STATUSES)))},
                   MAX(length(pr)) AS wn
            FROM per
        )
        SELECT pr AS o_orderpriority,
               lpad(pr, CAST(wn + 8 AS INTEGER), ' ')
               {"".join(
                   f"|| CASE WHEN t{i} > 0 THEN '  ' ||"
                   f" CASE WHEN n{i} > 0 THEN '{e}' ELSE '➖' END || ' ' ||"
                   f" lpad(CAST(n{i} AS VARCHAR),"
                   f" CAST(length(CAST(t{i} AS VARCHAR)) AS INTEGER), ' ')"
                   f" ELSE '' END "
                   for i, (_, e) in enumerate(_NOTIF_STATUSES))}
               AS row_text
        FROM per CROSS JOIN tot
    """),
    tags=("T5", "render"),
)
def notif_emoji_count_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The notification body's aligned emoji×count table primitive
    (reference misc.j2 emoji_count_row_fmt + build.j2
    container_summary, re-expressed in streaming/render.py) certified
    cross-engine on testdata: per order-priority rows of per-status
    emoji/count cells, name column right-aligned to the widest name
    +8, counts right-aligned to their column total's width, zero cells
    blanked with ➖, all-zero columns suppressed.  Pure string
    building over one groupBy plus a broadcast 1-row totals frame —
    the exact shape the revision-notification renderer runs per
    revision."""
    ords = table(spark, sf_dir, "orders")
    per = ords.groupBy(F.col("o_orderpriority").alias("pr")).agg(
        *[
            F.count_if(F.col("o_orderstatus") == s).alias(f"n{i}")
            for i, (s, _) in enumerate(_NOTIF_STATUSES)
        ]
    )
    tot = per.agg(
        *[F.sum(f"n{i}").cast("long").alias(f"t{i}")
          for i in range(len(_NOTIF_STATUSES))],
        F.max(F.length("pr")).alias("wn"),
    )
    j = per.crossJoin(F.broadcast(tot))
    cells = []
    for i, (_, emoji) in enumerate(_NOTIF_STATUSES):
        cells.append(
            F.when(
                F.col(f"t{i}") > 0,
                F.concat(
                    F.lit("  "),
                    F.when(F.col(f"n{i}") > 0, emoji).otherwise("➖"),
                    F.lit(" "),
                    F.expr(
                        f"lpad(CAST(n{i} AS STRING),"
                        f" length(CAST(t{i} AS STRING)), ' ')"
                    ),
                ),
            ).otherwise("")
        )
    return j.select(
        F.col("pr").alias("o_orderpriority"),
        F.concat(
            F.expr("lpad(pr, wn + 8, ' ')"), *cells
        ).alias("row_text"),
    )
