"""Driver-checked queries over the kcidb object domain itself.

The TPC-H-shaped registry queries cover the *relational* operator
inventory; these cover the kcidb-specific machinery (the ORM pattern
compiler) end-to-end under the driver's DuckDB-oracle gate.  The
driver's DuckDB has no kcidb tables, so the fixture is embedded: the
Spark side builds the five object tables in-engine and runs the REAL
parse_pattern → compile_patterns pipeline; the oracle replays the
expected join chains over inline VALUES.

Reference behavior being proven: pattern-chain joins with DISTINCT on
parent steps and per-type UNION (kcidb/orm/query.py:626-716 grammar;
kcidb/db/postgresql/v04_00.py:832-898 SQL generation; semantics
fixture kcidb/test_db.py:2535-2722).
"""

from __future__ import annotations

import datetime
from textwrap import dedent

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcidb_spark.queries.registry import register

_TS = datetime.datetime(2025, 1, 1, tzinfo=datetime.timezone.utc)

#: The fixture graph (modeled on the reference's closure fixture shape,
#: kcidb/test_db.py:2535-2570 — content our own):
#:   revisions (h1,p1) (h2,p2) (h3,p3)
#:   checkouts c1(h1,p1) c2(h2,p2) c3(h3,p3)
#:   builds    b1,b2→c1   b3→c2    b4→c3
#:   tests     t1,t2→b1   t3→b3    t4→b4
#:   issues    i1 v1, i1 v2, i2 v1
#:   incidents n1(i1 v2, t1)   n2(i2 v1, b3)
_FIXTURE = {
    "checkouts": [
        {"id": c, "origin": "_", "git_commit_hash": h, "patchset_hash": p}
        for c, h, p in (("c1", "h1", "p1"), ("c2", "h2", "p2"),
                        ("c3", "h3", "p3"))
    ],
    "builds": [
        {"id": b, "origin": "_", "checkout_id": c}
        for b, c in (("b1", "c1"), ("b2", "c1"), ("b3", "c2"), ("b4", "c3"))
    ],
    "tests": [
        {"id": t, "origin": "_", "build_id": b}
        for t, b in (("t1", "b1"), ("t2", "b1"), ("t3", "b3"), ("t4", "b4"))
    ],
    "issues": [
        {"id": i, "origin": "_", "version": v}
        for i, v in (("i1", 1), ("i1", 2), ("i2", 1))
    ],
    "incidents": [
        {"id": "n1", "origin": "_", "issue_id": "i1", "issue_version": 2,
         "test_id": "t1"},
        {"id": "n2", "origin": "_", "issue_id": "i2", "issue_version": 1,
         "build_id": "b3"},
    ],
}

#: Four chains exercising: child traversal with id restriction, the
#: parent direction (DISTINCT dedup), a two-field-id type, and a
#: derived root type.
_PATTERNS = (
    ">checkout[c1]#>build#>test#",
    ">test[t4]#<build#<checkout#",
    ">issue[i1]#>issue_version#>incident#",
    ">revision[h1,p1]#>checkout#",
)


def _fixture_tables(spark: SparkSession):
    from kcidb_spark.schema.types import schema_for

    out = {}
    for t, objs in _FIXTURE.items():
        rows = [dict(o, _timestamp=_TS) for o in objs]
        out[t] = spark.createDataFrame(rows, schema_for(t, with_metadata=True))
    return out


@register(
    "j4_pattern_chain",
    oracle=dedent("""
        WITH
        checkouts(id, git_commit_hash, patchset_hash) AS (VALUES
            ('c1','h1','p1'), ('c2','h2','p2'), ('c3','h3','p3')),
        builds(id, checkout_id) AS (VALUES
            ('b1','c1'), ('b2','c1'), ('b3','c2'), ('b4','c3')),
        tests(id, build_id) AS (VALUES
            ('t1','b1'), ('t2','b1'), ('t3','b3'), ('t4','b4')),
        issues(id, version) AS (VALUES ('i1',1), ('i1',2), ('i2',1)),
        incidents(id, issue_id, issue_version) AS (VALUES
            ('n1','i1',2), ('n2','i2',1))
        -- >checkout[c1]#>build#>test#
        SELECT 'checkout' AS obj_type, id AS obj_id
        FROM checkouts WHERE id = 'c1'
        UNION
        SELECT 'build', id FROM builds WHERE checkout_id = 'c1'
        UNION
        SELECT 'test', t.id FROM tests t
        JOIN builds b ON t.build_id = b.id WHERE b.checkout_id = 'c1'
        UNION
        -- >test[t4]#<build#<checkout#
        SELECT 'test', id FROM tests WHERE id = 't4'
        UNION
        SELECT 'build', b.id FROM builds b
        JOIN tests t ON t.build_id = b.id WHERE t.id = 't4'
        UNION
        SELECT 'checkout', c.id FROM checkouts c
        JOIN builds b ON b.checkout_id = c.id
        JOIN tests t ON t.build_id = b.id WHERE t.id = 't4'
        UNION
        -- >issue[i1]#>issue_version#>incident#  (UNION dedups the
        -- one-row-per-version issue ids)
        SELECT 'issue', id FROM issues WHERE id = 'i1'
        UNION
        SELECT 'issue_version', id || '|' || CAST(version AS VARCHAR)
        FROM issues WHERE id = 'i1'
        UNION
        SELECT 'incident', n.id FROM incidents n
        JOIN issues iv
          ON n.issue_id = iv.id AND n.issue_version = iv.version
        WHERE iv.id = 'i1'
        UNION
        -- >revision[h1,p1]#>checkout#
        SELECT 'revision', git_commit_hash || '|' || patchset_hash
        FROM checkouts WHERE git_commit_hash = 'h1' AND patchset_hash = 'p1'
        UNION
        SELECT 'checkout', id FROM checkouts
        WHERE git_commit_hash = 'h1' AND patchset_hash = 'p1'
    """),
    tags=("J4", "orm", "pattern"),
    bench=False,  # fixture-scale semantics proof, not a data-scale query
)
def j4_pattern_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ORM pattern compiler end-to-end: four pattern chains parsed
    by the real grammar, compiled to DataFrame join chains, matched
    rows projected to (obj_type, obj_id).

    ``sf_dir`` is unused — the unit under proof is the compiler, so the
    object graph is an embedded deterministic fixture (the driver's
    DuckDB replays the chains over the same VALUES).  Scale notes: each
    chain step is a broadcast semi-join on the id set / FK projection
    (see orm/compiler.py) — the 100 TB shape is proven by the plan
    tests; this query proves the *semantics*.
    """
    from kcidb_spark.orm.compiler import compile_patterns
    from kcidb_spark.orm.pattern import parse_pattern
    from kcidb_spark.orm.types import TYPES, type_views

    views = type_views(_fixture_tables(spark))
    patterns = set()
    for s in _PATTERNS:
        patterns |= parse_pattern(s)
    result = compile_patterns(spark, views, patterns)
    out = None
    for obj_type in sorted(result):
        idf = TYPES[obj_type].id_fields
        obj_id = F.concat_ws("|", *[F.col(f).cast("string") for f in idf])
        rows = result[obj_type].select(
            F.lit(obj_type).alias("obj_type"), obj_id.alias("obj_id")
        )
        out = rows if out is None else out.unionByName(rows)
    return out


@register(
    "a14_culprit_partition",
    oracle=dedent("""
        WITH iv(id, version_num, code, tool, harness) AS (VALUES
            ('i1', 1, TRUE,  FALSE, NULL),
            ('i1', 2, FALSE, TRUE,  FALSE),
            ('i2', 1, NULL,  NULL,  NULL),
            ('i3', 1, FALSE, FALSE, TRUE))
        SELECT id, version_num,
               CASE WHEN code THEN 'code'
                    WHEN tool THEN 'tool'
                    WHEN harness THEN 'harness'
                    ELSE 'unknown' END AS culprit
        FROM iv
    """),
    tags=("A14",),
    bench=False,  # fixture-scale semantics proof
)
def a14_culprit_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Culprit-flag partition of issue versions (A14 — reference
    kcidb/oo/__init__.py:214-252): first-true of code/tool/harness,
    else 'unknown'.  Runs the real oo.culprit_partition over an
    issue_version-view-shaped frame; pure projection at any scale."""
    from kcidb_spark.oo import culprit_partition

    rows = [
        ("i1", 1, True, False, None),
        ("i1", 2, False, True, False),
        ("i2", 1, None, None, None),
        ("i3", 1, False, False, True),
    ]
    iv = spark.createDataFrame(
        rows,
        "id string, version_num long, culprit_code boolean, "
        "culprit_tool boolean, culprit_harness boolean",
    )
    return culprit_partition(iv).select("id", "version_num", "culprit")
