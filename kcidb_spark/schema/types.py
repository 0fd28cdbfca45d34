"""StructTypes for the five kcidb object lists (I/O schema v5.3).

Column inventory from the reference's PostgreSQL driver as ground
truth: kcidb/db/postgresql/v04_00.py:202-264 with deltas through
v05_03 (SURVEY.md §1.3, FIXTURES.md §1).  Differences by design:

* nested objects (environment, number, culprit) are true StructTypes,
  not dotted flat columns — Spark's native representation;
* ``misc`` is a JSON string column (parse with from_json on demand),
  matching the BigQuery driver's JSON-in-STRING model
  (bigquery/v04_00.py:732-733);
* every table also carries a ``_timestamp`` metadata column
  (postgresql/v04_02.py:14-43) — present only when loaded
  ``with_metadata``.
"""

from __future__ import annotations

from pyspark.sql import types as T

#: Build/test status enum (postgresql/v04_05.py:34-42), priority order
#: is defined in oo.rollups, not here.
STATUS_VALUES = ("FAIL", "ERROR", "MISS", "PASS", "DONE", "SKIP")

#: Unit-prefix enum (postgresql/v04_08.py:12-18).
UNIT_PREFIX_VALUES = ("metric", "binary")


def _resource_list() -> T.ArrayType:
    """Array of {name, url} resources (bigquery/v04_00.py:182-185)."""
    return T.ArrayType(
        T.StructType(
            [
                T.StructField("name", T.StringType()),
                T.StructField("url", T.StringType()),
            ]
        )
    )


def _f(name: str, dtype: T.DataType) -> T.StructField:
    return T.StructField(name, dtype, nullable=True)


_S = T.StringType()
_B = T.BooleanType()
_TS = T.TimestampType()
_D = T.DoubleType()

CHECKOUTS_SCHEMA = T.StructType(
    [
        _f("id", _S),
        _f("origin", _S),
        _f("tree_name", _S),
        _f("git_repository_url", _S),
        _f("git_commit_hash", _S),
        _f("git_commit_name", _S),
        _f("git_commit_tags", T.ArrayType(_S)),
        _f("git_commit_message", _S),
        _f("git_repository_branch", _S),
        _f("git_repository_branch_tip", _B),
        _f("patchset_files", _resource_list()),
        _f("patchset_hash", _S),
        _f("message_id", _S),
        _f("comment", _S),
        _f("start_time", _TS),
        _f("log_url", _S),
        _f("log_excerpt", _S),
        _f("valid", _B),
        _f("origin_builds_finish_time", _TS),
        _f("origin_tests_finish_time", _TS),
        _f("misc", _S),
    ]
)

BUILDS_SCHEMA = T.StructType(
    [
        _f("checkout_id", _S),
        _f("id", _S),
        _f("origin", _S),
        _f("comment", _S),
        _f("start_time", _TS),
        _f("duration", _D),
        _f("architecture", _S),
        _f("command", _S),
        _f("compiler", _S),
        _f("input_files", _resource_list()),
        _f("output_files", _resource_list()),
        _f("config_name", _S),
        _f("config_url", _S),
        _f("log_url", _S),
        _f("log_excerpt", _S),
        _f("status", _S),
        _f("misc", _S),
    ]
)

TESTS_SCHEMA = T.StructType(
    [
        _f("build_id", _S),
        _f("id", _S),
        _f("origin", _S),
        _f(
            "environment",
            T.StructType(
                [
                    _f("comment", _S),
                    _f("misc", _S),
                    _f("compatible", T.ArrayType(_S)),
                ]
            ),
        ),
        _f("path", _S),
        _f("comment", _S),
        _f("log_url", _S),
        _f("log_excerpt", _S),
        _f("status", _S),
        _f("start_time", _TS),
        _f("duration", _D),
        _f(
            "number",
            T.StructType([_f("value", _D), _f("unit", _S), _f("prefix", _S)]),
        ),
        _f("input_files", _resource_list()),
        _f("output_files", _resource_list()),
        _f("misc", _S),
    ]
)

ISSUES_SCHEMA = T.StructType(
    [
        _f("id", _S),
        _f("version", T.LongType()),
        _f("origin", _S),
        _f("report_url", _S),
        _f("report_subject", _S),
        _f(
            "culprit",
            T.StructType([_f("code", _B), _f("tool", _B), _f("harness", _B)]),
        ),
        _f("categories", T.ArrayType(_S)),
        _f("comment", _S),
        _f("misc", _S),
    ]
)

INCIDENTS_SCHEMA = T.StructType(
    [
        _f("id", _S),
        _f("origin", _S),
        _f("issue_id", _S),
        _f("issue_version", T.LongType()),
        _f("build_id", _S),
        _f("test_id", _S),
        _f("present", _B),
        _f("comment", _S),
        _f("misc", _S),
    ]
)

SCHEMAS: dict[str, T.StructType] = {
    "checkouts": CHECKOUTS_SCHEMA,
    "builds": BUILDS_SCHEMA,
    "tests": TESTS_SCHEMA,
    "issues": ISSUES_SCHEMA,
    "incidents": INCIDENTS_SCHEMA,
}

#: Metadata columns prefixed "_" — selected in/out by with_metadata
#: (kcidb/db/abstract.py:334-356).
METADATA_FIELDS = (T.StructField("_timestamp", _TS, nullable=True),)


def schema_for(table: str, with_metadata: bool = False) -> T.StructType:
    base = SCHEMAS[table]
    if not with_metadata:
        return base
    return T.StructType(list(base.fields) + list(METADATA_FIELDS))


#: v4 compatibility fields accepted on the ingest wire so the engine
#: can upgrade v4 reports in-plan (reference v4→v5 migration,
#: postgresql/v05_00.py:178-231): builds carried tri-state ``valid``
#: (→ status), tests carried ``waived`` (→ synthetic "_:waived"
#: issue + incidents).  Unknown JSON keys are simply ignored by a
#: static from_json schema, so dropped v4 fields (checkouts.contacts)
#: need no wire slot.
_V4_WIRE_EXTRAS: dict[str, list[T.StructField]] = {
    "builds": [T.StructField("valid", T.BooleanType(), True)],
    "tests": [T.StructField("waived", T.BooleanType(), True)],
}


def _wire_type(dtype: T.DataType, path: tuple) -> T.DataType:
    """Target column type → ingest wire type for a static from_json
    parse: free-form JSON members parse as VARIANT (canonical re-encode
    via to_json, sorted keys), timestamps arrive as ISO strings
    (converted engine-side with to_timestamp — from_json's own
    timestamp parsing is format-pinned and session-TZ-coupled), and
    containers recurse."""
    from kcidb_spark.schema.validation import JSON_FIELDS

    if any(path in paths for paths in JSON_FIELDS.values()):
        return T.VariantType()
    if isinstance(dtype, T.TimestampType):
        return T.StringType()
    if isinstance(dtype, T.StructType):
        return T.StructType(
            [
                T.StructField(f.name, _wire_type(f.dataType, path + (f.name,)), True)
                for f in dtype.fields
            ]
        )
    if isinstance(dtype, T.ArrayType):
        return T.ArrayType(_wire_type(dtype.elementType, path))
    return dtype


def wire_element_schema(table: str) -> T.StructType:
    """Static parse schema for one object of ``table`` on the ingest
    wire: the v5 target schema in wire types, the ``_timestamp``
    metadata string (dump round-trips), and v4 compat fields."""
    fields = [
        T.StructField(f.name, _wire_type(f.dataType, (f.name,)), True)
        for f in SCHEMAS[table].fields
    ]
    fields.append(T.StructField("_timestamp", T.StringType(), True))
    fields.extend(_V4_WIRE_EXTRAS.get(table, []))
    return T.StructType(fields)


def report_wire_schema() -> T.StructType:
    """Static schema of one full I/O report for ``from_json``: version
    struct + the five object arrays + a corrupt-record capture slot.
    A STATIC schema keeps ingest parse JVM-only and single-pass —
    schema inference (``spark.read.json``) costs an extra full pass
    over every micro-batch, and an RDD round-trip pickles every report
    through Python; both are a serialization tax at 100 TB ingest."""
    return T.StructType(
        [
            T.StructField(
                "version",
                T.StructType(
                    [
                        T.StructField("major", T.LongType(), True),
                        T.StructField("minor", T.LongType(), True),
                    ]
                ),
                True,
            ),
            *[
                T.StructField(t, T.ArrayType(wire_element_schema(t)), True)
                for t in SCHEMAS
            ],
            T.StructField("_corrupt_record", T.StringType(), True),
        ]
    )
