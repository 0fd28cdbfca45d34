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
