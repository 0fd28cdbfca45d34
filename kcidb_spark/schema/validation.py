"""Full JSON-Schema validation of I/O reports (v5.3).

The reference validates every loaded/dumped report against the
versioned kcidb-io JSON Schema (kcidb/db/abstract.py:352-354); round 1
shipped only a structural check (required/unknown fields + status
enum), so wrong-typed nested values — a string ``duration``, a
malformed ``environment`` — passed silently.

This module derives a draft 2020-12 JSON Schema **from the engine's
own StructTypes** (single source of truth — no copied schema document)
layered with the semantic constraints the reference schema carries:

* per-field JSON types, including nested objects and arrays;
* required fields per object list;
* ``status`` / unit-``prefix`` enums;
* ISO-8601 pattern for every timestamp field;
* free-form ``misc`` members as JSON objects;
* ``_``-prefixed metadata fields (``_timestamp``) accepted on every
  object, so metadata-preserving dump→load round-trips validate;
* ``additionalProperties: false`` everywhere else.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Any

from pyspark.sql import types as T

from kcidb_spark.schema.graph import TABLES
from kcidb_spark.schema.types import SCHEMAS, STATUS_VALUES, UNIT_PREFIX_VALUES

#: Required fields per object list (reference kcidb-io required sets).
REQUIRED_FIELDS = {
    "checkouts": ("id", "origin"),
    "builds": ("id", "origin", "checkout_id"),
    "tests": ("id", "origin", "build_id"),
    "issues": ("id", "origin", "version"),
    "incidents": ("id", "origin", "issue_id", "issue_version"),
}

#: Dotted paths of free-form JSON members (objects in the I/O document,
#: JSON strings in the engine's columns).
JSON_FIELDS = {
    "checkouts": {("misc",)},
    "builds": {("misc",)},
    "tests": {("misc",), ("environment", "misc")},
    "issues": {("misc",)},
    "incidents": {("misc",)},
}

#: ISO-8601 timestamp with optional fraction and offset.
_ISO_TS = (
    r"^\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}"
    r"(\.\d+)?([+-]\d{2}:?\d{2}|Z)?$"
)

_TS_SCHEMA = {"type": "string", "pattern": _ISO_TS}


def _dtype_schema(dtype: T.DataType, path: tuple, json_paths: set) -> dict:
    if path in json_paths:
        return {"type": "object"}
    if path and path[-1] == "status":
        return {"type": "string", "enum": list(STATUS_VALUES)}
    if path and path[-1] == "prefix":
        return {"type": "string", "enum": list(UNIT_PREFIX_VALUES)}
    if isinstance(dtype, T.TimestampType):
        return dict(_TS_SCHEMA)
    if isinstance(dtype, T.StringType):
        return {"type": "string"}
    if isinstance(dtype, T.BooleanType):
        return {"type": "boolean"}
    if isinstance(dtype, (T.LongType, T.IntegerType, T.ShortType)):
        return {"type": "integer"}
    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        return {"type": "number"}
    if isinstance(dtype, T.ArrayType):
        return {
            "type": "array",
            "items": _dtype_schema(dtype.elementType, path, json_paths),
        }
    if isinstance(dtype, T.StructType):
        return {
            "type": "object",
            "properties": {
                f.name: _dtype_schema(f.dataType, path + (f.name,), json_paths)
                for f in dtype.fields
            },
            "additionalProperties": False,
        }
    raise TypeError(f"unmapped Spark type at {path}: {dtype}")


@lru_cache(maxsize=1)
def io_json_schema() -> dict:
    """The derived draft 2020-12 schema for a v5 I/O report."""
    props: dict[str, Any] = {
        "version": {
            "type": "object",
            "properties": {
                "major": {"const": 5},
                "minor": {"type": "integer", "minimum": 0},
            },
            "required": ["major"],
            "additionalProperties": False,
        }
    }
    for t in TABLES:
        obj = _dtype_schema(SCHEMAS[t], (), JSON_FIELDS[t])
        obj["required"] = list(REQUIRED_FIELDS[t])
        # Metadata fields ride along on dump(with_metadata=True) output
        # and must re-load; accept any "_"-prefixed member (only
        # _timestamp is emitted today, with a typed pattern).
        obj["properties"]["_timestamp"] = dict(_TS_SCHEMA)
        obj["patternProperties"] = {"^_": {}}
        props[t] = {"type": "array", "items": obj}
    return {
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "type": "object",
        "properties": props,
        "required": ["version"],
        "additionalProperties": False,
    }


@lru_cache(maxsize=1)
def _validator():
    try:
        import jsonschema
    except ImportError:  # pragma: no cover — baked into this container
        return None
    return jsonschema.Draft202012Validator(io_json_schema())


def validate_schema(data: dict[str, Any]) -> None:
    """Raise ValueError on the first (deepest-path) schema violation."""
    v = _validator()
    if v is None:  # pragma: no cover
        return
    err = None
    try:
        import jsonschema
        err = jsonschema.exceptions.best_match(v.iter_errors(data))
    except Exception:  # noqa: BLE001 — fall back to first error
        for err in v.iter_errors(data):
            break
    if err is not None:
        where = "$" + "".join(
            f"[{p}]" if isinstance(p, int) else f".{p}" for p in err.absolute_path
        )
        raise ValueError(f"schema violation at {where}: {err.message}")
