"""I/O report helpers: new / merge / count / validate / upgrade.

An I/O report is ``{"version": {"major": M, "minor": m},
"checkouts": [...], "builds": [...], "tests": [...], "issues": [...],
"incidents": [...]}`` (reference: kcidb_io package, pinned V5_3 at
kcidb/io.py:9).  These helpers are pure-Python (driver-side) — they
operate on the JSON documents before/after Spark.
"""

from __future__ import annotations

import copy
from typing import Any

from kcidb_spark.schema.graph import ID_FIELDS, TABLES
from kcidb_spark.schema.types import SCHEMAS, STATUS_VALUES

IO_VERSION = {"major": 5, "minor": 3}

#: Fields removed across major versions (v5.0: postgresql/v05_00.py:21-63).
_V4_DROPPED = {
    "checkouts": ("contacts",),
    "builds": ("valid",),
    "tests": ("waived",),
}

#: Fields ADDED at each v5 MINOR version (reference stepwise schema
#: chain, kcidb/db/schematic.py:174-198 instantiated at
#: postgresql/v05_01.py:29-30, v05_02.py:27, v05_03.py:27): a report
#: pinned at v5.m must not carry fields introduced after m, and a
#: store pinned there projects them away on read/dump.
V5_MINOR_ADDED: dict[int, dict[str, tuple[str, ...]]] = {
    1: {
        "checkouts": (
            "origin_builds_finish_time",
            "origin_tests_finish_time",
        )
    },
    2: {"issues": ("categories",)},
    3: {"tests": ("input_files",)},
}


def v5_minor_dropped(minor: int) -> dict[str, tuple[str, ...]]:
    """table → fields NOT present at v5.``minor`` (added later)."""
    out: dict[str, list[str]] = {}
    for m, tables in V5_MINOR_ADDED.items():
        if m > minor:
            for t, fields in tables.items():
                out.setdefault(t, []).extend(fields)
    return {t: tuple(fs) for t, fs in out.items()}


def new() -> dict[str, Any]:
    """An empty report at the current version."""
    return {"version": dict(IO_VERSION)}


def count(data: dict[str, Any]) -> int:
    """Total number of objects across all object lists."""
    return sum(len(data.get(t, ())) for t in TABLES)


def merge(target: dict[str, Any], sources: list[dict[str, Any]]) -> dict[str, Any]:
    """Concatenate object lists of several reports (upgrading each to
    the current version first).  Reference: io_schema.merge used at
    kcidb/__init__.py:459-470."""
    out = copy.deepcopy(upgrade(target))
    for src in sources:
        src = upgrade(src)
        for t in TABLES:
            if src.get(t):
                out.setdefault(t, []).extend(copy.deepcopy(src[t]))
    return out


def upgrade(data: dict[str, Any]) -> dict[str, Any]:
    """Upgrade a v4/v5 report to v5.3.

    v4→v5 semantics (postgresql/v05_00.py:178-231):
      * builds.valid → status: TRUE→PASS, FALSE→FAIL, NULL→absent
      * tests.waived=TRUE → synthetic "_:waived" issue + one incident
        per waived test
      * checkouts.contacts dropped
    """
    version = data.get("version", {})
    major = version.get("major")
    if major not in (4, 5):
        raise ValueError(f"unsupported report version: {version}")
    out = copy.deepcopy(data)
    out["version"] = dict(IO_VERSION)
    if major == 4:
        for build in out.get("builds", []):
            valid = build.pop("valid", None)
            if valid is not None and "status" not in build:
                build["status"] = "PASS" if valid else "FAIL"
        waived_ids = []
        for test in out.get("tests", []):
            if test.pop("waived", None):
                waived_ids.append(test["id"])
        if waived_ids:
            issue_id, issue_version = "_:waived", 1
            out.setdefault("issues", []).append(
                {
                    "id": issue_id,
                    "version": issue_version,
                    "origin": "_",
                    "comment": "Test waived as unreliable",
                }
            )
            out.setdefault("incidents", []).extend(
                {
                    "id": f"{issue_id}:{issue_version}:{tid}",
                    "origin": "_",
                    "issue_id": issue_id,
                    "issue_version": issue_version,
                    "test_id": tid,
                    "present": True,
                }
                for tid in waived_ids
            )
        for checkout in out.get("checkouts", []):
            checkout.pop("contacts", None)
    # Drop any stray removed fields on v5 input too (defensive).
    for table, fields in _V4_DROPPED.items():
        for obj in out.get(table, []):
            for fname in fields:
                obj.pop(fname, None)
    return out


from kcidb_spark.schema.validation import (  # noqa: E402
    REQUIRED_FIELDS as _REQUIRED,
    validate_schema,
)

_KNOWN_FIELDS = {t: {f.name for f in SCHEMAS[t].fields} for t in TABLES}


def validate(data: dict[str, Any]) -> dict[str, Any]:
    """Validate a v5 report: fast structural checks (version, required
    fields, unknown fields, status enum — with readable errors), then
    full JSON-Schema validation of types/formats/nesting against the
    schema derived from the engine's StructTypes
    (schema/validation.py), matching the reference's validate-on-every-
    load/dump behavior (kcidb/db/abstract.py:352-354).  Returns data
    unchanged.
    """
    version = data.get("version", {})
    if version.get("major") != 5:
        raise ValueError(f"expected major version 5, got {version}")
    for t in TABLES:
        for i, obj in enumerate(data.get(t, [])):
            where = f"{t}[{i}]"
            for req in _REQUIRED[t]:
                if obj.get(req) is None:
                    raise ValueError(f"{where}: missing required field {req!r}")
            # "_"-prefixed metadata fields (_timestamp) are legal: a
            # dump(with_metadata=True) report must re-load.
            unknown = {f for f in set(obj) - _KNOWN_FIELDS[t]
                       if not f.startswith("_")}
            if unknown:
                raise ValueError(f"{where}: unknown fields {sorted(unknown)}")
            status = obj.get("status")
            if status is not None and status not in STATUS_VALUES:
                raise ValueError(f"{where}: invalid status {status!r}")
    validate_schema(data)
    return data


def validate_at_minor(data: dict[str, Any], minor: int) -> dict[str, Any]:
    """Validate a report pinned at v5.``minor`` — the acceptance and
    dump check of a minor-pinned store (``Store(version="5.1")``):
    declared version must be exactly (5, minor), no object may carry a
    field introduced at a LATER minor (the mid-chain schema would not
    have the column), then the full v5 structural/JSON-Schema pass
    (the current schema is a superset, so it accepts every valid
    subset report).  Returns data unchanged."""
    version = data.get("version", {})
    if version.get("major") != 5 or version.get("minor") != minor:
        raise ValueError(
            f"expected version 5.{minor}, got {version}"
        )
    for t, fields in v5_minor_dropped(minor).items():
        for i, obj in enumerate(data.get(t, [])):
            bad = sorted(set(fields) & set(obj))
            if bad:
                raise ValueError(
                    f"{t}[{i}]: fields {bad} were introduced after"
                    f" v5.{minor}"
                )
    return validate(data)


_KNOWN_FIELDS_V4 = {
    t: _KNOWN_FIELDS[t] - {"status" if t == "builds" else ""}
    | set(_V4_DROPPED.get(t, ()))
    for t in TABLES
}


def validate_v4(data: dict[str, Any]) -> dict[str, Any]:
    """Structural validation of a v4 report — the acceptance check a
    store pinned at schema major 4 runs on load (the mux lattice's
    held-back member, store/drivers.py).  v4 field set = v5 minus
    ``builds.status`` plus the dropped trio (``valid`` / ``waived`` /
    ``contacts``).  Returns data unchanged."""
    version = data.get("version", {})
    if version.get("major") != 4:
        raise ValueError(f"expected major version 4, got {version}")
    for t in TABLES:
        for i, obj in enumerate(data.get(t, [])):
            where = f"{t}[{i}]"
            for req in _REQUIRED[t]:
                if obj.get(req) is None:
                    raise ValueError(f"{where}: missing required field {req!r}")
            unknown = {f for f in set(obj) - _KNOWN_FIELDS_V4[t]
                       if not f.startswith("_")}
            if unknown:
                raise ValueError(f"{where}: unknown fields {sorted(unknown)}")
    return data


def id_tuple(table: str, obj: dict[str, Any]) -> tuple:
    """The object's PK tuple per ID_FIELDS (issues: (id, version))."""
    return tuple(obj.get(f) for f in ID_FIELDS[table])
