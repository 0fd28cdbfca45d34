"""I/O report helpers: upgrade, merge, count, validate."""

from __future__ import annotations

import pytest

from kcidb_spark.schema.io import count, merge, new, upgrade, validate


def test_new_and_count():
    assert new() == {"version": {"major": 5, "minor": 3}}
    assert count(new()) == 0
    assert count({"version": {"major": 5, "minor": 3},
                  "checkouts": [{}, {}], "tests": [{}]}) == 3


def test_upgrade_v4_valid_to_status():
    out = upgrade({
        "version": {"major": 4, "minor": 5},
        "builds": [
            {"id": "b:1", "origin": "b", "checkout_id": "c:1", "valid": True},
            {"id": "b:2", "origin": "b", "checkout_id": "c:1", "valid": False},
            {"id": "b:3", "origin": "b", "checkout_id": "c:1"},
        ],
    })
    assert out["version"] == {"major": 5, "minor": 3}
    statuses = {b["id"]: b.get("status") for b in out["builds"]}
    assert statuses == {"b:1": "PASS", "b:2": "FAIL", "b:3": None}
    assert all("valid" not in b for b in out["builds"])


def test_upgrade_v4_waived_to_incident():
    out = upgrade({
        "version": {"major": 4, "minor": 0},
        "tests": [
            {"id": "t:1", "origin": "t", "build_id": "b:1", "waived": True},
            {"id": "t:2", "origin": "t", "build_id": "b:1", "waived": False},
        ],
    })
    assert all("waived" not in t for t in out["tests"])
    assert out["issues"] == [{
        "id": "_:waived", "version": 1, "origin": "_",
        "comment": "Test waived as unreliable",
    }]
    assert len(out["incidents"]) == 1
    inc = out["incidents"][0]
    assert inc["test_id"] == "t:1"
    assert inc["issue_id"] == "_:waived"
    assert inc["present"] is True
    validate(out)


def test_upgrade_drops_contacts():
    out = upgrade({
        "version": {"major": 4, "minor": 0},
        "checkouts": [{"id": "c:1", "origin": "c", "contacts": ["a@b"]}],
    })
    assert "contacts" not in out["checkouts"][0]


def test_merge_concatenates_and_upgrades():
    a = {"version": {"major": 5, "minor": 3},
         "checkouts": [{"id": "c:1", "origin": "c"}]}
    b = {"version": {"major": 4, "minor": 0},
         "builds": [{"id": "b:1", "origin": "b", "checkout_id": "c:1",
                     "valid": True}]}
    out = merge(a, [b])
    assert count(out) == 2
    assert out["builds"][0]["status"] == "PASS"


def test_upgrade_rejects_unknown_version():
    with pytest.raises(ValueError, match="unsupported report version"):
        upgrade({"version": {"major": 3, "minor": 0}})


# ---------------------------------------------------------------------------
# Full JSON-Schema validation (types/formats/nesting — VERDICT r1 §5)
# ---------------------------------------------------------------------------

def _rep(table: str, obj: dict) -> dict:
    base = {
        "checkouts": {"id": "c:1", "origin": "c"},
        "builds": {"id": "b:1", "origin": "b", "checkout_id": "c:1"},
        "tests": {"id": "t:1", "origin": "t", "build_id": "b:1"},
        "issues": {"id": "i:1", "origin": "i", "version": 1},
        "incidents": {"id": "n:1", "origin": "n", "issue_id": "i:1",
                      "issue_version": 1},
    }[table]
    return {"version": {"major": 5, "minor": 3}, table: [dict(base, **obj)]}


_INVALID = [
    ("string_duration", _rep("builds", {"duration": "600"})),
    ("environment_not_object", _rep("tests", {"environment": "x86"})),
    ("environment_bad_member_type", _rep("tests", {"environment": {"comment": 5}})),
    ("environment_unknown_member", _rep("tests", {"environment": {"flavor": "q"}})),
    ("misc_not_object", _rep("builds", {"misc": "free text"})),
    ("number_value_string", _rep("tests", {"number": {"value": "5"}})),
    ("number_bad_prefix", _rep("tests", {"number": {"value": 5.0, "prefix": "decimal"}})),
    ("tags_not_array", _rep("checkouts", {"git_commit_tags": "v6.6"})),
    ("tags_bad_element", _rep("checkouts", {"git_commit_tags": [1, 2]})),
    ("malformed_timestamp", _rep("checkouts", {"start_time": "yesterday"})),
    ("issue_version_string", _rep("issues", {"version": "1"})),
    ("resource_bad_member", _rep("checkouts", {"patchset_files": [{"name": 1}]})),
    ("culprit_bad_type", _rep("issues", {"culprit": {"code": "yes"}})),
    ("branch_tip_not_bool", _rep("checkouts", {"git_repository_branch_tip": "true"})),
    ("present_not_bool", _rep("incidents", {"present": 1})),
]


@pytest.mark.parametrize("rep", [r for _, r in _INVALID],
                         ids=[n for n, _ in _INVALID])
def test_wrong_typed_fields_rejected(rep):
    with pytest.raises(ValueError):
        validate(rep)


def test_comprehensive_validates():
    from tests.kcidb_fixtures import COMPREHENSIVE

    validate(COMPREHENSIVE)


def test_metadata_timestamp_accepted():
    rep = _rep("builds", {"_timestamp": "2025-03-01T12:30:45.123456+00:00"})
    validate(rep)


def test_metadata_timestamp_bad_format_rejected():
    rep = _rep("builds", {"_timestamp": "not a time"})
    with pytest.raises(ValueError):
        validate(rep)
