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
