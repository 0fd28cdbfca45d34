"""Closure query semantics — mirror of kcidb/test_db.py:2535-2722."""

from __future__ import annotations

import pytest

from kcidb_spark.closure import query_store
from kcidb_spark.store import Store
from tests.kcidb_fixtures import graph_fixture


@pytest.fixture(scope="module")
def loaded_store(spark, tmp_path_factory):
    store = Store(spark, str(tmp_path_factory.mktemp("closure") / "store"))
    store.load(graph_fixture())
    return store


def _ids(report: dict, table: str) -> set:
    return {o["id"] for o in report.get(table, [])}


def test_children_from_checkout_1(loaded_store):
    r = query_store(loaded_store, ids={"checkouts": ["_:1"]}, children=True)
    assert _ids(r, "checkouts") == {"_:1"}
    assert _ids(r, "builds") == {"_:1"}
    assert _ids(r, "tests") == {"_:1"}
    assert "issues" not in r  # issues are not children of anything
    assert _ids(r, "incidents") == {"_:1", "_:2", "_:4"}
    # full rows, not just ids
    assert r["builds"][0] == {"checkout_id": "_:1", "id": "_:1", "origin": "_"}


def test_children_from_checkout_2(loaded_store):
    r = query_store(loaded_store, ids={"checkouts": ["_:2"]}, children=True)
    assert _ids(r, "checkouts") == {"_:2"}
    assert _ids(r, "builds") == {"_:2"}
    assert _ids(r, "tests") == {"_:2"}
    assert _ids(r, "incidents") == {"_:3", "_:5"}


def test_parents_from_incident_3(loaded_store):
    r = query_store(loaded_store, ids={"incidents": ["_:3"]}, parents=True)
    assert _ids(r, "checkouts") == {"_:2"}
    assert _ids(r, "builds") == {"_:2"}
    assert _ids(r, "tests") == {"_:2"}
    assert {(i["id"], i["version"]) for i in r["issues"]} == {("_:3", 1)}
    assert _ids(r, "incidents") == {"_:3"}


def test_parents_then_children_from_incident_3(loaded_store):
    # parents run BEFORE children; children then re-derive descendants
    # of the added ancestors (so incident _:5 via test _:2 appears, but
    # issue _:4 of _:5 does NOT — parents are not re-run).
    r = query_store(
        loaded_store, ids={"incidents": ["_:3"]}, parents=True, children=True
    )
    assert _ids(r, "checkouts") == {"_:2"}
    assert _ids(r, "builds") == {"_:2"}
    assert _ids(r, "tests") == {"_:2"}
    assert {(i["id"], i["version"]) for i in r["issues"]} == {("_:3", 1)}
    assert _ids(r, "incidents") == {"_:3", "_:5"}


def test_no_flags_returns_only_explicit(loaded_store):
    r = query_store(loaded_store, ids={"builds": ["_:1"]})
    assert _ids(r, "builds") == {"_:1"}
    assert "checkouts" not in r
    assert "tests" not in r


def test_empty_ids_match_nothing(loaded_store):
    r = query_store(loaded_store, ids={"checkouts": []}, children=True)
    assert set(r) == {"version"}


def test_composite_issue_ids(loaded_store):
    r = query_store(loaded_store, ids={"issues": [("_:4", 1)]}, children=True)
    assert {(i["id"], i["version"]) for i in r["issues"]} == {("_:4", 1)}
    assert _ids(r, "incidents") == {"_:4", "_:5"}


def test_unknown_type_rejected(loaded_store):
    with pytest.raises(ValueError, match="unknown object types"):
        query_store(loaded_store, ids={"bogus": ["x"]})
