"""Store semantics: golden round-trip, field-wise merge, purge,
modified timestamps, status preservation.

Mirrors the reference's test strategy (SURVEY.md §5): test_all_fields
round-trip (kcidb/test_db.py:486-495), metadata/merge semantics
(:684-723), purge (:2764+), test_test_status (:2723-2737).
"""

from __future__ import annotations

import datetime

import pytest

from kcidb_spark.schema import STATUS_VALUES
from kcidb_spark.schema.io import new
from kcidb_spark.store import Store
from tests.kcidb_fixtures import COMPREHENSIVE

UTC = datetime.timezone.utc


@pytest.fixture()
def store(spark, tmp_path):
    return Store(spark, str(tmp_path / "store"))


def _sorted(report: dict) -> dict:
    out = {}
    for k, v in report.items():
        out[k] = sorted(v, key=lambda o: str(sorted(o.items()))) if isinstance(v, list) else v
    return out


def test_comprehensive_roundtrip(store):
    store.load(COMPREHENSIVE)
    dumped = store.dump(with_metadata=False)
    assert _sorted(dumped) == _sorted(COMPREHENSIVE)


def test_empty_dump(store):
    assert store.dump() == new()


def test_fieldwise_merge(store):
    t1 = datetime.datetime(2025, 1, 1, tzinfo=UTC)
    t2 = datetime.datetime(2025, 1, 2, tzinfo=UTC)
    # First load: comment set, no status.
    store.load(
        {
            "version": {"major": 5, "minor": 3},
            "builds": [
                {"id": "b:1", "origin": "b", "checkout_id": "c:1",
                 "comment": "first", "architecture": "arm64"}
            ],
        },
        timestamp=t1,
    )
    # Second load, later: status set, comment NULL (must not clobber),
    # architecture conflicting (latest non-NULL wins).
    store.load(
        {
            "version": {"major": 5, "minor": 3},
            "builds": [
                {"id": "b:1", "origin": "b", "checkout_id": "c:1",
                 "status": "PASS", "architecture": "x86_64"}
            ],
        },
        timestamp=t2,
    )
    dumped = store.dump(with_metadata=True)
    assert len(dumped["builds"]) == 1
    b = dumped["builds"][0]
    assert b["comment"] == "first"  # non-NULL survives later NULL
    assert b["status"] == "PASS"
    assert b["architecture"] == "x86_64"  # latest non-NULL wins conflict
    assert b["_timestamp"] == t2.isoformat(timespec="microseconds")  # GREATEST


def test_merge_commutes(store, spark, tmp_path):
    """Loads are commutative: same final state in either order."""
    a = {
        "version": {"major": 5, "minor": 3},
        "tests": [{"id": "t:1", "origin": "t", "build_id": "b:1", "status": "FAIL"}],
    }
    b = {
        "version": {"major": 5, "minor": 3},
        "tests": [{"id": "t:1", "origin": "t", "build_id": "b:1", "duration": 1.5}],
    }
    t1 = datetime.datetime(2025, 1, 1, tzinfo=UTC)
    t2 = datetime.datetime(2025, 1, 2, tzinfo=UTC)
    store.load(a, timestamp=t1)
    store.load(b, timestamp=t2)
    other = Store(spark, str(tmp_path / "other"))
    other.load(b, timestamp=t2)
    other.load(a, timestamp=t1)
    assert store.dump() == other.dump()


def test_status_preserved(store):
    store.load(
        {
            "version": {"major": 5, "minor": 3},
            "tests": [
                {"id": f"_:{s}", "origin": "_", "build_id": "_:1", "status": s}
                for s in STATUS_VALUES
            ],
        }
    )
    dumped = store.dump()
    assert {t["status"] for t in dumped["tests"]} == set(STATUS_VALUES)
    assert {t["id"][2:] for t in dumped["tests"]} == set(STATUS_VALUES)


def test_purge_and_modified(store):
    t1 = datetime.datetime(2025, 1, 1, tzinfo=UTC)
    t2 = datetime.datetime(2025, 2, 1, tzinfo=UTC)
    store.load(
        {"version": {"major": 5, "minor": 3},
         "checkouts": [{"id": "c:old", "origin": "c"}]},
        timestamp=t1,
    )
    store.load(
        {"version": {"major": 5, "minor": 3},
         "checkouts": [{"id": "c:new", "origin": "c"}]},
        timestamp=t2,
    )
    assert store.first_modified()["checkouts"] == t1
    assert store.last_modified()["checkouts"] == t2
    # Window dump: (after t1, until t2] sees only the newer object.
    windowed = store.dump(after=t1, until=t2)
    assert [c["id"] for c in windowed["checkouts"]] == ["c:new"]
    store.purge(before=datetime.datetime(2025, 1, 15, tzinfo=UTC))
    dumped = store.dump()
    assert [c["id"] for c in dumped["checkouts"]] == ["c:new"]


def test_validation_rejects(store):
    with pytest.raises(ValueError, match="missing required"):
        store.load({"version": {"major": 5, "minor": 3},
                    "checkouts": [{"origin": "x"}]})
    with pytest.raises(ValueError, match="unknown fields"):
        store.load({"version": {"major": 5, "minor": 3},
                    "checkouts": [{"id": "x:1", "origin": "x", "bogus": 1}]})
    with pytest.raises(ValueError, match="invalid status"):
        store.load({"version": {"major": 5, "minor": 3},
                    "builds": [{"id": "x:1", "origin": "x", "checkout_id": "c",
                                "status": "GREAT"}]})


def test_sql_surface(spark, tmp_path):
    """Store.sql: raw Spark SQL over object tables + ORM views."""
    from tests.kcidb_fixtures import COMPREHENSIVE

    st = Store(spark, str(tmp_path / "sqlstore"))
    st.load(COMPREHENSIVE)
    rows = st.sql(
        "SELECT b.id, c.tree_name FROM builds b "
        "JOIN checkouts c ON b.checkout_id = c.id ORDER BY b.id"
    ).collect()
    assert [r["id"] for r in rows] == sorted(
        o["id"] for o in COMPREHENSIVE["builds"]
    )
    assert all(r["tree_name"] == "mainline" for r in rows)
    # Derived ORM view is queryable too.
    revs = st.sql("SELECT git_commit_hash FROM revision").collect()
    assert len(revs) == 1
