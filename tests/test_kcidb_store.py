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


def test_metadata_roundtrip(store, spark, tmp_path):
    """dump(with_metadata=True) → load preserves per-object load times
    (reference metadata-preserving round-trip; ADVICE r1 item 1)."""
    t = datetime.datetime(2025, 3, 1, 12, 30, 45, 123456, tzinfo=UTC)
    store.load(COMPREHENSIVE, timestamp=t)
    dumped = store.dump(with_metadata=True)
    for tbl in ("checkouts", "builds", "tests", "issues", "incidents"):
        for obj in dumped.get(tbl, []):
            assert obj["_timestamp"] == "2025-03-01T12:30:45.123456+00:00"
    store2 = Store(spark, str(tmp_path / "store2"))
    store2.load(dumped, timestamp=datetime.datetime(2099, 1, 1, tzinfo=UTC))
    again = store2.dump(with_metadata=True)
    assert _sorted(again) == _sorted(dumped)


def test_dump_timestamps_survive_non_utc_driver(store):
    """Timestamps serialize engine-side in UTC: a non-UTC driver
    process must not shift dumped values (ADVICE r1 item 2)."""
    import os
    import time as _time

    t = datetime.datetime(2025, 3, 1, 12, 30, 45, 123456, tzinfo=UTC)
    store.load(COMPREHENSIVE, timestamp=t)
    old = os.environ.get("TZ")
    os.environ["TZ"] = "America/New_York"
    _time.tzset()
    try:
        dumped = store.dump(with_metadata=True)
        co = dumped["checkouts"][0]
        assert co["start_time"] == COMPREHENSIVE["checkouts"][0]["start_time"]
        assert co["_timestamp"] == "2025-03-01T12:30:45.123456+00:00"
        assert store.last_modified()["checkouts"] == t
        assert store.first_modified()["checkouts"] == t
    finally:
        if old is None:
            os.environ.pop("TZ", None)
        else:
            os.environ["TZ"] = old
        _time.tzset()


def test_dump_iter_pagination(store):
    """objects_per_report=k → ⌈N/k⌉ validated reports that merge back
    to the monolithic dump (reference kcidb/db/__init__.py:313-388)."""
    from kcidb_spark.schema.io import count as io_count
    from kcidb_spark.schema.io import merge as io_merge
    from kcidb_spark.schema.io import validate as io_validate

    report = {
        "version": {"major": 5, "minor": 3},
        "checkouts": [
            {"id": f"o:c{i}", "origin": "o"} for i in range(3)
        ],
        "builds": [
            {"id": f"o:b{i}", "origin": "o", "checkout_id": "o:c0"}
            for i in range(4)
        ],
        "tests": [
            {"id": f"o:t{i}", "origin": "o", "build_id": "o:b0"}
            for i in range(4)
        ],
    }
    store.load(report)
    chunks = list(store.dump_iter(4))
    assert len(chunks) == 3  # ⌈11/4⌉
    assert [io_count(c) for c in chunks] == [4, 4, 3]
    for c in chunks:
        io_validate(c)
    merged = io_merge(chunks[0], chunks[1:])
    assert _sorted(merged) == _sorted(store.dump())
    # No pagination → identical to dump().
    [whole] = list(store.dump_iter(None))
    assert _sorted(whole) == _sorted(store.dump())
    # Empty store still yields exactly one (empty, valid) report.
    from kcidb_spark.schema.io import new as io_new
    store.empty()
    assert list(store.dump_iter(5)) == [io_new()]
    with pytest.raises(ValueError):
        list(store.dump_iter(0))


def test_query_store_iter_pagination(store):
    from kcidb_spark.closure import query_store, query_store_iter
    from kcidb_spark.schema.io import count as io_count
    from kcidb_spark.schema.io import merge as io_merge

    store.load(COMPREHENSIVE)
    whole = query_store(store, {"checkouts": ["origin:checkout-1"]},
                        children=True)
    n = io_count(whole)
    assert n >= 4  # checkout + build + test + issueless incidents etc.
    chunks = list(
        query_store_iter(store, {"checkouts": ["origin:checkout-1"]},
                         children=True, objects_per_report=2)
    )
    assert len(chunks) == (n + 1) // 2
    assert all(io_count(c) <= 2 for c in chunks)
    assert _sorted(io_merge(chunks[0], chunks[1:])) == _sorted(whole)


def test_load_bulk_matches_incremental(store, spark, tmp_path):
    """load_bulk over a directory of report files == report-at-a-time
    load (same dump), with no driver-side report materialization."""
    import json as _json

    from tests.kcidb_fixtures import graph_fixture

    t = datetime.datetime(2025, 6, 1, tzinfo=UTC)
    reports = [COMPREHENSIVE, graph_fixture()]
    src = tmp_path / "reports"
    src.mkdir()
    for i, r in enumerate(reports):
        (src / f"r{i}.json").write_text(_json.dumps(r))

    bulk = store
    inc = Store(spark, str(tmp_path / "inc"))
    for r in reports:
        inc.load(r, timestamp=t)
    bulk.load_bulk(str(src), timestamp=t)
    assert _sorted(bulk.dump(with_metadata=True)) == _sorted(
        inc.dump(with_metadata=True)
    )


def test_load_bulk_jsonl(store, tmp_path):
    import json as _json

    t = datetime.datetime(2025, 6, 1, tzinfo=UTC)
    p = tmp_path / "reports.jsonl"
    rep1 = {"version": {"major": 5, "minor": 3},
            "checkouts": [{"id": "o:c1", "origin": "o"}]}
    rep2 = {"version": {"major": 5, "minor": 3},
            "checkouts": [{"id": "o:c2", "origin": "o",
                           "misc": {"k": [1, 2]}}]}
    p.write_text(_json.dumps(rep1) + "\n" + _json.dumps(rep2) + "\n")
    store.load_bulk(str(p), timestamp=t, multiline=False)
    dump = store.dump()
    assert sorted(c["id"] for c in dump["checkouts"]) == ["o:c1", "o:c2"]
    assert [c.get("misc") for c in dump["checkouts"]
            if c["id"] == "o:c2"] == [{"k": [1, 2]}]


def test_load_bulk_rejects_bad_version_and_missing_required(store, tmp_path):
    import json as _json

    p1 = tmp_path / "bad1"
    p1.mkdir()
    (p1 / "r.json").write_text(_json.dumps({"version": {"major": 3}}))
    with pytest.raises(ValueError, match="major version 4 or 5"):
        store.load_bulk(str(p1))
    p2 = tmp_path / "bad2"
    p2.mkdir()
    (p2 / "r.json").write_text(_json.dumps(
        {"version": {"major": 5, "minor": 3},
         "builds": [{"id": "o:b1", "origin": "o"}]}  # no checkout_id
    ))
    with pytest.raises(ValueError, match="required"):
        store.load_bulk(str(p2))


def test_compact_preserves_dump(store):
    """compact() materializes the dedup view; dump before == after,
    and the raw tables shrink to one row per PK."""
    t1 = datetime.datetime(2025, 1, 1, tzinfo=UTC)
    t2 = datetime.datetime(2025, 1, 2, tzinfo=UTC)
    store.load(
        {"version": {"major": 5, "minor": 3},
         "builds": [{"id": "b:1", "origin": "b", "checkout_id": "c:1",
                     "comment": "first"}]},
        timestamp=t1,
    )
    store.load(
        {"version": {"major": 5, "minor": 3},
         "builds": [{"id": "b:1", "origin": "b", "checkout_id": "c:1",
                     "status": "PASS"}]},
        timestamp=t2,
    )
    before = store.dump(with_metadata=True)
    assert store.raw("builds").count() == 2
    store.compact()
    assert store.raw("builds").count() == 1
    assert store.dump(with_metadata=True) == before
    # Field-wise merge semantics survived: comment from load 1,
    # status from load 2.
    b = before["builds"][0]
    assert b["comment"] == "first" and b["status"] == "PASS"


def test_minor_version_pinned_dump(spark, tmp_path):
    """VERDICT r14 #8 — mid-chain minor pinning
    (kcidb/db/schematic.py:174-198): load a v5.3 report carrying every
    minor-delta field, reopen pinned at 5.1/5.0, and the dump speaks
    EXACTLY that version — later-minor columns projected away, the
    report validating against validate_at_minor; a pinned LOAD rejects
    newer-minor fields."""
    import pytest as _pytest

    from kcidb_spark.schema.io import validate_at_minor
    from kcidb_spark.store import Store

    root = str(tmp_path / "pinned")
    full = {
        "version": {"major": 5, "minor": 3},
        "checkouts": [
            {
                "id": "o:c1", "origin": "o",
                "git_commit_hash": "a" * 40, "patchset_hash": "",
                "origin_builds_finish_time":
                    "2026-01-02T03:04:05.000000+00:00",  # v5.1 field
                "origin_tests_finish_time":
                    "2026-01-02T04:04:05.000000+00:00",
            }
        ],
        "builds": [
            {"id": "o:b1", "origin": "o", "checkout_id": "o:c1",
             "status": "PASS"}
        ],
        "tests": [
            {"id": "o:t1", "origin": "o", "build_id": "o:b1",
             "status": "PASS",
             "input_files": [  # v5.3 field
                 {"name": "i.bin", "url": "https://x.example/i.bin"}
             ]}
        ],
        "issues": [
            {"id": "o:i1", "origin": "o", "version": 1,
             "categories": ["regression"]}  # v5.2 field
        ],
    }
    Store(spark, root).load(full)

    p51 = Store(spark, root, version="5.1")
    assert p51.io_version() == (5, 1)
    d51 = p51.dump()
    assert d51["version"] == {"major": 5, "minor": 1}
    validate_at_minor(d51, 1)  # no later-minor fields anywhere
    assert "origin_builds_finish_time" in d51["checkouts"][0]  # ≤5.1 kept
    assert "categories" not in d51["issues"][0]
    assert "input_files" not in d51["tests"][0]
    assert "categories" not in p51.table("issues").columns
    # dump_iter re-validates every chunk at the pin.
    chunks = list(p51.dump_iter(objects_per_report=2))
    assert all(c["version"] == {"major": 5, "minor": 1} for c in chunks)

    p50 = Store(spark, root, version="5.0")
    d50 = p50.dump()
    validate_at_minor(d50, 0)
    assert "origin_builds_finish_time" not in d50["checkouts"][0]

    # A pinned load accepts its own version and REJECTS newer fields.
    ok = {
        "version": {"major": 5, "minor": 1},
        "checkouts": [
            {"id": "o:c2", "origin": "o", "git_commit_hash": "b" * 40,
             "patchset_hash": "",
             "origin_builds_finish_time":
                 "2026-01-03T00:00:00.000000+00:00"}
        ],
    }
    p51.load(ok)
    assert any(
        r["id"] == "o:c2" for r in d51["checkouts"]
    ) is False  # (old dump unchanged, sanity)
    bad = {
        "version": {"major": 5, "minor": 1},
        "issues": [
            {"id": "o:i2", "origin": "o", "version": 1,
             "categories": ["nope"]}
        ],
    }
    with _pytest.raises(ValueError, match="introduced after"):
        p51.load(bad)
    with _pytest.raises(ValueError, match="expected version 5.1"):
        p51.load({"version": {"major": 5, "minor": 3}})

    # The unpinned store still speaks v5.3 with everything intact.
    d = Store(spark, root).dump()
    assert d["version"] == {"major": 5, "minor": 3}
    assert d["issues"][0]["categories"] == ["regression"]

    # Out-of-range pins refuse.
    with _pytest.raises(ValueError, match="cannot pin"):
        Store(spark, root, version="5.9")
    with _pytest.raises(ValueError, match="cannot pin"):
        Store(spark, root, version="4.0")
