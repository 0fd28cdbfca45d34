"""Store-level schema versioning: v4-era directories open and migrate
losslessly (reference kcidb/db/schematic.py:174-198 inheritance chain;
v4→v5 semantics postgresql/v05_00.py:178-231)."""

from __future__ import annotations

import datetime
import json
import os

import pytest

from kcidb_spark.store import Store
from kcidb_spark.store.versioning import (
    STORE_VERSION,
    read_version,
    schema_for_v4,
    write_version,
)

UTC = datetime.timezone.utc
TS = datetime.datetime(2025, 1, 1, tzinfo=UTC)


def _write_v4_store(spark, root: str) -> None:
    os.makedirs(root, exist_ok=True)
    rows = {
        "checkouts": [
            {"id": "_:c1", "origin": "_", "contacts": ["dev@example.org"],
             "_timestamp": TS},
        ],
        "builds": [
            {"id": "_:b1", "origin": "_", "checkout_id": "_:c1",
             "valid": True, "_timestamp": TS},
            {"id": "_:b2", "origin": "_", "checkout_id": "_:c1",
             "valid": False, "_timestamp": TS},
            {"id": "_:b3", "origin": "_", "checkout_id": "_:c1",
             "_timestamp": TS},
        ],
        "tests": [
            {"id": "_:t1", "origin": "_", "build_id": "_:b1",
             "waived": True, "_timestamp": TS},
            {"id": "_:t2", "origin": "_", "build_id": "_:b1",
             "waived": False, "_timestamp": TS},
        ],
    }
    for table, objs in rows.items():
        df = spark.createDataFrame(objs, schema_for_v4(table))
        df.write.mode("overwrite").parquet(os.path.join(root, table))
    write_version(root, (4, 1))


def test_v4_store_migrates_on_open(spark, tmp_path):
    root = str(tmp_path / "v4store")
    _write_v4_store(spark, root)
    store = Store(spark, root)  # triggers migration
    assert read_version(root) == STORE_VERSION

    dump = store.dump()
    # builds: valid → status (TRUE→PASS, FALSE→FAIL, NULL→absent).
    status = {b["id"]: b.get("status") for b in dump["builds"]}
    assert status == {"_:b1": "PASS", "_:b2": "FAIL", "_:b3": None}
    assert all("valid" not in b for b in dump["builds"])
    # tests: waived dropped; waived=TRUE → _:waived issue + incident.
    assert all("waived" not in t for t in dump["tests"])
    assert [i["id"] for i in dump["issues"]] == ["_:waived"]
    incidents = dump["incidents"]
    assert len(incidents) == 1
    assert incidents[0]["issue_id"] == "_:waived"
    assert incidents[0]["test_id"] == "_:t1"
    assert incidents[0]["present"] is True
    # checkouts: contacts dropped, everything else intact.
    assert dump["checkouts"][0]["id"] == "_:c1"
    assert "contacts" not in dump["checkouts"][0]
    # The migrated dump re-validates and re-loads (lossless round-trip).
    store2 = Store(spark, str(tmp_path / "fresh"))
    store2.load(dump)
    assert store2.dump() == dump


def test_v4_store_without_waived_synthesizes_nothing(spark, tmp_path):
    root = str(tmp_path / "v4store2")
    _write_v4_store(spark, root)
    # Overwrite tests with no waived rows.
    df = spark.createDataFrame(
        [{"id": "_:t1", "origin": "_", "build_id": "_:b1",
          "waived": False, "_timestamp": TS}],
        schema_for_v4("tests"),
    )
    df.write.mode("overwrite").parquet(os.path.join(root, "tests"))
    store = Store(spark, root)
    dump = store.dump()
    assert "issues" not in dump
    assert "incidents" not in dump


def test_fresh_store_stamped_current(spark, tmp_path):
    root = str(tmp_path / "fresh")
    Store(spark, root)
    assert read_version(root) == STORE_VERSION


def test_minor_version_bumps_without_rewrite(spark, tmp_path):
    root = str(tmp_path / "minor")
    store = Store(spark, root)
    store.load({"version": {"major": 5, "minor": 3},
                "checkouts": [{"id": "_:c1", "origin": "_"}]})
    write_version(root, (5, 0))
    files_before = sorted(
        os.listdir(os.path.join(root, "checkouts"))
    )
    store2 = Store(spark, root)
    assert read_version(root) == STORE_VERSION
    assert sorted(os.listdir(os.path.join(root, "checkouts"))) == files_before
    assert store2.dump()["checkouts"][0]["id"] == "_:c1"


def test_future_major_rejected(spark, tmp_path):
    root = str(tmp_path / "future")
    os.makedirs(root)
    with open(os.path.join(root, "_schema.json"), "w") as f:
        json.dump({"major": 9, "minor": 0}, f)
    with pytest.raises(ValueError, match="unsupported schema version"):
        Store(spark, root)


# ---------------------------------------------------------------------------
# Date-partitioned layout (purge = partition drop)
# ---------------------------------------------------------------------------


def test_partitioned_store_roundtrip_and_purge(spark, tmp_path):
    from tests.kcidb_fixtures import COMPREHENSIVE

    t_old = datetime.datetime(2025, 1, 1, 8, 0, tzinfo=UTC)
    t_mid = datetime.datetime(2025, 1, 15, 6, 0, tzinfo=UTC)
    t_mid2 = datetime.datetime(2025, 1, 15, 18, 0, tzinfo=UTC)
    t_new = datetime.datetime(2025, 2, 1, 8, 0, tzinfo=UTC)

    root = str(tmp_path / "pstore")
    ps = Store(spark, root, partitioned=True)
    rep = lambda i: {"version": {"major": 5, "minor": 3},
                     "checkouts": [{"id": f"c:{i}", "origin": "c"}]}
    ps.load(rep("old"), timestamp=t_old)
    ps.load(rep("mid_am"), timestamp=t_mid)
    ps.load(rep("mid_pm"), timestamp=t_mid2)
    ps.load(rep("new"), timestamp=t_new)

    # Layout: one partition dir per load date.
    parts = sorted(
        os.path.basename(p) for p in
        __import__("glob").glob(os.path.join(root, "checkouts",
                                             "_load_date=*"))
    )
    assert parts == ["_load_date=2025-01-01", "_load_date=2025-01-15",
                     "_load_date=2025-02-01"]

    # Dump is layout-independent.
    flat = Store(spark, str(tmp_path / "flat"))
    for r, t in ((rep("old"), t_old), (rep("mid_am"), t_mid),
                 (rep("mid_pm"), t_mid2), (rep("new"), t_new)):
        flat.load(r, timestamp=t)
    assert ps.dump(with_metadata=True) == flat.dump(with_metadata=True)

    # Purge mid-day on the boundary date: 2025-01-01 partition is a
    # directory drop; the boundary partition is filter-rewritten
    # (mid_am goes, mid_pm stays); 2025-02-01 untouched.
    ps.purge(before=datetime.datetime(2025, 1, 15, 12, 0, tzinfo=UTC))
    parts = sorted(
        os.path.basename(p) for p in
        __import__("glob").glob(os.path.join(root, "checkouts",
                                             "_load_date=*"))
    )
    assert parts == ["_load_date=2025-01-15", "_load_date=2025-02-01"]
    ids = {c["id"] for c in ps.dump()["checkouts"]}
    assert ids == {"c:mid_pm", "c:new"}

    # Reopen without the flag: layout auto-detected, loads keep
    # partitioning, compact preserves it.
    ps2 = Store(spark, root)
    assert ps2.partitioned
    ps2.load(COMPREHENSIVE, timestamp=t_new)
    ps2.compact()
    assert __import__("glob").glob(os.path.join(root, "builds",
                                                "_load_date=*"))
    assert {c["id"] for c in ps2.dump()["checkouts"]} == {
        "c:mid_pm", "c:new", "origin:checkout-1"
    }
