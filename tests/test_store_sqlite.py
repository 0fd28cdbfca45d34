"""SQLite store driver: reference kcidb/db/sqlite analog (SURVEY §2.1
S1) — same append/dedup/dump semantics as the parquet Store, raw rows
in one SQLite file; plus the driver-spec dispatcher (open_store)."""

from __future__ import annotations

import datetime

import pytest

from kcidb_spark.store import Store
from kcidb_spark.store.drivers import MuxStore, NullStore, open_store
from kcidb_spark.store.sqlite import SqliteStore
from tests.kcidb_fixtures import COMPREHENSIVE

UTC = datetime.timezone.utc
T1 = datetime.datetime(2025, 1, 1, tzinfo=UTC)
T2 = datetime.datetime(2025, 1, 10, tzinfo=UTC)


def _canon(report):
    """Order-independent report form for equality checks."""
    out = {}
    for k, v in report.items():
        if isinstance(v, list):
            out[k] = sorted(
                v, key=lambda o: (o.get("id", ""), o.get("version", 0))
            )
        else:
            out[k] = v
    return out


def test_sqlite_matches_parquet_store(spark, tmp_path):
    """The two backends must produce bit-identical dumps from the same
    loads — dedup view and unpack logic are shared, so any difference
    is a raw-row encoding bug."""
    sq = SqliteStore(spark, str(tmp_path / "db.sqlite3"))
    pq = Store(spark, str(tmp_path / "pq"))
    sq.load(COMPREHENSIVE, timestamp=T1)
    pq.load(COMPREHENSIVE, timestamp=T1)
    assert _canon(sq.dump()) == _canon(pq.dump())
    assert _canon(sq.dump(with_metadata=True)) == _canon(
        pq.dump(with_metadata=True)
    )


def test_sqlite_dedup_latest_nonnull_wins(spark, tmp_path):
    sq = SqliteStore(spark, str(tmp_path / "db.sqlite3"))
    base = {
        "version": {"major": 5, "minor": 3},
        "checkouts": [
            {
                "id": "_:c1",
                "origin": "_",
                "comment": "first",
                "valid": True,
            }
        ],
    }
    later = {
        "version": {"major": 5, "minor": 3},
        "checkouts": [{"id": "_:c1", "origin": "_", "comment": "second"}],
    }
    sq.load(base, timestamp=T1)
    sq.load(later, timestamp=T2)
    row = sq.table("checkouts", with_metadata=True).collect()[0]
    # Latest non-NULL per column: comment from the later load, valid
    # kept from the earlier one; _timestamp = MAX.
    assert row["comment"] == "second"
    assert row["valid"] is True
    assert row["_timestamp"] == T2.replace(tzinfo=None) or (
        row["_timestamp"].replace(tzinfo=UTC) == T2
    )
    # Raw keeps both loaded versions (append-only).
    assert sq.raw("checkouts").count() == 2


def test_sqlite_window_dump_and_purge(spark, tmp_path):
    sq = SqliteStore(spark, str(tmp_path / "db.sqlite3"))
    sq.load(COMPREHENSIVE, timestamp=T2)
    # (after, until] window excludes T2 when after == T2.
    assert "builds" not in sq.dump(after=T2)
    assert "builds" in sq.dump(after=T1, until=T2)
    assert sq.first_modified()["builds"] == T2
    assert sq.last_modified()["builds"] == T2
    sq.purge(before=T2 + datetime.timedelta(days=1))
    assert sq.raw("builds").count() == 0
    sq.load(COMPREHENSIVE, timestamp=T1)
    sq.empty()
    assert sq.dump() == {"version": {"major": 5, "minor": 3}}


def test_sqlite_memory_and_reopen(spark, tmp_path):
    mem = SqliteStore(spark, ":memory:")
    mem.load(COMPREHENSIVE)
    assert mem.table("tests").count() == len(COMPREHENSIVE["tests"])
    # A file-backed store persists across connections.
    path = str(tmp_path / "db.sqlite3")
    SqliteStore(spark, path).load(COMPREHENSIVE, timestamp=T1)
    reopened = SqliteStore(spark, path)
    assert reopened.table("tests").count() == len(COMPREHENSIVE["tests"])


def test_open_store_spec_dispatch(spark, tmp_path):
    assert isinstance(open_store(spark, "null"), NullStore)
    assert isinstance(
        open_store(spark, f"sqlite:{tmp_path}/s.db"), SqliteStore
    )
    assert isinstance(open_store(spark, f"parquet:{tmp_path}/p"), Store)
    assert isinstance(open_store(spark, str(tmp_path / "bare")), Store)
    mux = open_store(
        spark, f"mux:sqlite::memory: {tmp_path}/pq2"
    )
    assert isinstance(mux, MuxStore)
    mux.load(COMPREHENSIVE)
    # Fan-out reached both members; queries hit the first (sqlite).
    assert mux.table("builds").count() == len(COMPREHENSIVE["builds"])
    assert Store(spark, f"{tmp_path}/pq2").table("builds").count() == len(
        COMPREHENSIVE["builds"]
    )


def test_open_store_json_spec(spark, tmp_path):
    import json

    p = tmp_path / "report.json"
    p.write_text(json.dumps(COMPREHENSIVE))
    st = open_store(spark, f"json:{p}")
    assert isinstance(st, SqliteStore)
    dumped = st.dump()
    assert {o["id"] for o in dumped["checkouts"]} == {
        o["id"] for o in COMPREHENSIVE["checkouts"]
    }


def test_archive_parquet_to_sqlite(spark, tmp_path):
    """The archive job is driver-agnostic: windowed raw copy from the
    parquet store into a SQLite target, dump equality afterwards."""
    from kcidb_spark.store.drivers import archive

    src = Store(spark, str(tmp_path / "src"))
    src.load(COMPREHENSIVE, timestamp=T2)
    dst = SqliteStore(spark, str(tmp_path / "arch.sqlite3"))
    reached = archive(
        src, dst, after=T1, until=T2, chunk=datetime.timedelta(days=30)
    )
    assert reached == T2
    assert _canon(dst.dump(with_metadata=True)) == _canon(
        src.dump(with_metadata=True)
    )


def test_sqlite_rejects_invalid_report(spark):
    sq = SqliteStore(spark, ":memory:")
    with pytest.raises(Exception):
        sq.load({"version": {"major": 5, "minor": 3}, "builds": [{"x": 1}]})
    assert sq.raw("builds").count() == 0


def test_append_raw_is_raw_faithful(spark, tmp_path):
    """Archive copy must preserve empty containers (ADVICE r6): a
    later load that supersedes a value with an EMPTY array must stay
    empty in the archive — the dump-path NULL-drop codec would store
    NULL and let the archived dedup view resurrect the older value."""
    from kcidb_spark.store.drivers import archive

    src = Store(spark, str(tmp_path / "src_raw"))
    base = {"id": "x:t1", "origin": "x", "build_id": "x:b1"}
    src.load(
        {"version": {"major": 5, "minor": 3},
         "tests": [dict(base, output_files=[
             {"name": "log", "url": "https://example.org/log"}])]},
        timestamp=T1,
    )
    src.load(
        {"version": {"major": 5, "minor": 3},
         "tests": [dict(base, output_files=[])]},
        timestamp=T2,
    )
    # Source view: the empty array superseded the populated one.
    src_val = src.table("tests").select("output_files").collect()[0][0]
    assert src_val == []

    dst = SqliteStore(spark, str(tmp_path / "arch.db"))
    archive(src, dst, after=T1 - datetime.timedelta(days=1), until=T2)
    dst_val = dst.table("tests").select("output_files").collect()[0][0]
    assert dst_val == [], "archive resurrected a superseded value"
    # Raw fidelity: both loaded versions crossed, not just the view.
    assert dst.raw("tests").count() == 2


def test_sqlite_compact(spark, tmp_path):
    """SqliteStore.compact(): dedup view materialized back into the
    raw table; the view of a compacted store is the identity."""
    sq = SqliteStore(spark, str(tmp_path / "c.db"))
    sq.load(COMPREHENSIVE, timestamp=T1)
    sq.load(COMPREHENSIVE, timestamp=T2)  # second version of every row
    before = _canon(sq.dump(with_metadata=True))
    assert sq.raw("builds").count() == 2 * len(COMPREHENSIVE["builds"])
    sq.compact()
    assert sq.raw("builds").count() == len(COMPREHENSIVE["builds"])
    assert _canon(sq.dump(with_metadata=True)) == before
