"""Null/mux/json drivers + the archive job (SURVEY §2.1 S4-S6, S10)."""

from __future__ import annotations

import datetime

import pytest

from kcidb_spark.store import Store
from kcidb_spark.store.drivers import MuxStore, NullStore, archive, json_store
from tests.kcidb_fixtures import COMPREHENSIVE

UTC = datetime.timezone.utc


def test_null_store(spark):
    ns = NullStore(spark)
    ns.load(COMPREHENSIVE)  # validated, discarded
    assert ns.table("builds").count() == 0
    assert ns.dump() == {"version": {"major": 5, "minor": 3}}
    with pytest.raises(Exception):
        ns.load({"version": {"major": 5, "minor": 3}, "builds": [{"bogus": 1}]})


def test_json_store_roundtrip(spark, tmp_path):
    st = json_store(spark, str(tmp_path / "js"), COMPREHENSIVE)
    dumped = st.dump()
    assert {o["id"] for o in dumped["checkouts"]} == {
        o["id"] for o in COMPREHENSIVE["checkouts"]
    }
    assert len(dumped["builds"]) == len(COMPREHENSIVE["builds"])


def test_mux_fanout(spark, tmp_path):
    a = Store(spark, str(tmp_path / "a"))
    b = Store(spark, str(tmp_path / "b"))
    mux = MuxStore([a, b, NullStore(spark)])
    mux.load(COMPREHENSIVE)
    # Every real member got the rows; queries hit the first member.
    assert a.table("tests").count() == len(COMPREHENSIVE["tests"])
    assert b.table("tests").count() == len(COMPREHENSIVE["tests"])
    assert mux.table("tests").count() == len(COMPREHENSIVE["tests"])
    with pytest.raises(ValueError):
        MuxStore([])


def test_archive_windowed_copy(spark, tmp_path):
    src = Store(spark, str(tmp_path / "src"))
    dst = Store(spark, str(tmp_path / "dst"))
    t1 = datetime.datetime(2025, 1, 1, tzinfo=UTC)
    t2 = datetime.datetime(2025, 1, 10, tzinfo=UTC)
    src.load(COMPREHENSIVE, timestamp=t2)
    # Window excluding the data copies nothing.
    archive(src, dst, after=t2, until=t2 + datetime.timedelta(days=1))
    assert dst.table("builds").count() == 0
    # Window covering the data copies raw rows chunk by chunk.
    reached = archive(
        src, dst, after=t1, until=t2, chunk=datetime.timedelta(days=3)
    )
    assert reached == t2
    for t in ("checkouts", "builds", "tests", "issues", "incidents"):
        assert dst.table(t).count() == src.table(t).count(), t
    # Idempotent under re-copy: dedup view unchanged.
    archive(src, dst, after=t1, until=t2)
    assert dst.table("builds").count() == src.table("builds").count()


def test_archive_deadline(spark, tmp_path):
    src = Store(spark, str(tmp_path / "src2"))
    dst = Store(spark, str(tmp_path / "dst2"))
    t0 = datetime.datetime(2025, 3, 1, tzinfo=UTC)
    src.load(COMPREHENSIVE, timestamp=t0 + datetime.timedelta(days=1))
    reached = archive(
        src,
        dst,
        after=t0,
        until=t0 + datetime.timedelta(days=30),
        chunk=datetime.timedelta(days=1),
        deadline_s=0.0,
    )
    # Deadline of 0 stops after the first chunk; watermark reflects it.
    assert reached == t0 + datetime.timedelta(days=1)
