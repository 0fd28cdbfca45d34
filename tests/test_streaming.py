"""Streaming ingest pipeline: file source → load → notify → spool."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from kcidb_spark.store import Store
from kcidb_spark.streaming import IngestPipeline, NotificationSpool, Subscription
from kcidb_spark.streaming.ingest import patterns_from_io
from kcidb_spark.orm import parse_pattern


def _report(n: int) -> dict:
    return {
        "version": {"major": 5, "minor": 3},
        "checkouts": [{"id": f"s:co{n}", "origin": "s"}],
        "builds": [
            {"id": f"s:b{n}", "origin": "s", "checkout_id": f"s:co{n}",
             "status": "FAIL" if n % 2 else "PASS",
             "architecture": "x86_64"}
        ],
    }


@pytest.fixture()
def pipeline(spark, tmp_path):
    store = Store(spark, str(tmp_path / "store"))
    spool = NotificationSpool(spark, str(tmp_path / "spool"))
    subs = [
        Subscription(
            name="failed-builds",
            obj_type="build",
            predicate=F.col("status") == "FAIL",
            subject=F.concat(F.lit("Build failed: "), F.col("id")),
            body=F.concat(F.lit("Architecture: "), F.col("architecture")),
        )
    ]
    return IngestPipeline(store, spool, subs)


def test_streaming_ingest(pipeline, spark, tmp_path):
    indir = tmp_path / "in"
    indir.mkdir()
    for n in range(4):
        (indir / f"r{n}.json").write_text(json.dumps(_report(n)))
    q = pipeline.start(str(indir), str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    dump = pipeline.store.dump()
    assert {c["id"] for c in dump["checkouts"]} == {f"s:co{n}" for n in range(4)}
    # Only FAIL builds notified (n=1,3)
    spooled = pipeline.spool.all().collect()
    assert {r["obj_id"] for r in spooled} == {"s:b1", "s:b3"}
    assert all(r["subject"].startswith("Build failed: ") for r in spooled)
    assert all(r["sent_at"] is None for r in spooled)


def test_streaming_ingest_is_executor_side(pipeline, spark, tmp_path, monkeypatch):
    """The foreachBatch stage must parse reports ENGINE-side
    (Store.load_json_df), never via the driver-collect ingest_batch /
    Store.load path."""
    from kcidb_spark.store import Store
    from kcidb_spark.streaming.ingest import IngestPipeline

    def boom(*a, **k):  # pragma: no cover - should never run
        raise AssertionError("driver-side path used in streaming ingest")

    monkeypatch.setattr(IngestPipeline, "ingest_batch", boom)
    monkeypatch.setattr(Store, "load", boom)

    indir = tmp_path / "in"
    indir.mkdir()
    for n in range(3):
        (indir / f"r{n}.json").write_text(json.dumps(_report(n)))
    (indir / "blank.json").write_text("   \n")
    q = pipeline.start(str(indir), str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    assert pipeline.loaded_reports == 3
    dump = pipeline.store.dump()
    assert {c["id"] for c in dump["checkouts"]} == {f"s:co{n}" for n in range(3)}
    assert {r["obj_id"] for r in pipeline.spool.all().collect()} == {"s:b1"}


def test_load_json_df(spark, tmp_path):
    """Engine-side string-batch load: parses, appends, returns the
    parsed frame; blank rows skipped; corrupt JSON raises."""
    from kcidb_spark.store import Store

    store = Store(spark, str(tmp_path / "store"))
    batch = spark.createDataFrame(
        [(json.dumps(_report(1)),), ("  ",), (json.dumps(_report(2)),)],
        "value string",
    )
    parsed = store.load_json_df(batch)
    assert parsed.count() == 2
    assert store.table("checkouts").count() == 2

    empty = spark.createDataFrame([("",)], "value string")
    assert store.load_json_df(empty) is None

    import pytest as _pytest

    bad = spark.createDataFrame([("{not json",)], "value string")
    with _pytest.raises(ValueError, match="unparseable"):
        store.load_json_df(bad)


def test_redelivery_no_double_notify(pipeline):
    raw = json.dumps(_report(1))
    pipeline.ingest_batch([raw])
    pipeline.ingest_batch([raw])  # redelivered micro-batch
    assert pipeline.spool.all().count() == 1
    assert pipeline.store.table("builds").count() == 1


def test_send_and_ack(pipeline):
    pipeline.ingest_batch([json.dumps(_report(1)), json.dumps(_report(3))])
    sent = []
    n = pipeline.spool.mark_sent(send=lambda notif: sent.append(notif.obj_id))
    assert n == 2 and set(sent) == {"s:b1", "s:b3"}
    assert pipeline.spool.unsent().count() == 0
    # idempotent: nothing left to send
    assert pipeline.spool.mark_sent() == 0


def test_patterns_from_io_parse(spark):
    pats = patterns_from_io(
        {
            "version": {"major": 5, "minor": 3},
            "builds": [{"id": "s:b1", "origin": "s", "checkout_id": "c"}],
            "issues": [{"id": "i:1", "origin": "i", "version": 2}],
        }
    )
    assert any(p.startswith(">build[") and p.endswith("]#<*#") for p in pats)
    # every generated pattern parses under our own grammar
    for p in pats:
        parse_pattern(p)


def test_template_rendering_golden(spark, tmp_path):
    """Template pair renders golden subject/body per matched object
    (reference kcidb/monitor/output.py:175-241 template rendering;
    golden-output style of kcidb test_monitor)."""
    from kcidb_spark.streaming.notify import match_subscriptions
    from kcidb_spark.streaming.templates import template_column

    store = Store(spark, str(tmp_path / "store"))
    store.load({
        "version": {"major": 5, "minor": 3},
        "checkouts": [{"id": "o:c1", "origin": "o"}],
        "builds": [
            {"id": "o:b1", "origin": "o", "checkout_id": "o:c1",
             "status": "FAIL", "architecture": "riscv64",
             "config_name": "defconfig"},
            {"id": "o:b2", "origin": "o", "checkout_id": "o:c1",
             "status": "PASS", "architecture": "arm64"},
            # NULL architecture must render as "" without nullifying
            # the message.
            {"id": "o:b3", "origin": "o", "checkout_id": "o:c1",
             "status": "FAIL"},
        ],
    })
    from kcidb_spark.orm.types import type_views
    from kcidb_spark.schema.graph import TABLES

    views = type_views({t: store.table(t, True) for t in TABLES})
    sub = Subscription.from_templates(
        name="failed-builds",
        obj_type="build",
        predicate=F.col("status") == "FAIL",
        subject="Build {id} failed on {architecture}",
        body="Status: {status} {{literal}}\nConfig: {config_name}",
    )
    rows = {r["obj_id"]: r for r in
            match_subscriptions(views, [sub]).collect()}
    assert set(rows) == {"o:b1", "o:b3"}
    assert rows["o:b1"]["subject"] == "Build o:b1 failed on riscv64"
    assert rows["o:b1"]["body"] == "Status: FAIL {literal}\nConfig: defconfig"
    assert rows["o:b3"]["subject"] == "Build o:b3 failed on "
    assert rows["o:b3"]["body"] == "Status: FAIL {literal}\nConfig: "

    # Dotted struct placeholder + cap enforcement.
    tdf = spark.createDataFrame(
        [(("qemu",),)], "environment struct<comment:string>"
    )
    [r] = tdf.select(
        template_column("env={environment.comment}").alias("s")
    ).collect()
    assert r["s"] == "env=qemu"


def _v4_report() -> dict:
    return {
        "version": {"major": 4, "minor": 0},
        "checkouts": [
            {"id": "v:c1", "origin": "v", "contacts": ["a@b.c"],
             "misc": {"z": 1, "a": [1, 2]}}
        ],
        "builds": [
            {"id": "v:b1", "origin": "v", "checkout_id": "v:c1", "valid": True},
            {"id": "v:b2", "origin": "v", "checkout_id": "v:c1", "valid": False},
        ],
        "tests": [
            {"id": "v:t1", "origin": "v", "build_id": "v:b1", "waived": True},
            {"id": "v:t2", "origin": "v", "build_id": "v:b1", "waived": False},
        ],
    }


def test_load_json_df_is_jvm_only(spark, tmp_path):
    """The ingest parse must stay JVM-side: a static from_json schema,
    no RDD pickling round-trip, no Python eval node in the plan."""
    from pathlib import Path

    store = Store(spark, str(tmp_path / "store"))
    batch = spark.createDataFrame([(json.dumps(_report(1)),)], "value string")
    parsed = store.load_json_df(batch)
    plan = parsed._jdf.queryExecution().executedPlan().toString()
    for node in ("BatchEvalPython", "PythonRDD", "EvalPython", "MapInPandas"):
        assert node not in plan, plan
    # Source-level pin: no .rdd escape hatch anywhere in the store.
    src = Path(Store.__module__.replace(".", "/")).with_suffix("")  # unused
    import inspect

    import kcidb_spark.store as store_mod

    assert ".rdd" not in inspect.getsource(store_mod)


def test_load_json_df_upgrades_v4(spark, tmp_path):
    """v4 reports upgrade ENGINE-side in the same single load pass:
    builds.valid → status, waived tests → the synthetic "_:waived"
    issue + per-test incidents (reference postgresql/v05_00.py
    migration semantics), contacts dropped, misc canonicalized."""
    store = Store(spark, str(tmp_path / "store"))
    batch = spark.createDataFrame(
        [(json.dumps(_v4_report()),), (json.dumps(_report(8)),)],
        "value string",
    )
    store.load_json_df(batch)
    builds = {r["id"]: r for r in store.table("builds").collect()}
    assert builds["v:b1"]["status"] == "PASS"
    assert builds["v:b2"]["status"] == "FAIL"
    assert builds["s:b8"]["status"] == "PASS"  # v5 untouched
    issues = store.table("issues").collect()
    assert [(i["id"], i["version"]) for i in issues] == [("_:waived", 1)]
    incidents = {r["id"]: r for r in store.table("incidents").collect()}
    assert set(incidents) == {"_:waived:1:v:t1"}
    inc = incidents["_:waived:1:v:t1"]
    assert inc["test_id"] == "v:t1" and inc["present"] is True
    checkouts = {r["id"]: r for r in store.table("checkouts").collect()}
    assert checkouts["v:c1"]["misc"] == '{"a":[1,2],"z":1}'


def test_streaming_ingest_v4_report(pipeline, spark, tmp_path):
    """A v4 report in the inbox must upgrade and load, not kill the
    streaming query (round-4 regression: load_json_df hard-failed on
    version.major != 5 inside foreachBatch)."""
    indir = tmp_path / "in"
    indir.mkdir()
    (indir / "v4.json").write_text(json.dumps(_v4_report()))
    (indir / "v5.json").write_text(json.dumps(_report(1)))
    q = pipeline.start(str(indir), str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert pipeline.loaded_reports == 2
    dump = pipeline.store.dump()
    assert {c["id"] for c in dump["checkouts"]} == {"v:c1", "s:co1"}
    assert {b["id"] for b in dump["builds"]} == {"v:b1", "v:b2", "s:b1"}


def test_load_json_df_rejects_bad_enum_and_timestamp(spark, tmp_path):
    """Engine-side value validation on the streaming path: a status
    outside the enum or a garbage timestamp string fails loudly
    instead of silently poisoning rollups / nulling the value."""
    store = Store(spark, str(tmp_path / "store"))
    bad_status = dict(_report(1))
    bad_status["builds"] = [dict(bad_status["builds"][0], status="GREAT")]
    batch = spark.createDataFrame(
        [(json.dumps(bad_status),)], "value string"
    )
    with pytest.raises(ValueError, match="status not in enum"):
        store.load_json_df(batch)

    bad_ts = dict(_report(2))
    bad_ts["builds"] = [
        dict(bad_ts["builds"][0], start_time="not-a-time")
    ]
    batch = spark.createDataFrame([(json.dumps(bad_ts),)], "value string")
    with pytest.raises(ValueError, match="unparseable timestamp start_time"):
        store.load_json_df(batch)

    good = dict(_report(3))
    good["builds"] = [
        dict(good["builds"][0], start_time="2024-05-01T10:00:00+00:00")
    ]
    batch = spark.createDataFrame([(json.dumps(good),)], "value string")
    store.load_json_df(batch)
    assert store.table("builds").count() == 1


def test_load_subscriptions_user_module(spark, tmp_path):
    """A user module dropped into a directory registers its
    subscriptions (reference: a module in kcidb/monitor/subscriptions/
    auto-registers via MATCH_MAP) and its notifications spool."""
    from kcidb_spark.streaming.notify import (
        load_subscriptions,
        match_subscriptions,
    )

    subdir = tmp_path / "subscriptions"
    subdir.mkdir()
    (subdir / "x86_watch.py").write_text(
        "from pyspark.sql import functions as F\n"
        "from kcidb_spark.streaming import Subscription\n"
        "SUBSCRIPTIONS = [Subscription.from_templates(\n"
        "    name='', obj_type='build',\n"
        "    predicate=F.col('architecture') == 'x86_64',\n"
        "    subject='x86 build: {id}',\n"
        "    body='Build {id} on {architecture}',\n"
        ")]\n"
    )
    (subdir / "broken_name.py").write_text(
        "from pyspark.sql import functions as F\n"
        "from kcidb_spark.streaming import Subscription\n"
        "def subscriptions():\n"
        "    return [Subscription.from_templates(\n"
        "        name='pass-watch', obj_type='build',\n"
        "        predicate=F.col('status') == 'PASS',\n"
        "        subject='pass: {id}', body='ok',\n"
        "    )]\n"
    )
    (subdir / "_helper.py").write_text("raise AssertionError('not loaded')\n")

    subs = load_subscriptions(str(subdir))
    # Sorted module order; empty name adopts the module stem.
    assert [s.name for s in subs] == ["pass-watch", "x86_watch"]

    store = Store(spark, str(tmp_path / "store"))
    store.load(_report(1))  # s:b1 FAIL x86_64
    store.load(_report(2))  # s:b2 PASS x86_64
    views = {"build": store.table("builds")}
    got = match_subscriptions(views, subs)
    rows = {(r["subscription"], r["obj_id"]) for r in got.collect()}
    assert rows == {
        ("pass-watch", "s:b2"),
        ("x86_watch", "s:b1"),
        ("x86_watch", "s:b2"),
    }
    spool = NotificationSpool(spark, str(tmp_path / "spool"))
    spool.spool(got)
    assert spool.all().count() == 3

    (subdir / "empty.py").write_text("x = 1\n")
    with pytest.raises(ValueError, match="neither SUBSCRIPTIONS"):
        load_subscriptions(str(subdir))


def test_rocksdb_state_store_parity(spark, tmp_path):
    """The streaming dedup yields identical results under the RocksDB
    state-store provider (the off-heap/on-disk provider for state
    beyond executor heap — SCALE.md) and the default HDFS-backed one.
    The provider is read at query start, so flipping the SQL conf
    between runs exercises both."""
    from kcidb_spark.queries.streaming_exec import t12_stream_dedup
    from kcidb_spark.streaming import ROCKSDB_CONF

    sf = "/root/testdata/sf0.001"
    default = {r["event_type"]: r["n_distinct"]
               for r in t12_stream_dedup(spark, sf).collect()}
    for key, val in ROCKSDB_CONF.items():
        spark.conf.set(key, val)
    try:
        rocks = {r["event_type"]: r["n_distinct"]
                 for r in t12_stream_dedup(spark, sf).collect()}
    finally:
        for key in ROCKSDB_CONF:
            spark.conf.unset(key)
    assert rocks == default and default
