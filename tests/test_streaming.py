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
