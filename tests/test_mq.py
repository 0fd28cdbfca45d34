"""File-transport queue semantics (kcidb_spark.mq): publish order,
at-least-once redelivery, subscription independence — property-tested
so the Pub/Sub contract analogs hold for arbitrary payloads."""

from __future__ import annotations

import json

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kcidb_spark.mq import FileQueue, IOQueue


@settings(max_examples=25, deadline=None)
@given(
    payloads=st.lists(
        st.text(min_size=0, max_size=200), min_size=1, max_size=8
    )
)
def test_pull_returns_publish_order(tmp_path_factory, payloads):
    q = FileQueue(str(tmp_path_factory.mktemp("q") / "queue"))
    q.init_subscription("s")
    for p in payloads:
        q.publish(p)
    got = [payload for _, payload in q.pull("s", len(payloads) + 5)]
    assert got == payloads


def test_redelivery_until_ack(tmp_path):
    q = FileQueue(str(tmp_path / "q"))
    q.init_subscription("s")
    q.publish("m1")
    q.publish("m2")
    first = list(q.pull("s", 1))
    assert [p for _, p in first] == ["m1"]
    # not acked: m1 redelivered
    again = list(q.pull("s", 2))
    assert [p for _, p in again] == ["m1", "m2"]
    q.ack("s", first[0][0])
    after = list(q.pull("s", 2))
    assert [p for _, p in after] == ["m2"]


def test_subscriptions_independent(tmp_path):
    q = FileQueue(str(tmp_path / "q"))
    q.init_subscription("a")
    q.init_subscription("b")
    mid = q.publish("payload")
    q.ack("a", mid)
    assert list(q.pull("a", 5)) == []
    assert [p for _, p in q.pull("b", 5)] == ["payload"]
    q.cleanup_subscription("b")
    with pytest.raises(FileNotFoundError):
        list(q.pull("b", 1))


def test_io_queue_validates(tmp_path):
    q = IOQueue(str(tmp_path / "q"))
    with pytest.raises(Exception):
        q.publish_report({"version": {"major": 99}})
    q.publish_report({"version": {"major": 5, "minor": 3}})
    q.init_subscription("s")
    [(ack, report)] = list(q.pull_reports("s", 5))
    assert report["version"]["major"] == 5


def test_pull_ignores_tmp_files(tmp_path):
    import os

    q = FileQueue(str(tmp_path / "q"))
    q.init_subscription("s")
    q.publish("real")
    # a concurrent publisher mid-write leaves a .tmp file
    with open(os.path.join(q.path, "99999-partial.msg.tmp"), "w") as f:
        f.write("partial")
    assert [p for _, p in q.pull("s", 10)] == ["real"]
