"""status_transitions: custom stateful operator (streaming/stateful.py).

The registry query t15 certifies single-batch equivalence to the LAG
oracle; the test that matters HERE is the cross-micro-batch boundary —
the per-key state must carry the last status from batch N into batch
N+1, which no batch LAG rewrite exercises.
"""

from __future__ import annotations

import json
import os
import time

from kcidb_spark.streaming.stateful import (
    status_transitions,
    transform_with_state_available,
)

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string"


def _write_batch(path, name, rows, start_id):
    path.mkdir(parents=True, exist_ok=True)
    lines = [
        json.dumps(
            {"event_id": start_id + i, "ts": ts, "user_id": uid,
             "event_type": et}
        )
        for i, (ts, uid, et) in enumerate(rows)
    ]
    f = path / name
    f.write_text("\n".join(lines))
    return f


def test_transitions_across_micro_batches(spark, tmp_path):
    indir = tmp_path / "ev"
    # Batch 0: user 1 ends in 'pass'; user 2 ends in 'fail'.
    f0 = _write_batch(indir, "b0.json", [
        ("2024-01-01T00:00:00", 1, "pass"),
        ("2024-01-01T00:10:00", 1, "pass"),
        ("2024-01-01T00:00:00", 2, "pass"),
        ("2024-01-01T00:05:00", 2, "fail"),
    ], start_id=0)
    # Batch 1 (later mtime → processed second): the ONLY transition for
    # user 1 happens across the boundary (pass → fail).
    f1 = _write_batch(indir, "b1.json", [
        ("2024-01-01T01:00:00", 1, "fail"),
        ("2024-01-01T01:00:00", 2, "fail"),
    ], start_id=10)
    now = time.time()
    os.utime(f0, (now - 60, now - 60))
    os.utime(f1, (now, now))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(indir))
    )
    out = status_transitions(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("t_transitions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {
        (r.user_id, r.prev_status, r.status)
        for r in spark.table("t_transitions").collect()
    }
    assert rows == {
        (2, "pass", "fail"),   # within batch 0
        (1, "pass", "fail"),   # ACROSS the batch boundary (state carry)
    }
    # user 2's batch-1 'fail' repeats its state status — no emission.
    assert spark.table("t_transitions").count() == 2


def test_null_status_never_a_known_prev():
    """Mid-batch null statuses must not fabricate None->x transitions:
    a transition needs a KNOWN previous status, so the row after a
    null is suppressed (and the null row itself only emits if it
    follows a known non-null status).  Direct unit drive of the
    detector — the synthetic event feeds are non-null, so only a
    crafted frame reaches this branch."""
    import pandas as pd

    from kcidb_spark.streaming.stateful import _emit_transitions

    batch = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            "ts_us": [10, 20, 30, 40],
            "user_id": [7, 7, 7, 7],
            "status": ["pass", None, "fail", "fail"],
        }
    )
    out, state = _emit_transitions((7,), iter([batch]), (None, None))
    # pass->None emits (prev known); None->fail suppressed (prev
    # unknown); fail->fail no change; first row has no prev.
    assert list(zip(out["prev_status"], out["status"])) == [
        ("pass", None)
    ]
    assert state == (40, "fail")


def test_engine_path_probe():
    # In this container google.protobuf is absent, so the operator must
    # select the applyInPandasWithState path; on a protobuf-equipped
    # cluster the probe flips to the transformWithState API.
    assert transform_with_state_available() in (True, False)


def test_prereduce_exact_on_interleaved_hot_key(spark, tmp_path):
    """The r11 hot-key mitigation (map-side consecutive-duplicate
    collapse per (user, time-bucket)) must be LOSSLESS even when a
    user's rows interleave across files within a micro-batch — the
    shape that makes naive per-file dedup drop real transitions.
    Drives the same two-file batch through prereduce=False and
    prereduce=True (with a bucket narrow enough to split the
    sequence) and pins identical outputs, including a duplicate run
    that straddles a bucket boundary."""
    import random

    rng = random.Random(11)
    # Hot user 7: long runs with occasional flips, timestamps chosen
    # so runs straddle the 60-second prereduce buckets used below.
    rows = []
    status = "pass"
    for i in range(400):
        if rng.random() < 0.07:
            status = "fail" if status == "pass" else "pass"
        ts = f"2024-01-01T00:{i // 60:02d}:{i % 60:02d}"
        rows.append((ts, 7, status))
    # A cold user whose rows interleave between the hot user's.
    for i in range(40):
        ts = f"2024-01-01T00:{(i * 9) // 60:02d}:{(i * 9) % 60:02d}"
        rows.append((ts, 3, "pass" if i % 3 else "err"))
    rng.shuffle(rows)
    indir = tmp_path / "ev"
    # Two interleaved files (odd/even rows) in ONE micro-batch.
    _write_batch(indir, "a.json", rows[0::2], start_id=0)
    _write_batch(indir, "b.json", rows[1::2], start_id=5000)

    def drive(prereduce, qname):
        stream = spark.readStream.schema(SCHEMA).json(str(indir))
        out = status_transitions(
            stream, prereduce=prereduce, prereduce_bucket_us=60_000_000
        )
        q = (
            out.writeStream.format("memory")
            .queryName(qname)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"ckpt_{qname}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sorted(
            tuple(r) for r in spark.table(qname).collect()
        )

    plain = drive(False, "t_pr_plain")
    reduced = drive(True, "t_pr_reduced")
    assert plain == reduced
    assert len(plain) > 10  # the corpus really flips
