"""Streaming-entry scratch dirs are process-keyed, not per-invocation
(VERDICT r13 "Next round" #8): N bench runs hold ONE live scratch tree
per site, and reuse starts from an EMPTY tree so a reused checkpoint
can never resume a previous invocation's offsets."""

from __future__ import annotations

import os

from kcidb_spark.queries import REGISTRY
from kcidb_spark.queries.streaming_exec import _SCRATCH_ROOT, _scratch_dir


def test_scratch_dir_is_stable_and_cleared():
    p1 = _scratch_dir("pin_site")
    with open(os.path.join(p1, "stale"), "w") as fh:
        fh.write("x")
    p2 = _scratch_dir("pin_site")
    assert p1 == p2
    assert os.listdir(p2) == []  # cleared on reuse


def test_streaming_entry_does_not_grow_scratch(spark):
    sf = "/root/testdata/sf0.001"
    q = REGISTRY["t12_stream_dedup"].spark
    n1 = q(spark, sf).count()
    root = _SCRATCH_ROOT[0]
    dirs1 = sorted(os.listdir(root))
    n2 = q(spark, sf).count()
    assert n1 == n2
    assert sorted(os.listdir(root)) == dirs1  # no per-invocation growth
