"""OO derived analytics: status rollups, histograms, path tree.

Fixtures per FIXTURES.md §3 (mirroring kcidb/test_oo.py:654-755 node
tree and status rollup expectations).
"""

from __future__ import annotations

import pytest

from kcidb_spark.oo import (
    architecture_status_histogram,
    latest_issue_version,
    rollup_status,
    rollup_valid,
    status_histogram,
    path_node_rollup,
)


@pytest.fixture(scope="module")
def builds_df(spark):
    rows = [
        ("b1", "c1", "x86_64", "PASS"),
        ("b2", "c1", "x86_64", "FAIL"),
        ("b3", "c1", "arm64", "PASS"),
        ("b4", "c1", "arm64", None),
        ("b5", "c2", "riscv", "SKIP"),
        ("b6", "c2", "riscv", "DONE"),
        ("b7", "c3", "x86_64", "ERROR"),
        ("b8", "c3", "x86_64", "MISS"),
    ]
    return spark.createDataFrame(
        rows, "id string, checkout_id string, architecture string, status string"
    )


@pytest.fixture(scope="module")
def tests_df(spark):
    rows = [
        ("t1", "b1", "ltp", "PASS"),
        ("t2", "b1", "ltp.sem01", "FAIL"),
        ("t3", "b1", "ltp.sem02", "PASS"),
        ("t4", "b1", "kunit.x", "SKIP"),
        ("t5", "b1", "", "DONE"),
        ("t6", "b1", "ltp.sem01", None),
    ]
    return spark.createDataFrame(
        rows, "id string, build_id string, path string, status string"
    )


def test_rollup_status_priority(spark, builds_df):
    got = {
        r["checkout_id"]: r["status"]
        for r in rollup_status(builds_df, ["checkout_id"]).collect()
    }
    # FAIL beats PASS and NULL; SKIP beats DONE? No: DONE < SKIP in
    # priority, so c2 rolls to DONE; ERROR beats MISS.
    assert got == {"c1": "FAIL", "c2": "DONE", "c3": "ERROR"}


def test_rollup_status_null_weakest(spark):
    df = spark.createDataFrame(
        [("g", None), ("g", "SKIP")], "k string, status string"
    )
    got = rollup_status(df, ["k"]).collect()[0]["status"]
    assert got == "SKIP"
    df2 = spark.createDataFrame([("g", None)], "k string, status string")
    assert rollup_status(df2, ["k"]).collect()[0]["status"] is None


def test_rollup_valid(spark):
    df = spark.createDataFrame(
        [("a", True), ("a", None), ("b", True), ("b", False), ("c", None)],
        "k string, valid boolean",
    )
    got = {r["k"]: r["valid"] for r in rollup_valid(df, ["k"]).collect()}
    assert got == {"a": True, "b": False, "c": None}


def test_status_histogram_ordered(spark, builds_df):
    rows = status_histogram(
        builds_df.filter("checkout_id = 'c1'"), ["checkout_id"]
    ).collect()
    assert [(r["status"], r["n"]) for r in rows] == [
        ("FAIL", 1),
        ("PASS", 2),
        (None, 1),
    ]


def test_architecture_histogram(spark, builds_df):
    got = {
        r["architecture"]: (r["n_fail"], r["n_pass"], r["n_none"])
        for r in architecture_status_histogram(builds_df).collect()
    }
    assert got["x86_64"] == (1, 1, 0)
    assert got["arm64"] == (0, 1, 1)
    assert got["riscv"] == (0, 0, 0)


def test_path_tree_rollup(spark, tests_df):
    nodes = {r["node"]: r for r in path_node_rollup(tests_df).collect()}
    assert set(nodes) == {"", "ltp", "ltp.sem01", "ltp.sem02", "kunit",
                          "kunit.x"}
    root = nodes[""]
    assert root["n_tests"] == 6 and root["depth"] == 0
    assert root["status"] == "FAIL"  # rolled up from ltp.sem01
    ltp = nodes["ltp"]
    assert ltp["n_tests"] == 4  # t1 (direct) + t2 + t3 + t6
    assert ltp["n_direct"] == 1
    assert ltp["status"] == "FAIL"
    assert nodes["ltp.sem01"]["n_tests"] == 2  # t2 + t6 (same path)
    assert nodes["ltp.sem01"]["status"] == "FAIL"
    assert nodes["kunit"]["status"] == "SKIP"
    assert nodes["kunit"]["n_direct"] == 0
    assert nodes["kunit.x"]["depth"] == 2


def test_latest_issue_version(spark):
    df = spark.createDataFrame(
        [("i1", 1, "old"), ("i1", 3, "new"), ("i1", 2, "mid"), ("i2", 1, "only")],
        "id string, version_num long, comment string",
    )
    got = {r["id"]: (r["version_num"], r["comment"])
           for r in latest_issue_version(df).collect()}
    assert got == {"i1": (3, "new"), "i2": (1, "only")}
