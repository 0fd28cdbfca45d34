"""Derived analytics as reusable DataFrame transformations.

Reference: kcidb/oo/__init__.py — status-priority rollups (A6/A7),
status histograms (A8/A9), repo/branch grouping (A10), test path-tree
rollup (A11), latest issue version (A12).  The reference computes
these per-object in Python; here each is a distributed DataFrame
transformation (the 100 TB form), with identical observable results.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

#: Status priority: a container's summarized status is the
#: highest-priority (lowest index) status present; absent/NULL is the
#: weakest (kcidb/oo/__init__.py:119-127).
STATUS_PRIORITY = ("FAIL", "ERROR", "MISS", "PASS", "DONE", "SKIP")

_NULL_PRIO = len(STATUS_PRIORITY) + 1  # NULL sorts after all statuses


def status_priority(col: Column) -> Column:
    """1-based priority of a status value; NULL → weakest."""
    arr = F.array(*[F.lit(s) for s in STATUS_PRIORITY])
    return F.coalesce(F.nullif(F.array_position(arr, col), F.lit(0)),
                      F.lit(_NULL_PRIO))


def rollup_status(df: DataFrame, group_cols: list[str],
                  status_col: str = "status") -> DataFrame:
    """Summarized status per group = min by priority (A6).

    min(struct(priority, status)) keeps the computation a single
    partial-aggregable pass — no join against a priority table.
    """
    pick = F.min(
        F.struct(
            status_priority(F.col(status_col)).alias("p"),
            F.col(status_col).alias("s"),
        )
    )["s"].alias("status")
    return df.groupBy(*group_cols).agg(pick)


def rollup_valid(df: DataFrame, group_cols: list[str],
                 valid_col: str = "valid") -> DataFrame:
    """Summarized validity per group: False < True < NULL (A7,
    kcidb/oo/__init__.py:110-114)."""
    prio = (
        F.when(F.col(valid_col) == False, 0)  # noqa: E712
        .when(F.col(valid_col) == True, 1)  # noqa: E712
        .otherwise(2)
    )
    pick = F.min(F.struct(prio.alias("p"), F.col(valid_col).alias("v")))["v"]
    return df.groupBy(*group_cols).agg(pick.alias("valid"))


def status_histogram(df: DataFrame, group_cols: list[str],
                     status_col: str = "status") -> DataFrame:
    """Counts per group × status, priority-ordered (A8,
    kcidb/oo/__init__.py:145-154)."""
    return (
        df.groupBy(*group_cols, status_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("_prio", status_priority(F.col(status_col)))
        .orderBy(*group_cols, "_prio")
        .drop("_prio")
    )


def architecture_status_histogram(builds: DataFrame) -> DataFrame:
    """Per-architecture status buckets, FAIL-first columns (A9,
    kcidb/oo/__init__.py:156-175)."""
    aggs = [
        F.sum(F.when(F.col("status") == s, 1).otherwise(0))
        .cast("long")
        .alias(f"n_{s.lower()}")
        for s in STATUS_PRIORITY
    ]
    aggs.append(
        F.sum(F.when(F.col("status").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_none")
    )
    return builds.groupBy("architecture").agg(*aggs)


def repo_branch_checkouts(checkouts: DataFrame) -> DataFrame:
    """repo → branch grouping with per-group checkout counts, both
    levels ranked by count desc (A10, kcidb/oo/__init__.py:413-446)."""
    g = checkouts.groupBy("git_repository_url", "git_repository_branch").agg(
        F.count(F.lit(1)).alias("n_checkouts"),
        F.sort_array(F.collect_list("id")).alias("checkout_ids"),
    )
    repo_total = W.partitionBy("git_repository_url")
    return (
        g.withColumn("repo_n_checkouts",
                     F.sum("n_checkouts").over(repo_total).cast("long"))
        .orderBy(
            F.desc("repo_n_checkouts"),
            F.asc("git_repository_url"),
            F.desc("n_checkouts"),
            F.asc("git_repository_branch"),
        )
    )


def path_prefixes(path_col: Column) -> Column:
    """All ancestor node paths of a dot-separated test path, including
    the root "" and the path itself: "a.b" → ["", "a", "a.b"]
    (reference node tree walk, kcidb/oo/__init__.py:295-302)."""
    parts = F.split(path_col, r"\.")
    return F.when(
        path_col.isNull() | (path_col == ""), F.array(F.lit(""))
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(parts)),
            lambda k: F.array_join(F.slice(parts, 1, k), "."),
        )
    )


def path_node_rollup(tests: DataFrame) -> DataFrame:
    """Hierarchical rollup over dot-separated test paths (A11,
    kcidb/oo/__init__.py:277-406): one row per tree node with subtree
    test count, rolled-up status (min priority), and direct-hit count.

    Implemented as a single explode of each test's ancestor prefixes
    followed by one aggregation — O(rows × depth), one shuffle.
    """
    exploded = tests.select(
        F.col("id"),
        F.col("path"),
        F.col("status"),
        F.explode(path_prefixes(F.col("path"))).alias("node"),
    )
    depth = F.when(F.col("node") == "", 0).otherwise(
        F.size(F.split(F.col("node"), r"\."))
    )
    pick = F.min(
        F.struct(status_priority(F.col("status")).alias("p"),
                 F.col("status").alias("s"))
    )["s"]
    return (
        exploded.groupBy("node")
        .agg(
            F.count(F.lit(1)).alias("n_tests"),
            F.sum(F.when(F.col("path") == F.col("node"), 1).otherwise(0))
            .cast("long")
            .alias("n_direct"),
            pick.alias("status"),
        )
        .withColumn("depth", depth.cast("int"))
    )


def latest_issue_version(issue_versions: DataFrame) -> DataFrame:
    """Latest version row per issue id (A12,
    kcidb/oo/__init__.py:624-636): ranking window, one shuffle."""
    w = W.partitionBy("id").orderBy(F.desc("version_num"))
    return (
        issue_versions.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def culprit_partition(issue_versions: DataFrame) -> DataFrame:
    """Issue partitions by culprit flags (A14,
    kcidb/oo/__init__.py:214-252)."""
    culprit = (
        F.when(F.col("culprit_code") == True, "code")  # noqa: E712
        .when(F.col("culprit_tool") == True, "tool")  # noqa: E712
        .when(F.col("culprit_harness") == True, "harness")  # noqa: E712
        .otherwise("unknown")
    )
    return issue_versions.withColumn("culprit", culprit)
