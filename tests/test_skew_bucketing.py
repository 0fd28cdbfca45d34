"""Skew salting + bucketed co-located joins (scale-path operators)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kcidb_spark.operators.bucketing import bucketed_join, write_bucketed
from kcidb_spark.operators.skew import salted_agg, salted_join


@pytest.fixture()
def skewed(spark):
    """90% of rows share one key — the classic hot-key shape."""
    hot = spark.range(900).select(
        F.lit(7).alias("k"), (F.col("id") % 10).alias("v")
    )
    cold = spark.range(100).select(
        (F.col("id") % 50).alias("k"), (F.col("id") % 10).alias("v")
    )
    return hot.unionByName(cold)


def test_salted_agg_equals_plain(spark, skewed):
    plain = {
        (r["k"]): (r["n"], r["s"])
        for r in skewed.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    salted = salted_agg(
        skewed,
        keys=["k"],
        aggs=lambda: [F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")],
        merge=lambda partial, keys: partial.groupBy(*keys).agg(
            F.sum("n").alias("n"), F.sum("s").alias("s")
        ),
        n_salts=8,
    )
    got = {(r["k"]): (r["n"], r["s"]) for r in salted.collect()}
    assert got == plain


def test_salted_join_equals_plain(spark, skewed):
    dim = spark.range(50).select(
        F.col("id").alias("k"), F.concat(F.lit("name-"), F.col("id")).alias("name")
    )
    plain = sorted(
        (r["k"], r["v"], r["name"])
        for r in skewed.join(dim, on="k").collect()
    )
    salted = sorted(
        (r["k"], r["v"], r["name"])
        for r in salted_join(skewed, dim, on=["k"], n_salts=8).collect()
    )
    assert salted == plain
    assert len(salted) == skewed.count()  # every row matched exactly once


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    facts = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    dims = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b")
    )
    write_bucketed(facts, "t_facts", ["k"], n_buckets=8, sort_by=["k"])
    write_bucketed(dims, "t_dims", ["k"], n_buckets=8, sort_by=["k"])
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # Disable broadcast so the plan shows the fact⋈fact shape this
    # operator exists for (at 100 TB neither side broadcasts).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "t_facts", "t_dims", on=["k"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan[:2000]
        assert "Exchange hashpartitioning" not in plan, plan[:2000]
        assert "Bucketed: true" in plan, plan[:2000]
        assert joined.count() == 1000
        # Values line up (join really happened on co-located buckets).
        row = joined.filter(F.col("k") == 10).collect()[0]
        assert (row["a"], row["b"]) == (20, 30)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_facts")
        spark.sql("DROP TABLE IF EXISTS t_dims")


def test_lsh_bucket_cap_bounds_pairs(spark):
    """max_bucket truncates pathological buckets to the B lowest ids:
    pair volume per bucket is bounded at B^2 regardless of how many
    duplicates land in it (the SCALE.md spam-flood safety valve)."""
    from pyspark.sql import functions as F

    from kcidb_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    # 50 byte-identical docs -> one LSH bucket per band.
    docs = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.lit("the same exact spam document body repeated").alias("text"),
    )
    sig = minhash_signatures(docs, n_hashes=8)
    uncapped = lsh_candidate_pairs(sig, n_hashes=8, n_bands=2).count()
    assert uncapped == 50 * 49 // 2
    capped = lsh_candidate_pairs(
        sig, n_hashes=8, n_bands=2, max_bucket=5
    )
    rows = capped.collect()
    assert len(rows) == 5 * 4 // 2
    # The kept ids are exactly the 5 lowest — survivor-compatible.
    assert {r["a"] for r in rows} | {r["b"] for r in rows} == set(range(5))


def test_lsh_pairs_filter_dedup_equals_bruteforce(spark):
    """The prior-band filter dedup (one-shuffle path) must produce
    EXACTLY the distinct band-collision pair set — cross-checked
    against a brute-force distinct() over the raw band join on a
    corpus engineered so many pairs collide in BOTH bands (full
    duplicates) and others in only one."""
    from pyspark.sql import functions as F

    from kcidb_spark.operators.dedup import (
        lsh_bands,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    texts = (
        # cluster A: 4 identical docs -> collide in both bands
        ["alpha beta gamma delta epsilon zeta"] * 4
        # cluster B: 3 identical
        + ["one two three four five six seven"] * 3
        # near-dups of A: shared prefix, different tail -> may share
        # one band only
        + ["alpha beta gamma delta epsilon omega"]
        + ["alpha beta gamma delta psi omega"]
        # singletons
        + ["unique document number %d padding words here" % i
           for i in range(5)]
    )
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    sig = minhash_signatures(docs, n_hashes=8)

    got = {
        (r["a"], r["b"])
        for r in lsh_candidate_pairs(sig, n_hashes=8, n_bands=2).collect()
    }
    bands = lsh_bands(sig, n_hashes=8, n_bands=2)
    left = bands.select("band", "key", F.col("doc_id").alias("a"))
    right = bands.select("band", "key", F.col("doc_id").alias("b"))
    brute = {
        (r["a"], r["b"])
        for r in left.join(right, on=["band", "key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
        .collect()
    }
    assert got == brute
    # the full-duplicate clusters must be present (they collide in
    # both bands — the exact case the filter must not double-emit or
    # suppress)
    assert {(0, 1), (0, 2), (0, 3), (4, 5), (4, 6)} <= got
    # and no pair may appear twice in the unaggregated output
    rows = lsh_candidate_pairs(sig, n_hashes=8, n_bands=2).collect()
    assert len(rows) == len({(r["a"], r["b"]) for r in rows})


def test_fingerprint_index_inlist_pushdown(spark, tmp_path):
    """probe_index_new_keys: small probes push a literal IN predicate
    into the index scan (visible as PushedFilters), larger probes fall
    back to the broadcast-semi prefilter; both equal the plain
    anti-join."""
    from pyspark.sql import functions as F

    from kcidb_spark.operators.bucketing import (
        probe_index_new_keys,
        write_fingerprint_index,
    )

    corpus = spark.range(5000).select(
        F.md5(F.col("id").cast("string")).alias("th")
    )
    idx_path = str(tmp_path / "fp_index")
    write_fingerprint_index(corpus, idx_path, rows_per_file=5000)

    # Day batch: 50 keys present in the index + 50 new.
    day = spark.range(4950, 5050).select(
        F.md5(F.col("id").cast("string")).alias("th"),
        F.col("id").alias("doc_id"),
    )
    conf_key = "spark.sql.parquet.pushdown.inFilterThreshold"
    prior = spark.conf.get(conf_key)
    out = probe_index_new_keys(spark, idx_path, day, max_inlist=1000)
    plain = day.join(
        spark.read.parquet(idx_path), on="th", how="left_anti"
    )
    assert {r["doc_id"] for r in out.collect()} == {
        r["doc_id"] for r in plain.collect()
    } == set(range(5000, 5050))
    # The probe must not leak its raised IN-pushdown threshold into
    # the session (every later scan would inherit it).
    assert spark.conf.get(conf_key) == prior

    # The internal probe scan pushes the literal IN list — assert it
    # on the lazy probe frame, executed inside the same conf window
    # probe_index_new_keys uses (the conf is read at action time).
    from kcidb_spark.operators.bucketing import probe_index_hits

    probe_keys = [r["th"] for r in day.select("th").distinct().collect()]
    try:
        spark.conf.set(conf_key, "1000")
        hits = probe_index_hits(spark, idx_path, probe_keys)
        assert hits.count() == 50
        plan = hits._jdf.queryExecution().executedPlan().toString()
        assert "In(th, [" in plan, "IN-list not pushed to the index scan"
    finally:
        spark.conf.set(conf_key, prior)

    # Above the inline cap: broadcast-semi path, same result.
    out2 = probe_index_new_keys(spark, idx_path, day, max_inlist=10)
    assert {r["doc_id"] for r in out2.collect()} == set(range(5000, 5050))
    plan2 = out2._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan2
