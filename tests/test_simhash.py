"""SimHash banding: pigeonhole exactness and the bucket-cap valve.

The oracle-parity mirror certifies the registry query against DuckDB
all-pairs; these tests pin the OPERATOR-level contracts that the
oracle can't see — banded == brute force at any width, and the
``max_bucket`` valve only drops (deterministically) inside oversized
buckets, never invents pairs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kcidb_spark.operators.dedup import simhash_bits, simhash_hamming_pairs


@pytest.fixture(scope="module")
def corpus(spark):
    """Texts engineered to contain near-dup groups plus noise.  A
    60-bit SimHash pair only lands at Hamming ≤ 3 when the token
    multisets are nearly identical, so near-dups here are LONG texts
    (200 tokens) with exact duplicates (Hamming 0, guaranteed pairs)
    and single-token substitutions (each changed token shifts every
    bit's vote sum by ±2 around a ~±14 std — a few flipped bits)."""
    rows = []
    for g in range(6):
        toks = [f"w{g}_{i}" for i in range(200)]
        base = " ".join(toks)
        rows.append((g * 10, base))
        rows.append((g * 10 + 1, base))  # exact duplicate: Hamming 0
        rows.append((g * 10 + 2, " ".join(["swapped" if i == 7 else t
                                           for i, t in enumerate(toks)])))
        rows.append((g * 10 + 3, " ".join(["other" if i == 100 else t
                                           for i, t in enumerate(toks)])))
    for i in range(40):
        rows.append((1000 + i, f"unrelated text number {i} with words w{i} v{i}"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _brute(spark, sig, max_hamming):
    a = sig.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("sa"))
    b = sig.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("sb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.expr("bit_count(sa ^ sb)").cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


@pytest.mark.parametrize("n_bits", [32, 60])
def test_banded_equals_bruteforce(spark, corpus, n_bits):
    sig = simhash_bits(corpus, n_bits=n_bits).cache()
    banded = simhash_hamming_pairs(sig, n_bits=n_bits, n_bands=4, max_hamming=3)
    brute = _brute(spark, sig, 3)
    got = {tuple(r) for r in banded.collect()}
    want = {tuple(r) for r in brute.collect()}
    sig.unpersist()
    assert got == want
    assert want, "fixture must actually produce near-dup pairs"


def test_banded_emits_each_pair_once(spark, corpus):
    sig = simhash_bits(corpus, n_bits=60)
    pairs = simhash_hamming_pairs(sig, n_bits=60, n_bands=4, max_hamming=3)
    total = pairs.count()
    distinct = pairs.select("id_a", "id_b").distinct().count()
    assert total == distinct


def test_bucket_cap_is_subset_and_deterministic(spark):
    # One boilerplate fingerprint dominating: identical texts all land
    # in the same bucket of every band.
    flood = spark.createDataFrame(
        [(i, "same boilerplate text everywhere") for i in range(30)]
        + [(100 + i, f"noise {i} q{i} r{i} s{i}") for i in range(10)],
        "doc_id long, text string",
    )
    sig = simhash_bits(flood, n_bits=60).cache()
    uncapped = simhash_hamming_pairs(sig, n_bits=60)
    capped = simhash_hamming_pairs(sig, n_bits=60, max_bucket=5)
    got_un = {(r.id_a, r.id_b) for r in uncapped.collect()}
    got_cap = {(r.id_a, r.id_b) for r in capped.collect()}
    sig.unpersist()
    # The flood contributes C(30,2)=435 uncapped but at most C(5,2)=10
    # per band capped; capping never invents pairs.
    assert got_cap <= got_un
    assert len(got_un) >= 435
    assert len(got_cap) < len(got_un)
    # Deterministic truncation: lowest ids survive — the kept flood
    # pairs are exactly those among the 5 lowest flood ids.
    flood_kept = {p for p in got_cap if p[0] < 100 and p[1] < 100}
    assert flood_kept == {(i, j) for i in range(5) for j in range(i + 1, 5)}


def _brute_multi(spark, sig, max_hamming, n_words):
    a = sig.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("sa"))
    b = sig.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("sb"))
    hamming = " + ".join(
        f"bit_count(sa[{w}] ^ sb[{w}])" for w in range(n_words)
    )
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.expr(hamming).cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def test_wide_banded_equals_bruteforce(spark, corpus):
    """120-bit (2×60-word) banding: pigeonhole exactness holds in the
    multi-word fingerprint exactly as in the single-BIGINT proof
    above (max_hamming=7 < 8 bands ⇒ banded == all-pairs)."""
    from kcidb_spark.operators.dedup import (
        simhash_bits_multi,
        simhash_hamming_pairs_multi,
    )

    sig = simhash_bits_multi(corpus, n_bits=120).cache()
    banded = simhash_hamming_pairs_multi(
        sig, n_bits=120, n_bands=8, max_hamming=7
    )
    got = {tuple(r) for r in banded.collect()}
    want = {tuple(r) for r in _brute_multi(spark, sig, 7, 2).collect()}
    sig.unpersist()
    assert got == want
    assert want, "fixture must actually produce near-dup pairs"
    # Each pair exactly once (first-agreeing-band dedup).
    assert len(got) == len({(a, b) for a, b, _ in got})


def test_wide_word0_equals_60bit(spark, corpus):
    """Word 0 of the 120-bit fingerprint IS the 60-bit fingerprint:
    widening refines an existing corpus without re-fingerprinting."""
    from kcidb_spark.operators.dedup import simhash_bits_multi

    wide = {
        r["doc_id"]: r["simhash"][0]
        for r in simhash_bits_multi(corpus, n_bits=120).collect()
    }
    narrow = {
        r["doc_id"]: r["simhash"]
        for r in simhash_bits(corpus, n_bits=60).collect()
    }
    assert wide == narrow


def test_wide_bucket_cap_is_subset(spark):
    from kcidb_spark.operators.dedup import (
        simhash_bits_multi,
        simhash_hamming_pairs_multi,
    )

    flood = spark.createDataFrame(
        [(i, "same boilerplate text everywhere") for i in range(30)]
        + [(100 + i, f"noise {i} q{i} r{i} s{i}") for i in range(10)],
        "doc_id long, text string",
    )
    sig = simhash_bits_multi(flood, n_bits=120).cache()
    full = {
        (r["id_a"], r["id_b"])
        for r in simhash_hamming_pairs_multi(
            sig, n_bits=120, n_bands=8, max_hamming=7
        ).collect()
    }
    capped = {
        (r["id_a"], r["id_b"])
        for r in simhash_hamming_pairs_multi(
            sig, n_bits=120, n_bands=8, max_hamming=7, max_bucket=5
        ).collect()
    }
    sig.unpersist()
    assert capped <= full
    # The capped survivor set keeps the lowest ids (dedup's pick).
    assert (0, 1) in capped
