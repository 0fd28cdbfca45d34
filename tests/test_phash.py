"""Perceptual-hash image dedup: operator contracts the oracle can't see.

The oracle-parity mirror certifies ``phash_image_signatures`` /
``phash_dedup_pairs`` against DuckDB; these tests pin the OPERATOR
contracts — the decode seam's determinism, the exact integer hash
semantics vs a pure-Python recompute, the brightness-shift invariance
both hashes are built on, banded == brute force, and the JVM-side
modality filter in front of the Python boundary.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kcidb_spark.operators.multimodal import (
    decode_gray_stub,
    phash_hamming_pairs,
    phash_signatures,
    sample_gray_pixels,
    to_media_table,
)


def _py_hashes(px: list[int], n_bits: int = 60) -> tuple[int, int]:
    """Pure-Python recompute of phash_signatures' integer semantics."""
    s = sum(px[:n_bits])
    ahash = sum(1 << k for k in range(n_bits) if px[k] * n_bits > s)
    dhash = sum(1 << k for k in range(n_bits) if px[k + 1] > px[k])
    return ahash, dhash


@pytest.fixture(scope="module")
def media(spark):
    """Synthetic image rows: near-dup twins that differ by a uniform
    brightness shift (the invariance class), a spiked variant (small
    Hamming), plus unrelated noise payloads (far pairs)."""
    base = bytes(range(40, 101))  # 61 distinct "luma" bytes
    rows = [
        (0, bytes(b for b in base)),
        (1, bytes(b + 5 for b in base)),          # uniform shift: Hamming 0
        (2, bytes(b + (50 if i == 30 else 0) for i, b in enumerate(base))),
        (3, bytes((b * 7 + 13) % 251 for b in base)),   # unrelated
        (4, bytes((b * 11 + 57) % 251 for b in base)),  # unrelated
        (5, b""),                                        # empty payload
    ]
    return spark.createDataFrame(
        [
            (
                mid,
                payload,
                ("image", "application/octet-stream", None, None, None),
            )
            for mid, payload in rows
        ],
        "media_id long, payload binary, "
        "meta struct<modality:string,mime:string,width:int,height:int,"
        "duration_ms:long>",
    )


def test_decode_stub_deterministic_and_empty():
    p = bytes(range(200))
    assert decode_gray_stub(p, 61) == decode_gray_stub(p, 61)
    assert decode_gray_stub(p, 61) == [p[(i * 200) // 61] for i in range(61)]
    assert decode_gray_stub(b"", 61) == [0] * 61


def test_signatures_match_pure_python(spark, media):
    sig = {
        r["media_id"]: (r["ahash"], r["dhash"])
        for r in phash_signatures(sample_gray_pixels(media)).collect()
    }
    for row in media.collect():
        px = decode_gray_stub(bytes(row["payload"] or b""), 61)
        assert sig[row["media_id"]] == _py_hashes(px), row["media_id"]
    # Empty payload → all-zero pixels → both hashes 0 (ties fall to 0).
    assert sig[5] == (0, 0)


def test_brightness_shift_invariance(spark, media):
    sig = {
        r["media_id"]: (r["ahash"], r["dhash"])
        for r in phash_signatures(sample_gray_pixels(media)).collect()
    }
    # Uniform +5 on every byte: both hashes identical by construction
    # (dHash compares neighbors; aHash's px·n > Σ cancels the shift).
    assert sig[0] == sig[1]
    # One spiked pixel: dHash differs in at most the two adjacent
    # comparisons; aHash may move more (the mean moved).
    d0, d2 = sig[0][1], sig[2][1]
    assert 0 < bin(d0 ^ d2).count("1") <= 2


def test_banded_pairs_equal_brute_force(spark, media):
    sig = phash_signatures(sample_gray_pixels(media)).cache()
    for hash_col in ("ahash", "dhash"):
        banded = {
            (r["id_a"], r["id_b"], r["hamming"])
            for r in phash_hamming_pairs(
                sig, hash_col=hash_col, n_bands=4, max_hamming=3
            ).collect()
        }
        a = sig.select(
            F.col("media_id").alias("id_a"), F.col(hash_col).alias("sa")
        )
        b = sig.select(
            F.col("media_id").alias("id_b"), F.col(hash_col).alias("sb")
        )
        brute = {
            (r["id_a"], r["id_b"], r["hamming"])
            for r in a.crossJoin(b)
            .filter(F.col("id_a") < F.col("id_b"))
            .select(
                "id_a",
                "id_b",
                F.expr("bit_count(sa ^ sb)").cast("long").alias("hamming"),
            )
            .filter(F.col("hamming") <= 3)
            .collect()
        }
        assert banded == brute, hash_col
    sig.unpersist()


def test_modality_filter_before_python_boundary(spark, media):
    # Re-tag one row as audio: it must not reach the decode seam.
    retagged = media.withColumn(
        "meta",
        F.when(
            F.col("media_id") == 3,
            F.struct(
                F.lit("audio").alias("modality"),
                F.col("meta.mime").alias("mime"),
                F.col("meta.width").alias("width"),
                F.col("meta.height").alias("height"),
                F.col("meta.duration_ms").alias("duration_ms"),
            ),
        ).otherwise(F.col("meta")),
    )
    out = sample_gray_pixels(retagged)
    assert out.filter(F.col("media_id") == 3).count() == 0
    assert out.count() == media.count() - 1
    # And the filter is JVM-side: the scan/filter sits below the
    # Python (ArrowEvalPython/MapInPandas) node in the plan.
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan or "mapInPandas" in plan.lower()


def test_media_adapter_roundtrip(spark):
    docs = spark.createDataFrame(
        [(0, "abc"), (3, "def"), (1, "ghi")], "doc_id long, text string"
    )
    media = to_media_table(docs)
    px = sample_gray_pixels(media)  # images: doc_id % 3 == 0
    got = {r["media_id"] for r in px.collect()}
    assert got == {0, 3}


def test_incremental_accepts_equal_brute_force(spark, media):
    """Banded day-vs-corpus blocking ≡ NOT-EXISTS brute force at
    Hamming ≤ 3 (pigeonhole), on a split where both accept and reject
    are exercised."""
    from kcidb_spark.operators.multimodal import phash_incremental_accepts

    sig = phash_signatures(sample_gray_pixels(media)).select(
        "media_id", "dhash"
    ).cache()
    day = sig.filter(F.col("media_id") < 3)      # 0,1,2: near-dup trio
    corpus = sig.filter(F.col("media_id") >= 3)  # 3,4,5: unrelated
    got = {
        r["media_id"]
        for r in phash_incremental_accepts(day, corpus).collect()
    }
    rows = {r["media_id"]: r["dhash"] for r in sig.collect()}
    brute = {
        a
        for a in (0, 1, 2)
        if not any(
            bin(rows[a] ^ rows[b]).count("1") <= 3 for b in (3, 4, 5)
        )
    }
    assert got == brute
    # And with the twin of image 0 planted in the corpus, 0 and its
    # Hamming-≤3 neighbors get rejected.
    twin = sig.filter(F.col("media_id") == 0).select(
        (F.col("media_id") + 100).alias("media_id"), "dhash"
    )
    got2 = {
        r["media_id"]
        for r in phash_incremental_accepts(
            day, corpus.unionByName(twin)
        ).collect()
    }
    assert 0 not in got2
    assert got2 == {
        a for a in brute if bin(rows[a] ^ rows[0]).count("1") > 3
    }
    sig.unpersist()
