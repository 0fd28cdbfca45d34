"""Multimodal plumbing: feature extraction, resize, frame sampling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kcidb_spark.operators.multimodal import (
    decode_stub,
    extract_features,
    resize_images,
    sample_frames,
    to_media_table,
)
from kcidb_spark.tables import table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def media(spark):
    return to_media_table(table(spark, SF_SMOKE, "documents")).limit(60).cache()


def test_extract_features(spark, media):
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == media.count()
    by_id = {r["media_id"]: r for r in rows}
    src = {r["media_id"]: r for r in media.collect()}
    some = next(iter(by_id.values()))
    assert some["n_bytes"] == len(src[some["media_id"]]["payload"])
    assert len(some["feature"]) == 4
    # Deterministic stub: re-running gives identical features.
    again = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    assert all(again[i] == r["feature"] for i, r in by_id.items())


def test_decode_stub_unknown_modality():
    with pytest.raises(NotImplementedError):
        decode_stub(b"xx", "hologram")


def test_resize_images(spark, media):
    n_images = media.filter(F.col("meta.modality") == "image").count()
    out = resize_images(media, width=64, height=64).collect()
    assert len(out) == n_images
    assert all(r["width"] == 64 and r["height"] == 64 for r in out)
    assert all(len(r["payload"]) <= (64 * 64) // 1024 for r in out)


def test_sample_frames(spark, media):
    vids = media.filter(F.col("meta.modality") == "video")
    out = sample_frames(media, n_frames=4)
    rows = out.collect()
    # 1→N explosion: one row per sampled frame, only for videos.
    per_media = {}
    for r in rows:
        per_media.setdefault(r["media_id"], []).append(r)
    assert set(per_media) == {r["media_id"] for r in vids.collect()}
    for frames in per_media.values():
        assert [f["frame_idx"] for f in sorted(frames, key=lambda f: f["frame_idx"])] == list(
            range(len(frames))
        )
        assert all(isinstance(f["frame"], (bytes, bytearray)) for f in frames)


def test_documents_text_is_ascii_nonnull(spark):
    """The multimodal_features oracle equates UTF-8 byte sums with
    codepoint sums (queries/pipeline.py) — valid ONLY while documents
    .text is pure non-null ASCII.  Assert that invariant over every
    testdata sf so a non-ASCII regeneration fails loudly here instead
    of silently diverging Spark (bytes) from DuckDB (codepoints)."""
    import os

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
                   "/root/testdata/sf0.1"):
        if not os.path.isdir(sf_dir):
            continue
        docs = table(spark, sf_dir, "documents")
        bad = docs.filter(
            F.col("text").isNull()
            | (F.octet_length("text") != F.length("text"))
        ).count()
        assert bad == 0, f"non-ASCII or NULL documents.text in {sf_dir}"
