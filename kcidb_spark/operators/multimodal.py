"""Multimodal column plumbing: opaque binary media + typed metadata.

Design (BASELINE.json north star): image/audio/video payloads are
``binary`` columns with a typed metadata struct; decode / feature
extraction runs as Arrow-batched pandas iterators (``mapInPandas``) so
the Python boundary is crossed once per batch, not per row.  The
actual codec step is STUBBED (image/audio libraries are not in this
container) behind ``decode_stub`` — the Spark-side plumbing (schema,
partitioning, UDF signature, batch shape) is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Canonical media-table schema: payload + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("modality", T.StringType()),  # image|audio|video
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.LongType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def decode_stub(payload: bytes, modality: str) -> list[float]:
    """Deterministic stand-in for a real decoder (PIL/ffmpeg/librosa
    would slot in here).  Raises for unknown modalities the way a
    real codec registry would."""
    if modality not in ("image", "audio", "video"):
        raise NotImplementedError(f"no decoder for modality {modality!r}")
    # 4-dim "embedding": byte-level statistics, deterministic.
    if not payload:
        return [0.0, 0.0, 0.0, 0.0]
    n = len(payload)
    return [
        float(n),
        payload[0] / 255.0,
        payload[-1] / 255.0,
        sum(payload[:64]) / (255.0 * min(n, 64)),
    ]


def to_media_table(docs: DataFrame) -> DataFrame:
    """Demo adapter: documents → media rows (payload = encoded text,
    modality round-robin) so the plumbing is exercisable on the
    synthetic tables."""
    modality = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            modality.alias("modality"),
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over media rows.

    mapInPandas keeps the per-batch pandas DataFrame shape (payload as
    bytes objects), so a real decoder drops in without plan changes.
    At scale the input should be repartitioned so batches hold a
    bounded number of payload bytes, not a bounded row count.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            modalities = pdf["meta"].map(lambda m: m["modality"])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": modalities,
                    "n_bytes": payloads.map(lambda p: 0 if p is None else len(p)),
                    "checksum": payloads.map(
                        lambda p: 0 if p is None else sum(p) % (2**31)
                    ),
                    "feature": [
                        decode_stub(p, m)
                        for p, m in zip(payloads, modalities)
                    ],
                }
            )

    return media.mapInPandas(extract, schema=_FEATURE_SCHEMA)
