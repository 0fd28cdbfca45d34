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

from kcidb_spark.ship import ensure_package_shipped

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

    ensure_package_shipped(media.sparkSession)
    return media.mapInPandas(extract, schema=_FEATURE_SCHEMA)


_RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def resize_images(media: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Resize the image rows to a fixed geometry (mapInPandas).

    The pixel resample is STUBBED deterministically (no imaging libs in
    this environment: a real implementation swaps PIL/opencv into
    ``_resize_stub`` with no plan change); filtering to the image
    modality happens JVM-side BEFORE the Python boundary so only image
    bytes cross into Arrow.
    """

    def _resize_stub(payload: bytes) -> bytes:
        # Deterministic stand-in: proportional byte sampling to a
        # size suggestive of w*h (keeps tests meaningful).
        if not payload:
            return b""
        target = min(len(payload), max(1, (width * height) // 1024))
        step = max(1, len(payload) // target)
        return payload[::step][:target]

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": pdf["payload"].map(
                        lambda p: None if p is None else _resize_stub(p)
                    ),
                    "width": width,
                    "height": height,
                }
            )

    images = media.filter(F.col("meta.modality") == "image")
    ensure_package_shipped(images.sparkSession)
    return images.mapInPandas(do_resize, schema=_RESIZED_SCHEMA)


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Sample ``n_frames`` evenly spaced frames from each video row —
    a 1→N mapInPandas (the pandas iterator may emit more output rows
    than input rows, which is how frame explosion stays Arrow-batched
    instead of per-row).  Frame decode is STUBBED as byte slicing; an
    ffmpeg-backed decoder drops into ``_frames_stub`` unchanged.
    """

    def _frames_stub(payload: bytes) -> list[bytes]:
        if not payload:
            return []
        n = min(n_frames, len(payload))
        span = len(payload) // n
        return [payload[i * span:(i + 1) * span] for i in range(n)]

    def do_sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            frames: list[bytes] = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for i, fr in enumerate(_frames_stub(payload or b"")):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(fr)
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    videos = media.filter(F.col("meta.modality") == "video")
    ensure_package_shipped(videos.sparkSession)
    return videos.mapInPandas(do_sample, schema=_FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# Perceptual-hash image dedup (aHash / dHash).
#
# Mirrors the classic average-hash / difference-hash pipeline (pHash
# family): decode → grayscale downsample → threshold into a compact
# bit fingerprint → Hamming-distance blocking.  The DECODE step is the
# injected seam shared with `decode_stub` above (a real implementation
# swaps PIL's convert("L")+resize into `decode_gray_stub` with no plan
# change); everything downstream — the bit math, the banded Hamming
# join — is exact integer arithmetic on the JVM, reusing the certified
# simhash band machinery (see operators/dedup.simhash_hamming_pairs).
#
# 60 bits, not the classic 64: one 60-bit BIGINT never touches the
# sign bit, so the shift/OR arithmetic is replayable verbatim in the
# DuckDB oracle (same width rule as simhash_bits — DuckDB raises on
# 1::BIGINT << 63) and the fingerprint drops straight into the 15-bit
# 4-band pigeonhole blocking already proven for simhash.
# ---------------------------------------------------------------------------

_PIXEL_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("px", T.ArrayType(T.IntegerType())),
    ]
)


def decode_gray_stub(payload: bytes, n_px: int) -> list[int]:
    """Injected decode seam for perceptual hashing: payload bytes →
    ``n_px`` point-sampled "luma" values (pixel i = byte at position
    ``(i * len) // n_px``, the nearest-neighbor downsample a real
    grayscale resize approximates).  Deterministic, so the synthetic
    pure-ASCII payloads make the whole hash oracle-replayable
    char-by-char.  A PIL-backed ``convert("L") + resize`` drops in
    here with no plan change."""
    if not payload:
        return [0] * n_px
    n = len(payload)
    return [payload[(i * n) // n_px] for i in range(n_px)]


def sample_gray_pixels(media: DataFrame, n_px: int = 61) -> DataFrame:
    """Arrow-batched grayscale sampling over IMAGE rows: the modality
    filter runs JVM-side before the Python boundary (only image bytes
    cross into Arrow), then one mapInPandas emits ``(media_id,
    px array<int>)`` with ``n_px`` deterministic luma samples per row.
    61 samples feed both hashes: aHash thresholds the first 60 against
    their mean, dHash compares the 60 adjacent sample pairs."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "px": [
                        decode_gray_stub(p or b"", n_px)
                        for p in pdf["payload"]
                    ],
                }
            )

    images = media.filter(F.col("meta.modality") == "image")
    ensure_package_shipped(images.sparkSession)
    return images.mapInPandas(sample, schema=_PIXEL_SCHEMA)


def phash_signatures(pixels: DataFrame, n_bits: int = 60) -> DataFrame:
    """``(media_id, ahash, dhash)`` from sampled pixels — both hashes
    as one whole-stage-codegen'd projection (no shuffle):

    - aHash bit k: pixel k strictly above the mean of the first
      ``n_bits`` pixels, compared multiplicatively (``px[k] * n > Σpx``)
      so the threshold is exact integer arithmetic — no float mean to
      diverge between engines; ties fall to 0 in both.
    - dHash bit k: ``px[k+1] > px[k]`` (the gradient-sign hash,
      robust to global brightness shifts a real decoder introduces).

    Unrolled CASE sums, not array-HOF folds: higher-order-function
    lambdas evaluate interpreted per element (the measured simhash
    cliff, operators/dedup.simhash_bits_multi), while 60 unrolled
    CASEs stay inside codegen."""
    assert n_bits <= 60
    total = " + ".join(f"px[{k}]" for k in range(n_bits))
    ahash = " + ".join(
        f"CASE WHEN px[{k}] * {n_bits} > __s THEN {1 << k} ELSE 0 END"
        for k in range(n_bits)
    )
    dhash = " + ".join(
        f"CASE WHEN px[{k + 1}] > px[{k}] THEN {1 << k} ELSE 0 END"
        for k in range(n_bits)
    )
    return pixels.select(
        "media_id", "px", F.expr(f"({total})").alias("__s")
    ).select(
        "media_id",
        F.expr(f"CAST({ahash} AS BIGINT)").alias("ahash"),
        F.expr(f"CAST({dhash} AS BIGINT)").alias("dhash"),
    )


def phash_hamming_pairs(
    signatures: DataFrame,
    hash_col: str = "dhash",
    n_bands: int = 4,
    max_hamming: int = 3,
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-duplicate image pairs at Hamming ≤ ``max_hamming`` over a
    perceptual hash, via the certified simhash banded pigeonhole
    blocking (``max_hamming < n_bands`` ⇒ provably the exact all-pairs
    result, shuffle proportional to band buckets, never n²) — the
    image-dedup leg of the multimodal surface, sharing the machinery
    rather than reimplementing it."""
    from kcidb_spark.operators.dedup import simhash_hamming_pairs

    sig = signatures.select(
        F.col("media_id"), F.col(hash_col).alias("simhash")
    )
    return simhash_hamming_pairs(
        sig, id_col="media_id", n_bits=60, n_bands=n_bands,
        max_hamming=max_hamming, max_bucket=max_bucket,
    )


def phash_incremental_accepts(
    day: DataFrame,
    corpus: DataFrame,
    hash_col: str = "dhash",
    n_bits: int = 60,
    n_bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """The image edition of the incremental ingest gate
    (dedup_incremental_neardup's shape): ACCEPT a day-batch image iff
    no corpus image sits within ``max_hamming`` of its perceptual
    hash.  Day and corpus band keys equi-join (pigeonhole: with
    ``max_hamming < n_bands`` the banded candidate set provably
    contains every qualifying pair, so banded-then-verify EQUALS the
    NOT-EXISTS brute force the oracle runs); the verify is pure
    in-row bit math — unlike the text gate no second data fetch is
    needed, the hash IS the evidence.  Returns the accepted day rows
    (``media_id``).

    Scale shape: one exchange for the band join (bucket-sized — the
    day side is a fraction of a bucket), one broadcast anti-join on
    the matched-id set; at production scale the corpus bands live in
    a persisted band||key-bucketed index (fpindex_build's layout) and
    the day side probes it."""
    assert max_hamming < n_bands and n_bits % n_bands == 0
    band_bits = n_bits // n_bands
    mask = (1 << band_bits) - 1

    def banded(df: DataFrame, id_alias: str, hash_alias: str) -> DataFrame:
        return df.select(
            F.col("media_id").alias(id_alias),
            F.col(hash_col).alias(hash_alias),
            F.explode(
                F.array(*[
                    F.expr(
                        f"named_struct('band', {j}, 'key',"
                        f" shiftright({hash_col}, {j * band_bits}) & {mask})"
                    )
                    for j in range(n_bands)
                ])
            ).alias("__bnd"),
        ).select(id_alias, hash_alias, "__bnd.band", "__bnd.key")

    day_b = banded(day, "a", "ha")
    cor_b = banded(corpus, "b", "hb")
    matched = (
        day_b.join(cor_b, on=["band", "key"])
        .filter(F.expr("bit_count(ha ^ hb)") <= max_hamming)
        .select(F.col("a").alias("media_id"))
        .distinct()
    )
    return day.join(F.broadcast(matched), on="media_id", how="left_anti")
