"""Large-scale training-data pipeline operators over documents/embeddings.

These go beyond the reference's own surface (BASELINE.json north star):
deduplication (exact, normalized, MinHash), text analysis (token stats,
quality scoring, token frequency), and similarity search (brute-force
cosine top-k).  Every operator is expressed with JVM-side built-ins
(no Python UDFs in the hot path) and carries a DuckDB oracle.

Scale notes:
  * fingerprint dedup is a single hash-partitioned groupBy — the
    canonical 100 TB exact-dedup plan;
  * MinHash signatures stream through explode → partial-agg min() per
    seed, so the shuffle carries (doc_id, 8 hashes), not the shingles;
  * brute-force KNN broadcasts the (small) query side so the corpus
    side never shuffles; an IVF/LSH-bucketed variant is the scale path
    for large query sets (see operators/).
"""

from __future__ import annotations

from textwrap import dedent

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kcidb_spark.queries.registry import register
from kcidb_spark.tables import table

# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------


@register(
    "dedup_exact",
    oracle=dedent("""
        SELECT md5(text) AS fp,
               count(*) AS n_copies,
               min(doc_id) AS keeper_id
        FROM documents
        GROUP BY 1
    """),
    tags=("dedup",),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: content fingerprint → hash-partitioned groupBy.

    At 100 TB the md5 is computed map-side and only (fp, doc_id) tuples
    shuffle; keeper selection is min() so it is deterministic.
    """
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(F.md5("text").alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_copies"), F.min("doc_id").alias("keeper_id"))
    )


def _norm_text(col: Column) -> Column:
    """Canonical text normalization: lowercase, non-alnum → space, trim."""
    return F.trim(F.regexp_replace(F.lower(col), "[^a-z0-9]+", " "))


_NORM_SQL = "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))"


@register(
    "dedup_near_normalized",
    oracle=dedent(f"""
        SELECT md5({_NORM_SQL}) AS fp,
               count(*) AS n_copies,
               min(doc_id) AS keeper_id,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM documents
        GROUP BY 1
    """),
    tags=("dedup",),
)
def dedup_near_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup dedup on normalized text (case/punct/whitespace
    insensitive) — same single-shuffle plan as exact dedup."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(F.md5(_norm_text(F.col("text"))).alias("fp"), "doc_id", "n_chars")
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("keeper_id"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )
    )


_MINHASH_SEEDS = tuple(range(8))


@register(
    "minhash_signature",
    oracle=dedent(f"""
        WITH toks AS (
            SELECT doc_id, string_split({_NORM_SQL}, ' ') AS tokens
            FROM documents
        ),
        sh AS (
            SELECT doc_id,
                   list_transform(generate_series(1, length(tokens) - 2),
                                  i -> tokens[i] || ' ' || tokens[i + 1] || ' ' || tokens[i + 2])
                       AS shingles
            FROM toks
            WHERE length(tokens) >= 3
        )
        SELECT doc_id,
               {", ".join(f"list_min(list_transform(shingles, s -> md5('{s}:' || s))) AS h{s}" for s in _MINHASH_SEEDS)}
        FROM sh
    """),
    tags=("dedup", "minhash"),
)
def minhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures over 3-word shingles (8 salted md5 hashes).

    Key scale property: min() over a multiset equals min() over the
    set, so the signature is a *pure per-row array projection* —
    normalize → tokenize → shingle (array transform) → array_min of
    salted hashes — with NO explode, NO shuffle, NO aggregation.  At
    100 TB this is an embarrassingly parallel map over documents.
    LSH banding then buckets signatures for candidate-pair generation
    (operators/dedup.py).
    """
    docs = table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split(_norm_text(F.col("text")), " ").alias("tokens")).filter(
        F.size("tokens") >= 3
    )
    # 1-based sequence mirrors DuckDB list indexing exactly.
    shingles = toks.select(
        "doc_id",
        F.expr(
            "transform(sequence(1, size(tokens) - 2),"
            " i -> concat_ws(' ', tokens[i-1], tokens[i], tokens[i+1]))"
        ).alias("shingles"),
    )
    cols = [
        F.array_min(
            F.transform(F.col("shingles"), lambda s: F.md5(F.concat(F.lit(f"{seed}:"), s)))
        ).alias(f"h{seed}")
        for seed in _MINHASH_SEEDS
    ]
    return shingles.select("doc_id", *cols)


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@register(
    "text_token_stats",
    oracle=dedent("""
        WITH d AS (
            SELECT lang,
                   n_chars,
                   CAST(length(string_split_regex(trim(text), '\\s+')) AS INTEGER) AS n_tokens
            FROM documents
        )
        SELECT lang,
               count(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
               CAST(SUM(n_tokens) AS BIGINT) / (1.0 * count(*)) AS avg_tokens,
               CAST(SUM(n_chars) AS BIGINT) / (1.0 * count(*)) AS avg_chars
        FROM d
        GROUP BY lang
    """),
    tags=("text",),
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting + per-language corpus stats.

    Averages are exact-integer-sum / count → bit-stable doubles.
    """
    docs = table(spark, sf_dir, "documents")
    d = docs.select(
        "lang", "n_chars", F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens")
    )
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("sum_tokens"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        (F.sum("n_tokens").cast("long") / (1.0 * F.count(F.lit(1)))).alias("avg_tokens"),
        (F.sum("n_chars").cast("long") / (1.0 * F.count(F.lit(1)))).alias("avg_chars"),
    )


@register(
    "text_quality_score",
    oracle=dedent("""
        WITH d AS (
            SELECT doc_id, lang,
                   CAST(length(text) AS BIGINT) AS len,
                   CAST(length(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
                   CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS BIGINT) AS alpha_chars,
                   CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS digit_chars
            FROM documents
        )
        SELECT doc_id, lang, len, n_tokens,
               alpha_chars / (1.0 * len) AS alpha_ratio,
               digit_chars / (1.0 * len) AS digit_ratio,
               CASE WHEN n_tokens >= 5 AND alpha_chars > len * 0.5 THEN 1 ELSE 0 END AS quality_ok
        FROM d
    """),
    tags=("text",),
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality heuristics: length, token count, alpha and
    digit ratios, and a keep/drop flag — the standard pre-training
    corpus filter shape.  All-narrow projection, no shuffle at all."""
    docs = table(spark, sf_dir, "documents")
    length = F.length("text").cast("long")
    n_tokens = F.size(F.split(F.trim("text"), r"\s+")).cast("long")
    alpha = F.length(F.regexp_replace("text", "[^a-zA-Z]", "")).cast("long")
    digit = F.length(F.regexp_replace("text", "[^0-9]", "")).cast("long")
    d = docs.select(
        "doc_id",
        "lang",
        length.alias("len"),
        n_tokens.alias("n_tokens"),
        alpha.alias("alpha_chars"),
        digit.alias("digit_chars"),
    )
    return d.select(
        "doc_id",
        "lang",
        "len",
        "n_tokens",
        (F.col("alpha_chars") / (1.0 * F.col("len"))).alias("alpha_ratio"),
        (F.col("digit_chars") / (1.0 * F.col("len"))).alias("digit_ratio"),
        F.when(
            (F.col("n_tokens") >= 5) & (F.col("alpha_chars") > F.col("len") * 0.5), 1
        )
        .otherwise(0)
        .alias("quality_ok"),
    )


@register(
    "token_freq_topk",
    oracle=dedent(f"""
        WITH tok AS (
            SELECT unnest(string_split({_NORM_SQL}, ' ')) AS token
            FROM documents
        )
        SELECT token, count(*) AS n
        FROM tok
        WHERE token <> ''
        GROUP BY token
        ORDER BY n DESC, token
        LIMIT 20
    """),
    tags=("text",),
)
def token_freq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token frequency top-k (explode → groupBy → top-k).

    The explode stays JVM-side; partial aggregation collapses each
    partition's token counts before the shuffle, so the exchange
    carries one row per distinct token per partition.
    """
    docs = table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(F.split(_norm_text(F.col("text")), " ")).alias("token"))
    return (
        tok.filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------


def _dot(a: Column, b: Column) -> Column:
    """Sequential fold dot-product (matches DuckDB list_dot_product's
    left-to-right accumulation → bit-comparable doubles)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


_KNN_K = 5
_KNN_QUERIES = 10


@register(
    "knn_cosine_bruteforce",
    oracle=dedent(f"""
        WITH q AS (
            SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
            FROM embeddings WHERE vec_id < {_KNN_QUERIES}
        ),
        b AS (
            SELECT vec_id AS n_id, CAST(embedding AS DOUBLE[]) AS nv
            FROM embeddings
        ),
        sims AS (
            SELECT q_id, n_id,
                   round(list_dot_product(qv, nv)
                         / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(nv, nv))),
                         4) AS sim
            FROM q, b
            WHERE q_id <> n_id
        )
        SELECT q_id, n_id, sim
        FROM (
            SELECT q_id, n_id, sim,
                   row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rn
            FROM sims
        )
        WHERE rn <= {_KNN_K}
    """),
    tags=("similarity",),
)
def knn_cosine_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: the exact-ANN baseline.

    The query side is broadcast, so the corpus scan is embarrassingly
    parallel with no shuffle until the final tiny per-query top-k.
    Similarity is rounded to 4 decimals *before* ranking, with n_id as
    tie-break, so the selected neighbor set is deterministic across
    engines.  The scale path (IVF buckets / LSH) lives in operators/.
    """
    emb = table(spark, sf_dir, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    q = emb.filter(F.col("vec_id") < _KNN_QUERIES).select(
        F.col("vec_id").alias("q_id"), vec.alias("qv")
    )
    b = emb.select(F.col("vec_id").alias("n_id"), vec.alias("nv"))
    sims = (
        b.crossJoin(F.broadcast(q))
        .filter(F.col("q_id") != F.col("n_id"))
        .select(
            "q_id",
            "n_id",
            F.round(
                _dot(F.col("qv"), F.col("nv"))
                / (
                    F.sqrt(_dot(F.col("qv"), F.col("qv")))
                    * F.sqrt(_dot(F.col("nv"), F.col("nv")))
                ),
                4,
            ).alias("sim"),
        )
    )
    w = W.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("n_id"))
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _KNN_K)
        .select("q_id", "n_id", "sim")
    )
