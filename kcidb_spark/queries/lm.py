"""Statistical language-model quality scoring (CCNet-style).

The canonical large-corpus quality gate trains a cheap LM on (a clean
slice of) the corpus and drops documents whose per-token surprisal is
an outlier — CCNet (arXiv:1911.00359) does it with a pruned KenLM;
Gopher/MassiveText keep the same shape.  This module is the
engine-native version: an interpolated bigram model TRAINED AND
APPLIED inside the same lazy DAG, no external model artifact.

Float doctrine (see queries/ranking.py): every probability is built
from IEEE basic ops on integer counts (bit-identical across engines);
the single transcendental (``log2``) is immediately quantized to
integer MICRO-BITS per bigram, and every aggregate after that point
is integer arithmetic — sums are order-independent BIGINTs, the
filter boundary is ``rank > count div 10``, never a float quantile.

Scale shape (100 TB): the bigram table is pruned to a top-K
(deterministic count-desc tie-broken order — the same reason CCNet
ships a PRUNED KenLM), so the scoring join broadcasts a bounded
model; the unigram table is Zipf-bounded.  Training is two
partial-aggregated shuffles over exploded tokens; scoring is
broadcast joins + one doc-keyed aggregation.  The decile filter
partitions its window per language — never a global window.
"""

from __future__ import annotations

from textwrap import dedent

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kcidb_spark.queries.pipeline import _NORM_SQL, _norm_text
from kcidb_spark.queries.registry import register
from kcidb_spark.tables import table

#: Bigram-table prune size.  Small enough to actually PRUNE on the
#: sf0.01 gate corpus so the oracle certifies the prune semantics,
#: not just the happy path.
_TOP_K_BIGRAMS = 5_000

_SCORE_SQL = dedent(f"""
    toks AS (
        SELECT doc_id, lang, string_split({_NORM_SQL}, ' ') AS t
        FROM documents
    ),
    words AS (SELECT unnest(t) AS w FROM toks),
    uni AS (SELECT w, count(*) AS cw FROM words GROUP BY w),
    tot AS (SELECT count(*) AS n_total FROM words),
    pp AS (
        SELECT doc_id, lang,
               unnest(list_transform(generate_series(1, length(t) - 1),
                                     i -> t[i])) AS w1,
               unnest(list_transform(generate_series(1, length(t) - 1),
                                     i -> t[i + 1])) AS w2
        FROM toks
    ),
    bi AS (
        SELECT w1, w2, count(*) AS c12 FROM pp GROUP BY w1, w2
        ORDER BY c12 DESC, w1, w2 LIMIT {_TOP_K_BIGRAMS}
    ),
    scored AS (
        SELECT pp.doc_id, pp.lang,
               CAST(round(-log2(
                   CASE WHEN bi.c12 IS NOT NULL
                        THEN 0.8 * bi.c12 / u1.cw
                             + 0.2 * u2.cw / tot.n_total
                        ELSE 0.2 * u2.cw / tot.n_total END
               ) * 1000000) AS BIGINT) AS nll
        FROM pp
        LEFT JOIN bi ON pp.w1 = bi.w1 AND pp.w2 = bi.w2
        JOIN uni u1 ON pp.w1 = u1.w
        JOIN uni u2 ON pp.w2 = u2.w
        CROSS JOIN tot
    ),
    docs_scored AS (
        SELECT doc_id, lang,
               CAST(count(*) AS BIGINT) AS n_bigrams,
               CAST(sum(nll) AS BIGINT) AS sum_nll_micros,
               CAST(sum(nll) // count(*) AS BIGINT) AS avg_nll_micros
        FROM scored GROUP BY doc_id, lang
    )
""")


def doc_surprisal(docs: DataFrame) -> DataFrame:
    """Per-document mean bigram surprisal under an interpolated
    bigram LM trained on the same corpus.

    Model: ``p(w2|w1) = 0.8·c(w1,w2)/c(w1) + 0.2·c(w2)/N`` when the
    bigram survives the top-K prune, else the backoff term alone —
    the unigram interpolation makes every probability nonzero without
    add-k's vocabulary-size constant, and the prune is what a shipped
    model would have anyway (CCNet's KenLM is pruned for the same
    reason).

    Every count join broadcasts (bigram table K-bounded, unigram
    Zipf-bounded, N a 1-row frame); per-bigram surprisal is quantized
    to integer micro-bits BEFORE the per-doc sum, so the aggregation
    is order-independent and the result engine-exact.
    """
    toks = docs.select(
        "doc_id", "lang", F.split(_norm_text(F.col("text")), " ").alias("t")
    )
    words = toks.select(F.explode("t").alias("w"))
    uni = words.groupBy("w").agg(F.count(F.lit(1)).alias("cw"))
    tot = words.agg(F.count(F.lit(1)).alias("n_total"))
    pairs = (
        toks.filter(F.size("t") >= 2)
        .select(
            "doc_id",
            "lang",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1),"
                    " i -> struct(t[i - 1] AS w1, t[i] AS w2))"
                )
            ).alias("b"),
        )
        .select("doc_id", "lang", "b.w1", "b.w2")
    )
    bi = (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .orderBy(F.desc("c12"), "w1", "w2")
        .limit(_TOP_K_BIGRAMS)
    )
    backoff = F.lit(0.2) * F.col("c2") / F.col("n_total")
    p = F.when(
        F.col("c12").isNotNull(),
        F.lit(0.8) * F.col("c12") / F.col("c1") + backoff,
    ).otherwise(backoff)
    return (
        pairs.join(F.broadcast(bi), ["w1", "w2"], "left")
        .join(
            F.broadcast(
                uni.select(F.col("w").alias("w1"), F.col("cw").alias("c1"))
            ),
            "w1",
        )
        .join(
            F.broadcast(
                uni.select(F.col("w").alias("w2"), F.col("cw").alias("c2"))
            ),
            "w2",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "lang",
            F.round(-F.log2(p) * F.lit(1000000.0))
            .cast("long")
            .alias("nll"),
        )
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("nll").alias("sum_nll_micros"),
        )
        .withColumn(
            "avg_nll_micros",
            F.expr("sum_nll_micros div n_bigrams"),
        )
    )


@register(
    "lm_bigram_surprisal",
    oracle=dedent(f"""
        WITH {_SCORE_SQL}
        SELECT doc_id, lang, n_bigrams, sum_nll_micros, avg_nll_micros
        FROM docs_scored
    """),
    tags=("pipeline", "quality", "lm"),
)
def lm_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score every document's mean bigram surprisal (integer
    micro-bits) under the corpus-trained interpolated bigram LM —
    the raw signal behind CCNet-style perplexity bucketing
    (perplexity = 2^(avg_nll_micros/1e6); the monotone-equivalent
    integer form is what crosses the engine boundary)."""
    return doc_surprisal(table(spark, sf_dir, "documents", spread=True))


@register(
    "lm_surprisal_filter",
    oracle=dedent(f"""
        WITH {_SCORE_SQL}
        SELECT doc_id, lang, avg_nll_micros, rk FROM (
            SELECT doc_id, lang, avg_nll_micros,
                   CAST(row_number() OVER (
                       PARTITION BY lang
                       ORDER BY avg_nll_micros DESC, doc_id
                   ) AS BIGINT) AS rk,
                   count(*) OVER (PARTITION BY lang) AS cnt
            FROM docs_scored
        ) WHERE rk > cnt // 10
    """),
    tags=("pipeline", "quality", "lm"),
)
def lm_surprisal_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The gate itself: drop each language's ⌊n/10⌋ highest-surprisal
    documents (gibberish, boilerplate soup, wrong-language residue
    rank at the top).  Per-language window — relative thresholds
    self-calibrate across strata and the window stays partitioned at
    any corpus size; the boundary is pure integer rank arithmetic
    (see quality_percentile_filter)."""
    scored = doc_surprisal(table(spark, sf_dir, "documents", spread=True))
    w_rank = W.partitionBy("lang").orderBy(
        F.desc("avg_nll_micros"), "doc_id"
    )
    w_all = W.partitionBy("lang")
    return (
        scored.select(
            "doc_id",
            "lang",
            "avg_nll_micros",
            F.row_number().over(w_rank).cast("long").alias("rk"),
            F.count(F.lit(1)).over(w_all).alias("cnt"),
        )
        .filter(F.col("rk") > F.floor(F.col("cnt") / 10))
        .select("doc_id", "lang", "avg_nll_micros", "rk")
    )
