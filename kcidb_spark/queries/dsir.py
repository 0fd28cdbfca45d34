"""DSIR-style importance weighting for training-data selection.

Data Selection with Importance Resampling (Xie et al. 2023,
arXiv:2302.03169) scores raw documents by how target-like they are
under two cheap bag-of-hashed-ngrams models — one fit on a trusted
TARGET slice, one on the RAW pool — and keeps documents with the
highest importance weight ``log p_target(x) - log p_raw(x)``.  It is
the standard pretraining-corpus selection recipe when you have a
small high-quality exemplar set and a 100 TB crawl.

Engine mapping (Spark-first, two corpus scans total — the same
two-pass shape as the paper's implementation):

* pass 1 (model fit): explode unigram+bigram features, hash each into
  one of ``_N_BUCKETS`` buckets (md5-prefix mod — deterministic and
  engine-identical, see ``sample_by_hash``), then ONE
  partial-aggregated shuffle keyed on the bucket id produces BOTH
  models' counts (`cr` over the pool, `ct` over the target slice via
  a conditional count) — the model is a ≤4096-row table;
* pass 2 (scoring): the per-bucket log-ratio table broadcasts to a
  map-side join against the re-exploded corpus, followed by one
  doc-keyed aggregation.  No corpus-sized shuffle carries text.

Float doctrine (queries/ranking.py): the two ``log2`` calls and their
difference happen once per BUCKET (≤4096 rows) and are immediately
quantized to integer MICRO-BITS; every per-document aggregate after
that is order-independent BIGINT arithmetic, so results are
bit-identical across engines and partitionings.

Add-one smoothing over the bucket space keeps every ratio finite
(DSIR §2.2 does the same); ``_N_BUCKETS`` is sized so the sf0.01
gate corpus actually produces hash collisions — the oracle certifies
the collision semantics, not just the happy path.
"""

from __future__ import annotations

from textwrap import dedent

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kcidb_spark.localrel import local_df
from kcidb_spark.cache import scoped_persist
from kcidb_spark.operators.rank import (
    stratified_drop_leading,
    stratified_row_number,
)
from kcidb_spark.queries.pipeline import _NORM_SQL, _norm_text
from kcidb_spark.queries.registry import register
from kcidb_spark.tables import table

#: Hashed-feature space size.  DSIR uses 10k buckets at web scale;
#: 4096 guarantees collisions on the 500-doc gate corpus.
_N_BUCKETS = 4096

#: The trusted target slice: English documents stand in for the
#: "quality exemplar" distribution on the synthetic corpus.
_TARGET_LANG = "en"

_WEIGHTS_SQL = dedent(f"""
    toks AS (
        SELECT doc_id, lang, source,
               string_split({_NORM_SQL}, ' ') AS t
        FROM documents
    ),
    grams AS (
        SELECT doc_id, lang, source, unnest(t) AS g FROM toks
        UNION ALL
        SELECT doc_id, lang, source,
               unnest(list_transform(generate_series(1, length(t) - 1),
                                     i -> t[i] || ' ' || t[i + 1])) AS g
        FROM toks
    ),
    bucketed AS (
        SELECT doc_id, lang, source,
               CAST(concat('0x', substring(md5(g), 1, 6)) AS BIGINT)
                   % {_N_BUCKETS} AS b
        FROM grams
    ),
    counts AS (
        SELECT b,
               count(*) AS cr,
               count(CASE WHEN lang = '{_TARGET_LANG}' THEN 1 END) AS ct
        FROM bucketed GROUP BY b
    ),
    tot AS (
        SELECT CAST(sum(cr) AS BIGINT) AS n_r,
               CAST(sum(ct) AS BIGINT) AS n_t
        FROM counts
    ),
    lam AS (
        SELECT b,
               CAST(round((log2((ct + 1.0) / (n_t + {_N_BUCKETS}.0))
                         - log2((cr + 1.0) / (n_r + {_N_BUCKETS}.0)))
                    * 1000000) AS BIGINT) AS lam_micros
        FROM counts CROSS JOIN tot
    ),
    weights AS (
        SELECT doc_id, lang, source,
               CAST(count(*) AS BIGINT) AS n_grams,
               CAST(sum(lam_micros) AS BIGINT) AS weight_micros
        FROM bucketed JOIN lam USING (b)
        GROUP BY doc_id, lang, source
    )
""")


#: (appId, sf) → the collected ≤_N_BUCKETS-row λ model — the
#: train-once session cache (the _KM_CENTROIDS_CACHE idiom: the model
#: is control-plane-sized, its computation deterministic given the
#: corpus, and FIVE registry entries re-fit it over the same corpus,
#: each paying the counts pass — one corpus scan — for an identical
#: table).  Collected doubles/longs round-trip the driver bit-exactly,
#: so a hit cannot change any certified result.
_LAM_CACHE: dict = {}


def importance_weights(
    docs: DataFrame, sf_dir: str | None = None
) -> DataFrame:
    """Per-document DSIR importance weight in integer micro-bits.

    ``weight_micros = Σ_grams [log2 p̂_target(bucket) − log2
    p̂_raw(bucket)]`` with add-one smoothing over the bucket space;
    positive means "more target-like than the pool average".  The
    per-bucket ratio is quantized BEFORE the per-doc sum (integer
    micro-bits), so the sum is order-independent.

    ``sf_dir`` keys the λ-model session cache; None always refits
    (two passes — the paper's minimum).

    CACHE-KEY CONTRACT (ADVICE r15): pass ``sf_dir`` ONLY with the
    unfiltered ``documents`` table of that sf_dir — the cache key is
    (appId, realpath(sf_dir)) and ignores ``docs``, so a filtered or
    derived frame passed with sf_dir set would read (or poison) the
    full-corpus model shared by the other consumers.  All five
    registry callers pass the full table; a new caller with a derived
    frame must pass ``sf_dir=None`` (always refits).
    """
    toks = docs.select(
        "doc_id", "lang", "source",
        F.split(_norm_text(F.col("text")), " ").alias("t"),
    )
    # Unigrams and bigrams assembled IN-ROW and exploded once — a
    # UNION of two explode branches would scan the corpus twice per
    # pass (Spark does not fuse union legs over one parquet scan);
    # concat halves the 100 TB IO.  Same multiset as the oracle's
    # UNION ALL, and the gate hash is order-insensitive.
    grams = toks.select(
        "doc_id", "lang", "source",
        F.explode(
            F.concat(
                F.col("t"),
                # sequence(1, 0) DESCENDS in Spark (the BPE footgun,
                # operators/bpe.py) — one-word docs need the explicit
                # empty-array branch.
                F.expr(
                    "if(size(t) < 2, array(),"
                    " transform(sequence(1, size(t) - 1),"
                    " i -> concat(t[i - 1], ' ', t[i])))"
                ),
            )
        ).alias("g"),
    )
    bucketed = grams.select(
        "doc_id", "lang", "source",
        (
            F.conv(F.substring(F.md5("g"), 1, 6), 16, 10).cast("long")
            % _N_BUCKETS
        ).alias("b"),
    )
    sess = docs.sparkSession
    key = None
    if sf_dir is not None:
        import os as _os

        from kcidb_spark.queries.advanced import _trainer_cache_put

        key = (sess.sparkContext.applicationId, _os.path.realpath(sf_dir))
    if key is None or key not in _LAM_CACHE:
        # ≤4096-row model table, persisted because TWO consumers (the
        # totals aggregate and the log-ratio projection) would
        # otherwise each recompute its lineage — a full corpus scan
        # (repo idiom: kcidb_spark/cache.py, released by every
        # harness post-action).
        counts = scoped_persist(
            bucketed.groupBy("b").agg(
                F.count(F.lit(1)).alias("cr"),
                F.count(
                    F.when(F.col("lang") == _TARGET_LANG, 1)
                ).alias("ct"),
            )
        )
        tot = counts.agg(
            F.sum("cr").alias("n_r"), F.sum("ct").alias("n_t")
        )
        denom_t = F.col("n_t") + F.lit(float(_N_BUCKETS))
        denom_r = F.col("n_r") + F.lit(float(_N_BUCKETS))
        lam_rows = [
            (int(r["b"]), int(r["lam_micros"]))
            for r in counts.crossJoin(F.broadcast(tot))
            .select(
                "b",
                F.round(
                    (
                        F.log2((F.col("ct") + F.lit(1.0)) / denom_t)
                        - F.log2((F.col("cr") + F.lit(1.0)) / denom_r)
                    )
                    * F.lit(1000000.0)
                )
                .cast("long")
                .alias("lam_micros"),
            )
            .collect()
        ]
        if key is not None:
            _trainer_cache_put(
                _LAM_CACHE, key[0], key, lam_rows
            )
    else:
        lam_rows = _LAM_CACHE[key]
    lam = local_df(sess, lam_rows, "b long, lam_micros long")
    return (
        bucketed.join(F.broadcast(lam), "b")
        .groupBy("doc_id", "lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("lam_micros").alias("weight_micros"),
        )
    )


@register(
    "dsir_importance_weights",
    oracle=dedent(f"""
        WITH {_WEIGHTS_SQL}
        SELECT doc_id, lang, source, n_grams, weight_micros
        FROM weights
    """),
    tags=("pipeline", "sampling", "dsir"),
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score every pool document's target-likeness under hashed
    unigram+bigram models fit on the 'en' target slice vs the whole
    pool — DSIR's importance weight, in engine-exact micro-bits."""
    return importance_weights(
        table(spark, sf_dir, "documents", spread=True), sf_dir=sf_dir
    )


#: Gate seed for the Gumbel resampling entry (any string works; the
#: seed is part of the md5 preimage so every seed is a fresh sample).
_GUMBEL_SEED = "r9"

#: 2^24 + 1 — maps the 24-bit md5 prefix h to u = (h+1)/(2^24+1),
#: strictly inside (0, 1) so both log2 calls below are finite.
_U_DENOM = 16777217.0


def gumbel_keys(
    scored: DataFrame,
    seed,
    id_col: str = "doc_id",
    weight_col: str = "weight_micros",
) -> DataFrame:
    """Append ``gumbel_micros``: a seeded, hash-deterministic Gumbel
    perturbation of a log-space importance weight, such that a top-k
    on the key samples WITHOUT replacement with probability ∝ weight
    (the Gumbel-max trick, Vieira 2014; DSIR §3 selects by exactly
    this resampling rather than a deterministic top-k).

    Derivation of the integer form: with ``weight_micros = 1e6·log2 w``
    and u ~ Uniform(0,1), the Gumbel-max key is ``log w + G``,
    G = −ln(−ln u).  In base 2, G/ln 2 = −log2(−log2 u) − log2(ln 2);
    the trailing constant is row-independent, so ranking by
    ``weight_micros − round(1e6·log2(−log2 u))`` is EXACTLY ranking by
    the real-valued Gumbel key — no approximation beyond the micro-bit
    quantization every score in this repo already carries.  u comes
    from the ``sample_by_hash`` idiom: the first 24 md5 bits of
    ``seed:id`` mapped to (0,1), engine-identical and reproducible —
    rerunning with the same seed reselects the same documents on any
    cluster layout.

    ``seed`` may be a Column (tests sweep hundreds of seeds in one
    job by exploding a seed array).
    """
    seed_col = seed if isinstance(seed, Column) else F.lit(seed)
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":", seed_col, F.col(id_col).cast("string")
                )
            ),
            1,
            6,
        ),
        16,
        10,
    ).cast("long")
    u = (h + F.lit(1)) / F.lit(_U_DENOM)
    g = F.round(F.log2(-F.log2(u)) * F.lit(1000000.0)).cast("long")
    return scored.withColumn("gumbel_micros", F.col(weight_col) - g)


@register(
    "dsir_gumbel_sample",
    oracle=dedent(f"""
        WITH {_WEIGHTS_SQL},
        gum AS (
            SELECT doc_id, lang, source, weight_micros,
                   weight_micros - CAST(round(log2(-log2(
                       (CAST(concat('0x', substring(
                            md5('{_GUMBEL_SEED}:' || CAST(doc_id AS VARCHAR)),
                            1, 6)) AS BIGINT) + 1) / {_U_DENOM}
                   )) * 1000000) AS BIGINT) AS gumbel_micros
            FROM weights
        )
        SELECT doc_id, lang, source, weight_micros, gumbel_micros, rk
        FROM (
            SELECT doc_id, lang, source, weight_micros, gumbel_micros,
                   CAST(row_number() OVER (
                       PARTITION BY source
                       ORDER BY gumbel_micros DESC, doc_id
                   ) AS BIGINT) AS rk,
                   count(*) OVER (PARTITION BY source) AS cnt
            FROM gum
        ) WHERE rk <= cnt // 5
    """),
    tags=("pipeline", "sampling", "dsir"),
)
def dsir_gumbel_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The paper-faithful selection step: importance RESAMPLING — each
    source keeps ⌊n/5⌋ documents drawn without replacement with
    probability ∝ importance weight via seeded Gumbel-top-k
    (:func:`gumbel_keys`), instead of ``dsir_select_per_source``'s
    deterministic argmax.  Same partitioned-window scale shape (never
    a global sort); the perturbed key is integer micro-bits, so the
    whole sample is engine-exact and seed-reproducible."""
    scored = importance_weights(
        table(spark, sf_dir, "documents", spread=True), sf_dir=sf_dir
    )
    keyed = gumbel_keys(scored, _GUMBEL_SEED)
    ranked = stratified_row_number(
        keyed.select(
            "doc_id", "lang", "source", "weight_micros", "gumbel_micros"
        ),
        "source",
        "gumbel_micros",
        descending=True,
    )
    return (
        ranked.filter(F.col("rk") <= F.floor(F.col("cnt") / 5))
        .select(
            "doc_id", "lang", "source", "weight_micros",
            "gumbel_micros", "rk",
        )
    )


@register(
    "dsir_select_per_source",
    oracle=dedent(f"""
        WITH {_WEIGHTS_SQL}
        SELECT doc_id, lang, source, weight_micros, rk FROM (
            SELECT doc_id, lang, source, weight_micros,
                   CAST(row_number() OVER (
                       PARTITION BY source
                       ORDER BY weight_micros DESC, doc_id
                   ) AS BIGINT) AS rk,
                   count(*) OVER (PARTITION BY source) AS cnt
            FROM weights
        ) WHERE rk <= cnt // 5
    """),
    tags=("pipeline", "sampling", "dsir"),
)
def dsir_select_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The selection step: keep each source's top ⌊n/5⌋ documents by
    importance weight — a per-domain selection budget, so no single
    crawl domain monopolizes the selected corpus and the ranking
    window stays PARTITIONED (never a global sort) at any scale.
    Deterministic top-k (weight desc, doc_id tie-break) is the
    reproducible variant of the paper's Gumbel resampling; the
    boundary is integer rank arithmetic, never a float quantile."""
    scored = importance_weights(
        table(spark, sf_dir, "documents", spread=True), sf_dir=sf_dir
    )
    ranked = stratified_row_number(
        scored.select("doc_id", "lang", "source", "weight_micros"),
        "source",
        "weight_micros",
        descending=True,
    )
    return (
        ranked.filter(F.col("rk") <= F.floor(F.col("cnt") / 5))
        .select("doc_id", "lang", "source", "weight_micros", "rk")
    )


# ---------------------------------------------------------------------------
# The full selection stack, composed and certified end-to-end
# ---------------------------------------------------------------------------

#: Seed for the composed pipeline's resampling (distinct from the
#: standalone entry's so the two samples are independent draws).
_SELECT_SEED = "sel9"


def _select_corpus_oracle() -> str:
    from kcidb_spark.queries.lm import _SCORE_SQL as _LM_SQL

    return dedent(f"""
        WITH lmg AS (
            WITH {_LM_SQL}
            SELECT doc_id, lang, avg_nll_micros FROM (
                SELECT doc_id, lang, avg_nll_micros,
                       row_number() OVER (
                           PARTITION BY lang
                           ORDER BY avg_nll_micros DESC, doc_id
                       ) AS rk,
                       count(*) OVER (PARTITION BY lang) AS cnt
                FROM docs_scored
            ) WHERE rk > cnt // 10
        ),
        dw AS (
            WITH {_WEIGHTS_SQL}
            SELECT doc_id, source, weight_micros FROM weights
        ),
        joined AS (
            SELECT l.doc_id, l.lang, d.source, l.avg_nll_micros,
                   d.weight_micros,
                   d.weight_micros - CAST(round(log2(-log2(
                       (CAST(concat('0x', substring(
                            md5('{_SELECT_SEED}:'
                                || CAST(l.doc_id AS VARCHAR)),
                            1, 6)) AS BIGINT) + 1) / {_U_DENOM}
                   )) * 1000000) AS BIGINT) AS gumbel_micros
            FROM lmg l JOIN dw d ON l.doc_id = d.doc_id
        )
        SELECT doc_id, lang, source, avg_nll_micros, weight_micros,
               gumbel_micros, rk
        FROM (
            SELECT doc_id, lang, source, avg_nll_micros, weight_micros,
                   gumbel_micros,
                   CAST(row_number() OVER (
                       PARTITION BY source
                       ORDER BY gumbel_micros DESC, doc_id
                   ) AS BIGINT) AS rk,
                   count(*) OVER (PARTITION BY source) AS cnt
            FROM joined
        ) WHERE rk <= cnt // 5
    """)


@register(
    "pipeline_select_corpus",
    oracle=_select_corpus_oracle(),
    tags=("pipeline", "sampling", "lm", "dsir"),
)
def pipeline_select_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole selection stack in one certified DAG — what a corpus
    curation run actually executes: (1) CCNet-style per-language LM
    decile gate drops each language's highest-surprisal 10%
    (queries/lm.py — bounded per-language models, <unk>-folded), (2)
    DSIR importance weights score the survivors' target-likeness
    (bounded 4096-bucket model), (3) seeded Gumbel-top-k resampling
    keeps each source's ⌊n/5⌋ with probability ∝ weight.  Every
    stage's model is configuration-bounded and broadcast; the only
    corpus-keyed exchanges are the doc_id join of the two score sets
    and the partitioned per-source selection window.  The DuckDB
    oracle nests each module's CTE block in its own scope and replays
    the composition exactly — the end-to-end result is hash-certified,
    not just the stages."""
    from kcidb_spark.queries.lm import _scored_docs

    docs = table(spark, sf_dir, "documents", spread=True)
    # Session-keyed score cache shared with lm_surprisal_filter —
    # the two entries gate the same scored corpus (VERDICT r10 #1b).
    scored = _scored_docs(spark, sf_dir)
    # The gate's rank is dropped immediately, so use the boundary
    # form: wholesale bucket pass/drop + exact rank of only the one
    # straddling bucket — no exchange on the scored frame at all.
    survivors = stratified_drop_leading(
        scored.select("doc_id", "lang", "avg_nll_micros"),
        "lang",
        "avg_nll_micros",
        den=10,
        descending=True,
    )
    weights = importance_weights(docs, sf_dir=sf_dir).select(
        "doc_id", "source", "weight_micros"
    )
    keyed = gumbel_keys(survivors.join(weights, "doc_id"), _SELECT_SEED)
    ranked = stratified_row_number(
        keyed.select(
            "doc_id", "lang", "source", "avg_nll_micros",
            "weight_micros", "gumbel_micros",
        ),
        "source",
        "gumbel_micros",
        descending=True,
    )
    return (
        ranked.filter(F.col("rk") <= F.floor(F.col("cnt") / 5))
        .select(
            "doc_id", "lang", "source", "avg_nll_micros",
            "weight_micros", "gumbel_micros", "rk",
        )
    )
