"""Second wave of operator-inventory queries (SURVEY.md §2 parity +
training-pipeline extensions).

Covers reference operators that the first wave left without a
driver-checkable query: status-priority rollups (A6/A7,
kcidb/oo/__init__.py:119-143), two-level count-ordered grouping (A10,
oo/__init__.py:413-446), latest-version-per-id (A12,
oo/__init__.py:624-636), report chunking (O4,
kcidb/db/__init__.py:313-388), the scalar-function surface F6/F10/
F13/F14/F15 (see §2.8), and JSON field extraction (misc columns,
§1.3).  Plus pipeline extensions: embedding-cosine near-dup, IVF-style
ANN, winnowing document fingerprints, BPE-ish token counting.

Every query is a JVM-side DataFrame plan with a DuckDB oracle;
float-valued outputs are rounded-from-exact-integers or ratios of
exact integers so cross-engine hashes match bit-for-bit.
"""

from __future__ import annotations

from textwrap import dedent

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kcidb_spark.localrel import local_df
from kcidb_spark.cache import scoped_persist
from kcidb_spark.queries._exact import oracle_int_sum
from kcidb_spark.queries.registry import register
from kcidb_spark.tables import table

# ---------------------------------------------------------------------------
# A6/A7 — status rollup by explicit priority (worst status wins)
# ---------------------------------------------------------------------------

#: error < purchase < click < view < signup — "worst first", mirroring
#: the reference's FAIL<ERROR<MISS<PASS<DONE<SKIP ordering
#: (kcidb/oo/__init__.py:119-127).
_STATUS_PRIO = ("error", "purchase", "click", "view", "signup")


def _prio_case_sql(col: str) -> str:
    whens = " ".join(
        f"WHEN '{s}' THEN {i}" for i, s in enumerate(_STATUS_PRIO)
    )
    return f"CASE {col} {whens} ELSE {len(_STATUS_PRIO)} END"


def _unprio_case_sql(col: str) -> str:
    whens = " ".join(
        f"WHEN {i} THEN '{s}'" for i, s in enumerate(_STATUS_PRIO)
    )
    return f"CASE {col} {whens} ELSE NULL END"


@register(
    "a6_status_priority_rollup",
    oracle=dedent(f"""
        SELECT user_id,
               {_unprio_case_sql(f"min({_prio_case_sql('event_type')})")} AS worst_status,
               count(*) AS n_events
        FROM events
        GROUP BY user_id
    """),
    tags=("A6", "A7"),
)
def a6_status_priority_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Container status = min(status) under an explicit priority order
    (reference: builds_status/checkouts_valid rollups,
    kcidb/oo/__init__.py:119-143).  The priority map is a CASE chain,
    so the rollup is a plain partial-aggregable min() — one small
    exchange at any scale.
    """
    ev = table(spark, sf_dir, "events")
    prio = F.expr(_prio_case_sql("event_type"))
    g = ev.groupBy("user_id").agg(
        F.min(prio).alias("_p"), F.count(F.lit(1)).alias("n_events")
    )
    return g.select(
        "user_id",
        F.expr(_unprio_case_sql("_p")).alias("worst_status"),
        "n_events",
    )


# ---------------------------------------------------------------------------
# A10 — two-level grouping, both levels ordered by count desc
# ---------------------------------------------------------------------------


@register(
    "a10_two_level_grouping",
    oracle=dedent("""
        WITH shard_counts AS (
            SELECT event_type,
                   user_id % 7 AS shard,
                   count(*) AS n
            FROM events
            GROUP BY event_type, user_id % 7
        )
        SELECT event_type, shard, n,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY n DESC, shard) AS shard_rank,
               CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT) AS type_total
        FROM shard_counts
    """),
    tags=("A10", "O3"),
)
def a10_two_level_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested grouping repo→branch→[checkouts] with both levels
    ordered by member count desc (reference: kcidb/oo/__init__.py:
    413-446).  Count + rank-within-group; partial aggregation shrinks
    the exchange to one row per (type, shard) per partition.
    """
    ev = table(spark, sf_dir, "events")
    counts = (
        ev.select("event_type", (F.col("user_id") % 7).alias("shard"))
        .groupBy("event_type", "shard")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_rank = W.partitionBy("event_type").orderBy(F.desc("n"), F.asc("shard"))
    w_tot = W.partitionBy("event_type")
    return counts.select(
        "event_type",
        "shard",
        "n",
        F.row_number().over(w_rank).alias("shard_rank"),
        F.sum("n").over(w_tot).cast("long").alias("type_total"),
    )


# ---------------------------------------------------------------------------
# A12 — latest version per id (ranking window dedup)
# ---------------------------------------------------------------------------


@register(
    "a12_latest_per_key",
    oracle=dedent("""
        SELECT user_id, event_id, ts, event_type, value
        FROM (
            SELECT user_id, event_id, ts, event_type, value,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        )
        WHERE rn = 1
    """),
    tags=("A12", "A3"),
)
def a12_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest row per key (reference: latest issue version,
    kcidb/oo/__init__.py:624-636) — the ranking-window dedup shape.
    One shuffle on the key; ties broken by id so results are
    deterministic under any physical ordering.
    """
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type", "value")
    )


# ---------------------------------------------------------------------------
# O4 — report chunking (objects_per_report pagination)
# ---------------------------------------------------------------------------


@register(
    "o4_chunk_pagination",
    oracle=dedent("""
        SELECT o_orderkey // 1000 AS chunk,
               count(*) AS n_objects,
               min(o_orderkey) AS first_key,
               max(o_orderkey) AS last_key
        FROM orders
        GROUP BY o_orderkey // 1000
    """),
    tags=("O4",),
)
def o4_chunk_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunked emission (reference: objects_per_report,
    kcidb/db/__init__.py:313-388).  The scale-correct formulation is
    key-RANGE chunking — floor(key / N) — which needs no global sort
    or row numbering (a global row_number would serialize through one
    partition); each chunk is derivable map-side.
    """
    o = table(spark, sf_dir, "orders")
    return (
        o.select((F.col("o_orderkey") / 1000).cast("long").alias("chunk"), "o_orderkey")
        .groupBy("chunk")
        .agg(
            F.count(F.lit(1)).alias("n_objects"),
            F.min("o_orderkey").alias("first_key"),
            F.max("o_orderkey").alias("last_key"),
        )
    )


# ---------------------------------------------------------------------------
# F6/F10/F13/F14/F15 — scalar string-function surface
# ---------------------------------------------------------------------------


@register(
    "f_string_suite",
    oracle=dedent("""
        SELECT p_partkey,
               p_brand || '#' || split_part(p_type, ' ', 1) AS brand_type,
               to_base64(encode(p_type)) AS type_b64,
               split_part(p_type, ' ', 1) AS type_head,
               regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_masked,
               replace(p_type, ' ', '%20') AS type_uri
        FROM part
    """),
    tags=("F6", "F10", "F13", "F14", "F15"),
)
def f_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string surface of the reference in one projection:
    `||` concat (F10, postgresql/v05_00.py:206), base64 notification
    ids (F13, monitor/output.py:113-140), dot-path head extraction
    (F14, oo/__init__.py:304-316), linkification-style regex replace
    (F15, monitor/output.py:225-229), and URI encoding (F6,
    postgresql/v04_05.py:10-32 — here the space→%20 core, JVM-side
    instead of a Python UDF).  Zero shuffles: pure projection.
    """
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.concat_ws("#", F.col("p_brand"), F.substring_index("p_type", " ", 1)).alias(
            "brand_type"
        ),
        F.base64(F.encode("p_type", "UTF-8")).alias("type_b64"),
        F.substring_index("p_type", " ", 1).alias("type_head"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("name_masked"),
        F.regexp_replace("p_type", " ", "%20").alias("type_uri"),
    )


# ---------------------------------------------------------------------------
# P7 / F9 — JSON field extraction over free-form `misc`-style columns
# ---------------------------------------------------------------------------


@register(
    "p7_json_extract",
    oracle=dedent("""
        SELECT event_type,
               CAST(SUM(CAST(props->>'k' AS INTEGER)) AS BIGINT) AS sum_k,
               count(*) AS n,
               CAST(min(CAST(props->>'k' AS INTEGER)) AS INTEGER) AS min_k,
               CAST(max(CAST(props->>'k' AS INTEGER)) AS INTEGER) AS max_k
        FROM events
        GROUP BY event_type
    """),
    tags=("P7", "F9"),
)
def p7_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Free-form JSON (`misc`) field extraction + aggregation
    (reference stores misc as JSONB/JSON-string, kcidb/db/
    bigquery/v04_00.py:732-733; field-tree walk main.py:256-281).
    get_json_object stays JVM-side; the agg is partial-aggregable.
    """
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").cast("long").alias("sum_k"),
            F.count(F.lit(1)).alias("n"),
            F.min("k").cast("int").alias("min_k"),
            F.max("k").cast("int").alias("max_k"),
        )
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-duplicate pairs (bucketed, the 100 TB path)
# ---------------------------------------------------------------------------

_COS_THRESH = 0.93
#: Adaptive hyperplane-LSH sizing: p(n) = #{i < MAX : TARGET·2^i < n}
#: planes, i.e. 2^p ≥ n/TARGET buckets, keeping EXPECTED BUCKET SIZE
#: CONSTANT as the corpus grows.  A fixed plane count is the same
#: toy-scale quadratic the rehearsal caught in semdedup: with 8 fixed
#: planes the per-bucket pair stage grows as n²/256 — measured 4.8×
#: wall for 10× rows.  The count formula is pure integer CASE
#: arithmetic so Spark and DuckDB derive the identical p from their
#: own COUNT(*) — no float log2 at the boundary.
_EMB_BUCKET_TARGET = 8
_EMB_MAX_PLANES = 16


def _emb_planes_sql(n_col: str) -> str:
    return " + ".join(
        f"(CASE WHEN {_EMB_BUCKET_TARGET * (1 << i)} < {n_col}"
        " THEN 1 ELSE 0 END)"
        for i in range(_EMB_MAX_PLANES)
    )


def _bucket_case_sql(planes, p_col: str) -> str:
    terms = []
    for i, plane in enumerate(planes):
        arr = "[" + ", ".join(repr(x) for x in plane) + "]"
        terms.append(
            f"CASE WHEN {i} < {p_col}"
            f" AND list_dot_product(v, {arr}) >= 0"
            f" THEN {1 << i} ELSE 0 END"
        )
    return " + ".join(terms)


def _emb_cos_oracle() -> str:
    from kcidb_spark.operators.similarity import hyperplanes

    bucket = _bucket_case_sql(hyperplanes(_EMB_MAX_PLANES, 64), "p")
    return dedent(f"""
        WITH np AS (
            SELECT {_emb_planes_sql("count(*)")} AS p FROM embeddings
        ),
        vecs AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        b AS (
            SELECT vec_id, v, CAST({bucket} AS BIGINT) AS bucket
            FROM vecs CROSS JOIN np
        )
        SELECT l.vec_id AS a, r.vec_id AS b,
               round(list_dot_product(l.v, r.v)
                     / (sqrt(list_dot_product(l.v, l.v))
                        * sqrt(list_dot_product(r.v, r.v))), 4) AS sim
        FROM b l
        JOIN b r ON l.bucket = r.bucket AND l.vec_id < r.vec_id
        WHERE round(list_dot_product(l.v, r.v)
                    / (sqrt(list_dot_product(l.v, l.v))
                       * sqrt(list_dot_product(r.v, r.v))), 4) >= {_COS_THRESH}
    """)


from kcidb_spark.operators.similarity import cosine_expr as _cos_expr  # noqa: E402


@register("dedup_embedding_cosine", oracle=_emb_cos_oracle(), tags=("dedup", "similarity"))
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: hyperplane-LSH bucket join, cosine ≥
    τ within buckets only.  The all-pairs O(n²) comparison never
    happens — the equi-join on bucket is the only exchange, and at
    100 TB AQE's skew handling splits hot buckets.  Cosine is rounded
    to 4 decimals before thresholding so the kept-pair set is
    identical across engines.

    The plane count ADAPTS to the corpus (p = ⌈log₂(n/target)⌉ via
    integer CASEs, identical in the oracle — see _emb_planes_sql):
    bucket count ∝ n, expected bucket size constant, so pair-compare
    work stays linear where a fixed plane count is quadratic (the
    rehearsal-measured 4.8× wall at 10× rows).  Recall per pair is
    the single-band hyperplane trade-off — a production recall target
    adds OR-ed bands exactly like the MinHash family.
    """
    from kcidb_spark.operators.similarity import dot_expr, hyperplanes

    emb = table(spark, sf_dir, "embeddings", spread=True)
    n_df = emb.select(F.count(F.lit(1)).alias("n_vecs"))
    p = sum(
        F.when(
            F.lit(_EMB_BUCKET_TARGET * (1 << i)) < F.col("n_vecs"), 1
        ).otherwise(0)
        for i in range(_EMB_MAX_PLANES)
    )
    # One compact HOF over the plane MATRIX, not 16 inlined per-plane
    # CASE terms: the inlined form blew spark.sql.codegen method
    # limits and knocked the whole stage out of codegen (measured
    # 3.4× slower).  signs[i] then folds into Σ signs[i]·2^i gated at
    # i < p — the same bit encoding the oracle's CASE sum computes.
    planes_sql = (
        "array("
        + ", ".join(
            "array(" + ", ".join(f"cast({x!r} as double)" for x in row) + ")"
            for row in hyperplanes(_EMB_MAX_PLANES, 64)
        )
        + ")"
    )
    # slice to the first p planes so only the needed dot products are
    # computed (p=10 of 16 at sf0.1); p=0 (corpus ≤ target) degenerates
    # to one bucket, same as the oracle's i<p gate yielding 0.
    bucket_sql = (
        f"CASE WHEN p = 0 THEN cast(0 as bigint) ELSE "
        f"aggregate(zip_with("
        f"  transform(slice({planes_sql}, 1, cast(p as int)),"
        f"    pl -> CASE WHEN {dot_expr('v', 'pl')} >= 0"
        f"    THEN cast(1 as bigint) ELSE cast(0 as bigint) END),"
        f"  sequence(cast(0 as bigint), p - 1),"
        f"  (s, i) -> s * shiftleft(cast(1 as bigint), cast(i as int))),"
        f"  cast(0 as bigint), (acc, x) -> acc + x) END"
    )
    b = (
        emb.crossJoin(F.broadcast(n_df))
        .select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("v"),
            p.cast("bigint").alias("p"),
        )
        .select(
            "vec_id",
            "v",
            F.expr(bucket_sql).alias("bucket"),
            # Precompute each vector's norm ONCE (O(n·d)) and carry it
            # through the join: the pair stage otherwise re-derives
            # sqrt(v·v) per PAIR (3 dot products each, O(pairs·d)).
            # Identical doubles — sqrt(x) and the final
            # dot/(na*nb) division are the same operations the oracle
            # applies per pair, just computed earlier.
            F.expr(f"sqrt({dot_expr('v', 'v')})").alias("nv"),
        )
    )
    left = b.select(
        F.col("bucket"), F.col("vec_id").alias("a"),
        F.col("v").alias("va"), F.col("nv").alias("na"),
    )
    right = b.select(
        F.col("bucket"), F.col("vec_id").alias("b"),
        F.col("v").alias("vb"), F.col("nv").alias("nb"),
    )
    sim = F.expr(f"round({dot_expr('va', 'vb')} / (na * nb), 4)")
    return (
        left.join(right, on="bucket")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", sim.alias("sim"))
        .filter(F.col("sim") >= _COS_THRESH)
    )


# ---------------------------------------------------------------------------
# IVF-style ANN: coarse quantize to centroids, search within cluster
# ---------------------------------------------------------------------------

_IVF_CENTROIDS = 8
_IVF_QUERIES = 5
_IVF_K = 3


def _ivf_oracle() -> str:
    return dedent(f"""
        WITH vecs AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        cents AS (
            SELECT vec_id AS c_id, v AS cv FROM vecs WHERE vec_id < {_IVF_CENTROIDS}
        ),
        assign AS (
            SELECT vec_id, c_id, v
            FROM (
                SELECT vecs.vec_id, cents.c_id, vecs.v,
                       row_number() OVER (
                           PARTITION BY vecs.vec_id
                           ORDER BY round(list_dot_product(v, cv)
                                    / (sqrt(list_dot_product(v, v))
                                       * sqrt(list_dot_product(cv, cv))), 4) DESC,
                                    cents.c_id
                       ) AS rn
                FROM vecs CROSS JOIN cents
            )
            WHERE rn = 1
        )
        SELECT q_id, n_id, sim
        FROM (
            SELECT q.vec_id AS q_id, m.vec_id AS n_id,
                   round(list_dot_product(q.v, m.v)
                         / (sqrt(list_dot_product(q.v, q.v))
                            * sqrt(list_dot_product(m.v, m.v))), 4) AS sim,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY round(list_dot_product(q.v, m.v)
                                / (sqrt(list_dot_product(q.v, q.v))
                                   * sqrt(list_dot_product(m.v, m.v))), 4) DESC,
                                m.vec_id
                   ) AS rn
            FROM assign q
            JOIN assign m ON m.c_id = q.c_id AND m.vec_id <> q.vec_id
            WHERE q.vec_id < {_IVF_QUERIES}
        )
        WHERE rn <= {_IVF_K}
    """)


def _ivf_nprobe_oracle(nprobe: int) -> str:
    cos = (
        "round(list_dot_product({a}, {b})"
        " / (sqrt(list_dot_product({a}, {a}))"
        "    * sqrt(list_dot_product({b}, {b}))), 4)"
    )
    cos_v_cv = cos.format(a="v", b="cv")
    cos_qv_nv = cos.format(a="p.qv", b="m.v")
    return dedent(f"""
        WITH vecs AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        cents AS (
            SELECT vec_id AS c_id, v AS cv FROM vecs
            WHERE vec_id < {_IVF_CENTROIDS}
        ),
        assign AS (
            SELECT vec_id, c_id, v FROM (
                SELECT vecs.vec_id, cents.c_id, vecs.v,
                       row_number() OVER (
                           PARTITION BY vecs.vec_id
                           ORDER BY {cos_v_cv} DESC, cents.c_id
                       ) AS rn
                FROM vecs CROSS JOIN cents
            ) WHERE rn = 1
        ),
        probes AS (
            SELECT vec_id AS q_id, c_id, v AS qv FROM (
                SELECT vecs.vec_id, cents.c_id, vecs.v,
                       row_number() OVER (
                           PARTITION BY vecs.vec_id
                           ORDER BY {cos_v_cv} DESC, cents.c_id
                       ) AS rn
                FROM vecs CROSS JOIN cents
                WHERE vecs.vec_id < {_IVF_QUERIES}
            ) WHERE rn <= {nprobe}
        )
        SELECT q_id, n_id, sim FROM (
            SELECT p.q_id, m.vec_id AS n_id, {cos_qv_nv} AS sim,
                   row_number() OVER (
                       PARTITION BY p.q_id
                       ORDER BY {cos_qv_nv} DESC, m.vec_id
                   ) AS rn
            FROM probes p
            JOIN assign m ON m.c_id = p.c_id AND m.vec_id <> p.q_id
        ) WHERE rn <= {_IVF_K}
    """)


@register("ann_ivf_topk", oracle=_ivf_oracle(), tags=("similarity", "ivf"))
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style approximate nearest neighbor: coarse-quantize every
    vector to its nearest centroid (tiny centroid set → broadcast
    cross join + map-side min_by partial agg, no corpus-wide sort),
    then answer queries by scanning ONLY their own cluster.  Search
    cost is O(cluster), not O(corpus) — the standard inverted-file
    trade.  Centroids here are the first {_IVF_CENTROIDS} vectors
    (deterministic stand-in for a k-means step).  nprobe=1 — the
    fastest/lowest-recall point; ann_ivf_nprobe_topk is the recall
    dial (tests/test_ann_recall.py measures the curve).
    """
    from kcidb_spark.operators.similarity import ivf_topk

    emb = table(spark, sf_dir, "embeddings", spread=True)
    vecs = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    return ivf_topk(
        vecs, _IVF_CENTROIDS, _IVF_QUERIES, _IVF_K, nprobe=1
    )


_IVF_NPROBE = 4


@register(
    "ann_ivf_nprobe_topk",
    oracle=_ivf_nprobe_oracle(_IVF_NPROBE),
    tags=("similarity", "ivf"),
)
def ann_ivf_nprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with multi-cluster probing: each query probes its
    {_IVF_NPROBE} nearest coarse clusters and ranks the union of
    their members — the production recall dial (nprobe=1 misses true
    neighbors that quantize across a Voronoi boundary; recall@k rises
    monotonically with nprobe at O(nprobe·cluster) search cost,
    measured in tests/test_ann_recall.py and SCALE.md).
    """
    from kcidb_spark.operators.similarity import ivf_topk

    emb = table(spark, sf_dir, "embeddings", spread=True)
    vecs = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    return ivf_topk(
        vecs, _IVF_CENTROIDS, _IVF_QUERIES, _IVF_K, nprobe=_IVF_NPROBE
    )


def _ivf_filtered_oracle() -> str:
    cos = (
        "round(list_dot_product({a}, {b})"
        " / (sqrt(list_dot_product({a}, {a}))"
        "    * sqrt(list_dot_product({b}, {b}))), 4)"
    )
    cos_v_cv = cos.format(a="v", b="cv")
    cos_qv_nv = cos.format(a="p.qv", b="m.v")
    return dedent(f"""
        WITH vecs AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
            FROM embeddings
        ),
        cents AS (
            SELECT vec_id AS c_id, v AS cv FROM vecs
            WHERE vec_id < {_IVF_CENTROIDS}
        ),
        assign AS (
            SELECT vec_id, c_id, v, label FROM (
                SELECT vecs.vec_id, cents.c_id, vecs.v, vecs.label,
                       row_number() OVER (
                           PARTITION BY vecs.vec_id
                           ORDER BY {cos_v_cv} DESC, cents.c_id
                       ) AS rn
                FROM vecs CROSS JOIN cents
            ) WHERE rn = 1
        ),
        probes AS (
            SELECT vec_id AS q_id, c_id, v AS qv, label FROM (
                SELECT vecs.vec_id, cents.c_id, vecs.v, vecs.label,
                       row_number() OVER (
                           PARTITION BY vecs.vec_id
                           ORDER BY {cos_v_cv} DESC, cents.c_id
                       ) AS rn
                FROM vecs CROSS JOIN cents
                WHERE vecs.vec_id < {_IVF_QUERIES}
            ) WHERE rn <= {_IVF_NPROBE}
        )
        SELECT q_id, n_id, sim FROM (
            SELECT p.q_id, m.vec_id AS n_id, {cos_qv_nv} AS sim,
                   row_number() OVER (
                       PARTITION BY p.q_id
                       ORDER BY {cos_qv_nv} DESC, m.vec_id
                   ) AS rn
            FROM probes p
            JOIN assign m ON m.c_id = p.c_id AND m.vec_id <> p.q_id
                         AND m.label = p.label
        ) WHERE rn <= {_IVF_K}
    """)


@register(
    "ann_filtered_topk",
    oracle=_ivf_filtered_oracle(),
    tags=("similarity", "ivf"),
)
def ann_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """METADATA-FILTERED ANN — the serving feature every production
    retrieval tier needs next (FAISS IDSelector, Qdrant/Milvus payload
    filters): each query retrieves top-k only among vectors sharing
    its ``label`` (the embeddings table's typed metadata column).
    Implemented as PRE-FILTERING composed with IVF probing: candidates
    come from the probed clusters as usual, and the label predicate is
    applied to the candidate rows BEFORE ranking — so the filter
    shrinks the window input instead of post-truncating the top-k
    (post-filtering silently returns < k rows when the filter is
    selective; pre-filtering ranks the true filtered neighborhood).

    Scale shape: identical to ann_ivf_nprobe_topk plus one equality
    predicate on the broadcast-join output — labels ride the corpus
    rows (no extra join; at 100 TB label would be a partition/bucket
    column and the predicate prunes storage too, the
    ann_ivf_stored_probe layout one dimension richer)."""
    from pyspark.sql import Window as W

    from kcidb_spark.operators.similarity import dot_expr

    emb = table(spark, sf_dir, "embeddings", spread=True)
    base = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
        "label",
    ).withColumn("nrm", F.expr(f"sqrt({dot_expr('v', 'v')})"))
    cents = base.filter(F.col("vec_id") < _IVF_CENTROIDS).select(
        F.col("vec_id").alias("c_id"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
    )
    c_sim = F.expr(f"round({dot_expr('v', 'cv')} / (nrm * cn), 4)")
    assign = (
        base.crossJoin(F.broadcast(cents))
        .select("vec_id", "v", "nrm", "label", "c_id", c_sim.alias("c_sim"))
        .groupBy("vec_id")
        .agg(
            F.min_by("c_id", F.struct(F.negate("c_sim"), "c_id")).alias(
                "c_id"
            ),
            F.first("v").alias("nv"),
            F.first("nrm").alias("nn"),
            F.first("label").alias("n_label"),
        )
        .select(
            F.col("vec_id").alias("n_id"), "c_id", "nv", "nn", "n_label"
        )
    )
    w_probe = W.partitionBy("vec_id").orderBy(F.desc("c_sim"), F.asc("c_id"))
    q_probe = (
        base.filter(F.col("vec_id") < _IVF_QUERIES)
        .crossJoin(F.broadcast(cents))
        .select("vec_id", "v", "nrm", "label", "c_id", c_sim.alias("c_sim"))
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= _IVF_NPROBE)
        .select(
            F.col("vec_id").alias("q_id"),
            "c_id",
            F.col("v").alias("qv"),
            F.col("nrm").alias("qn"),
            F.col("label").alias("q_label"),
        )
    )
    w_rank = W.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("n_id"))
    return (
        assign.join(F.broadcast(q_probe), on="c_id")
        .filter(
            (F.col("n_id") != F.col("q_id"))
            & (F.col("n_label") == F.col("q_label"))
        )
        .select(
            "q_id",
            "n_id",
            F.expr(f"round({dot_expr('qv', 'nv')} / (qn * nn), 4)").alias(
                "sim"
            ),
        )
        .withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") <= _IVF_K)
        .select("q_id", "n_id", "sim")
    )


#: (applicationId, store path) pairs whose inverted file was written
#: THIS session — same idiom as mixing._FP_INDEX_BUILT: the build is
#: paid (and visible) once per session, probes reuse the layout.
_IVF_STORE_BUILT: set = set()


def _ivf_session_store(spark: SparkSession, sf_dir: str):
    """Build-once, session-keyed inverted file shared by every reader
    of the static-centroid IVF layout (ann_ivf_stored_probe's probe,
    t19's online serve, t19_store_build's certification): the corpus
    assignment written as parquet PARTITIONED BY c_id, at a path
    keyed by (applicationId, sha256(realpath(sf_dir))).  Returns
    ``(store_path, assign_schema)``; the first caller in a session
    pays the ONE partitioned write (the honest build wall —
    t19_store_build exists to carry it in the bench), later callers
    reuse the layout.  ``assign`` is independent of nprobe and of the
    query count (operators/similarity.ivf_parts), so every consumer
    reads the same directories."""
    import hashlib as _hl
    import os as _os
    import tempfile as _tf

    from kcidb_spark.operators.similarity import ivf_parts

    emb = table(spark, sf_dir, "embeddings", spread=True)
    vecs = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    assign, _ = ivf_parts(
        vecs, _IVF_CENTROIDS, _IVF_QUERIES, _IVF_NPROBE
    )
    store = _os.path.join(
        _tf.gettempdir(),
        "kcidb_spark_ivf_store",
        spark.sparkContext.applicationId,
        _hl.sha256(
            _os.path.realpath(sf_dir).encode()
        ).hexdigest()[:16],
    )
    if (spark.sparkContext.applicationId, store) not in _IVF_STORE_BUILT:
        assign.write.mode("overwrite").partitionBy("c_id").parquet(store)
        _IVF_STORE_BUILT.add((spark.sparkContext.applicationId, store))
    return store, assign.schema


@register(
    "ann_ivf_stored_probe",
    oracle=_ivf_nprobe_oracle(_IVF_NPROBE),
    tags=("similarity", "ivf", "index", "layout"),
)
def ann_ivf_stored_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search against a PERSISTED inverted file: the corpus
    assignments are written once as parquet PARTITIONED BY cluster id
    (one directory per coarse cluster — the storage layout an ANN
    serving tier keeps between queries), and the probe then reads
    ONLY the nprobe·|queries| probed clusters via partition pruning —
    the directories of unprobed clusters are never listed into the
    scan (tests/test_plans.py pins the PartitionFilters).  Same
    result as ann_ivf_nprobe_topk (identical oracle); what changes is
    WHERE the O(nprobe·cluster) bound is enforced: at STORAGE, so a
    100 TB corpus answers a query batch by reading gigabytes, not the
    table.  The probed-cluster id set is the collected probe list —
    ≤ queries × nprobe ids, control-plane-sized like the k-means
    centroids.  Index build cost (one partitioned write) is paid by
    the session's FIRST invocation — inside that wall, mirroring
    fpindex_build's honest accounting — and later invocations probe
    the stored layout, which is the point of a stored index."""
    from kcidb_spark.operators.similarity import ivf_parts, ivf_rank

    emb = table(spark, sf_dir, "embeddings", spread=True)
    vecs = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    _, q_probe = ivf_parts(
        vecs, _IVF_CENTROIDS, _IVF_QUERIES, _IVF_NPROBE
    )
    # Deterministic, session-owned store: one directory per
    # (session, sf) rather than a fresh mkdtemp per invocation (which
    # leaked a corpus-sized tree AND re-paid the partitioned write on
    # every bench/correctness run — ADVICE r9), keyed by a hash of
    # the NORMALIZED FULL sf_dir (ADVICE r10).  First call in a
    # session builds it; later calls probe the existing layout — the
    # serving-tier shape this entry models.  Like t17's out_dir, the
    # one residual dir per session is reclaimed by tmp cleaning.
    store, store_schema = _ivf_session_store(spark, sf_dir)
    q_probe = scoped_persist(q_probe)
    probed = sorted(
        r["c_id"] for r in q_probe.select("c_id").distinct().collect()
    )
    members = (
        # Explicit schema: partition-column values parse as LONG (not
        # inferred int), and an EMPTY store (no partition dirs to
        # infer from) still reads as a schema-correct empty frame.
        spark.read.schema(store_schema)
        .parquet(store)
        # Partition-column literal IN → directory-level pruning.
        .filter(F.col("c_id").isin(probed))
        .select(
            F.col("vec_id").alias("n_id"),
            "c_id",
            F.col("v").alias("nv"),
            F.col("nrm").alias("nn"),
        )
    )
    return ivf_rank(members, q_probe, _IVF_K)


# --- k-means-trained IVF: the composed train → index → probe path ---

#: Fixed Lloyd round count — unrolled verbatim in the oracle's CTEs.
_KM_ROUNDS = 3
#: Integer quantization: x → floor((x + 1) · 2^20); the +1 offset
#: keeps every coordinate positive so the integer-mean truncation is
#: sign-free, and L2 argmins are translation-invariant.
_KM_SCALE = 1 << 20
_KM_NPROBE = 2


def _km_coarse_parts(v_cte: str | None = None) -> list[str]:
    """Shared oracle prefix replaying the SAME {_KM_ROUNDS} coarse
    Lloyd rounds: long-form (vec, pos, x) joins compute the BIGINT
    squared distances, ``//`` the integer centroid means — every
    intermediate is integer-exact, so the trained centroids (and
    therefore assignments/probes) match Spark bit-for-bit.  Ends at
    the ``afin`` (corpus assignment) and ``probes`` (per-query
    top-nprobe clusters) CTEs; ann_ivf_kmeans_topk appends exact
    rescoring, ivf_pq_kmeans_adc_topk appends the trained-codebook
    ADC chain.  ``v_cte`` overrides the quantized-vector CTE chain
    (must end defining ``v(vec_id, q array<bigint>)``) — the rotated
    variant injects its Givens layers here."""
    default_v = dedent(f"""
        WITH v AS (
            SELECT vec_id,
                   list_transform(CAST(embedding AS DOUBLE[]),
                                  x -> CAST(floor((x + 1.0) * {_KM_SCALE})
                                            AS BIGINT)) AS q
            FROM embeddings
        ),""")
    parts = [(v_cte if v_cte is not None else default_v) + dedent(f"""
        vx AS (
            SELECT vec_id,
                   unnest(generate_series(1, length(q))) AS pos,
                   unnest(q) AS x
            FROM v
        ),
        c0 AS (
            SELECT vec_id AS c_id, pos, x FROM vx
            WHERE vec_id < {_IVF_CENTROIDS}
        )""")]
    for r in range(1, _KM_ROUNDS + 1):
        parts.append(dedent(f""",
        d{r} AS (
            SELECT vx.vec_id, c.c_id,
                   CAST(sum((vx.x - c.x) * (vx.x - c.x)) AS BIGINT) AS d2
            FROM vx JOIN c{r - 1} c ON vx.pos = c.pos
            GROUP BY vx.vec_id, c.c_id
        ),
        a{r} AS (
            SELECT vec_id, c_id FROM (
                SELECT vec_id, c_id,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY d2, c_id) AS rn
                FROM d{r}
            ) WHERE rn = 1
        ),
        c{r} AS (
            SELECT a.c_id, vx.pos,
                   CAST(sum(vx.x) // count(*) AS BIGINT) AS x
            FROM a{r} a JOIN vx ON a.vec_id = vx.vec_id
            GROUP BY a.c_id, vx.pos
        )"""))
    parts.append(dedent(f""",
        dfin AS (
            SELECT vx.vec_id, c.c_id,
                   CAST(sum((vx.x - c.x) * (vx.x - c.x)) AS BIGINT) AS d2
            FROM vx JOIN c{_KM_ROUNDS} c ON vx.pos = c.pos
            GROUP BY vx.vec_id, c.c_id
        ),
        afin AS (
            SELECT vec_id, c_id FROM (
                SELECT vec_id, c_id,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY d2, c_id) AS rn
                FROM dfin
            ) WHERE rn = 1
        ),
        probes AS (
            SELECT vec_id AS q_id, c_id FROM (
                SELECT vec_id, c_id,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY d2, c_id) AS rn
                FROM dfin WHERE vec_id < {_IVF_QUERIES}
            ) WHERE rn <= {_KM_NPROBE}
        )"""))
    return parts


def _ivf_kmeans_oracle() -> str:
    parts = _km_coarse_parts()
    parts.append(dedent(f""",
        cand AS (
            SELECT p.q_id, m.vec_id AS n_id
            FROM probes p
            JOIN afin m ON m.c_id = p.c_id AND m.vec_id <> p.q_id
        ),
        scoredk AS (
            SELECT c.q_id, c.n_id,
                   CAST(sum((qx.x - nx.x) * (qx.x - nx.x)) AS BIGINT) AS d2
            FROM cand c
            JOIN vx qx ON qx.vec_id = c.q_id
            JOIN vx nx ON nx.vec_id = c.n_id AND nx.pos = qx.pos
            GROUP BY c.q_id, c.n_id
        )
        SELECT q_id, n_id, d2 FROM (
            SELECT q_id, n_id, d2,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY d2, n_id) AS rn
            FROM scoredk
        ) WHERE rn <= {_IVF_K}
    """))
    return "".join(parts)


#: Session-keyed trained-centroid cache — (applicationId,
#: realpath(sf_dir), k, rounds) → the driver-held centroid list.
#: VERDICT r10 "Next round" #2: ann_ivf_kmeans_topk,
#: ivf_pq_kmeans_adc_topk and ivf_pq_residual_adc_topk each train the
#: SAME coarse quantizer over the SAME corpus; production trains once
#: and serves many indexes from it.  The cached object is k·dim
#: BIGINTs (control-plane) and the training is deterministic integer
#: Lloyd, so reuse cannot change any oracle-certified result.  Keyed
#: by applicationId (the fp-index/ivf-store idiom) so a fresh session
#: always pays — and shows — the training cost exactly once; entries
#: from previous sessions are pruned.
_KM_CENTROIDS_CACHE: dict = {}


def _coarse_centroids_trained(
    spark: SparkSession, sf_dir: str, vecs: DataFrame, space: str = "raw"
) -> list:
    import os as _os

    from kcidb_spark.operators.clustering import kmeans_centroids_exact

    app = spark.sparkContext.applicationId
    key = (app, _os.path.realpath(sf_dir), _IVF_CENTROIDS, _KM_ROUNDS,
           space)
    if key not in _KM_CENTROIDS_CACHE:
        _trainer_cache_put(
            _KM_CENTROIDS_CACHE, app, key,
            kmeans_centroids_exact(vecs, _IVF_CENTROIDS, _KM_ROUNDS),
        )
    return _KM_CENTROIDS_CACHE[key]


@register(
    "ann_ivf_kmeans_topk",
    oracle=_ivf_kmeans_oracle(),
    tags=("similarity", "ivf", "clustering"),
)
def ann_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production IVF path END-TO-END: train the coarse quantizer
    with {_KM_ROUNDS} Lloyd rounds, build the inverted file from the
    trained centroids, then answer queries by probing their
    {_KM_NPROBE} nearest clusters — previously only the static-centroid
    stand-ins were oracle-certified (VERDICT r8 "What's missing" #2).

    Engine-exactness: vectors quantize to integer micro-coordinates
    (floor((x+1)·2^20)), assignment is BIGINT squared-L2 argmin with
    c_id tie-break, and the centroid mean is ``sum div count`` — pure
    integer arithmetic at every round, so DuckDB's unrolled replay of
    the same rounds lands on identical centroids (FAISS IVF's native
    metric is L2, so the quantized-L2 ranking is the honest shape, not
    a hash workaround).  Scale: centroids are driver-held between
    rounds (k·dim BIGINTs — control-plane-sized), each round is one
    broadcast-join assignment + one partial-agg mean over the
    persisted corpus, and search is O(nprobe·cluster) via the
    broadcast probe list, never O(corpus)."""
    from kcidb_spark.operators.clustering import ivf_kmeans_topk

    emb = table(spark, sf_dir, "embeddings", spread=True)
    vecs = scoped_persist(
        emb.select(
            F.col("vec_id").alias("id"),
            F.expr(
                "transform(cast(embedding as array<double>),"
                f" x -> cast(floor((x + 1.0D) * {_KM_SCALE}.0D) as bigint))"
            ).alias("q"),
        )
    )
    return ivf_kmeans_topk(
        vecs, _IVF_CENTROIDS, _KM_ROUNDS, _IVF_QUERIES, _IVF_K,
        nprobe=_KM_NPROBE,
        centroids=_coarse_centroids_trained(spark, sf_dir, vecs),
    )


# --- trained IVF-PQ: k-means coarse quantizer + k-means codebooks ---

#: Product-quantization geometry for the TRAINED path: 64-dim vectors
#: → 8 subspaces × 8 dims, 8 codewords per subspace, 2 Lloyd rounds
#: per subspace (unrolled verbatim in the oracle; the production dial
#: is 256 codewords × ~25 rounds — the construction is round-count
#: agnostic).
_PQK_SUBS = 8
_PQK_SUBDIM = 8
_PQK_CODES = 8
_PQK_ROUNDS = 2

#: Train-once session cache for the per-subspace codebooks — the
#: _KM_CENTROIDS_CACHE rationale one level down: each trained-PQ entry
#: Lloyds the SAME books over the SAME corpus every run; the cached
#: object is S·M·D BIGINTs (control-plane) and grouped integer Lloyd
#: is deterministic, so reuse cannot change any oracle-certified
#: result.  Keyed by applicationId: a fresh session pays — and shows —
#: the training cost exactly once.
_PQK_BOOKS_CACHE: dict = {}


def _pqk_model_trained(
    spark: SparkSession,
    sf_dir: str,
    vecs_plan: DataFrame,
    subs_of,
    c_space: str = "raw",
    b_space: str = "raw",
) -> tuple[list, list]:
    """(cents, books) for the trained IVF-PQ family, train-once per
    session (guide §1.2: the training jobs are the entries' dominant
    repeated cost; both models are deterministic integer Lloyd, so a
    cache hit is bit-identical to retraining).  On a cold cache the
    corpus and subvector frames scope-persist for the trainers' round
    scans; on a warm one the entry builds NEITHER frame — the corpus
    is consumed once, by the in-row encode projection.

    ``subs_of(vecs, cents)`` builds the codebook-training subvector
    frame (the residual form needs the trained centroids)."""
    import os as _os

    from kcidb_spark.operators.clustering import pq_codebooks_exact

    app = spark.sparkContext.applicationId
    sfp = _os.path.realpath(sf_dir)
    ckey = (app, sfp, _IVF_CENTROIDS, _KM_ROUNDS, c_space)
    bkey = (app, sfp, _PQK_SUBS, _PQK_SUBDIM, _PQK_CODES, _PQK_ROUNDS,
            b_space)
    if ckey in _KM_CENTROIDS_CACHE and bkey in _PQK_BOOKS_CACHE:
        return _KM_CENTROIDS_CACHE[ckey], _PQK_BOOKS_CACHE[bkey]
    vecs = scoped_persist(vecs_plan)
    cents = _coarse_centroids_trained(spark, sf_dir, vecs, space=c_space)
    if bkey not in _PQK_BOOKS_CACHE:
        subs = scoped_persist(subs_of(vecs, cents))
        _trainer_cache_put(
            _PQK_BOOKS_CACHE, app, bkey,
            pq_codebooks_exact(subs, _PQK_CODES, _PQK_ROUNDS),
        )
    return cents, _PQK_BOOKS_CACHE[bkey]


def _ivf_pq_kmeans_oracle(v_cte: str | None = None) -> str:
    """The full trained IVF-PQ pipeline in one replay: the shared
    coarse-Lloyd prefix (afin/probes), then per-subspace codebook
    Lloyd ({_PQK_ROUNDS} rounds, grouped by subspace s), corpus
    encoding, per-query ADC distance tables over the TRAINED books,
    and the probed-cluster ADC top-k.  ``v_cte`` passes through to
    :func:`_km_coarse_parts` (the rotated variant's hook)."""
    parts = _km_coarse_parts(v_cte)
    parts.append(dedent(f""",
        sx AS (
            SELECT vec_id,
                   CAST((pos - 1) // {_PQK_SUBDIM} AS BIGINT) AS s,
                   CAST((pos - 1) % {_PQK_SUBDIM} + 1 AS BIGINT) AS spos,
                   x
            FROM vx
        ),
        b0 AS (
            SELECT s, vec_id AS m, spos, x FROM sx
            WHERE vec_id < {_PQK_CODES}
        )"""))
    for r in range(1, _PQK_ROUNDS + 1):
        parts.append(dedent(f""",
        pe{r} AS (
            SELECT sx.vec_id, sx.s, b.m,
                   CAST(sum((sx.x - b.x) * (sx.x - b.x)) AS BIGINT) AS d2
            FROM sx JOIN b{r - 1} b ON sx.s = b.s AND sx.spos = b.spos
            GROUP BY sx.vec_id, sx.s, b.m
        ),
        pa{r} AS (
            SELECT vec_id, s, m FROM (
                SELECT vec_id, s, m,
                       row_number() OVER (PARTITION BY vec_id, s
                                          ORDER BY d2, m) AS rn
                FROM pe{r}
            ) WHERE rn = 1
        ),
        b{r} AS (
            SELECT a.s, a.m, sx.spos,
                   CAST(sum(sx.x) // count(*) AS BIGINT) AS x
            FROM pa{r} a
            JOIN sx ON a.vec_id = sx.vec_id AND a.s = sx.s
            GROUP BY a.s, a.m, sx.spos
        )"""))
    parts.append(dedent(f""",
        pefin AS (
            SELECT sx.vec_id, sx.s, b.m,
                   CAST(sum((sx.x - b.x) * (sx.x - b.x)) AS BIGINT) AS d2
            FROM sx JOIN b{_PQK_ROUNDS} b
              ON sx.s = b.s AND sx.spos = b.spos
            GROUP BY sx.vec_id, sx.s, b.m
        ),
        codes AS (
            SELECT vec_id, s, m FROM (
                SELECT vec_id, s, m,
                       row_number() OVER (PARTITION BY vec_id, s
                                          ORDER BY d2, m) AS rn
                FROM pefin
            ) WHERE rn = 1
        ),
        dt AS (
            SELECT vec_id AS q_id, s, m, d2 AS d FROM pefin
            WHERE vec_id < {_IVF_QUERIES}
        ),
        adc AS (
            SELECT p.q_id, cd.vec_id AS n_id,
                   CAST(sum(dt.d) AS BIGINT) AS adc_micro
            FROM probes p
            JOIN afin na ON na.c_id = p.c_id AND na.vec_id <> p.q_id
            JOIN codes cd ON cd.vec_id = na.vec_id
            JOIN dt ON dt.q_id = p.q_id AND dt.s = cd.s AND dt.m = cd.m
            GROUP BY p.q_id, cd.vec_id
        )
        SELECT q_id, n_id, adc_micro, rk FROM (
            SELECT q_id, n_id, adc_micro,
                   CAST(row_number() OVER (PARTITION BY q_id
                                           ORDER BY adc_micro, n_id)
                        AS BIGINT) AS rk
            FROM adc
        ) WHERE rk <= {_IVF_K}
    """))
    return "".join(parts)


@register(
    "ivf_pq_kmeans_adc_topk",
    oracle=_ivf_pq_kmeans_oracle(),
    tags=("similarity", "ivf", "clustering"),
)
def ivf_pq_kmeans_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production IVF-PQ path with BOTH quantizers TRAINED
    (VERDICT r9 "Next round" #5): Lloyd-trained coarse centroids
    route queries to nprobe clusters, Lloyd-trained per-subspace
    codebooks (operators/clustering.pq_codebooks_exact) compress the
    corpus to {_PQK_SUBS} bytes-ish of codes, and search is
    asymmetric-distance (ADC) over a per-query distance table —
    completing ivf_pq_adc_topk (static books) + ann_ivf_kmeans_topk
    (trained coarse, exact rescoring) into the pipeline FAISS's
    IVFx,PQy index actually runs (Jégou et al. 2011 §IV).

    Engine-exactness: the same integer micro-coordinate doctrine as
    the coarse trainer — codebook init IS the static codebook (the
    first {_PQK_CODES} vectors' subvectors), each round's argmin is a
    BIGINT d2 with m tie-break, means are ``sum div count``, and the
    ADC sum is integer-associative, so DuckDB's unrolled per-subspace
    replay lands on identical books, codes, and rankings.

    Scale: books are S·M·D BIGINTs driver-held between rounds
    (control-plane, like the centroids); training is {_PQK_ROUNDS}
    rounds × (one broadcast join + partial-agg mean) over the
    subvector frame — all subspaces train in the SAME jobs, grouped
    by s, not S sequential loops; encode/dt/search reuse the
    broadcast books; the only corpus-keyed exchanges are the encode
    partial-agg and the (q,n)-keyed ADC sum after the probed-cluster
    semi-join."""
    from kcidb_spark.operators.ivf import (
        adc_topk,
        inrow_coarse_sql,
        inrow_codes_sql,
        pq_dt_driver,
        route_int_driver,
        subvectors,
    )

    emb = table(spark, sf_dir, "embeddings", spread=True)
    quant = (
        "transform(cast(embedding as array<double>),"
        f" x -> cast(floor((x + 1.0D) * {_KM_SCALE}.0D) as bigint))"
    )
    vecs_plan = emb.select(
        F.col("vec_id").alias("id"), F.expr(quant).alias("q")
    )
    # Both quantizers train-once per session (_pqk_model_trained).
    cents, books = _pqk_model_trained(
        spark, sf_dir, vecs_plan,
        lambda vecs, _c: subvectors(
            vecs, ("id",), "q", _PQK_SUBS, _PQK_SUBDIM
        ),
    )
    # Probe routing + per-query ADC tables DRIVER-SIDE (guide §2.4/§5):
    # the model is driver-held and the queries are request-scale, so
    # one pruned collect (vec_id pushdown) plus exact integer math
    # replaces the corpus-persisted crossJoin+window probes subtree
    # and the subvector-explode distance-table subtree — per run the
    # corpus is consumed ONCE, by the in-row encode projection below.
    qrows = [
        (int(r["id"]), [int(x) for x in r["q"]])
        for r in vecs_plan.filter(
            F.col("id") < _IVF_QUERIES
        ).collect()
    ]
    probes = local_df(
        spark,
        route_int_driver(qrows, cents, _KM_NPROBE),
        "q_id long, c_id bigint",
    )
    dt = local_df(
        spark,
        pq_dt_driver(qrows, books, _PQK_SUBS, _PQK_SUBDIM),
        "q_id long, s bigint, m bigint, d bigint",
    )
    # Encode side fully in-row: coarse id + PQ codes are per-row
    # expressions over the literal model, so the old explode ×S +
    # (id, s)-keyed code argmin exchange AND the id-keyed
    # codes⋈assign join disappear — one projection feeds the ADC
    # semi-join directly (identical rows: same argmins, same
    # tie-breaks, subspaces absent from the books omitted).
    n_codes = vecs_plan.select(
        F.col("id").alias("n_id"),
        F.expr(inrow_coarse_sql(cents)).alias("c_id"),
        F.expr(inrow_codes_sql(books, _PQK_SUBS, _PQK_SUBDIM)),
    )
    return adc_topk(n_codes, probes, dt, _IVF_K)


# --- rotated IVF-PQ: fixed orthogonal rotation before subvectoring ---

#: Givens rotation constants — an exact-rational 3-4-5 angle, so the
#: same two decimal literals parse to the same IEEE doubles in both
#: engines and every rotated coordinate is bit-identical.
_ROT_C = "0.6"
_ROT_S = "0.8"


def _rot_v_cte() -> str:
    """Oracle CTE chain: two Givens layers (even pairs, then odd
    pairs) over the raw doubles, then the standard integer grid —
    ends defining ``v(vec_id, q)`` exactly like the default."""
    c, s = _ROT_C, _ROT_S
    return dedent(f"""
        WITH e0 AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
            FROM embeddings
        ),
        e1 AS (
            SELECT vec_id,
                   list_transform(generate_series(1, length(e)), p ->
                       CASE WHEN p % 2 = 1
                            THEN CAST({c} AS DOUBLE) * e[p]
                                 - CAST({s} AS DOUBLE) * e[p + 1]
                            ELSE CAST({s} AS DOUBLE) * e[p - 1]
                                 + CAST({c} AS DOUBLE) * e[p] END) AS e
            FROM e0
        ),
        e2 AS (
            SELECT vec_id,
                   list_transform(generate_series(1, length(e)), p ->
                       CASE WHEN p = 1 OR p = length(e) THEN e[p]
                            WHEN p % 2 = 0
                            THEN CAST({c} AS DOUBLE) * e[p]
                                 - CAST({s} AS DOUBLE) * e[p + 1]
                            ELSE CAST({s} AS DOUBLE) * e[p - 1]
                                 + CAST({c} AS DOUBLE) * e[p] END) AS e
            FROM e1
        ),
        v AS (
            SELECT vec_id,
                   list_transform(e, x -> CAST(floor((x + 1.0)
                       * {_KM_SCALE}) AS BIGINT)) AS q
            FROM e2
        ),""")


def _rot_expr(src: str) -> str:
    """Spark SQL text for the SAME two Givens layers over an
    array<double> column ``src`` — identical literals, identical
    operation order, so the doubles match the oracle bit-for-bit."""
    c, s = f"cast({_ROT_C} as double)", f"cast({_ROT_S} as double)"
    layer1 = (
        f"transform(sequence(1, size({src})), p -> CASE"
        f" WHEN p % 2 = 1 THEN {c} * element_at({src}, p)"
        f"  - {s} * element_at({src}, p + 1)"
        f" ELSE {s} * element_at({src}, p - 1)"
        f"  + {c} * element_at({src}, p) END)"
    )
    return (
        f"transform(sequence(1, size({src})), p -> CASE"
        f" WHEN p = 1 OR p = size({src}) THEN element_at(_e1, p)"
        f" WHEN p % 2 = 0 THEN {c} * element_at(_e1, p)"
        f"  - {s} * element_at(_e1, p + 1)"
        f" ELSE {s} * element_at(_e1, p - 1)"
        f"  + {c} * element_at(_e1, p) END)"
    ), layer1


@register(
    "ivf_pq_rotated_adc_topk",
    oracle=_ivf_pq_kmeans_oracle(_rot_v_cte()),
    tags=("similarity", "ivf", "clustering"),
)
def ivf_pq_rotated_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ over a ROTATED vector space — the fourth point of the
    PQ family (raw / trained / residual / rotated): apply a fixed
    orthogonal rotation before subvectoring, so correlated adjacent
    dimensions spread across PQ subspaces instead of wasting one
    subspace's codebook on shared structure.  This is FAISS's
    ``RR64,PQ8`` (random-rotation PQ); full OPQ (Ge et al. 2013)
    LEARNS the rotation by alternating Procrustes solves — the
    learned matrix cannot be replayed by a static SQL oracle, so the
    engine ships the fixed-rotation form hash-certified and leaves
    OPQ's trainer as the documented extension (the pipeline after
    the rotation is IDENTICAL — operators/ivf.py stages).

    The rotation is two Givens layers (even dim pairs, then odd) at
    the exact-rational 3-4-5 angle: orthogonal by construction
    (norms preserved — pinned in tests), expressible as the same two
    array transforms in Spark and DuckDB with the same literals and
    operation order, so the rotated doubles — and therefore the
    integer grid, the trained centroids/books, and the ADC ranking —
    are bit-identical cross-engine.  Scale shape identical to
    ivf_pq_kmeans_adc_topk: the rotation is a per-row projection
    (zero shuffle), everything downstream reuses the shared stages."""
    from kcidb_spark.operators.ivf import (
        adc_topk,
        inrow_coarse_sql,
        inrow_codes_sql,
        pq_dt_driver,
        route_int_driver,
        subvectors,
    )

    emb = table(spark, sf_dir, "embeddings", spread=True)
    layer2, layer1 = _rot_expr("_e0")

    def _rot_quant(src):
        return (
            src.select(
                F.col("vec_id").alias("id"),
                F.expr("cast(embedding as array<double>)").alias("_e0"),
            )
            .withColumn("_e1", F.expr(layer1))
            .withColumn("_e2", F.expr(layer2))
            .select(
                "id",
                F.expr(
                    "transform(_e2, x -> cast(floor((x + 1.0D)"
                    f" * {_KM_SCALE}.0D) as bigint))"
                ).alias("q"),
            )
        )

    # The rotated corpus PERSISTS unconditionally (unlike the raw
    # entries): without the cache boundary Catalyst collapses the
    # 3-layer rotation projection INTO every one of the ~k + S·M
    # literal d2 expressions of the in-row encode — a measured
    # ~100× blowup, not a win.
    vecs_plan = scoped_persist(_rot_quant(emb))
    # Train-once models; driver-side probes + ADC tables from one
    # pruned collect — see ivf_pq_kmeans_adc_topk.  The query rows
    # collect from a SEPARATE pruned plan (filter below the rotation,
    # vec_id pushdown) so it does not materialize the corpus cache.
    cents, books = _pqk_model_trained(
        spark, sf_dir, vecs_plan,
        lambda vecs, _c: subvectors(
            vecs, ("id",), "q", _PQK_SUBS, _PQK_SUBDIM
        ),
        c_space="rot", b_space="rot",
    )
    qrows = [
        (int(r["id"]), [int(x) for x in r["q"]])
        for r in _rot_quant(
            emb.filter(F.col("vec_id") < _IVF_QUERIES)
        ).collect()
    ]
    probes = local_df(
        spark,
        route_int_driver(qrows, cents, _KM_NPROBE),
        "q_id long, c_id bigint",
    )
    dt = local_df(
        spark,
        pq_dt_driver(qrows, books, _PQK_SUBS, _PQK_SUBDIM),
        "q_id long, s bigint, m bigint, d bigint",
    )
    # Encode side fully in-row: coarse id + PQ codes are per-row
    # expressions over the literal model, so the old explode ×S +
    # (id, s)-keyed code argmin exchange AND the id-keyed
    # codes⋈assign join disappear — one projection feeds the ADC
    # semi-join directly (identical rows: same argmins, same
    # tie-breaks, subspaces absent from the books omitted).
    n_codes = vecs_plan.select(
        F.col("id").alias("n_id"),
        F.expr(inrow_coarse_sql(cents)).alias("c_id"),
        F.expr(inrow_codes_sql(books, _PQK_SUBS, _PQK_SUBDIM)),
    )
    return adc_topk(n_codes, probes, dt, _IVF_K)


# --- OPQ: the LEARNED rotation (Ge et al. 2013), rows-only entry ---

#: OPQ trains on a bounded sample (FAISS trains on ~2^16 vectors at
#: any corpus size); the alternation never touches the full corpus.
_OPQ_SAMPLE = 2048
_OPQ_ITERS = 3

#: (appId, sf, dials) → (R, books, history): the learned rotation and
#: codebooks train ONCE per session per corpus (the quantizer-cache
#: idiom of _KM_CENTROIDS_CACHE — a fresh session pays and shows the
#: training cost exactly once; stale-session entries pruned).
_OPQ_CACHE: dict = {}

#: Cross-app eviction bounds these trainer caches across SESSIONS but
#: not across sf_dirs WITHIN one long-lived session (ADVICE r12): a
#: driver training over many corpora accumulates one control-plane
#: entry per (sf, dials).  Each entry is a few hundred KB, so the cap
#: is a symmetry/backstop bound, not a memory fix — oldest-inserted
#: evicts first (dict preserves insertion order).
_TRAINER_CACHE_MAX = 8


def _trainer_cache_put(cache: dict, app: str, key, value) -> None:
    """Shared insert discipline for the driver-held trainer caches:
    prune stale-session entries, then cap same-session entries at
    ``_TRAINER_CACHE_MAX`` by evicting the oldest-inserted."""
    for stale in [k for k in cache if k[0] != app]:
        del cache[stale]
    while len(cache) >= _TRAINER_CACHE_MAX:
        del cache[next(iter(cache))]
    cache[key] = value


def _opq_trained(spark: SparkSession, sf_dir: str, vecs: DataFrame):
    import os as _os

    from kcidb_spark.operators.opq import givens_rotation, opq_train

    app = spark.sparkContext.applicationId
    key = (app, _os.path.realpath(sf_dir), _PQK_SUBS, _PQK_CODES,
           _OPQ_ITERS)
    if key not in _OPQ_CACHE:
        sample = vecs.filter(F.col("id") < _OPQ_SAMPLE)
        _trainer_cache_put(
            _OPQ_CACHE, app, key,
            opq_train(
                sample, _PQK_SUBS, _PQK_SUBDIM, _PQK_CODES,
                lloyd_rounds=_PQK_ROUNDS, iters=_OPQ_ITERS,
                r_init=givens_rotation(_PQK_SUBS * _PQK_SUBDIM),
            ),
        )
    return _OPQ_CACHE[key]


@register(
    "opq_adc_topk",
    tags=("similarity", "clustering", "opq"),
    schema="q_id bigint, n_id bigint, rk bigint",
)
def opq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPQ — the LEARNED rotation completing the PQ family (VERDICT
    r11 #7; ivf_pq_rotated_adc_topk's docstring names it as the
    documented extension): alternate per-subspace float Lloyd with
    closed-form orthogonal-Procrustes solves (operators/opq.py, Ge et
    al. CVPR 2013), initialized at the hash-certified fixed 3-4-5
    Givens rotation with keep-best, so the learned rotation's
    quantization distortion is PROVABLY ≤ the fixed one's.  Search is
    the flat-PQ ADC scan (FAISS IndexPQ) over the learned books:
    rotate + encode the corpus (broadcast d×d matrix and S·M·D books;
    per-row projections, min_by partial aggs), per-query distance
    tables broadcast, candidates summed and ranked per query.

    ROWS-ONLY by necessity, like the BPE/unigram trainers: a learned
    rotation is the output of float alternation (ordering-dependent
    means), which no static SQL oracle can replay.  The property
    harness (tests/test_opq.py) pins what the hash gate cannot:
    orthogonality of R, distortion ≤ the Givens init's (history[0]),
    monotone keep-best, and recall@k vs the exact cosine oracle at
    least matching the fixed-rotation pipeline's.  Training runs on a
    {_OPQ_SAMPLE}-vector sample per session (the FAISS posture —
    never alternate over the corpus); the full corpus is touched once
    by the encode pass."""
    from kcidb_spark.operators.ivf import pq_assign_codes, subvectors
    from kcidb_spark.operators.opq import d2_float_expr, rotate

    emb = table(spark, sf_dir, "embeddings", spread=True)
    vecs = scoped_persist(
        emb.select(
            F.col("vec_id").alias("id"),
            F.expr("cast(embedding as array<double>)").alias("x"),
        )
    )
    r_learned, books, _hist = _opq_trained(spark, sf_dir, vecs)
    xr = rotate(vecs, r_learned, "x", "q").select("id", "q")
    subs = subvectors(xr, ("id",), "q", _PQK_SUBS, _PQK_SUBDIM)
    bdf = local_df(
        spark, books, "s bigint, m bigint, bq array<double>"
    )
    scored = scoped_persist(
        subs.join(F.broadcast(bdf), on="s").select(
            "s", "id", "q", "m",
            F.expr(d2_float_expr("q", "bq")).alias("d2"),
        )
    )
    codes = pq_assign_codes(scored)
    dt = scored.filter(F.col("id") < _IVF_QUERIES).select(
        F.col("id").alias("q_id"), "s", "m", F.col("d2").alias("d")
    )
    w_rank = W.partitionBy("q_id").orderBy("adc", "n_id")
    return (
        codes.withColumnRenamed("id", "n_id")
        .join(F.broadcast(dt), on=["s", "m"])
        .filter(F.col("n_id") != F.col("q_id"))
        .groupBy("q_id", "n_id")
        .agg(F.sum("d").alias("adc"))
        .withColumn("rk", F.row_number().over(w_rank).cast("long"))
        .filter(F.col("rk") <= _IVF_K)
        .select("q_id", "n_id", "rk")
    )


# --- residual IVF-PQ: encode (x − coarse centroid), the IVFADC form ---


def _ivf_pq_residual_oracle() -> str:
    """Replay of the RESIDUAL pipeline: coarse-Lloyd prefix, corpus
    residuals r = q − centroid(assign), per-subspace codebook Lloyd
    over the residuals, residual codes, PER-(query, probed-cluster)
    distance tables, probed ADC top-k."""
    parts = _km_coarse_parts()
    parts.append(dedent(f""",
        rres AS (
            SELECT vx.vec_id, vx.pos, vx.x - c.x AS x
            FROM vx
            JOIN afin a ON vx.vec_id = a.vec_id
            JOIN c{_KM_ROUNDS} c ON c.c_id = a.c_id AND c.pos = vx.pos
        ),
        rsx AS (
            SELECT vec_id,
                   CAST((pos - 1) // {_PQK_SUBDIM} AS BIGINT) AS s,
                   CAST((pos - 1) % {_PQK_SUBDIM} + 1 AS BIGINT) AS spos,
                   x
            FROM rres
        ),
        rb0 AS (
            SELECT s, vec_id AS m, spos, x FROM rsx
            WHERE vec_id < {_PQK_CODES}
        )"""))
    for r in range(1, _PQK_ROUNDS + 1):
        parts.append(dedent(f""",
        rpe{r} AS (
            SELECT rsx.vec_id, rsx.s, b.m,
                   CAST(sum((rsx.x - b.x) * (rsx.x - b.x)) AS BIGINT) AS d2
            FROM rsx JOIN rb{r - 1} b ON rsx.s = b.s AND rsx.spos = b.spos
            GROUP BY rsx.vec_id, rsx.s, b.m
        ),
        rpa{r} AS (
            SELECT vec_id, s, m FROM (
                SELECT vec_id, s, m,
                       row_number() OVER (PARTITION BY vec_id, s
                                          ORDER BY d2, m) AS rn
                FROM rpe{r}
            ) WHERE rn = 1
        ),
        rb{r} AS (
            SELECT a.s, a.m, rsx.spos,
                   CAST(sum(rsx.x) // count(*) AS BIGINT) AS x
            FROM rpa{r} a
            JOIN rsx ON a.vec_id = rsx.vec_id AND a.s = rsx.s
            GROUP BY a.s, a.m, rsx.spos
        )"""))
    parts.append(dedent(f""",
        rpefin AS (
            SELECT rsx.vec_id, rsx.s, b.m,
                   CAST(sum((rsx.x - b.x) * (rsx.x - b.x)) AS BIGINT) AS d2
            FROM rsx JOIN rb{_PQK_ROUNDS} b
              ON rsx.s = b.s AND rsx.spos = b.spos
            GROUP BY rsx.vec_id, rsx.s, b.m
        ),
        rcodes AS (
            SELECT vec_id, s, m FROM (
                SELECT vec_id, s, m,
                       row_number() OVER (PARTITION BY vec_id, s
                                          ORDER BY d2, m) AS rn
                FROM rpefin
            ) WHERE rn = 1
        ),
        qsx AS (
            SELECT p.q_id, p.c_id,
                   CAST((vx.pos - 1) // {_PQK_SUBDIM} AS BIGINT) AS s,
                   CAST((vx.pos - 1) % {_PQK_SUBDIM} + 1 AS BIGINT) AS spos,
                   vx.x - c.x AS x
            FROM probes p
            JOIN vx ON vx.vec_id = p.q_id
            JOIN c{_KM_ROUNDS} c ON c.c_id = p.c_id AND c.pos = vx.pos
        ),
        rdt AS (
            SELECT q.q_id, q.c_id, q.s, b.m,
                   CAST(sum((q.x - b.x) * (q.x - b.x)) AS BIGINT) AS d
            FROM qsx q JOIN rb{_PQK_ROUNDS} b
              ON q.s = b.s AND q.spos = b.spos
            GROUP BY q.q_id, q.c_id, q.s, b.m
        ),
        radc AS (
            SELECT p.q_id, na.vec_id AS n_id,
                   CAST(sum(rdt.d) AS BIGINT) AS adc_micro
            FROM probes p
            JOIN afin na ON na.c_id = p.c_id AND na.vec_id <> p.q_id
            JOIN rcodes cd ON cd.vec_id = na.vec_id
            JOIN rdt ON rdt.q_id = p.q_id AND rdt.c_id = p.c_id
                    AND rdt.s = cd.s AND rdt.m = cd.m
            GROUP BY p.q_id, na.vec_id
        )
        SELECT q_id, n_id, adc_micro, rk FROM (
            SELECT q_id, n_id, adc_micro,
                   CAST(row_number() OVER (PARTITION BY q_id
                                           ORDER BY adc_micro, n_id)
                        AS BIGINT) AS rk
            FROM radc
        ) WHERE rk <= {_IVF_K}
    """))
    return "".join(parts)


@register(
    "ivf_pq_residual_adc_topk",
    oracle=_ivf_pq_residual_oracle(),
    tags=("similarity", "ivf", "clustering"),
)
def ivf_pq_residual_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC proper (Jégou et al. 2011 §IV.A): PQ encodes the
    RESIDUAL x − centroid(assign(x)) rather than the raw vector —
    residuals across all clusters share one codebook whose cells then
    describe displacement-from-centroid, which is why FAISS's IVFxPQy
    defaults to residual encoding (raw-vector PQ wastes codebook
    resolution re-describing coarse structure the IVF already
    captured).  The price is a PER-(query, probed-cluster) distance
    table — the query's residual differs in every probed cluster —
    which is exactly how the paper's ADC works and still
    control-plane-sized: queries × nprobe × S × M entries, broadcast.

    Engine-exactness end to end: residuals are differences of integer
    micro-coordinates (signed, but only squared — no shift semantics
    to diverge), codebooks train with the same grouped integer Lloyd
    as ivf_pq_kmeans_adc_topk (init = first {_PQK_CODES} vectors'
    RESIDUAL subvectors), and the oracle replays coarse training,
    residualization, codebook rounds, and the cluster-dependent
    tables verbatim.  Scale: one broadcast-centroid join produces
    residuals map-side; training/encode/search shapes match the
    non-residual entry (driver-held books, probed-cluster semi-join,
    (q,n)-keyed integer ADC sum)."""
    from kcidb_spark.operators.clustering import _int_array_sql
    from kcidb_spark.operators.ivf import (
        adc_topk,
        d2_int,
        inrow_coarse_sql,
        inrow_codes_sql,
        route_int_driver,
        subvectors,
    )

    emb = table(spark, sf_dir, "embeddings", spread=True)
    quant = (
        "transform(cast(embedding as array<double>),"
        f" x -> cast(floor((x + 1.0D) * {_KM_SCALE}.0D) as bigint))"
    )
    vecs_plan = emb.select(
        F.col("vec_id").alias("id"), F.expr(quant).alias("q")
    )

    def _res_subs(vecs, cents_t):
        # Codebooks train on RESIDUAL subvectors: in-row coarse argmin
        # + CASE centroid dispatch, one projection (guide §2.4).
        case = (
            "CASE c_id "
            + " ".join(
                f"WHEN {int(c_id)} THEN {_int_array_sql(cq)}"
                for c_id, cq in cents_t
            )
            + " END"
        ) if cents_t else "cast(null as array<bigint>)"
        res_t = vecs.withColumn(
            "c_id", F.expr(inrow_coarse_sql(cents_t))
        ).select(
            "id", "c_id",
            F.expr(f"zip_with(q, {case}, (a, b) -> a - b)").alias("r"),
        )
        return subvectors(res_t, ("id",), "r", _PQK_SUBS, _PQK_SUBDIM)

    # Coarse model shared with the non-residual entry (space "raw");
    # books are residual-space.  Train-once per session.
    cents, books = _pqk_model_trained(
        spark, sf_dir, vecs_plan, _res_subs, b_space="res",
    )
    # Driver-side routing + the per-(query, probed-cluster) RESIDUAL
    # distance tables (IVFADC — the query's residual differs in every
    # probed cluster): one pruned collect, exact integer math; still
    # queries × nprobe × S × M rows, control-plane-sized.
    qrows = [
        (int(r["id"]), [int(x) for x in r["q"]])
        for r in vecs_plan.filter(
            F.col("id") < _IVF_QUERIES
        ).collect()
    ]
    probe_pairs = route_int_driver(qrows, cents, _KM_NPROBE)
    cmap = {int(c): list(cq) for c, cq in cents}
    qmap = dict(qrows)
    dtrows = []
    for qid, c in probe_pairs:
        rq = [a - b for a, b in zip(qmap[qid], cmap[c])]
        for s, m, bq in books:
            s = int(s)
            if not (0 <= s < _PQK_SUBS):
                continue
            sub = rq[s * _PQK_SUBDIM:(s + 1) * _PQK_SUBDIM]
            dtrows.append((qid, c, s, int(m), d2_int(sub, bq)))
    probes = local_df(spark, probe_pairs, "q_id long, c_id bigint")
    dt = local_df(
        spark, dtrows,
        "q_id long, c_id bigint, s bigint, m bigint, d bigint",
    )
    # Corpus residuals fully MAP-SIDE (guide §2.4): the coarse argmin
    # is the in-row literal expression and the assigned centroid is a
    # CASE dispatch on it — one projection, no assignment exchange.
    cq_case = (
        (
            "CASE c_id "
            + " ".join(
                f"WHEN {int(c_id)} THEN {_int_array_sql(cq)}"
                for c_id, cq in cents
            )
            + " END"
        )
        if cents
        # Empty model (empty corpus alongside): a branchless CASE is a
        # parse error — a typed NULL keeps the plan analyzable and the
        # zero input rows produce the same empty result.
        else "cast(null as array<bigint>)"
    )
    res = vecs_plan.withColumn(
        "c_id", F.expr(inrow_coarse_sql(cents))
    ).select(
        "id",
        "c_id",
        F.expr(f"zip_with(q, {cq_case}, (a, b) -> a - b)").alias("r"),
    )
    # Residual codes in-row over ``r`` — no (id, s)-keyed encode
    # exchange, no codes⋈assign join (identical rows, same argmins).
    n_codes = res.select(
        F.col("id").alias("n_id"),
        "c_id",
        F.expr(
            inrow_codes_sql(books, _PQK_SUBS, _PQK_SUBDIM, vec_col="r")
        ),
    )
    return adc_topk(
        n_codes,
        probes,
        dt,
        _IVF_K,
        dt_keys=("q_id", "c_id", "s", "m"),
    )


# --- scalar-quantized IVF (FAISS IVF,SQ8): codes are per-dim ints ---

#: SQ code grid: x ∈ [−1, 1] → floor((x+1)·128) ∈ [0, 256] — 8-ish
#: bits per dimension (vs PQ's 3 bits per SUBSPACE here; SQ is the
#: higher-fidelity / lower-compression point on the same curve).
#: 128·8192 = 2^20 aligns the dequantized code exactly onto the
#: query's fine integer grid, so the asymmetric distance is pure
#: BIGINT arithmetic.
_SQ_SCALE = 128
_SQ_UP = 8192
_SQ_NPROBE = 2


def _sq8_oracle() -> str:
    """Full replay via the dot-product identity: Σ(q−c·UP)² =
    q·q − 2·UP·(q·c) + UP²·(c·c); every dot ≤ 2^48, integer-exact in
    DuckDB's double list_dot_product, cast back to BIGINT."""
    d2_qq = (
        "CAST(list_dot_product(a.q, a.q)"
        " - 2 * list_dot_product(a.q, b.q)"
        " + list_dot_product(b.q, b.q) AS BIGINT)"
    )
    adc = (
        "CAST(list_dot_product(p.q, p.q)"
        f" - 2 * {_SQ_UP} * list_dot_product(p.q, m.c)"
        f" + {_SQ_UP} * {_SQ_UP} * list_dot_product(m.c, m.c)"
        " AS BIGINT)"
    )
    return dedent(f"""
        WITH vx AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(floor(
                       (CAST(x AS DOUBLE) + 1.0) * {_KM_SCALE}.0)
                       AS BIGINT)) AS q,
                   list_transform(embedding, x -> CAST(floor(
                       (CAST(x AS DOUBLE) + 1.0) * {_SQ_SCALE}.0)
                       AS BIGINT)) AS c
            FROM embeddings
        ),
        cents AS (SELECT vec_id AS c_id, q FROM vx
                  WHERE vec_id < {_IVF_CENTROIDS}),
        assign AS (
            SELECT vec_id, c_id, c FROM (
                SELECT a.vec_id, b.c_id, a.c,
                       row_number() OVER (
                           PARTITION BY a.vec_id
                           ORDER BY {d2_qq}, b.c_id
                       ) AS rn
                FROM vx a JOIN (SELECT c_id, q FROM cents) b ON TRUE
            ) WHERE rn = 1
        ),
        probes AS (
            SELECT vec_id AS q_id, c_id, q FROM (
                SELECT a.vec_id, b.c_id, a.q,
                       row_number() OVER (
                           PARTITION BY a.vec_id
                           ORDER BY {d2_qq}, b.c_id
                       ) AS rn
                FROM vx a JOIN (SELECT c_id, q FROM cents) b ON TRUE
                WHERE a.vec_id < {_IVF_QUERIES}
            ) WHERE rn <= {_SQ_NPROBE}
        )
        SELECT q_id, n_id, adc_d2, rk FROM (
            SELECT p.q_id, m.vec_id AS n_id, {adc} AS adc_d2,
                   CAST(row_number() OVER (
                       PARTITION BY p.q_id
                       ORDER BY {adc}, m.vec_id
                   ) AS BIGINT) AS rk
            FROM probes p
            JOIN assign m ON m.c_id = p.c_id AND m.vec_id <> p.q_id
        ) WHERE rk <= {_IVF_K}
    """)


@register(
    "ann_ivf_sq8_adc_topk",
    oracle=_sq8_oracle(),
    tags=("similarity", "ivf", "quantize"),
)
def ann_ivf_sq8_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF + SCALAR quantization (FAISS's ``IVFx,SQ8``): the corpus
    keeps one small integer PER DIMENSION (floor((x+1)·{_SQ_SCALE}) —
    ~8 bits/dim, a 4× cut vs float32) instead of PQ's per-subspace
    codeword, and search is asymmetric — the EXACT query against the
    dequantized code, no codebook table at all.  SQ8 is the
    higher-fidelity, lower-compression point on the same
    memory/recall curve as IVF-PQ; serving tiers pick it when recall
    at small k matters more than the last 4× of RAM (it is FAISS's
    default suggestion before PQ).

    Engine-exactness: the code grid divides the query grid
    ({_SQ_SCALE}·{_SQ_UP} = 2^20), so dequantization is an integer
    upscale and the ADC sum Σ(q_i − c_i·{_SQ_UP})² is BIGINT — the
    oracle replays it through the dot-product identity with every
    term ≤ 2^48 (integer-exact in a double).  Scale shape: one scan
    builds grid+codes; static broadcast centroids (the
    deterministic stand-in the ann_ivf_* family uses — the trained
    path is ann_ivf_kmeans_topk's), map-side min_by assignment,
    nprobe={_SQ_NPROBE} probes; candidates bounded by the
    probed-cluster semi-join carry only their CODES, so the
    corpus-side search reads ~64 bytes per vector where the float32
    row is 256."""
    from kcidb_spark.operators.ivf import (
        coarse_assign,
        coarse_probes,
        coarse_score,
    )

    emb = table(spark, sf_dir, "embeddings", spread=True)
    vecs = scoped_persist(
        emb.select(
            F.col("vec_id").alias("id"),
            F.expr(
                "transform(cast(embedding as array<double>),"
                f" x -> cast(floor((x + 1.0D) * {_KM_SCALE}.0D) as bigint))"
            ).alias("q"),
            F.expr(
                "transform(cast(embedding as array<double>),"
                f" x -> cast(floor((x + 1.0D) * {_SQ_SCALE}.0D) as bigint))"
            ).alias("c"),
        )
    )
    cdf = vecs.filter(F.col("id") < _IVF_CENTROIDS).select(
        F.col("id").alias("c_id"), F.col("q").alias("cq")
    )
    scored_c = coarse_score(vecs, cdf, carry=("q", "c"))
    assign = coarse_assign(scored_c, carry=("c",))
    probes = coarse_probes(scored_c, _IVF_QUERIES, _SQ_NPROBE, carry=("q",))
    adc = F.expr(
        f"aggregate(zip_with(q, c, (x, y) -> (x - y * {_SQ_UP})"
        f" * (x - y * {_SQ_UP})),"
        " cast(0 as bigint), (acc, x) -> acc + x)"
    )
    w_rank = W.partitionBy("q_id").orderBy("adc_d2", "n_id")
    return (
        assign.select(F.col("id").alias("n_id"), "c_id", "c")
        .join(F.broadcast(probes), on="c_id")
        .filter(F.col("n_id") != F.col("q_id"))
        .select("q_id", "n_id", adc.alias("adc_d2"))
        .withColumn("rk", F.row_number().over(w_rank).cast("long"))
        .filter(F.col("rk") <= _IVF_K)
        .select("q_id", "n_id", "adc_d2", "rk")
    )


# --- Matryoshka-style prefix-dim prefilter + full-dim exact rerank ---

#: Prefix dims scored in stage 1 (MRL embeddings order information
#: front-to-back, so a 16-of-64 prefix is the standard cheap filter);
#: R candidates survive to the exact full-dim rerank.
_MRL_PREFIX = 16
_MRL_R = 10


def _prefix_rerank_oracle() -> str:
    d2 = (
        "CAST(list_dot_product({a}, {a})"
        " - 2 * list_dot_product({a}, {b})"
        " + list_dot_product({b}, {b}) AS BIGINT)"
    )
    d2p = d2.format(a="q.qp", b="n.qp")
    d2f = d2.format(a="q.q", b="s1.q")
    return dedent(f"""
        WITH vx AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(floor(
                       (CAST(x AS DOUBLE) + 1.0) * {_KM_SCALE}.0)
                       AS BIGINT)) AS q
            FROM embeddings
        ),
        vp AS (SELECT vec_id, q, q[1:{_MRL_PREFIX}] AS qp FROM vx),
        stage1 AS (
            SELECT q_id, n_id, q FROM (
                SELECT q.vec_id AS q_id, n.vec_id AS n_id, n.q,
                       row_number() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY {d2p}, n.vec_id
                       ) AS rn
                FROM vp q JOIN vp n ON n.vec_id <> q.vec_id
                WHERE q.vec_id < {_IVF_QUERIES}
            ) WHERE rn <= {_MRL_R}
        )
        SELECT q_id, n_id, d2, rk FROM (
            SELECT s1.q_id, s1.n_id, {d2f} AS d2,
                   CAST(row_number() OVER (
                       PARTITION BY s1.q_id
                       ORDER BY {d2f}, s1.n_id
                   ) AS BIGINT) AS rk
            FROM stage1 s1 JOIN vx q ON q.vec_id = s1.q_id
        ) WHERE rk <= {_IVF_K}
    """)


@register(
    "ann_prefix_rerank_topk",
    oracle=_prefix_rerank_oracle(),
    tags=("similarity", "rerank"),
)
def ann_prefix_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval over prefix-truncatable (Matryoshka-style)
    embeddings: stage 1 scores every query against the corpus on the
    FIRST {_MRL_PREFIX} of 64 dimensions ({_MRL_PREFIX * 100 // 64}%
    of the arithmetic and — in a column layout that stores the prefix
    separately — of the IO), keeps the top {_MRL_R}; stage 2 reranks
    only those by EXACT full-dimension distance.  This is the
    shortlist-then-rerank pattern every serving stack runs (MRL,
    Kusupati et al. 2022 §4 use exactly this shortlist construction);
    it composes with the IVF entries (probe clusters first, prefix-
    score within them) — certified here in its pure form so the
    rerank's exactness has its own oracle.

    Engine-exactness: both stages are BIGINT squared-L2 on the
    integer grid with n_id tie-breaks.  Scale shape: the query side
    broadcasts (|Q| vectors), the corpus never shuffles for stage 1,
    and the rank-≤-{_MRL_R} filter directly over row_number lets
    Spark's WindowGroupLimit keep a per-partition top-{_MRL_R} BEFORE
    the per-query exchange — map-side top-k, the same physical shape
    as the brute-force baseline but on {_MRL_PREFIX}/64 of the
    data; stage 2 touches {_MRL_R}·|Q| rows, nothing."""
    from kcidb_spark.operators.clustering import d2_int_expr

    emb = table(spark, sf_dir, "embeddings", spread=True)
    vecs = scoped_persist(
        emb.select(
            F.col("vec_id").alias("id"),
            F.expr(
                "transform(cast(embedding as array<double>),"
                f" x -> cast(floor((x + 1.0D) * {_KM_SCALE}.0D) as bigint))"
            ).alias("q"),
        ).withColumn("qp", F.expr(f"slice(q, 1, {_MRL_PREFIX})"))
    )
    queries = vecs.filter(F.col("id") < _IVF_QUERIES).select(
        F.col("id").alias("q_id"),
        F.col("q").alias("qq"),
        F.col("qp").alias("qqp"),
    )
    w1 = W.partitionBy("q_id").orderBy("d2p", "n_id")
    stage1 = (
        vecs.crossJoin(F.broadcast(queries))
        .filter(F.col("id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("id").alias("n_id"),
            "q",
            "qq",
            F.expr(d2_int_expr("qqp", "qp")).alias("d2p"),
        )
        .withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= _MRL_R)
    )
    w2 = W.partitionBy("q_id").orderBy("d2", "n_id")
    return (
        stage1.select(
            "q_id", "n_id", F.expr(d2_int_expr("qq", "q")).alias("d2")
        )
        .withColumn("rk", F.row_number().over(w2).cast("long"))
        .filter(F.col("rk") <= _IVF_K)
        .select("q_id", "n_id", "d2", "rk")
    )


# ---------------------------------------------------------------------------
# Winnowing document fingerprints (Schleimer et al. local minima)
# ---------------------------------------------------------------------------

_WINNOW_W = 4

_NORM_SQL = "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))"


@register(
    "doc_fingerprint_winnow",
    oracle=dedent(f"""
        WITH toks AS (
            SELECT doc_id, string_split({_NORM_SQL}, ' ') AS tokens FROM documents
        ),
        hs AS (
            SELECT doc_id,
                   list_transform(
                       list_transform(generate_series(1, length(tokens) - 2),
                           i -> tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2]),
                       s -> md5(s)) AS hashes
            FROM toks
            WHERE length(tokens) >= {_WINNOW_W + 2}
        ),
        fp AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                       generate_series(1, length(hashes) - {_WINNOW_W - 1}),
                       i -> list_min(list_slice(hashes, i, i + {_WINNOW_W - 1})))) AS fps
            FROM hs
        )
        SELECT doc_id,
               CAST(length(fps) AS INTEGER) AS n_fp,
               list_min(fps) AS min_fp,
               list_max(fps) AS max_fp
        FROM fp
    """),
    tags=("dedup", "fingerprint"),
)
def doc_fingerprint_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (Schleimer et al., SIGMOD'03): hash the
    3-shingles, slide a w={_WINNOW_W} window, keep each window's min
    hash, dedup.  Near-identical documents share most fingerprints, so
    a downstream explode + groupBy(fp) finds clusters with
    bucket-sized shuffles.  Here: per-doc fingerprint-set summary, a
    pure projection (no shuffle at all).
    """
    docs = table(spark, sf_dir, "documents", spread=True)
    toks = docs.select(
        "doc_id",
        F.expr("split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ')), ' ')").alias(
            "tokens"
        ),
    ).filter(F.size("tokens") >= _WINNOW_W + 2)
    hs = toks.select(
        "doc_id",
        F.expr(
            "transform(transform(sequence(1, size(tokens) - 2),"
            " i -> concat_ws(' ', tokens[i-1], tokens[i], tokens[i+1])),"
            " s -> md5(s))"
        ).alias("hashes"),
    )
    fp = hs.select(
        "doc_id",
        F.expr(
            f"array_distinct(transform(sequence(1, size(hashes) - {_WINNOW_W - 1}),"
            f" i -> array_min(slice(hashes, i, {_WINNOW_W}))))"
        ).alias("fps"),
    )
    return fp.select(
        "doc_id",
        F.size("fps").cast("int").alias("n_fp"),
        F.array_min("fps").alias("min_fp"),
        F.array_max("fps").alias("max_fp"),
    )


# ---------------------------------------------------------------------------
# BPE-ish token counting (regex word-piece segmentation)
# ---------------------------------------------------------------------------

_BPE_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


@register(
    "token_count_bpe",
    oracle=dedent(f"""
        WITH d AS (
            SELECT source,
                   CAST(length(regexp_extract_all(lower(text), '{_BPE_RE}')) AS BIGINT)
                       AS n_pieces,
                   CAST(length(string_split_regex(trim(text), '\\s+')) AS BIGINT)
                       AS n_words
            FROM documents
        )
        SELECT source,
               count(*) AS n_docs,
               CAST(SUM(n_pieces) AS BIGINT) AS sum_pieces,
               CAST(SUM(n_words) AS BIGINT) AS sum_words,
               CAST(SUM(n_pieces) AS BIGINT) / (1.0 * CAST(SUM(n_words) AS BIGINT))
                   AS pieces_per_word
        FROM d
        GROUP BY source
    """),
    tags=("text", "tokenize"),
)
def token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-word ("BPE-ish") token counting via regex word-piece
    segmentation — letters runs / digit runs / single punctuation —
    the standard pre-tokenizer shape.  Counting uses size(regexp
    matches) per row (no explode needed), then one partial-aggregated
    group-by; the ratio is exact-int / exact-int.
    """
    docs = table(spark, sf_dir, "documents", spread=True)
    # Regex passed via the column API (F.lit), NOT an expr string —
    # Spark SQL string literals process backslash escapes, which would
    # silently corrupt the \s class.
    d = docs.select(
        "source",
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(_BPE_RE), F.lit(0)))
        .cast("long")
        .alias("n_pieces"),
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_words"),
    )
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_pieces").cast("long").alias("sum_pieces"),
        F.sum("n_words").cast("long").alias("sum_words"),
        (
            F.sum("n_pieces").cast("long") / (1.0 * F.sum("n_words").cast("long"))
        ).alias("pieces_per_word"),
    )


# ---------------------------------------------------------------------------
# T8 — tumbling event-time window aggregation (Spark-native windows)
# ---------------------------------------------------------------------------


@register(
    "t8_tumbling_window",
    oracle=dedent(f"""
        SELECT date_trunc('hour', ts) AS window_start,
               event_type,
               count(*) AS n_events,
               {oracle_int_sum('value', 100)} / 100.0 AS sum_value
        FROM events
        GROUP BY date_trunc('hour', ts), event_type
    """),
    tags=("T8", "streaming"),
)
def t8_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows (the reference has no stream
    windowing — SURVEY §2.9 T8 — this is the Spark-native extension;
    the same ``F.window`` expression drives the Structured Streaming
    ingest in streaming/ingest.py, where a watermark bounds state).
    Batch and streaming share the plan shape: partial-agg per
    partition, one exchange keyed (window, type).
    """
    from kcidb_spark.queries._exact import as_money, int_sum

    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            int_sum(F.col("value"), 100).alias("_sv"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            as_money(F.col("_sv"), 100).alias("sum_value"),
        )
    )


# ---------------------------------------------------------------------------
# W — lead/lag inter-arrival analysis (ranking/offset window frame)
# ---------------------------------------------------------------------------


@register(
    "w_lead_lag_gaps",
    oracle=dedent("""
        WITH gaps AS (
            SELECT user_id, event_id,
                   CAST(date_diff('microseconds',
                        lag(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id), ts) AS BIGINT)
                       AS gap_us
            FROM events
        )
        SELECT user_id,
               count(*) AS n_gaps,
               CAST(SUM(gap_us) AS BIGINT) AS sum_gap_us,
               CAST(min(gap_us) AS BIGINT) AS min_gap_us,
               CAST(max(gap_us) AS BIGINT) AS max_gap_us
        FROM gaps
        WHERE gap_us IS NOT NULL
        GROUP BY user_id
    """),
    tags=("W", "A"),
)
def w_lead_lag_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-arrival gaps via lag() then an exact-integer
    rollup — the offset-window shape (no frame scan, single shuffle on
    the partition key shared by the window and the group-by: Catalyst
    reuses the exchange, so the agg adds no second shuffle).
    """
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "user_id",
        "event_id",
        (
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
        ).alias("gap_us"),
    )
    return (
        gaps.filter(F.col("gap_us").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.sum("gap_us").cast("long").alias("sum_gap_us"),
            F.min("gap_us").cast("long").alias("min_gap_us"),
            F.max("gap_us").cast("long").alias("max_gap_us"),
        )
    )


# ---------------------------------------------------------------------------
# Dedup clustering: connected components over LSH candidate pairs
# ---------------------------------------------------------------------------

_CAND_SQL = (
    "toks AS (SELECT doc_id, string_split(" + _NORM_SQL + ", ' ') AS tokens FROM documents),\n"
    "sh AS (SELECT doc_id, list_transform(generate_series(1, length(tokens) - 2),"
    " i -> tokens[i] || ' ' || tokens[i + 1] || ' ' || tokens[i + 2]) AS shingles"
    " FROM toks WHERE length(tokens) >= 3),\n"
    "sig AS (SELECT doc_id, "
    + ", ".join(
        f"list_min(list_transform(shingles, s -> md5('{s}:' || s))) AS h{s}"
        for s in range(8)
    )
    + " FROM sh),\n"
    "bands AS ("
    "SELECT doc_id, 0 AS band, md5(h0 || '|' || h1 || '|' || h2 || '|' || h3) AS key FROM sig"
    " UNION ALL "
    "SELECT doc_id, 1 AS band, md5(h4 || '|' || h5 || '|' || h6 || '|' || h7) AS key FROM sig),\n"
    "cand AS (SELECT DISTINCT l.doc_id AS a, r.doc_id AS b"
    " FROM bands l JOIN bands r ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id)"
)


@register(
    "dedup_cluster_components",
    oracle=dedent(f"""
        WITH RECURSIVE {_CAND_SQL},
        edges AS (
            SELECT a AS u, b AS v FROM cand
            UNION
            SELECT b AS u, a AS v FROM cand
        ),
        nodes AS (SELECT DISTINCT u AS node FROM edges),
        reach(node, r) AS (
            SELECT node, node FROM nodes
            UNION
            SELECT e.v, reach.r FROM reach JOIN edges e ON e.u = reach.node
        ),
        comp AS (SELECT node, min(r) AS cluster FROM reach GROUP BY node)
        SELECT cluster AS cluster_id,
               count(*) AS n_members,
               min(node) AS keeper_id,
               max(node) AS max_member
        FROM comp
        GROUP BY cluster
    """),
    tags=("dedup", "components", "iterative"),
)
def dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters = connected components over the MinHash-LSH
    candidate graph; keeper = min id per component (deterministic).
    Iterative min-label propagation in Spark (O(diameter) rounds of
    join+min — see operators/components.py); the oracle replays the
    same fixpoint as a DuckDB recursive CTE, so even this iterative
    operator stays hash-verified.
    """
    from kcidb_spark.operators.components import (
        cluster_summary,
        connected_components,
    )
    from kcidb_spark.operators.dedup import lsh_candidate_pairs, minhash_signatures

    docs = table(spark, sf_dir, "documents", spread=True)
    sig = scoped_persist(minhash_signatures(docs, n_hashes=8))
    pairs = scoped_persist(lsh_candidate_pairs(sig, n_hashes=8, n_bands=2))
    return cluster_summary(connected_components(pairs))


@register(
    "split_leakage_safe",
    oracle=dedent(f"""
        WITH RECURSIVE {_CAND_SQL},
        edges AS (
            SELECT a AS u, b AS v FROM cand
            UNION
            SELECT b AS u, a AS v FROM cand
        ),
        nodes AS (SELECT DISTINCT u AS node FROM edges),
        reach(node, r) AS (
            SELECT node, node FROM nodes
            UNION
            SELECT e.v, reach.r FROM reach JOIN edges e ON e.u = reach.node
        ),
        comp AS (SELECT node, min(r) AS cluster FROM reach GROUP BY node)
        SELECT d.doc_id,
               coalesce(c.cluster, d.doc_id) AS cluster_id,
               CASE WHEN substring(md5('split:' ||
                        CAST(coalesce(c.cluster, d.doc_id) AS VARCHAR)),
                        1, 1) < 'c'
                    THEN 'train' ELSE 'val' END AS split
        FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
    """),
    tags=("pipeline", "sampling", "components"),
)
def split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val split WITHOUT near-duplicate leakage: hash-splitting
    individual documents puts ~2·p·(1−p) of every near-dup pair across
    the train/val boundary — the quiet eval contamination every large
    corpus ships with — so the split key here is the document's
    near-dup CLUSTER representative (min doc_id of its LSH connected
    component, singletons = themselves), making whole components land
    on one side (~75/25 via the md5 first-hex rule of sample_by_hash).
    Composition of certified parts: the LSH candidate graph + min-label
    components of dedup_cluster_components, then one join back to the
    corpus — left to AQE unhinted because the component table is
    corpus-proportional in the worst case (a near-dup-heavy crawl),
    not broadcast-sized.  tests/test_components.py pins the invariant
    the hash can't state: no candidate pair ever straddles splits."""
    from kcidb_spark.operators.components import connected_components
    from kcidb_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = table(spark, sf_dir, "documents", spread=True)
    sig = scoped_persist(minhash_signatures(docs, n_hashes=8))
    pairs = scoped_persist(lsh_candidate_pairs(sig, n_hashes=8, n_bands=2))
    comp = connected_components(pairs)
    rep = F.coalesce(F.col("cluster"), F.col("doc_id"))
    return (
        docs.select("doc_id")
        .join(comp, docs.doc_id == comp.node, "left")
        .select(
            "doc_id",
            rep.alias("cluster_id"),
            F.when(
                F.substring(
                    F.md5(F.concat(F.lit("split:"), rep.cast("string"))),
                    1,
                    1,
                )
                < "c",
                F.lit("train"),
            )
            .otherwise(F.lit("val"))
            .alias("split"),
        )
    )


# ---------------------------------------------------------------------------
# A15 — exact per-group quantiles (beyond the reference; SURVEY §2.4)
# ---------------------------------------------------------------------------


@register(
    "a15_exact_quantiles",
    oracle=dedent("""
        SELECT o_orderpriority,
               count(*) AS n_orders,
               quantile_cont(o_totalprice, 0.25) AS p25,
               quantile_cont(o_totalprice, 0.50) AS p50,
               quantile_cont(o_totalprice, 0.95) AS p95
        FROM orders
        GROUP BY o_orderpriority
    """),
    tags=("A", "quantile"),
)
def a15_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quantiles per group — Spark ``percentile``
    and DuckDB ``quantile_cont`` share the lower + (upper−lower)·frac
    formula over doubles, so results are bit-identical (probed before
    registering).

    Scale note: exact quantiles concentrate each group's values on
    one reducer — acceptable for bounded-cardinality groups like the
    5 priorities; for high-cardinality groups at 100 TB swap in
    ``approx_percentile`` (identical call shape, mergeable sketch).
    """
    orders = table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.expr("percentile(o_totalprice, 0.25)").alias("p25"),
        F.expr("percentile(o_totalprice, 0.50)").alias("p50"),
        F.expr("percentile(o_totalprice, 0.95)").alias("p95"),
    )


@register(
    "o6_topk_per_group",
    oracle=dedent("""
        WITH ranked AS (
            SELECT o_orderpriority, o_orderkey, o_totalprice,
                   row_number() OVER (
                       PARTITION BY o_orderpriority
                       ORDER BY o_totalprice DESC, o_orderkey
                   ) AS rn
            FROM orders
        )
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               CAST(rn AS INTEGER) AS rn
        FROM ranked
        WHERE rn <= 3
    """),
    tags=("O", "W", "topk"),
)
def o6_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by price per priority — the rank-filter shape.
    Catalyst rewrites the row_number ≤ k filter into WindowGroupLimit
    (plan-asserted): each partition keeps a k-row heap map-side before
    the window shuffle, so the exchange carries ≤ k·partitions rows
    per group instead of every row — the difference between a top-k
    and a full per-group sort at 100 TB.  Tie-break on o_orderkey
    keeps both engines deterministic.
    """
    orders = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )
