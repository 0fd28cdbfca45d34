"""Distributed per-stratum exact rank (row_number without the wall).

The naive per-stratum gate —

    row_number() OVER (PARTITION BY lang ORDER BY score, doc_id)

— hash-shuffles EVERY row of a stratum to ONE reducer, which sorts the
whole stratum.  With ~100s of language values (or ~5 sources) that is
invisible at rehearsal scale, but on a real crawl where one language
is half of 10^10-10^11 documents the biggest partition is a multi-TB
single-task sort-and-spill: the same trap :mod:`operators.scan`'s
docstring calls "the single worst scale trap in window-function code",
solved there for cumsum.  This module applies the identical two-phase
construction to exact ranking:

1. per-stratum ``(min, max, count)`` of the integer score — a partial
   aggregate producing ≤ |strata| rows, broadcast back;
2. bucket each row by score range *in rank order* (descending ranks
   bucket on ``kmax − score``) — a pure projection, no sampling, no
   nondeterminism;
3. per-(stratum, bucket) counts (≤ |strata|·P rows) get a prefix sum
   in one tiny window — P is the only sequential domain per stratum;
4. in-bucket ``row_number`` PARTITIONED by (stratum, bucket) — each
   task sorts one bucket, never a stratum — plus the broadcast bucket
   offset gives the exact global per-stratum rank.

Rank semantics are IDENTICAL to the single-window form: bucketing is
monotone in the score (equal scores share a bucket, so the tie-break
column decides order inside one in-bucket window), and every quantity
is integer, so results are deterministic under any physical ordering.

Cost: two partial-agg shuffles of tiny outputs + one exchange on
(stratum, bucket) — versus one exchange on stratum for the naive form
— but max task input drops from |largest stratum| to |largest
stratum| / P.  Degenerate case, documented honestly: a stratum whose
score key has a single value (kmax == kmin) collapses to one bucket
and re-inherits the old shape for that stratum; the call sites all
rank micro-bit scores (or per-document lengths), where a total tie
across a billion-row stratum does not occur.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def stratified_row_number(
    df: DataFrame,
    stratum_col: str,
    score_col: str,
    *,
    descending: bool = False,
    tiebreak_col: str = "doc_id",
    rk_col: str = "rk",
    cnt_col: str = "cnt",
    n_buckets: int = 1024,
) -> DataFrame:
    """Append ``rk_col`` = row_number() over (PARTITION BY stratum
    ORDER BY score [DESC], tiebreak) and ``cnt_col`` = count(*) over
    (PARTITION BY stratum) — both BIGINT — without ever sorting a
    whole stratum in one task.

    ``score_col`` must be an integral type (the bucket projection is
    integer range arithmetic); ``tiebreak_col`` must make the order
    total within a stratum for the rank to be engine-deterministic.

    The input is scoped-persisted and the per-stratum stats are
    computed by an EAGER collect: the frame fans out to three
    consumers (stats, bucket counts, the ranked output) whose
    broadcast subtrees would otherwise race to compute the caller's
    upstream (typically an expensive tokenize/score) before the cache
    fills — the collect serializes the fill, and the ≤|strata|-row
    result is control-plane-sized (the same contract that already
    bounds the counts table and the offset broadcast: stratum
    cardinality is languages/sources, not documents).
    """
    from kcidb_spark.cache import scoped_persist

    spark = df.sparkSession
    df = scoped_persist(df)
    stat_rows = (
        df.groupBy(stratum_col)
        .agg(
            F.min(score_col).alias("_kmin"),
            F.max(score_col).alias("_kmax"),
            F.count(F.lit(1)).alias(cnt_col),
        )
        .collect()
    )
    stats = spark.createDataFrame(
        [
            (r[stratum_col], int(r["_kmin"]), int(r["_kmax"]), int(r[cnt_col]))
            for r in stat_rows
        ],
        df.select(stratum_col).schema.add("_kmin", "long")
        .add("_kmax", "long").add(cnt_col, "long"),
    )
    pos = (
        (F.col("_kmax") - F.col(score_col))
        if descending
        else (F.col(score_col) - F.col("_kmin"))
    )
    bucketed = (
        df.join(F.broadcast(stats), stratum_col)
        .withColumn(
            "_bkt",
            F.floor(
                pos * n_buckets / (F.col("_kmax") - F.col("_kmin") + 1)
            ).cast("long"),
        )
        .drop("_kmin", "_kmax")
    )
    counts = bucketed.groupBy(stratum_col, "_bkt").agg(
        F.count(F.lit(1)).alias("_bcnt")
    )
    w_pfx = (
        W.partitionBy(stratum_col)
        .orderBy("_bkt")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    offsets = counts.select(
        stratum_col,
        "_bkt",
        (F.sum("_bcnt").over(w_pfx) - F.col("_bcnt")).alias("_off"),
    )
    order = F.desc(score_col) if descending else F.asc(score_col)
    w_in = W.partitionBy(stratum_col, "_bkt").orderBy(order, tiebreak_col)
    return (
        bucketed.join(F.broadcast(offsets), [stratum_col, "_bkt"])
        .withColumn(
            rk_col,
            (F.col("_off") + F.row_number().over(w_in)).cast("long"),
        )
        .drop("_bkt", "_off")
    )


def stratified_drop_leading(
    df: DataFrame,
    stratum_col: str,
    score_col: str,
    *,
    den: int,
    descending: bool = False,
    tiebreak_col: str = "doc_id",
    n_buckets: int = 1024,
) -> DataFrame:
    """Drop each stratum's FIRST ⌊cnt/den⌋ rows in (score [DESC],
    tiebreak) order — the fraction gate — without ranking the
    survivors at all.

    When the caller doesn't need a rank column (the composed
    pipelines filter and immediately drop it), the full distributed
    rank is overkill: only ONE bucket per stratum straddles the
    boundary rank k* = cnt div den, so every other bucket passes or
    drops WHOLESALE on its broadcast prefix offset — a map-side
    filter with NO exchange on the data path — and only the straddle
    bucket's rows (≈ |stratum|/P) are exactly ranked for the
    deterministic tie-break at the boundary.  This is the cheapest
    correct shape at any scale: the big frame never shuffles, the
    per-bucket counts are the only aggregation, and the straddle
    window's task input is bucket-sized.  Results are row-identical
    to filtering ``rk > cnt div den`` on
    :func:`stratified_row_number` (pinned in tests/test_rank.py).
    """
    from kcidb_spark.cache import scoped_persist

    spark = df.sparkSession
    df = scoped_persist(df)
    stat_rows = (
        df.groupBy(stratum_col)
        .agg(
            F.min(score_col).alias("_kmin"),
            F.max(score_col).alias("_kmax"),
            F.count(F.lit(1)).alias("_cnt"),
        )
        .collect()
    )
    stats = spark.createDataFrame(
        [
            (
                r[stratum_col],
                int(r["_kmin"]),
                int(r["_kmax"]),
                int(r["_cnt"]) // den,
            )
            for r in stat_rows
        ],
        df.select(stratum_col).schema.add("_kmin", "long")
        .add("_kmax", "long").add("_kstar", "long"),
    )
    pos = (
        (F.col("_kmax") - F.col(score_col))
        if descending
        else (F.col(score_col) - F.col("_kmin"))
    )
    bucketed = (
        df.join(F.broadcast(stats), stratum_col)
        .withColumn(
            "_bkt",
            F.floor(
                pos * n_buckets / (F.col("_kmax") - F.col("_kmin") + 1)
            ).cast("long"),
        )
        .drop("_kmin", "_kmax")
    )
    counts = bucketed.groupBy(stratum_col, "_bkt").agg(
        F.count(F.lit(1)).alias("_bcnt")
    )
    w_pfx = (
        W.partitionBy(stratum_col)
        .orderBy("_bkt")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    offsets = counts.select(
        stratum_col,
        "_bkt",
        "_bcnt",
        (F.sum("_bcnt").over(w_pfx) - F.col("_bcnt")).alias("_off"),
    )
    j = bucketed.join(F.broadcast(offsets), [stratum_col, "_bkt"])
    passed = j.filter(F.col("_off") >= F.col("_kstar"))
    straddle = j.filter(
        (F.col("_off") < F.col("_kstar"))
        & (F.col("_off") + F.col("_bcnt") > F.col("_kstar"))
    )
    order = F.desc(score_col) if descending else F.asc(score_col)
    w_in = W.partitionBy(stratum_col, "_bkt").orderBy(order, tiebreak_col)
    kept_straddle = (
        straddle.withColumn("_rn", F.row_number().over(w_in))
        .filter(F.col("_off") + F.col("_rn") > F.col("_kstar"))
        .drop("_rn")
    )
    return passed.unionByName(kept_straddle).drop(
        "_bkt", "_bcnt", "_off", "_kstar"
    )
