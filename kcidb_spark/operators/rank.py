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

    The input is scoped-persisted: it fans out to three consumers
    (the stats aggregate, the bucket counts, and the ranked output),
    and the caller's upstream is typically an expensive projection
    (tokenize / score) that must not re-run per consumer.
    """
    from kcidb_spark.cache import scoped_persist

    df = scoped_persist(df)
    stats = df.groupBy(stratum_col).agg(
        F.min(score_col).alias("_kmin"),
        F.max(score_col).alias("_kmax"),
        F.count(F.lit(1)).alias(cnt_col),
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
