"""Bucketed (co-located) joins: the pre-shuffle that pays for itself.

At 100 TB the dominant cost of a fact⋈fact join is shuffling both
sides on the key.  Writing both tables bucketed on that key moves the
shuffle to WRITE time, once; every subsequent join reads co-located
buckets and the plan contains NO Exchange on either side (verified by
tests/test_skew_bucketing.py against the physical plan).

Rules that make this work (and that the helpers enforce):
* both sides bucketed by the SAME columns into the SAME bucket count;
* read via the catalog (``spark.table``) — bucket metadata lives in
  the table definition, a bare ``spark.read.parquet`` forgets it;
* ``spark.sql.sources.bucketing.enabled`` on (default).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    keys: Sequence[str],
    n_buckets: int = 32,
    sort_by: Sequence[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) catalog
    table.  Sorting within buckets additionally removes the Sort from
    later sort-merge joins."""
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *keys)
    )
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(name)


def bucketed_join(
    spark: SparkSession,
    left_name: str,
    right_name: str,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed catalog tables on their bucket keys — reads
    co-located buckets, no shuffle on either side."""
    return spark.table(left_name).join(spark.table(right_name), on=list(on), how=how)
