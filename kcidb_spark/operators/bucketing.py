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


def write_fingerprint_index(
    df: DataFrame,
    path: str,
    key: str = "th",
    rows_per_file: int = 1_000_000,
) -> None:
    """Persist a fingerprint index as parquet with a FOOTER BLOOM
    FILTER on the key column, RANGE-partitioned by the key.  This is
    what makes "index scan bytes drop" literal for small probes: a
    pushed equality/IN predicate is tested against each row group's
    min/max (narrow, because files are key-ranged) and then its bloom
    before any page is read, so a probe key absent from a row group
    skips it entirely — the 100 TB incremental-dedup index answers a
    small day batch by reading the few row groups whose blooms fire,
    not the index.

    Sizing matters (measured): the bloom's ``expected.ndv`` must be
    the PER-FILE row count — a corpus-level ndv implies a bloom larger
    than parquet's ``bloom.filter.max.bytes`` cap and parquet silently
    writes NO bloom at all, which reads as "blooms don't work".  The
    one extra count() here is write-time-only and prices the layout
    correctly."""
    n = df.count()
    n_files = max(1, -(-n // rows_per_file))
    (
        df.repartitionByRange(n_files, key)
        .write.mode("overwrite")
        .option(f"parquet.bloom.filter.enabled#{key}", "true")
        .option(f"parquet.bloom.filter.expected.ndv#{key}", str(rows_per_file))
        .option("parquet.bloom.filter.max.bytes", str(4 * 1024 * 1024))
        .parquet(path)
    )


_IN_THRESHOLD_CONF = "spark.sql.parquet.pushdown.inFilterThreshold"


def probe_index_hits(
    spark: SparkSession,
    index_path: str,
    keys: Sequence,
    key: str = "th",
    index_filter=None,
) -> DataFrame:
    """LAZY index scan filtered to the literal key list — the plan
    carries ``PushedFilters: [In(th, …)]`` so parquet tests every
    row group's stats and footer bloom before reading a page.  The
    pushdown is only effective while ``_IN_THRESHOLD_CONF`` covers
    ``len(keys)`` AT EXECUTION time (the conf is read when the scan is
    planned, i.e. at the action, not when this frame is built) —
    :func:`probe_index_new_keys` executes it inside that window."""
    from pyspark.sql import functions as F

    index = spark.read.parquet(index_path)
    if index_filter is not None:
        # Composes with the pushed IN: a PARTITION-column predicate
        # (e.g. batch_id < N for the transactional ingest) prunes
        # whole directories before any footer is touched.
        index = index.filter(index_filter)
    return index.filter(F.col(key).isin(list(keys))).select(key).distinct()


#: Largest key list inlined as a pushed IN predicate.  Bounded by the
#: JVM, not by taste: parquet-mr expands an N-value IN into a
#: left-deep Or tree and evaluates it by recursive visitor, so filter
#: depth ≈ N stack frames per row group — on the default ~1 MB task
#: thread stack the overflow point measures at ~1.0–1.2k values
#: (reproduced: 1,000 evaluates, 1,250 throws StackOverflowError
#: inside the scan).  512 keeps 2× headroom for whatever stack the
#: task already spent; bigger probes take the broadcast-semi path,
#: which prunes post-scan and has no depth anywhere.
_MAX_INLIST = 512


def probe_index_new_keys(
    spark: SparkSession,
    index_path: str,
    day: DataFrame,
    key: str = "th",
    max_inlist: int = _MAX_INLIST,
    index_filter=None,
) -> DataFrame:
    """Day-batch rows whose ``key`` is ABSENT from the stored index —
    the incremental-ingest dedup core, with the probe pushed INTO the
    index scan when the day key set is small enough to inline:

    * ≤ ``max_inlist`` distinct keys → the keys are collected and the
      index scan gets a literal IN predicate (``PushedFilters:
      [In(th, …)]``), which parquet evaluates against row-group
      stats and the footer blooms written by
      :func:`write_fingerprint_index` — row groups with no probe key
      are never read.  ``spark.sql.parquet.pushdown.inFilterThreshold``
      must cover ``max_inlist`` while that scan RUNS (above it Spark
      degrades the pushed IN to a min/max range, which a hash keyspace
      never prunes — measured, full index read), so the probe is
      executed EAGERLY here, inside a save/restore window around the
      session conf (a lazy return would read the restored — too low —
      threshold at action time and silently lose the pushdown; and
      without the restore every later scan in the session would
      inherit a 10k-entry IN-pushdown threshold).  The collected hit
      set is ≤ the probe set (≤ ``max_inlist`` keys) by construction,
      so the eager step is bounded driver state, and the returned
      frame is a map-side literal filter on the day batch — no join,
      no shuffle;
    * larger probes → lazy broadcast LEFT SEMI pre-filter (the exact
      zero-false-positive bloom of queries/mixing.dedup_incremental),
      which prunes post-scan instead of at the scan.

    Either way the result is identical to the plain anti-join
    (including null-key day rows, which an anti-join keeps).

    ``index_filter``: optional predicate applied to the index scan
    before probing — a partition-column predicate (batch_id < N)
    prunes directories at listing time, which is how the
    transactional ingest replays batch N against exactly the batches
    that preceded it.
    """
    from pyspark.sql import functions as F

    keys_df = day.select(key).distinct()
    keys = [r[0] for r in keys_df.limit(max_inlist + 1).collect()]
    if len(keys) <= max_inlist:
        prior = spark.conf.get(_IN_THRESHOLD_CONF)
        try:
            if int(prior) < max_inlist:
                spark.conf.set(_IN_THRESHOLD_CONF, str(max_inlist))
            hit_keys = [
                r[0]
                for r in probe_index_hits(
                    spark, index_path, keys, key, index_filter
                ).collect()
            ]
        finally:
            spark.conf.set(_IN_THRESHOLD_CONF, prior)
        if not hit_keys:
            return day
        # Anti-join parity: null keys never match, so they survive.
        return day.filter(
            F.col(key).isNull() | ~F.col(key).isin(hit_keys)
        )
    index = spark.read.parquet(index_path)
    if index_filter is not None:
        index = index.filter(index_filter)
    hits = (
        index
        .join(F.broadcast(keys_df), on=key, how="left_semi")
        .select(key).distinct()
    )
    return day.join(hits, on=key, how="left_anti")
