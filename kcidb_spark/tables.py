"""Parquet table catalog over the driver-provided synthetic tables.

Every reader goes through ``table()`` so filters/projections applied by
callers reach the parquet scan (Catalyst pushes them down — verify with
``df.explain("formatted")``: look for PushedFilters / ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: All driver-provided tables (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables small enough to always broadcast at any scale factor.
#: region/nation are bounded by geography (25 nations, 5 regions) even at
#: 100 TB; broadcasting them removes a shuffle from every join they touch.
BROADCAST_TABLES = frozenset({"region", "nation"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table(spark: SparkSession, sf_dir: str, name: str,
          spread: bool = False) -> DataFrame:
    """Read one synthetic table as a DataFrame (lazy parquet scan).

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects; read it as a long and convert to a
    microsecond timestamp (floor semantics — matching how DuckDB
    truncates nanos to its microsecond TIMESTAMP).

    ``spread=True`` is for per-row-CPU-heavy consumers (hashing,
    shingling, vector math): if the scan would yield fewer splits than
    cores (parquet can't split inside a row group, so a small file is
    ONE task no matter what), repartition up to the default
    parallelism.  The split estimate is file-size / maxPartitionBytes
    — pure metadata, no JVM round-trip.  On a real cluster input
    splits ≫ cores, so the guard makes it a no-op and the 100 TB plan
    stays shuffle-free.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        df = _normalize_ts(_events_raw(spark, path))
    else:
        df = spark.read.parquet(path)
    if spread:
        target = spark.sparkContext.defaultParallelism
        est_splits = max(1, os.path.getsize(path) // _max_partition_bytes(spark))
        if est_splits < target:
            df = df.repartition(target)
    return df


#: path → "nanos" | "other"; the footer type of a generated table never
#: changes within a run, so sniff once per path (a pure pyarrow
#: footer read, no JVM round-trip) instead of per query.
_TS_LAYOUT_CACHE: dict[str, str] = {}


def _events_ts_layout(path: str) -> str:
    """On-disk layout of ``events.ts``: "nanos" needs the
    ``nanosAsLong`` legacy conf (Spark's vectorized reader rejects
    parquet TIMESTAMP(NANOS)); anything else reads directly."""
    layout = _TS_LAYOUT_CACHE.get(path)
    if layout is None:
        import pyarrow.parquet as pq

        f = path
        if os.path.isdir(path):  # multi-file dataset: footer of any part
            parts = [p for p in sorted(os.listdir(path)) if p.endswith(".parquet")]
            f = os.path.join(path, parts[0]) if parts else path
        ts_type = pq.ParquetFile(f).schema_arrow.field("ts").type
        layout = "nanos" if getattr(ts_type, "unit", None) == "ns" else "other"
        _TS_LAYOUT_CACHE[path] = layout
    return layout


def _events_raw(spark: SparkSession, path: str):
    """Raw events scan, tolerant of either on-disk ``ts`` encoding.

    Testdata generations have shipped ``ts`` as parquet TIMESTAMP(NANOS)
    (unreadable by the vectorized reader → read as long via
    ``nanosAsLong``) and as TIMESTAMP(MICROS) (reads directly as
    TIMESTAMP_NTZ).  Dispatch on the cached footer type so both work;
    the legacy conf is only touched when the nanos layout demands it.
    """
    if _events_ts_layout(path) == "nanos":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(path)


def _normalize_ts(raw: DataFrame) -> DataFrame:
    """``ts`` → TimestampType, whatever the on-disk encoding was.

    Long (nanos-as-long) → microsecond timestamp with floor semantics
    (matching DuckDB's nanos→micros truncation); TIMESTAMP_NTZ →
    cast to session-TZ (UTC) timestamp so downstream schemas stay
    TimestampType either way.  The cast is exact: session TZ is pinned
    to UTC in `get_spark`, so NTZ wall-clock == UTC instant.
    """
    import pyspark.sql.types as T
    from pyspark.sql import functions as F

    ts_type = raw.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(ts_type, T.TimestampNTZType):
        return raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def events_in_window(
    spark: SparkSession,
    sf_dir: str,
    after: "datetime.datetime | None" = None,
    until: "datetime.datetime | None" = None,
) -> DataFrame:
    """events with an ``(after, until]`` window applied to the RAW
    nanos column — BEFORE the timestamp conversion — so the predicate
    reaches the parquet scan (``PushedFilters: GreaterThan(ts, …)``).
    A filter on the converted column cannot be pushed through the
    ``timestamp_micros`` expression and degrades to a full scan — at
    100 TB that is the difference between reading one time partition
    and reading everything.

    Bound equivalence holds because the data and the bounds are whole
    microseconds (nanos are micros·1000), so ``ts_ns > after_us·1000``
    ⟺ ``ts_us > after_us``.
    """
    import datetime as _dt

    import pyspark.sql.types as T
    from pyspark.sql import functions as F

    raw = _events_raw(spark, os.path.join(sf_dir, "events.parquet"))
    ts_is_long = isinstance(raw.schema["ts"].dataType, T.LongType)

    def bound(dt: _dt.datetime):
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=_dt.timezone.utc)
        if ts_is_long:  # raw nanos-as-long column
            return F.lit(int(dt.timestamp() * 1_000_000) * 1000)
        # TIMESTAMP_NTZ column: compare against an NTZ literal of the
        # same UTC wall clock — stays a plain pushdown-able comparison.
        # Built from the ISO string, NOT F.lit(naive): a naive datetime
        # literal round-trips through the driver OS local timezone
        # (TimestampType.toInternal uses time.mktime), shifting the
        # bound by the OS offset on any non-UTC driver.
        naive = dt.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return F.lit(naive.isoformat(sep=" ")).cast("timestamp_ntz")

    if after is not None:
        raw = raw.filter(F.col("ts") > bound(after))
    if until is not None:
        raw = raw.filter(F.col("ts") <= bound(until))
    return _normalize_ts(raw)


_SIZE_SUFFIXES = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30}


def _max_partition_bytes(spark: SparkSession) -> int:
    """spark.sql.files.maxPartitionBytes as an int (handles 128m etc.)."""
    raw = str(spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728"))
    s = raw.strip().lower().removesuffix("b")
    mult = _SIZE_SUFFIXES.get(s[-1:], 1)
    if mult > 1:
        s = s[:-1]
    try:
        return max(1, int(s) * mult)
    except ValueError:
        return 134217728


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL surface."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
