"""Auxiliary store drivers + maintenance jobs, mirroring the
reference's driver registry (kcidb/db/__init__.py:47-54):

* :class:`NullStore` — the ``null`` driver (kcidb/db/null.py:9-253):
  accepts and validates every load, answers every query empty.
* :class:`MuxStore` — the ``mux`` driver (kcidb/db/mux.py:11-518):
  fans every load out to all member stores, delegates queries to the
  first.  (The reference's schema-version lattice is unnecessary here:
  all members speak the one v5.3 Spark schema.)
* :func:`json_store` — the ``json`` driver (kcidb/db/json.py:9-48):
  a throwaway store pre-loaded from an I/O JSON report.
* :func:`archive` — the archive job (main.py:422-569): windowed
  incremental copy from an operational store to an archive store,
  sliced into bounded time chunks under an optional deadline.
"""

from __future__ import annotations

import datetime
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcidb_spark.schema import TABLES, schema_for, validate
from kcidb_spark.store import Store


class NullStore:
    """Accepts everything, returns nothing (reference ``null`` driver)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def load(self, data: dict[str, Any], timestamp=None) -> None:
        validate(data)

    def raw(self, table: str) -> DataFrame:
        return self.spark.createDataFrame([], schema_for(table, with_metadata=True))

    def table(self, table: str, with_metadata: bool = False) -> DataFrame:
        return self.spark.createDataFrame(
            [], schema_for(table, with_metadata=with_metadata)
        )

    def dump(self, **kwargs) -> dict[str, Any]:
        from kcidb_spark.schema.io import IO_VERSION

        return {"version": dict(IO_VERSION)}


class MuxStore:
    """Fan-out loads to N member stores; query the first member
    (reference ``mux`` driver, load fan-out kcidb/db/mux.py:484-517).

    At scale this is the one-writer-many-sinks shape a
    ``foreachBatch`` streaming sink uses: the batch is written to
    every member inside one epoch, so members stay in lockstep under
    re-delivery (each member's own load path is idempotent).
    """

    def __init__(self, members: list):
        if not members:
            raise ValueError("MuxStore needs at least one member")
        self.members = list(members)

    def load(self, data: dict[str, Any], timestamp=None) -> None:
        # Validate once; members trust the pre-validated report.
        validate(data)
        ts = timestamp or datetime.datetime.now(datetime.timezone.utc)
        for m in self.members:
            m.load(data, timestamp=ts)

    def raw(self, table: str) -> DataFrame:
        return self.members[0].raw(table)

    def table(self, table: str, with_metadata: bool = False) -> DataFrame:
        return self.members[0].table(table, with_metadata=with_metadata)

    def dump(self, **kwargs) -> dict[str, Any]:
        return self.members[0].dump(**kwargs)


def open_store(spark: SparkSession, spec: str):
    """Open a store from a ``driver[:params]`` connection spec — the
    reference's database specification syntax (kcidb/db/misc.py
    ``instantiate_spec``, drivers registered at
    kcidb/db/__init__.py:47-54):

    * ``parquet:<dir>`` or a bare path — the scale-path parquet Store;
    * ``sqlite:<file>`` or ``sqlite::memory:`` — the local single-file
      driver (reference kcidb/db/sqlite);
    * ``json:<file>`` — an in-memory database initialized from one I/O
      report JSON file (reference kcidb/db/json; backed here by an
      in-memory SQLite raw store — the dedup view / dump surface is
      Spark either way);
    * ``null`` — accepts everything, answers empty;
    * ``mux:<spec> <spec>...`` — load fan-out to every member,
      queries from the first (specs whitespace-separated, as in the
      reference's mux params).
    """
    from kcidb_spark.store.sqlite import SqliteStore

    if spec == "null":
        return NullStore(spark)
    if spec.startswith("mux:"):
        members = [open_store(spark, s) for s in spec[4:].split()]
        return MuxStore(members)
    if spec.startswith("sqlite:"):
        return SqliteStore(spark, spec[len("sqlite:"):])
    if spec.startswith("json:"):
        import json as _json

        store = SqliteStore(spark, ":memory:")
        path = spec[len("json:"):]
        if path:
            with open(path, encoding="utf-8") as f:
                store.load(_json.load(f))
        return store
    if spec.startswith("parquet:"):
        return Store(spark, spec[len("parquet:"):])
    return Store(spark, spec)


def json_store(
    spark: SparkSession,
    root: str,
    data: dict[str, Any],
    timestamp: datetime.datetime | None = None,
) -> Store:
    """A fresh store pre-loaded from one I/O report (reference
    ``json`` driver: JSON-initialized in-memory database)."""
    store = Store(spark, root)
    store.empty()
    store.load(data, timestamp=timestamp)
    return store


def archive(
    src: Store,
    dst: Store,
    after: datetime.datetime,
    until: datetime.datetime,
    chunk: datetime.timedelta = datetime.timedelta(days=7),
    deadline_s: float | None = None,
) -> datetime.datetime:
    """Copy raw rows with ``after < _timestamp <= until`` from ``src``
    to ``dst`` in bounded time slices; returns the watermark actually
    reached (== ``until`` unless the deadline fired first).

    Mirrors the reference archive function (main.py:422-569):
    windows are aligned across tables so each chunk is a consistent
    cross-table slice, and the copy moves RAW rows (all loaded
    versions, metadata included) so the archive's dedup view equals
    the operational one.  DataFrame-to-DataFrame append — rows never
    surface to the driver.
    """
    start = time.monotonic()
    lo = after
    while lo < until:
        hi = min(lo + chunk, until)
        for t in TABLES:
            rows = src.raw(t).filter(
                (F.col("_timestamp") > F.lit(lo)) & (F.col("_timestamp") <= F.lit(hi))
            )
            if rows.take(1):
                dst.append_raw(rows, t)
        lo = hi
        if deadline_s is not None and time.monotonic() - start > deadline_s:
            break
    return lo
