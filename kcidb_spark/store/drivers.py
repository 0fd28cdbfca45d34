"""Auxiliary store drivers + maintenance jobs, mirroring the
reference's driver registry (kcidb/db/__init__.py:47-54):

* :class:`NullStore` — the ``null`` driver (kcidb/db/null.py:9-253):
  accepts and validates every load, answers every query empty.
* :class:`MuxStore` — the ``mux`` driver (kcidb/db/mux.py:11-518):
  fans every load out to all member stores, delegates queries to the
  first, and carries the reference's schema-version lattice
  (kcidb/db/mux.py:69-168): members at different schema majors
  coexist — the mux speaks the LOWEST member I/O version, upgrades
  reports per-member on load, and ``upgrade()`` walks the lattice
  migrating held-back members in place.
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
from kcidb_spark.store import ReportDumpMixin, Store
from kcidb_spark.store.versioning import STORE_VERSION


class NullStore(ReportDumpMixin):
    """Accepts everything, returns nothing (reference ``null`` driver).
    Inherits the full dump/dump_iter/sql surface from
    :class:`ReportDumpMixin` over its empty tables, so every CLI db-*
    verb works against ``null`` (as the reference null driver does)."""

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

    # Maintenance is a no-op on a store that never holds data.
    def empty(self) -> None:
        pass

    def purge(self, before=None) -> None:
        pass

    def compact(self) -> None:
        pass

    def first_modified(self) -> dict[str, datetime.datetime]:
        return {}

    def last_modified(self) -> dict[str, datetime.datetime]:
        return {}

    def io_version(self) -> tuple[int, int]:
        return STORE_VERSION

    def supported_io_versions(self) -> list[tuple[int, int]]:
        return [STORE_VERSION]

    def upgrade(self, target=None) -> None:
        pass


class MuxStore:
    """Fan-out loads to N member stores; query the first member
    (reference ``mux`` driver, load fan-out kcidb/db/mux.py:484-517).

    At scale this is the one-writer-many-sinks shape a
    ``foreachBatch`` streaming sink uses: the batch is written to
    every member inside one epoch, so members stay in lockstep under
    re-delivery (each member's own load path is idempotent).

    Schema-version lattice (kcidb/db/mux.py:69-168): members may sit
    at different schema majors (a parquet directory still at v4 opens
    *pinned* under the mux — ``Store(migrate=False)``).  The mux's own
    I/O version is the MINIMUM across members; ``load`` accepts
    reports at that version and upgrades them per-member to each
    member's schema before loading (mux.py:484-517 ``load``); the
    :meth:`schemas` lattice enumerates reachable member-version
    pairings and :meth:`upgrade` walks it, migrating held-back members
    in place (mux.py:373-395 ``upgrade``).
    """

    def __init__(self, members: list):
        if not members:
            raise ValueError("MuxStore needs at least one member")
        self.members = list(members)

    # -- schema lattice -------------------------------------------------
    def io_version(self) -> tuple[int, int]:
        """The I/O version the mux accepts on load: the lowest current
        member version (mux.py:503 — "the oldest across member
        drivers")."""
        return min(m.io_version() for m in self.members)

    def schemas(self) -> dict[tuple[int, int], tuple[tuple[int, int], list]]:
        """The mux version lattice: ``{(major, minor): (io_version,
        [per-member versions])}``, v0.0 = the members' CURRENT
        versions, ascending by supported I/O version; the mux major
        bumps whenever a member's major does (mux.py:150-166)."""
        sup = [m.supported_io_versions() for m in self.members]
        idx = [lst.index(m.io_version()) for m, lst in zip(self.members, sup)]
        combos: list[tuple[tuple[int, int], list]] = []

        def add():
            vers = [lst[i] for lst, i in zip(sup, idx)]
            combos.append((min(vers), list(vers)))

        for io in sorted({v for lst in sup for v in lst}):
            for k in range(len(self.members)):
                while idx[k] < len(sup[k]) - 1 and sup[k][idx[k]] == io:
                    add()
                    idx[k] += 1
        add()
        out: dict[tuple[int, int], tuple[tuple[int, int], list]] = {}
        major = minor = 0
        prev = None
        for io, vers in combos:
            if prev is not None and any(
                v[0] > p[0] for v, p in zip(vers, prev)
            ):
                major += 1
                minor = 0
            out[(major, minor)] = (io, vers)
            minor += 1
            prev = vers
        return out

    def upgrade(self, target: tuple[int, int] | None = None) -> None:
        """Upgrade the mux to lattice version ``target`` (default: the
        newest), migrating each held-back member to its version in
        that pairing."""
        lattice = self.schemas()
        target = target if target is not None else max(lattice)
        if target not in lattice:
            raise ValueError(f"mux lattice has no version {target}")
        for version in sorted(lattice):
            if version > target:
                break
            for m, v in zip(self.members, lattice[version][1]):
                if m.io_version() != v:
                    m.upgrade(v)

    # -- load / query ---------------------------------------------------
    def load(self, data: dict[str, Any], timestamp=None) -> None:
        from kcidb_spark.schema.io import upgrade as io_upgrade

        mux_major, mux_minor = self.io_version()
        ver = data.get("version", {})
        data_major = ver.get("major")
        data_minor = ver.get("minor", 0)
        # Direct compatibility, as the reference mux requires
        # (io_schema.is_compatible_directly): same major AND the
        # report's minor must not exceed the mux schema minor — a
        # v5.9 report against a v5.3 mux must fail HERE with an
        # actionable message, not later in per-member field
        # validation (or silently, if no new fields are used).
        if data_major != mux_major or (data_minor or 0) > mux_minor:
            raise ValueError(
                f"report is v{data_major}.{data_minor} but the mux"
                f" schema is v{mux_major}.{mux_minor} (the lowest"
                f" member schema) — upgrade() the mux first"
            )
        ts = timestamp or datetime.datetime.now(datetime.timezone.utc)
        for m in self.members:
            # Per-member upgrade on the way in (each member's own load
            # validates at its version).
            report = (
                io_upgrade(data)
                if m.io_version()[0] > data_major
                else data
            )
            m.load(report, timestamp=ts)

    def raw(self, table: str) -> DataFrame:
        return self.members[0].raw(table)

    def table(self, table: str, with_metadata: bool = False) -> DataFrame:
        return self.members[0].table(table, with_metadata=with_metadata)

    def dump(self, **kwargs) -> dict[str, Any]:
        return self.members[0].dump(**kwargs)

    def dump_iter(self, *args, **kwargs):
        yield from self.members[0].dump_iter(*args, **kwargs)

    def sql(self, query: str, with_metadata: bool = False) -> DataFrame:
        return self.members[0].sql(query, with_metadata=with_metadata)

    # -- maintenance: fan out like load (mux.py:246-280) ---------------
    def empty(self) -> None:
        for m in self.members:
            m.empty()

    def purge(self, before) -> None:
        for m in self.members:
            m.purge(before)

    def compact(self) -> None:
        for m in self.members:
            m.compact()

    def first_modified(self) -> dict[str, datetime.datetime]:
        """Merged across members: the MIN per object type
        (mux.py:294-316)."""
        out: dict[str, datetime.datetime] = {}
        for m in self.members:
            for table, ts in m.first_modified().items():
                out[table] = min(out.get(table, ts), ts)
        return out

    def last_modified(self) -> dict[str, datetime.datetime]:
        """Merged across members: the MAX per object type
        (mux.py:318-341)."""
        out: dict[str, datetime.datetime] = {}
        for m in self.members:
            for table, ts in m.last_modified().items():
                out[table] = max(out.get(table, ts), ts)
        return out

    @property
    def spark(self):
        return self.members[0].spark


def open_store(spark: SparkSession, spec: str, migrate: bool = True):
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
      reference's mux params).  Members open PINNED at their
      directory's recorded schema version (no auto-migration): the
      mux's version lattice decides when a held-back member upgrades.
    """
    from kcidb_spark.store.sqlite import SqliteStore

    if spec == "null":
        return NullStore(spark)
    if spec.startswith("mux:"):
        members = [
            open_store(spark, s, migrate=False) for s in spec[4:].split()
        ]
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
        return Store(spark, spec[len("parquet:"):], migrate=migrate)
    return Store(spark, spec, migrate=migrate)


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
