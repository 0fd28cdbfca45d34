"""SQLite store driver — the reference's small/local backend
(kcidb/db/sqlite/__init__.py:1-19: "connection to an SQLite file
database or an in-memory database").

Same load/read semantics as the parquet :class:`~kcidb_spark.store.Store`
— append-only raw rows, dedup-at-read via the shared
:func:`~kcidb_spark.store.dedup_view`, the full
:class:`~kcidb_spark.store.ReportDumpMixin` dump/SQL surface — but the
raw rows live in one SQLite file:

* complex columns (structs, resource arrays) are stored as JSON TEXT,
  exactly how the reference's SQLite schema packs them
  (kcidb/db/sqlite/v04_00.py: JSONColumn/TextColumn);
* timestamps are stored as INTEGER epoch microseconds, so window
  predicates and MIN/MAX are exact and order-correct in SQL.

Scale position: this driver is deliberately single-file/driver-side —
it exists for the reference's local-developer workflow (seed a test
database, inspect a dump) and for driver parity; a corpus-scale store
belongs in the parquet ``Store``.  Rows cross the driver only here, on
the load/raw boundary of a by-definition-small database — the dedup
view, dump windowing, and SQL all run as Spark plans once loaded.
"""

from __future__ import annotations

import datetime
import json
import os
import sqlite3
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from kcidb_spark.schema import TABLES, schema_for, validate
from kcidb_spark.schema.validation import JSON_FIELDS as _JSON_FIELDS
from kcidb_spark.store import ReportDumpMixin, _pack_value, dedup_view

_EPOCH = datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc)


def _micros(ts: datetime.datetime) -> int:
    if ts.tzinfo is None:
        ts = ts.replace(tzinfo=datetime.timezone.utc)
    return round((ts - _EPOCH).total_seconds() * 1_000_000)


def _from_micros(us: int) -> datetime.datetime:
    return _EPOCH + datetime.timedelta(microseconds=us)


def _sql_type(dtype: T.DataType) -> str:
    if isinstance(dtype, (T.StructType, T.ArrayType, T.MapType)):
        return "TEXT"  # JSON
    if isinstance(dtype, T.TimestampType):
        return "INTEGER"  # epoch micros
    if isinstance(dtype, (T.LongType, T.IntegerType, T.BooleanType)):
        return "INTEGER"
    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        return "REAL"
    return "TEXT"


class SqliteStore(ReportDumpMixin):
    """kcidb store backed by a single SQLite file (or ``:memory:``)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        self.path = path
        if path != ":memory:" and os.path.dirname(path):
            os.makedirs(os.path.dirname(path), exist_ok=True)
        # One long-lived connection: required for :memory: (a new
        # connection would be a new empty database), harmless for files.
        self._conn = sqlite3.connect(path)
        with self._conn:
            for table in TABLES:
                cols = ", ".join(
                    f'"{f.name}" {_sql_type(f.dataType)}'
                    for f in schema_for(table, with_metadata=True).fields
                )
                self._conn.execute(
                    f'CREATE TABLE IF NOT EXISTS "{table}" ({cols})'
                )

    # -- load -----------------------------------------------------------
    def load(
        self,
        data: dict[str, Any],
        timestamp: datetime.datetime | None = None,
    ) -> None:
        """Validate and append a v5 I/O report; same commutative
        append-only semantics as the parquet Store (T7)."""
        validate(data)
        ts = timestamp or datetime.datetime.now(datetime.timezone.utc)
        for table in TABLES:
            objs = data.get(table)
            if not objs:
                continue
            fields = schema_for(table, with_metadata=True).fields
            self._insert_rows(
                table, [self._encode_row(table, obj, fields, ts) for obj in objs]
            )

    def _insert_rows(self, table: str, rows: list) -> None:
        fields = schema_for(table, with_metadata=True).fields
        names = ", ".join(f'"{f.name}"' for f in fields)
        marks = ", ".join("?" for _ in fields)
        with self._conn:
            self._conn.executemany(
                f'INSERT INTO "{table}" ({names}) VALUES ({marks})', rows
            )

    def append_raw(self, df: DataFrame, table: str) -> None:
        """Append pre-validated RAW rows from a DataFrame (the archive
        sink).  Rows stream through ``toLocalIterator`` — bounded
        driver memory, and a SQLite archive target is by definition
        small.  The codec is the RAW-faithful unpack
        (:func:`~kcidb_spark.store._unpack_raw_value`): empty
        containers and struct-of-NULLs survive the copy, so the
        archive's dedup view resolves latest-non-NULL exactly like the
        source store's — the dump-path NULL-drop unpack would let an
        older value resurface where a later load had superseded it
        with an empty container."""
        rows = self._encode_df(table, df)
        if rows:
            self._insert_rows(table, rows)

    def _encode_df(self, table: str, df: DataFrame) -> list:
        """RAW rows of a metadata-schema DataFrame, encoded for INSERT
        via the raw-faithful codec."""
        from kcidb_spark.functions import iso_utc_timestamps
        from kcidb_spark.store import _unpack_raw_value

        fields = schema_for(table, with_metadata=True).fields
        json_paths = _JSON_FIELDS[table]
        now = datetime.datetime.now(datetime.timezone.utc)
        rows = []
        for row in iso_utc_timestamps(self.spark, df).toLocalIterator():
            d = row.asDict(recursive=True)
            obj = {
                k: u
                for k, v in d.items()
                if (u := _unpack_raw_value(v, (k,), json_paths)) is not None
            }
            rows.append(self._encode_row(table, obj, fields, now))
        return rows

    def _encode_row(self, table, obj, fields, ts):
        json_paths = _JSON_FIELDS[table]
        row = []
        for f in fields:
            if f.name == "_timestamp":
                own = obj.get("_timestamp", ts)
                if isinstance(own, str):
                    own = datetime.datetime.fromisoformat(own)
                row.append(_micros(own))
                continue
            v = obj.get(f.name)
            if v is None:
                row.append(None)
            elif isinstance(f.dataType, (T.StructType, T.ArrayType, T.MapType)):
                # Store the ORIGINAL wire JSON; decode re-packs it into
                # the Spark value shape (ISO → datetime, misc → JSON
                # string) with the same _pack_value the parquet load
                # uses, so both backends load bit-identical rows.
                row.append(json.dumps(v, sort_keys=True))
            elif isinstance(f.dataType, T.TimestampType):
                packed = _pack_value(v, (f.name,), json_paths)
                row.append(_micros(packed) if isinstance(
                    packed, datetime.datetime) else packed)
            else:
                row.append(_pack_value(v, (f.name,), json_paths))
        return row

    # -- read -----------------------------------------------------------
    def raw(self, table: str) -> DataFrame:
        """The append-only raw table as a DataFrame (all loaded
        versions of each row), schema-identical to the parquet Store's
        raw table."""
        schema = schema_for(table, with_metadata=True)
        json_paths = _JSON_FIELDS[table]
        names = [f.name for f in schema.fields]
        cur = self._conn.execute(
            "SELECT {} FROM \"{}\"".format(
                ", ".join(f'"{n}"' for n in names), table
            )
        )
        rows = []
        for raw in cur:
            d = {}
            for f, v in zip(schema.fields, raw):
                if v is None:
                    d[f.name] = None
                elif isinstance(f.dataType, T.TimestampType):
                    d[f.name] = _from_micros(v)
                elif isinstance(
                    f.dataType, (T.StructType, T.ArrayType, T.MapType)
                ):
                    d[f.name] = _pack_value(
                        json.loads(v), (f.name,), json_paths
                    )
                elif isinstance(f.dataType, T.BooleanType):
                    d[f.name] = bool(v)
                else:
                    d[f.name] = v
            rows.append(d)
        return self.spark.createDataFrame(rows, schema)

    def table(self, table: str, with_metadata: bool = False) -> DataFrame:
        """The shared dedup view over this backend's raw rows."""
        return dedup_view(self.raw(table), table, with_metadata)

    # -- maintenance ----------------------------------------------------
    def compact(self) -> None:
        """Materialize the dedup view back into the raw tables — same
        semantics as the parquet ``Store.compact`` (one row per PK,
        per-column latest-non-NULL resolved, ``_timestamp`` = MAX; the
        dedup view of a compacted table is the identity) — then VACUUM
        the file to reclaim the deleted versions' pages."""
        # Encode every table's resolved view BEFORE deleting anything:
        # the view is computed lazily over this same file.
        resolved = {
            table: self._encode_df(table, self.table(table, with_metadata=True))
            for table in TABLES
        }
        with self._conn:
            for table, rows in resolved.items():
                self._conn.execute(f'DELETE FROM "{table}"')
                if rows:
                    fields = schema_for(table, with_metadata=True).fields
                    names = ", ".join(f'"{f.name}"' for f in fields)
                    marks = ", ".join("?" for _ in fields)
                    self._conn.executemany(
                        f'INSERT INTO "{table}" ({names}) VALUES ({marks})',
                        rows,
                    )
        self._conn.execute("VACUUM")

    def empty(self) -> None:
        with self._conn:
            for table in TABLES:
                self._conn.execute(f'DELETE FROM "{table}"')

    def purge(self, before: datetime.datetime) -> None:
        cutoff = _micros(before)
        with self._conn:
            for table in TABLES:
                self._conn.execute(
                    f'DELETE FROM "{table}" WHERE "_timestamp" < ?', (cutoff,)
                )

    def first_modified(self) -> dict[str, datetime.datetime]:
        return self._modified("MIN")

    def last_modified(self) -> dict[str, datetime.datetime]:
        return self._modified("MAX")

    def _modified(self, agg: str) -> dict[str, datetime.datetime]:
        out = {}
        for table in TABLES:
            (us,) = self._conn.execute(
                f'SELECT {agg}("_timestamp") FROM "{table}"'
            ).fetchone()
            if us is not None:
                out[table] = _from_micros(us)
        return out

    # -- schema version (mux lattice membership) ------------------------
    def io_version(self) -> tuple[int, int]:
        from kcidb_spark.store.versioning import STORE_VERSION

        return STORE_VERSION

    def supported_io_versions(self) -> list[tuple[int, int]]:
        return [self.io_version()]

    def upgrade(self, target=None) -> None:
        """Single-version driver: only the current schema exists."""
        if target is not None and target != self.io_version():
            raise ValueError(f"sqlite driver cannot upgrade to {target}")

    def close(self) -> None:
        self._conn.close()
