"""Store-level schema versioning + in-place migration.

The reference chains versioned database schemas with in-place
``_inherit`` migrations (kcidb/db/schematic.py:174-198); the
operationally important one is v4→v5 (postgresql/v05_00.py:178-231):

* ``builds.valid`` → ``status`` (TRUE→PASS, FALSE→FAIL, NULL→absent);
* ``tests.waived=TRUE`` → a synthetic ``_:waived`` issue plus one
  incident per waived test;
* ``checkouts.contacts`` dropped.

Here the store directory records its schema version in
``_schema.json``; :class:`~kcidb_spark.store.Store` checks it on open
and migrates old major versions **DataFrame-native** — the whole
transform is a column projection plus two derived writes, no row ever
reaches the driver, so a 100 TB store migrates as a distributed
rewrite (on a partitioned lake, per-partition).

Minor-version deltas (v5.0 → v5.3 added columns) need no rewrite at
all: the raw tables are always read with the current StructType, so
columns absent in old parquet footers surface as NULL — the migration
just bumps the recorded version.
"""

from __future__ import annotations

import json
import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kcidb_spark.schema import schema_for

#: The store schema version this engine writes.
STORE_VERSION = (5, 3)

_VERSION_FILE = "_schema.json"


def read_version(root: str) -> Optional[tuple[int, int]]:
    path = os.path.join(root, _VERSION_FILE)
    if not os.path.exists(path):
        return None
    with open(path, encoding="utf-8") as f:
        v = json.load(f)
    return (v["major"], v["minor"])


def write_version(root: str, version: tuple[int, int] = STORE_VERSION) -> None:
    path = os.path.join(root, _VERSION_FILE)
    with open(path, "w", encoding="utf-8") as f:
        json.dump({"major": version[0], "minor": version[1]}, f)


def schema_for_v4(table: str) -> T.StructType:
    """The v4-era column set: current schema minus v5 additions, plus
    the fields v5.0 removed (reference postgresql/v04_00.py:202-264)."""
    base = schema_for(table, with_metadata=True)
    fields = [f for f in base.fields]
    if table == "builds":
        fields = [f for f in fields if f.name != "status"]
        fields.append(T.StructField("valid", T.BooleanType(), True))
    elif table == "tests":
        fields.append(T.StructField("waived", T.BooleanType(), True))
    elif table == "checkouts":
        fields.append(
            T.StructField("contacts", T.ArrayType(T.StringType()), True)
        )
    return T.StructType(fields)


def _rewrite(df: DataFrame, path: str) -> None:
    tmp = path + ".migrating"
    df.write.mode("overwrite").parquet(tmp)
    import shutil

    shutil.rmtree(path)
    os.rename(tmp, path)


def migrate_v4_store(spark: SparkSession, root: str) -> None:
    """Upgrade a v4-era store directory to v5.3 in place, losslessly
    (modulo the v5 semantics: valid→status, waived→incident,
    contacts dropped)."""

    def tpath(table: str) -> str:
        return os.path.join(root, table)

    def has(table: str) -> bool:
        import glob

        return bool(glob.glob(os.path.join(tpath(table), "*.parquet")))

    # builds: valid → status where status is unset.
    if has("builds"):
        v4 = spark.read.schema(schema_for_v4("builds")).parquet(tpath("builds"))
        migrated = v4.withColumn(
            "status",
            F.when(F.col("valid"), F.lit("PASS")).when(
                ~F.col("valid"), F.lit("FAIL")
            ),
        ).drop("valid")
        _rewrite(
            migrated.select(*[f.name for f in schema_for("builds", True).fields]),
            tpath("builds"),
        )

    # tests: waived=TRUE → synthetic issue + incidents, column dropped.
    if has("tests"):
        v4 = spark.read.schema(schema_for_v4("tests")).parquet(tpath("tests"))
        waived = v4.filter(F.col("waived")).select("id", "_timestamp").persist()
        any_waived = bool(waived.limit(1).count())
        issue_id, issue_version = "_:waived", 1
        incidents = waived.select(
            F.concat(F.lit(f"{issue_id}:{issue_version}:"), F.col("id")).alias("id"),
            F.lit("_").alias("origin"),
            F.lit(issue_id).alias("issue_id"),
            F.lit(issue_version).cast("long").alias("issue_version"),
            F.col("id").alias("test_id"),
            F.lit(True).alias("present"),
            F.col("_timestamp"),
        )
        issue = waived.groupBy().agg(F.max("_timestamp").alias("_timestamp")).select(
            F.lit(issue_id).alias("id"),
            F.lit(issue_version).cast("long").alias("version"),
            F.lit("_").alias("origin"),
            F.lit("Test waived as unreliable").alias("comment"),
            F.col("_timestamp"),
        )

        def pad(df: DataFrame, table: str) -> DataFrame:
            full = schema_for(table, with_metadata=True)
            cols = [
                F.col(f.name).cast(f.dataType)
                if f.name in df.columns
                else F.lit(None).cast(f.dataType).alias(f.name)
                for f in full.fields
            ]
            return df.select(*cols)

        if any_waived:
            # Append BEFORE rewriting tests (the derived frames read
            # them).
            pad(issue, "issues").write.mode("append").parquet(tpath("issues"))
            pad(incidents, "incidents").write.mode("append").parquet(
                tpath("incidents")
            )
        migrated = v4.drop("waived")
        _rewrite(
            migrated.select(*[f.name for f in schema_for("tests", True).fields]),
            tpath("tests"),
        )
        waived.unpersist()

    # checkouts: contacts dropped.
    if has("checkouts"):
        v4 = spark.read.schema(schema_for_v4("checkouts")).parquet(
            tpath("checkouts")
        )
        _rewrite(
            v4.drop("contacts").select(
                *[f.name for f in schema_for("checkouts", True).fields]
            ),
            tpath("checkouts"),
        )

    write_version(root, STORE_VERSION)


def ensure_current(spark: SparkSession, root: str) -> None:
    """Called on Store open: record/verify the directory's schema
    version, migrating old majors in place."""
    v = read_version(root)
    if v is None:
        # Pre-versioning or fresh directory: stamp the current version
        # (existing data predating version files was written by this
        # engine, i.e. already v5.3).
        write_version(root, STORE_VERSION)
        return
    if v == STORE_VERSION:
        return
    if v[0] == STORE_VERSION[0]:
        # Minor delta: current StructType read yields NULL for columns
        # missing from old footers — no rewrite needed.
        write_version(root, STORE_VERSION)
        return
    if v[0] == 4:
        migrate_v4_store(spark, root)
        return
    raise ValueError(
        f"store at {root} has unsupported schema version {v}; "
        f"this engine speaks v{STORE_VERSION[0]}.{STORE_VERSION[1]}"
    )
