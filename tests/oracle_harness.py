"""Local mirror of the driver's duckdb-oracle correctness gate.

Runs every registered query on Spark and its oracle SQL on DuckDB over
the same parquet tables, then compares row count, column names, and an
order-insensitive canonicalized value multiset — strictly (exact value
equality, which the engine implementations are designed to deliver).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import duckdb
import pandas as pd

from kcidb_spark.cache import release_persisted
from kcidb_spark.tables import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_value(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "∅"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 2**53:
            return f"f{int(v)}"
        return f"f{v!r}"
    if isinstance(v, (pd.Timestamp,)):
        ts = v.tz_convert("UTC").tz_localize(None) if v.tzinfo else v
        return f"t{ts.isoformat()}"
    if hasattr(v, "tolist"):  # numpy scalar / array
        lst = v.tolist()
        if isinstance(lst, list):
            return "[" + ",".join(map(_canon_value, lst)) + "]"
        return _canon_value(lst)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(map(_canon_value, v)) + "]"
    if isinstance(v, bool):
        return f"b{int(v)}"
    if isinstance(v, int):
        return f"f{v}" if abs(v) < 2**53 else f"i{v}"
    return f"s{v}"


def canon_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(_canon_value(v) for v in row))
    return sorted(out)


@dataclass
class CompareResult:
    name: str
    ok: bool
    detail: str = ""


def _driver_unhashable(df: pd.DataFrame) -> list[str]:
    """Columns the driver's pandas sort_values canonicalization cannot
    hash (lists/arrays/dicts).  The round-1 driver gate errored on such
    a column (vec_quantize_int8); mirror that rejection locally."""
    bad = []
    for c in df.columns:
        s = df[c]
        if s.dtype == object and s.map(
            lambda v: isinstance(v, (list, dict, set)) or hasattr(v, "tolist")
        ).any():
            bad.append(c)
    return bad


def compare(name: str, spark_df, duck_df: pd.DataFrame) -> CompareResult:
    sp = spark_df.toPandas()
    bad = _driver_unhashable(sp) + _driver_unhashable(duck_df)
    if bad:
        return CompareResult(
            name, False,
            f"array/object-valued output columns {sorted(set(bad))} are not "
            "canonicalizable by the driver harness — serialize them "
            "(array_join/to_json) in both engines",
        )
    if sorted(sp.columns) != sorted(duck_df.columns):
        return CompareResult(
            name, False, f"columns differ: spark={sorted(sp.columns)} duck={sorted(duck_df.columns)}"
        )
    if len(sp) != len(duck_df):
        return CompareResult(name, False, f"row count: spark={len(sp)} duck={len(duck_df)}")
    a, b = canon_rows(sp), canon_rows(duck_df)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        return CompareResult(name, False, f"values differ; first diffs: {diffs}")
    return CompareResult(name, True)


def run_all(spark, sf_dir: str, names: list[str] | None = None) -> list[CompareResult]:
    from kcidb_spark.queries import REGISTRY

    con = duck_connection(sf_dir)
    results = []
    for qname, q in REGISTRY.items():
        if names and qname not in names:
            continue
        if q.oracle is None:
            continue
        try:
            duck_df = con.execute(q.oracle).df()
        except Exception as e:  # noqa: BLE001
            results.append(CompareResult(qname, False, f"oracle error: {e}"))
            continue
        try:
            spark_df = q.spark(spark, sf_dir)
            results.append(compare(qname, spark_df, duck_df))
        except Exception as e:  # noqa: BLE001
            results.append(CompareResult(qname, False, f"spark error: {e}"))
        finally:
            release_persisted()
    return results
