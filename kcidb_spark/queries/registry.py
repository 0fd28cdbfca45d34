"""Query registry: name -> (spark impl, duckdb oracle SQL, tags)."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    spark: SparkQuery
    oracle: str | None = None
    tags: tuple[str, ...] = ()
    #: Queries worth timing in bench.py (headline set).
    bench: bool = field(default=True)


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = True,
):
    """Decorator adding a Spark query (+ optional DuckDB oracle) to REGISTRY."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, spark=fn, oracle=oracle, tags=tags, bench=bench)
        return fn

    return deco
