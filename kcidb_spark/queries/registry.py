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
    #: Declared output schema (Spark DDL) — REQUIRED for oracle-less
    #: queries, where no cross-engine column check exists; pinned on
    #: empty input by tests/test_empty_corpus.py.
    schema: str | None = None


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = True,
    schema: str | None = None,
):
    """Decorator adding a Spark query (+ optional DuckDB oracle) to REGISTRY."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        if oracle is None and schema is None:
            raise ValueError(
                f"query {name!r} has neither oracle nor declared schema —"
                " oracle-less queries must pin their output schema"
            )
        REGISTRY[name] = Query(
            name=name, spark=fn, oracle=oracle, tags=tags, bench=bench,
            schema=schema,
        )
        return fn

    return deco
