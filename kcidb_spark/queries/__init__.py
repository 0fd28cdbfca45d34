"""Oracle-checked query registry.

Each query is registered with a Spark implementation plus (usually) an
equivalent DuckDB-runnable ANSI SQL oracle.  The driver's correctness
gate runs both at sf=0.01 and compares row count + schema + an
order-insensitive value hash — so every implementation here is written
for *bit-identical* results across engines (see ``_exact``).
"""

from __future__ import annotations

from kcidb_spark.queries.registry import REGISTRY, Query, register  # noqa: F401

# Importing the modules populates REGISTRY via @register decorators.
from kcidb_spark.queries import relational  # noqa: F401,E402
from kcidb_spark.queries import pipeline  # noqa: F401,E402
from kcidb_spark.queries import advanced  # noqa: F401,E402
from kcidb_spark.queries import temporal  # noqa: F401,E402
from kcidb_spark.queries import kcidb_domain  # noqa: F401,E402
from kcidb_spark.queries import coverage  # noqa: F401,E402
from kcidb_spark.queries import ranking  # noqa: F401,E402
from kcidb_spark.queries import mixing  # noqa: F401,E402
from kcidb_spark.queries import integrity  # noqa: F401,E402
from kcidb_spark.queries import streaming_exec  # noqa: F401,E402


def spark_queries():
    """name -> callable(spark, sf_dir) -> DataFrame, for __spark_entry__."""
    return {name: q.spark for name, q in REGISTRY.items()}


def oracle_sqls():
    """name -> DuckDB SQL string, for __spark_entry__ (SQL-expressible only)."""
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
