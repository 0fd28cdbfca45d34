"""Cross-engine bit-exact arithmetic helpers.

The correctness gate hash-compares Spark and DuckDB result values, so
floating-point aggregation must be *deterministic across engines*.  Two
rules make that true:

1. Never sum doubles directly — partial-aggregation order differs
   between engines (and between runs under AQE).  Instead scale each
   row to an integer (the synthetic money/measure columns are 2–4
   decimal digits), round once per row, and sum as BIGINT: integer
   addition is associative, so any aggregation order yields the same
   value.

2. Never round a final value to fewer digits than it has — Spark
   rounds doubles via their shortest decimal representation
   (BigDecimal HALF_UP) while DuckDB rounds in binary, and they
   disagree exactly on the .5 boundaries that scaled-integer data is
   full of.  Instead produce the final double with a single division
   of the exact integer sum: the same IEEE-754 operation on the same
   operands is bit-identical in the JVM and in C++.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def int_sum(col: Column, scale: int) -> Column:
    """Exact aggregation of a fixed-decimal double column.

    Per-row ``round(col * scale)`` lands on an integer (data has fewer
    decimals than ``scale`` carries), cast to long, summed exactly.
    """
    return F.sum(F.round(col * F.lit(scale)).cast("long"))


def as_money(int_sum_col: Column, scale: int) -> Column:
    """Exact-integer sum -> double, one IEEE division (bit-stable)."""
    return int_sum_col / F.lit(float(scale))


def exact_avg(int_sum_col: Column, count_col: Column, scale: int) -> Column:
    """Average from an exact integer sum: sum / (scale * n), bit-stable."""
    return int_sum_col / (F.lit(float(scale)) * count_col)


def oracle_int_sum(expr: str, scale: int) -> str:
    """DuckDB rendering of :func:`int_sum` (HUGEINT -> BIGINT)."""
    return f"CAST(SUM(CAST(ROUND(({expr}) * {scale}) AS BIGINT)) AS BIGINT)"
