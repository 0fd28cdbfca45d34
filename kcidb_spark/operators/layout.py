"""Z-order (Morton) data layout: multi-dimensional scan pruning.

A single sort column gives parquet min/max pruning on ONE dimension;
every other predicate reads the whole table.  Interleaving the bits
of two columns into one Morton key and range-partitioning + sorting
by it makes every file cover a small RECTANGLE of the (a, b) space,
so min/max footer stats prune on BOTH dimensions — the layout trick
behind Delta/Iceberg ``ZORDER BY`` and time-series "hypertable"
chunking, here as a plain DataFrame operator (write-side only; the
reader needs nothing special, the pruning is ordinary parquet
row-group elimination).

The interleave is the textbook magic-number bit spread — five
shift-or-mask steps per column, all ``long`` arithmetic inside
whole-stage codegen (no UDF), engine-exact and therefore fully
DuckDB-oracle-able (same shifts and masks in SQL).

Scale shape: assigning keys is a pure projection; laying data out is
one ``repartitionByRange(zkey)`` exchange — the same single shuffle
any sorted write pays — after which a 100 TB table answers
two-dimensional box queries by opening only the files whose
rectangles intersect the box (tests/test_layout.py counts candidate
files straight from the parquet footers).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (shift, mask) steps spreading a 32-bit value so its bits occupy
#: the even positions of a 64-bit word.
_SPREAD_STEPS = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)

_LOW32 = 0xFFFFFFFF


def _spread(col: Column) -> Column:
    x = col.cast("long").bitwiseAND(F.lit(_LOW32))
    for sh, mask in _SPREAD_STEPS:
        x = x.bitwiseOR(F.shiftleft(x, sh)).bitwiseAND(F.lit(mask))
    return x


def zorder_key(a: Column, b: Column) -> Column:
    """64-bit Morton interleave of two non-negative 32-bit values:
    bit i of ``a`` lands at position 2i, bit i of ``b`` at 2i+1.
    Monotone locality: keys close in z-order are close in BOTH
    coordinates, which is exactly what makes per-file min/max boxes
    tight."""
    return _spread(a).bitwiseOR(F.shiftleft(_spread(b), 1))


def spread_sql(expr: str) -> str:
    """The identical spread as a DuckDB SQL expression (textual
    expansion of the same shift-or-mask chain) — used by oracles."""
    x = f"(({expr}) & {_LOW32})"
    for sh, mask in _SPREAD_STEPS:
        x = f"((({x}) | (({x}) << {sh})) & {mask})"
    return x


def zorder_key_sql(a: str, b: str) -> str:
    return f"({spread_sql(a)} | ({spread_sql(b)} << 1))"


#: Normalized per-dimension width used by :func:`zorder_layout`.
_NORM_BITS = 16


def _normalize(col: Column, lo: int, hi: int) -> Column:
    """Scale [lo, hi] onto [0, 2^_NORM_BITS): raw interleave is
    dominated by whichever column has more significant bits (an
    11-bit user id contributes nothing above bit 22 while a 31-bit
    epoch owns the top of the key — the classic z-order pitfall), so
    the layout normalizes every dimension to the same width first,
    exactly what table formats' ZORDER implementations do.
    (x−lo)·65535 / span with a truncating cast — the double division
    is exact below 2^53 and the numerator caps at ~2^47, so this is
    floor division in effect."""
    span = max(1, hi - lo)
    return (
        (col.cast("long") - F.lit(lo))
        * F.lit((1 << _NORM_BITS) - 1)
        / F.lit(span)
    ).cast("long")


def zorder_layout(
    df: DataFrame, a: str, b: str, n_files: int, path: str
) -> None:
    """Write ``df`` z-ordered on (``a``, ``b``): one cheap min/max agg
    to price the normalization, one range exchange on the Morton key,
    sorted within partitions so row groups inside a file are
    rectangles too, then parquet with ordinary footer stats.

    Layout keys must be non-null: min/max skip nulls, so an empty
    frame (or an all-null key column) has no bounds — raise rather
    than TypeError deep in the cast (ADVICE r9).  Rows with a null
    ``a`` or ``b`` among non-null ones get a null Morton key and
    range-partition into the nulls-first file, OUTSIDE the rectangle
    guarantee — reject them too so the property holds for every file.
    """
    bounds = df.agg(
        F.min(a), F.max(a), F.min(b), F.max(b),
        F.count(F.lit(1)).alias("_n"),
        F.count(a).alias("_na"),
        F.count(b).alias("_nb"),
    ).collect()[0]
    if bounds["_n"] == 0:
        raise ValueError("zorder_layout: empty input frame")
    if bounds["_na"] < bounds["_n"] or bounds["_nb"] < bounds["_n"]:
        raise ValueError(
            f"zorder_layout: null values in layout column(s) "
            f"{a!r}/{b!r} — null keys have no Morton position; filter "
            f"or impute them before laying out"
        )
    a_lo, a_hi, b_lo, b_hi = (int(v) for v in bounds[:4])
    keyed = df.withColumn(
        "_z",
        zorder_key(
            _normalize(F.col(a), a_lo, a_hi),
            _normalize(F.col(b), b_lo, b_hi),
        ),
    )
    (
        keyed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
