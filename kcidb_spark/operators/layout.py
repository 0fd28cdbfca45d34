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


# ---------------------------------------------------------------------------
# Hilbert curve: the better-locality alternative to Morton
# ---------------------------------------------------------------------------

#: Curve order (bits per dimension) for Hilbert keys; inputs must be
#: normalized into [0, 2^_HILBERT_BITS).
_HILBERT_BITS = 16


def hilbert_expr(ax: str, ay: str, bits: int = _HILBERT_BITS) -> str:
    """Spark-SQL text computing the Hilbert-curve index d of the
    point (``ax``, ``ay``) — the classic iterative xy→d transform
    (quadrant + rotate-and-flip per bit level, most significant
    first), folded by the ``aggregate`` higher-order function so the
    16 levels run as a RUNTIME loop inside one JVM expression:
    unrolling them as nested column expressions would re-reference
    x/y ~3× per level and grow the Catalyst tree exponentially (the
    same codegen blow-up operators/dedup.py measured on inlined
    plane CASEs), while the HOF keeps one accumulator struct and no
    Python.  Every step is BIGINT shift/mask/CASE arithmetic —
    engine-exact, so a DuckDB oracle unrolling the same levels as
    CTE steps lands on identical keys.  Intermediate x/y are masked
    to the current level's low bits after the rotation (only bits
    below the level are ever read again), which also keeps the
    transient ``s−1−x`` flip non-negative — the one point where
    two's-complement shift semantics could have diverged."""
    m = f"shiftleft(CAST(1 AS BIGINT), bb) - 1"
    rx = "(shiftright(acc.x, bb) & 1)"
    ry = "(shiftright(acc.y, bb) & 1)"
    quad = (
        f"CASE WHEN {ry} = 1 "
        f"THEN CASE WHEN {rx} = 1 THEN 2 ELSE 1 END "
        f"ELSE CASE WHEN {rx} = 1 THEN 3 ELSE 0 END END"
    )
    return (
        f"aggregate("
        f"sequence({bits - 1}, 0, -1), "
        f"named_struct("
        f"'x', CAST(({ax}) AS BIGINT), "
        f"'y', CAST(({ay}) AS BIGINT), "
        f"'d', CAST(0 AS BIGINT)), "
        f"(acc, bb) -> named_struct("
        f"'x', CASE WHEN {ry} = 0 THEN "
        f"(CASE WHEN {rx} = 1 THEN ({m}) - acc.y ELSE acc.y END) & ({m}) "
        f"ELSE acc.x END, "
        f"'y', CASE WHEN {ry} = 0 THEN "
        f"(CASE WHEN {rx} = 1 THEN ({m}) - acc.x ELSE acc.x END) & ({m}) "
        f"ELSE acc.y END, "
        f"'d', acc.d + shiftleft(CAST(1 AS BIGINT), 2 * bb) * ({quad})), "
        f"acc -> acc.d)"
    )


def hilbert_oracle_ctes(
    src: str, keys: str, ax: str, ay: str, bits: int = _HILBERT_BITS
) -> str:
    """DuckDB CTE chain replaying :func:`hilbert_expr` level by level
    (one CTE per bit, most significant first).  ``src`` is the input
    CTE name carrying ``keys`` (passthrough columns) plus integer
    ``ax``/``ay``; the final CTE is ``hs0`` with column ``d``."""
    parts = [
        f"hs{bits} AS (SELECT {keys}, CAST({ax} AS BIGINT) AS x,"
        f" CAST({ay} AS BIGINT) AS y, CAST(0 AS BIGINT) AS d FROM {src})"
    ]
    for bb in range(bits - 1, -1, -1):
        s = 1 << bb
        m = s - 1
        rx = f"((x >> {bb}) & 1)"
        ry = f"((y >> {bb}) & 1)"
        quad = (
            f"CASE WHEN {ry} = 1 "
            f"THEN CASE WHEN {rx} = 1 THEN 2 ELSE 1 END "
            f"ELSE CASE WHEN {rx} = 1 THEN 3 ELSE 0 END END"
        )
        parts.append(
            f"hs{bb} AS (SELECT {keys}, "
            f"CASE WHEN {ry} = 0 THEN "
            f"(CASE WHEN {rx} = 1 THEN {m} - y ELSE y END) & {m} "
            f"ELSE x END AS x, "
            f"CASE WHEN {ry} = 0 THEN "
            f"(CASE WHEN {rx} = 1 THEN {m} - x ELSE x END) & {m} "
            f"ELSE y END AS y, "
            f"d + CAST({s} AS BIGINT) * CAST({s} AS BIGINT) * ({quad}) AS d "
            f"FROM hs{bb + 1})"
        )
    return ",\n".join(parts)


def hilbert_layout(
    df: DataFrame, a: str, b: str, n_files: int, path: str
) -> None:
    """Write ``df`` Hilbert-ordered on (``a``, ``b``) — same contract
    and cost as :func:`zorder_layout` (one bounds agg, one range
    exchange, footer-stats pruning), but along the Hilbert curve,
    whose every unit step is axis-adjacent (Morton takes long
    diagonal jumps at quadrant seams), so per-file bounding boxes
    are tighter and 2-D box queries touch fewer files on average —
    the reason Iceberg added a Hilbert option to its z-order
    clustering.  Null/empty guards as in zorder_layout."""
    bounds = df.agg(
        F.min(a), F.max(a), F.min(b), F.max(b),
        F.count(F.lit(1)).alias("_n"),
        F.count(a).alias("_na"),
        F.count(b).alias("_nb"),
    ).collect()[0]
    if bounds["_n"] == 0:
        raise ValueError("hilbert_layout: empty input frame")
    if bounds["_na"] < bounds["_n"] or bounds["_nb"] < bounds["_n"]:
        raise ValueError(
            f"hilbert_layout: null values in layout column(s) "
            f"{a!r}/{b!r} — null keys have no curve position; filter "
            f"or impute them before laying out"
        )
    a_lo, a_hi, b_lo, b_hi = (int(v) for v in bounds[:4])
    keyed = df.withColumn(
        "_hx", _normalize(F.col(a), a_lo, a_hi)
    ).withColumn(
        "_hy", _normalize(F.col(b), b_lo, b_hi)
    ).withColumn("_h", F.expr(hilbert_expr("_hx", "_hy")))
    (
        keyed.repartitionByRange(n_files, "_h")
        .sortWithinPartitions("_h")
        .drop("_hx", "_hy", "_h")
        .write.mode("overwrite")
        .parquet(path)
    )


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
