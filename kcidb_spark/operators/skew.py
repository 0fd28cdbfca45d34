"""Skew mitigation operators: salting for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime, but two shapes still need *plan-level* salting at 100 TB:

* a global/hot-key aggregation whose per-key state is large
  (collect_list-style) — one reducer drowns no matter how AQE splits
  scan partitions;
* a join where ONE side has a pathological hot key and the other side
  is small enough to replicate per salt but too big to broadcast
  outright.

Both helpers keep results EXACTLY equal to their unsalted forms —
salting only changes the physical key space.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Callable[[], list[Column]],
    merge: Callable[[DataFrame, Sequence[str]], DataFrame],
    n_salts: int = 16,
    salt_col: str = "_salt",
) -> DataFrame:
    """Two-phase aggregation over salted keys.

    Phase 1 groups by (keys…, salt) — the hot key's rows spread over
    ``n_salts`` reducers; phase 2 merges the per-salt partials with
    ``merge`` (which must re-aggregate the partial columns: sums of
    sums, max of maxes…).  The salt derives from a hash of the whole
    row via a cheap xxhash — deterministic per executor and uniform.

    For algebraic aggregates Spark's own partial aggregation already
    does this; use salted_agg when the aggregate's per-key state is
    what explodes (e.g. building per-key collections).
    """
    salted = df.withColumn(
        salt_col, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )
    partial = salted.groupBy(*keys, salt_col).agg(*aggs())
    return merge(partial.drop(salt_col), keys)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the big side's key, replicate the
    small side once per salt value, join on (keys…, salt).

    The hot key's rows land on ``n_salts`` different reducers instead
    of one.  Replication costs |small| × n_salts — use when the small
    side exceeds the broadcast threshold but replication still fits;
    below the threshold, plain ``F.broadcast`` is strictly better.
    Result equals the unsalted join exactly.
    """
    on = list(on)
    big_s = big.withColumn(
        "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    small_r = small.select("*", salts)
    joined = big_s.join(small_r, on=on + ["_salt"], how=how)
    return joined.drop("_salt")
