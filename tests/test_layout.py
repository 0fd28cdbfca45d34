"""Z-order layout (operators/layout.py): key correctness + the
pruning claim measured from real parquet footers.

The registry entry (zorder_key_assign) certifies the interleave
against DuckDB; these tests pin the inverse mapping and the actual
point of the layout — that a two-dimensional box query touches fewer
candidate files on a z-ordered layout than on a single-column sort,
counted from per-file min/max statistics exactly the way a scan's
row-group elimination does.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from kcidb_spark.operators.layout import zorder_key, zorder_layout


def _deinterleave(z: int) -> tuple[int, int]:
    a = b = 0
    for i in range(32):
        a |= ((z >> (2 * i)) & 1) << i
        b |= ((z >> (2 * i + 1)) & 1) << i
    return a, b


def test_zorder_key_roundtrips(spark):
    """Every (a, b) must come back out of its Morton key bit-exact —
    the interleave is a bijection on 32-bit pairs."""
    df = spark.range(512).select(
        (F.col("id") * 2_654_435_761 % 4_294_967_296).alias("a"),
        (F.col("id") * 40_503 % 4_294_967_296).alias("b"),
    )
    rows = df.withColumn("z", zorder_key(F.col("a"), F.col("b"))).collect()
    for r in rows:
        # Python ints are unbounded; Spark longs are signed — map the
        # (only theoretical here) negative wrap back to unsigned.
        z = r["z"] & 0xFFFFFFFFFFFFFFFF
        assert _deinterleave(z) == (r["a"], r["b"]), r


def _candidate_files(path: str, pred: dict[str, tuple[int, int]]) -> int:
    """Files a scan must open for a conjunctive box predicate: those
    whose per-file column min/max overlap every requested range —
    plain parquet footer arithmetic, no Spark involved."""
    n = 0
    for f in glob.glob(os.path.join(path, "part-*.parquet")):
        md = pq.read_metadata(f)
        lo: dict[str, int] = {}
        hi: dict[str, int] = {}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                name = col.path_in_schema
                if name in pred and col.statistics is not None:
                    st = col.statistics
                    lo[name] = min(lo.get(name, st.min), st.min)
                    hi[name] = max(hi.get(name, st.max), st.max)
        if all(
            name in lo and not (hi[name] < a or lo[name] > b)
            for name, (a, b) in pred.items()
        ):
            n += 1
    return n


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    """A narrow-TIME, all-users box query: the user-sorted layout
    cannot prune it (every file spans all times), the z-ordered
    layout must open strictly fewer files; and the symmetric
    narrow-user box still prunes on z-order too.  Candidate counts
    come from the files' own min/max footers."""
    from kcidb_spark.queries.relational import _utc
    from kcidb_spark.tables import table

    _utc(spark)
    ev = table(spark, "/root/testdata/sf0.01", "events").select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").alias("t_sec"),
    )
    n_files = 16
    zpath = str(tmp_path / "zorder")
    upath = str(tmp_path / "bysort")
    zorder_layout(ev, "user_id", "t_sec", n_files, zpath)
    (
        ev.repartitionByRange(n_files, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(upath)
    )
    t_lo, t_hi = [
        r[0]
        for r in ev.agg(F.min("t_sec"), F.max("t_sec")).collect()[0:1]
    ][0], ev.agg(F.max("t_sec")).collect()[0][0]
    span = t_hi - t_lo
    # ~3% time slice in the middle, all users.
    box_time = {"t_sec": (t_lo + span // 2, t_lo + span // 2 + span // 32)}
    z_time = _candidate_files(zpath, box_time)
    u_time = _candidate_files(upath, box_time)
    assert u_time == n_files  # single-dim layout can't prune time
    assert z_time < u_time, (z_time, u_time)
    # Narrow-user box: both layouts prune; z-order need not win but
    # must still eliminate most files (the rectangle claim).
    box_user = {"user_id": (100, 140)}
    z_user = _candidate_files(zpath, box_user)
    assert z_user < n_files, z_user
