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


def _hilbert_ref(x: int, y: int, bits: int = 16) -> int:
    """Textbook iterative xy→d transform (quadrant + rotate/flip per
    level, most significant first) — the pure-Python reference the
    Spark HOF expression is fuzzed against."""
    d = 0
    for b in range(bits - 1, -1, -1):
        s = 1 << b
        rx = (x >> b) & 1
        ry = (y >> b) & 1
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
            x &= s - 1
            y &= s - 1
    return d


def test_hilbert_key_matches_reference(spark):
    """The aggregate-HOF Hilbert key equals the pure-Python transform
    on a deterministic pseudo-random grid (full 16-bit range), and is
    a bijection on the sampled points (distinct inputs → distinct d)."""
    from kcidb_spark.operators.layout import hilbert_expr

    df = spark.range(1024).select(
        (F.col("id") * 2_654_435_761 % 65536).alias("x"),
        (F.col("id") * 40_503 % 65536).alias("y"),
    )
    rows = df.withColumn("d", F.expr(hilbert_expr("x", "y"))).collect()
    seen = set()
    for r in rows:
        assert r["d"] == _hilbert_ref(r["x"], r["y"]), (r["x"], r["y"])
        seen.add((r["x"], r["y"], r["d"]))
    assert len({(x, y) for x, y, _ in seen}) == len(
        {d for _, _, d in seen}
    )


def test_hilbert_curve_steps_are_axis_adjacent(spark):
    """The locality property Morton lacks: consecutive d along the
    Hilbert curve differ by exactly one unit step in exactly one
    axis.  Checked exhaustively at order 4 (16×16 grid) by inverting
    the sampled mapping."""
    from kcidb_spark.operators.layout import hilbert_expr

    df = spark.range(256).select(
        (F.col("id") % 16).alias("x"),
        (F.col("id") / 16).cast("long").alias("y"),
    )
    rows = df.withColumn("d", F.expr(hilbert_expr("x", "y", bits=4))).collect()
    by_d = {r["d"]: (r["x"], r["y"]) for r in rows}
    assert sorted(by_d) == list(range(256))
    for d in range(255):
        (x0, y0), (x1, y1) = by_d[d], by_d[d + 1]
        assert abs(x0 - x1) + abs(y0 - y1) == 1, (d, by_d[d], by_d[d + 1])


def test_hilbert_prunes_and_is_no_worse_than_zorder(spark, tmp_path):
    """hilbert_layout must (a) prune both dimensions like z-order and
    (b) open no MORE files than z-order on an ensemble of 2-D box
    queries (tighter per-file rectangles are the whole argument for
    the curve; averaged over boxes to keep the assertion robust)."""
    from kcidb_spark.operators.layout import hilbert_layout
    from kcidb_spark.queries.relational import _utc
    from kcidb_spark.tables import table

    _utc(spark)
    ev = table(spark, "/root/testdata/sf0.01", "events").select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").alias("t_sec"),
    )
    n_files = 16
    hpath = str(tmp_path / "hilbert")
    zpath = str(tmp_path / "zorder")
    hilbert_layout(ev, "user_id", "t_sec", n_files, hpath)
    zorder_layout(ev, "user_id", "t_sec", n_files, zpath)
    u_lo, u_hi, t_lo, t_hi = ev.agg(
        F.min("user_id"), F.max("user_id"),
        F.min("t_sec"), F.max("t_sec"),
    ).collect()[0]
    du, dt = (u_hi - u_lo) // 8, (t_hi - t_lo) // 8
    h_tot = z_tot = 0
    for i in range(4):
        for j in range(4):
            box = {
                "user_id": (u_lo + 2 * i * du, u_lo + (2 * i + 1) * du),
                "t_sec": (t_lo + 2 * j * dt, t_lo + (2 * j + 1) * dt),
            }
            h_tot += _candidate_files(hpath, box)
            z_tot += _candidate_files(zpath, box)
    # Both prune hard vs the 16-box × 16-file worst case…
    assert h_tot < 16 * 16 / 2, h_tot
    # …and Hilbert's tighter rectangles never lose on aggregate.
    assert h_tot <= z_tot, (h_tot, z_tot)
