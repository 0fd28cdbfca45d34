"""Distributed per-stratum exact rank (row_number without the wall).

The naive per-stratum gate —

    row_number() OVER (PARTITION BY lang ORDER BY score, doc_id)

— hash-shuffles EVERY row of a stratum to ONE reducer, which sorts the
whole stratum.  With ~100s of language values (or ~5 sources) that is
invisible at rehearsal scale, but on a real crawl where one language
is half of 10^10-10^11 documents the biggest partition is a multi-TB
single-task sort-and-spill: the same trap :mod:`operators.scan`'s
docstring calls "the single worst scale trap in window-function code",
solved there for cumsum.  This module applies the same two-phase
construction to exact ranking, in the r11 fused form (VERDICT r10
"Next round" #1a/#5):

1. ONE aggregation over the input: per-(stratum, pre-bucket) counts,
   where the pre-bucket is a fixed-width integer shift of the rank key
   (``_k >> prebucket_shift``, ``_k = score`` or ``-score``) — no
   min/max pre-pass, no eager stats job, no per-stratum range scan.
   The collected table is control-plane sized by CONTRACT: distinct
   pre-buckets ≈ score range / 2^prebucket_shift (the call sites rank
   micro-bit scores and lengths — ranges ≤ ~10^8, so ≤ ~10^5 rows).
2. The driver equalizes the segment histogram into ≤ ~n_buckets
   balanced final buckets (pure control-plane walk — boundaries are
   data-dependent, the assignment is a monotone segment → bucket
   map), computes exact per-bucket prefix offsets and per-stratum
   counts, and broadcasts the tiny mapping back as a literal frame.
3. Over-cap segments split CONDITIONALLY, two levels deep, each level
   one extra driver-side aggregation over only the affected rows
   (zero extra jobs on non-adversarial data):
   * a pre-bucket holding more rows than ``hot_cap`` splits by the
     EXACT low score bits (one sub-segment per distinct score in the
     bucket — a dense length histogram can put 40% of a language in
     one 1024-wide pre-bucket; the r11 skew rehearsal measured
     188k-row tasks before this level existed);
   * a single SCORE VALUE still over the cap (a genuinely tied key —
     constant-size chunks ranked by length) splits further by the
     top 12 bits of a monotone 56-bit tie-break prefix (first 7
     bytes, big-endian).  The tie-break bits sit BELOW the score
     bits in the sub-segment id, so they only discriminate where the
     score is constant — which is exactly where they are ordered
     consistently with the rank order.
4. In-bucket ``row_number`` PARTITIONED by (stratum, _bkt) — each
   task sorts one bucket, never a stratum — plus the broadcast bucket
   offset gives the exact global per-stratum rank.

Rank semantics are IDENTICAL to the single-window form: the bucket
assignment is (weakly) monotone in the (score [DESC], tiebreak) rank
order, offsets are exact actual prefix counts, and every quantity is
integer, so results are deterministic under any physical ordering
(pinned against the naive window in tests/test_rank.py, including the
tie-concentrated hot path, where the max bucket size is ALSO pinned).

Cost: ONE count-aggregation job at plan-build time (which also
serializes the scoped persist's cache fill — the returned plan and
the conditional split aggregations then read the cache, never the
caller's upstream), then the data path is a single broadcast join +
the (stratum, bucket)-partitioned window.  Max task input is
``max(ceil(cnt/n_buckets), hot_cap, |hottest tie| / 4096)`` rows for
any distribution.

Residual exposure, surfaced LOUDLY (VERDICT r11 #6): the tie
sub-split spreads by the tie-break's first 7 BYTES; ids sharing a
long common prefix (same-host URLs) under a 100%-tied score cannot
be spread without breaking the (score, tiebreak) order the oracles
pin — a hash spread would.  When an over-cap tied group's collected
prefix span collapses to zero, planning raises ValueError naming the
tie-break column instead of silently planning one oversized segment;
the caller must pass a discriminating tie-break column.

Preconditions (raise ValueError): integral ``score_col`` with
|score| < 2^62, no NULL stratum or score (a window would rank the
NULL group; this operator refuses loudly instead of silently
diverging — ADVICE r10), and input columns disjoint from the
temp/output names (ADVICE r10).
"""

from __future__ import annotations

import math
from typing import Callable, Dict, List, Optional, Tuple

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F
from kcidb_spark.localrel import local_df

#: Temp columns injected into the caller's frame (asserted disjoint).
_TEMP_COLS = ("_k", "_pb", "_sub", "_bkt", "_off", "_kstar", "_straddle")

#: Tie-break sub-split width: one over-cap score value spreads across
#: up to 2^12 sub-segments keyed by the tie-break prefix's top bits.
_TB_BITS = 12

#: Control-plane bound on the collected pre-bucket table.  Module
#: level so tests can shrink it to prove the guard fires BEFORE any
#: driver-side materialization (ADVICE r11: the old post-collect check
#: could not prevent the driver OOM it existed to catch).
_PREBUCKET_BOUND = 1 << 22

#: Integral Spark SQL types accepted for ``score_col`` — the bucket
#: projection is integer shift arithmetic; a float score would be
#: silently truncated by the cast, spreading same-truncation rows by
#: tie-break prefix AGAINST the true (score, tiebreak) order
#: (ADVICE r11).
_INTEGRAL_TYPES = ("tinyint", "smallint", "int", "bigint")


def _check_schema(df: DataFrame, score_col: str, *out_cols: str) -> None:
    clash = set(df.columns) & (set(_TEMP_COLS) | set(out_cols))
    if clash:
        raise ValueError(
            f"stratified rank: input columns {sorted(clash)} collide with "
            f"temp/output names; rename them before ranking"
        )
    dt = df.schema[score_col].dataType.simpleString()
    if dt not in _INTEGRAL_TYPES:
        raise ValueError(
            f"stratified rank: score_col {score_col!r} has type {dt}; an "
            f"integral type is required (cast a float score to micro-bit "
            f"BIGINT first — a silent cast would truncate distinct scores "
            f"onto one bucket key and mis-order them by tiebreak)"
        )


def _tb56(tiebreak_col: str) -> Column:
    """Monotone 56-bit big-endian integer prefix of the tie-break
    column: first 7 bytes of its UTF-8 form, zero-right-padded, so a
    string that is a strict prefix of another maps weakly below it.
    NULL folds to 0 (shares the lowest sub-segment; the in-bucket
    window's own null ordering decides, same as the naive form)."""
    b7 = F.substring(F.col(tiebreak_col).cast("string").cast("binary"), 1, 7)
    return F.coalesce(
        F.conv(F.rpad(F.hex(b7), 14, "0"), 16, 10).cast("long"), F.lit(0)
    )


def _low_col(prebucket_shift: int) -> Column:
    if prebucket_shift <= 0:
        return F.lit(0).cast("long")
    return F.col("_k").bitwiseAND(
        F.lit((1 << prebucket_shift) - 1)
    ).cast("long")


def _hot_cond(hot: Dict[object, set], stratum_col: str) -> Column:
    cond = F.lit(False)
    for s, pbs in hot.items():
        cond = cond | (
            (F.col(stratum_col) == F.lit(s))
            & F.col("_pb").isin(*sorted(pbs))
        )
    return cond


def _sub_expr(
    stratum_col: str,
    prebucket_shift: int,
    tiebreak_col: str,
    hot: Dict[object, set],
    tied: Dict[Tuple[object, int, int], Tuple[int, int]],
) -> Column:
    """The row-side sub-segment id, consistent with the driver's
    segment plan: 0 outside hot pre-buckets; ``low << 12`` inside one
    (low = the exact score's low bits — monotone); where that
    (pre-bucket, score) group is itself over the cap (``tied`` maps
    (stratum, pb, low) → (tmin, q, n_sub)), additionally OR'd with a
    linear-RANGE bucket of the full 56-bit tie-break prefix:
    ``floor((tb56 − tmin) / q)`` clamped to ``n_sub − 1`` — adaptive
    to the group's actual prefix span (ids share leading bytes almost
    universally, so fixed TOP bits of the prefix are constant; the
    range form discriminates on whatever bytes actually vary).  The
    Column ``/`` is IEEE double division, which for spans near 2^56
    can round the quotient UP past exact integer division — unclamped,
    floor() could then yield n_sub, whose bit 12 collides with the
    NEXT low-bits sub-segment id (ADVICE r11: silent row loss through
    the broadcast-mapping inner join).  ``least(·, n_sub − 1)`` bounds
    it; double division by a positive constant and floor are both
    weakly monotone, and the planner's level-2 aggregation groups by
    THIS SAME expression, so plan counts and data-path assignment
    agree exactly whatever the rounding."""
    if not hot:
        return F.lit(0).cast("long")
    base = F.shiftleft(_low_col(prebucket_shift), _TB_BITS)
    expr = F.when(_hot_cond(hot, stratum_col), base).otherwise(F.lit(0))
    if tied:
        tb = _tb56(tiebreak_col)
        low = _low_col(prebucket_shift)
        for (s, pb, lowv), (tmin, q, n_sub) in sorted(
            tied.items(), key=lambda kv: (str(kv[0][0]), kv[0][1:])
        ):
            cond = (
                (F.col(stratum_col) == F.lit(s))
                & (F.col("_pb") == F.lit(pb))
                & (low == F.lit(lowv))
            )
            bucket = F.least(
                F.floor((tb - F.lit(tmin)) / F.lit(q)).cast("long"),
                F.lit(n_sub - 1).cast("long"),
            )
            expr = F.when(cond, base.bitwiseOR(bucket)).otherwise(expr)
    return expr.cast("long")


def _collect_prebucket_counts(
    df: DataFrame, stratum_col: str
) -> Dict[object, List[Tuple[int, int]]]:
    """ONE aggregation + collect: {stratum: [(pb, n)] sorted by pb}.
    Raises on NULL stratum / score (ADVICE r10) and on a pre-bucket
    table too large to be control-plane (contract: raise the shift).
    The bound is enforced with ``limit(bound + 1)`` so at most one row
    past the bound ever reaches the driver — a mis-set shift raises
    the contract error instead of OOM-ing the driver mid-collect
    (ADVICE r11; the aggregation itself stays distributed)."""
    grouped = df.groupBy(stratum_col, "_pb").agg(
        F.count(F.lit(1)).alias("_n")
    )
    rows = grouped.limit(_PREBUCKET_BOUND + 1).collect()
    if len(rows) > _PREBUCKET_BOUND:
        raise ValueError(
            "stratified rank: pre-bucket table exceeds the control-plane "
            "bound (score range too wide for prebucket_shift — raise it)"
        )
    out: Dict[object, List[Tuple[int, int]]] = {}
    for r in rows:
        s, pb = r[stratum_col], r["_pb"]
        if s is None or pb is None:
            raise ValueError(
                "stratified rank: NULL stratum or score encountered; a "
                "window would rank the NULL group — filter or fill NULLs "
                "before ranking (non-null precondition, ADVICE r10)"
            )
        out.setdefault(s, []).append((int(pb), int(r["_n"])))
    for s in out:
        out[s].sort()
    return out


def _plan_segments(
    df: DataFrame,
    stratum_col: str,
    prebucket_shift: int,
    tiebreak_col: str,
    n_buckets: int,
    hot_cap: Optional[int],
    hot_eligible: Optional[Callable[[object, int, int, int], bool]] = None,
    precounted: Optional[Dict[object, List[Tuple[int, int]]]] = None,
):
    """Shared driver-side planning: the rank-ordered SEGMENT histogram
    per stratum, split just enough that no segment exceeds the cap
    (up to the 2^{_TB_BITS} tie-split bound).

    Returns (segments, hot, tied, targets) where segments maps
    stratum -> [(pb, sub, n), ...] in rank order.  ``hot_eligible``
    (drop_leading's straddle test) can exempt an over-cap pre-bucket
    from splitting when wholesale pass/drop handles it; args are
    (stratum, pb, rows_before_pb_in_stratum, n).  ``precounted``
    passes an already-collected first-aggregation result so a caller
    that needed it early (drop_leading's k*) doesn't pay the job
    twice.
    """
    by_stratum = (
        precounted
        if precounted is not None
        else _collect_prebucket_counts(df, stratum_col)
    )
    targets: Dict[object, int] = {}
    caps: Dict[object, int] = {}
    for s, pbs in by_stratum.items():
        cnt = sum(n for _, n in pbs)
        targets[s] = max(1, math.ceil(cnt / n_buckets))
        caps[s] = hot_cap if hot_cap is not None else max(
            4 * targets[s], 4096
        )

    hot: Dict[object, set] = {}
    for s, pbs in by_stratum.items():
        off = 0
        for pb, n in pbs:
            if n > caps[s] and (
                hot_eligible is None or hot_eligible(s, pb, off, n)
            ):
                hot.setdefault(s, set()).add(pb)
            off += n

    # Level 1: split hot pre-buckets by the exact low score bits —
    # one aggregation over only the hot rows, ≤ 2^shift groups per
    # hot pre-bucket; min/max of the tie-break prefix ride along so
    # level 2 needs no extra pass to size its range buckets.
    low_counts: Dict[Tuple[object, int], List[Tuple[int, int]]] = {}
    spans: Dict[Tuple[object, int, int], Tuple[int, int]] = {}
    tied: Dict[Tuple[object, int, int], Tuple[int, int]] = {}
    if hot:
        tb = _tb56(tiebreak_col)
        for r in (
            df.filter(_hot_cond(hot, stratum_col))
            .groupBy(
                stratum_col, "_pb",
                _low_col(prebucket_shift).alias("_low"),
            )
            .agg(
                F.count(F.lit(1)).alias("_n"),
                F.min(tb).alias("_tmin"),
                F.max(tb).alias("_tmax"),
            )
            .collect()
        ):
            key = (r[stratum_col], int(r["_pb"]))
            low_counts.setdefault(key, []).append(
                (int(r["_low"]), int(r["_n"]))
            )
            spans[(*key, int(r["_low"]))] = (
                int(r["_tmin"]), int(r["_tmax"])
            )
        for k in low_counts:
            low_counts[k].sort()
        for (s, pb), lows in low_counts.items():
            for low, n in lows:
                if n > caps[s]:
                    tmin, tmax = spans[(s, pb, low)]
                    if tmax == tmin:
                        raise ValueError(
                            f"stratified rank: tie-break column "
                            f"{tiebreak_col!r} cannot spread an over-cap "
                            f"tied group ({n} rows in stratum {s!r} share "
                            f"one score AND one 7-byte tie-break prefix); "
                            f"pass a tiebreak_col whose leading bytes "
                            f"discriminate, or raise hot_cap"
                        )
                    n_sub = min(
                        1 << _TB_BITS,
                        max(2, math.ceil(n / targets[s])),
                    )
                    q = max(1, (tmax - tmin) // n_sub + 1)
                    tied[(s, pb, low)] = (tmin, q, n_sub)

    # Level 2: exact sub-segment counts for the tied groups — one
    # aggregation over only the tied rows, grouped by the SAME
    # sub-segment expression the data path will compute, ≤ n_sub
    # rows per tied group.
    sub_counts: Dict[Tuple[object, int], List[Tuple[int, int]]] = {}
    if tied:
        sub = _sub_expr(
            stratum_col, prebucket_shift, tiebreak_col, hot, tied
        )
        tied_cond = F.lit(False)
        low = _low_col(prebucket_shift)
        for (s, pb, lowv) in tied:
            tied_cond = tied_cond | (
                (F.col(stratum_col) == F.lit(s))
                & (F.col("_pb") == F.lit(pb))
                & (low == F.lit(lowv))
            )
        for r in (
            df.filter(tied_cond)
            .groupBy(stratum_col, "_pb", sub.alias("_sub"))
            .agg(F.count(F.lit(1)).alias("_n"))
            .collect()
        ):
            sub_counts.setdefault(
                (r[stratum_col], int(r["_pb"])), []
            ).append((int(r["_sub"]), int(r["_n"])))
        for k in sub_counts:
            sub_counts[k].sort()

    segments: Dict[object, List[Tuple[int, int, int]]] = {}
    for s, pbs in by_stratum.items():
        segs: List[Tuple[int, int, int]] = []
        for pb, n in pbs:
            if s in hot and pb in hot[s]:
                tied_subs = dict(sub_counts.get((s, pb), []))
                for low, ln in low_counts[(s, pb)]:
                    if (s, pb, low) in tied:
                        lo = low << _TB_BITS
                        hi = (low + 1) << _TB_BITS
                        for sv in sorted(
                            v for v in tied_subs if lo <= v < hi
                        ):
                            segs.append((pb, sv, tied_subs[sv]))
                    else:
                        segs.append((pb, low << _TB_BITS, ln))
            else:
                segs.append((pb, 0, n))
        segments[s] = segs
    return segments, hot, tied, targets


def _keyed(
    df: DataFrame, score_col: str, descending: bool, prebucket_shift: int
) -> DataFrame:
    k = (-F.col(score_col) if descending else F.col(score_col)).cast(
        "long"
    )
    return df.withColumn("_k", k).withColumn(
        "_pb", F.shiftright("_k", prebucket_shift)
    )


def _mapping_df(spark, df, stratum_col, mapping, extra):
    """Broadcastable literal mapping frame (control-plane sized)."""
    schema = (
        df.select(stratum_col).schema
        .add("_pb", "long").add("_sub", "long").add("_bkt", "long")
        .add("_off", "long")
    )
    for name, typ in extra:
        schema = schema.add(name, typ)
    return local_df(spark, mapping, schema)


def stratified_row_number(
    df: DataFrame,
    stratum_col: str,
    score_col: str,
    *,
    descending: bool = False,
    tiebreak_col: str = "doc_id",
    rk_col: str = "rk",
    cnt_col: str = "cnt",
    n_buckets: int = 1024,
    prebucket_shift: int = 10,
    hot_cap: Optional[int] = None,
) -> DataFrame:
    """Append ``rk_col`` = row_number() over (PARTITION BY stratum
    ORDER BY score [DESC], tiebreak) and ``cnt_col`` = count(*) over
    (PARTITION BY stratum) — both BIGINT — without ever sorting a
    whole stratum in one task.

    ``score_col`` must be an integral type (the bucket projection is
    integer shift arithmetic); ``tiebreak_col`` must make the order
    total within a stratum for the rank to be engine-deterministic.
    ``prebucket_shift`` fixes the pre-bucket width (2^shift score
    units); the contract is ``score range >> shift`` stays
    control-plane sized — the default 10 puts micro-bit scores
    (range ≤ ~10^8) at ≤ ~10^5 pre-buckets.  ``hot_cap`` bounds the
    rows a segment may hold before the conditional splits engage
    (default: max(4·cnt/n_buckets, 4096)).

    The input is scoped-persisted; the planning aggregation's collect
    serializes the cache fill, so the data path (one broadcast join +
    one (stratum, bucket)-partitioned window) reads the cache, never
    recomputes the caller's upstream.
    """
    from kcidb_spark.cache import scoped_persist

    _check_schema(df, score_col, rk_col, cnt_col)
    spark = df.sparkSession
    df = _keyed(scoped_persist(df), score_col, descending, prebucket_shift)
    segments, hot, tied, targets = _plan_segments(
        df, stratum_col, prebucket_shift, tiebreak_col, n_buckets, hot_cap
    )
    # Equalization walk: consecutive rank-ordered segments merge until
    # >= target rows; each mapping row carries ITS final bucket's
    # exact prefix offset and the stratum total.
    mapping: List[tuple] = []
    for s, segs in segments.items():
        cnt = sum(n for _, _, n in segs)
        target = targets[s]
        bkt = off = acc = 0
        pending: List[Tuple[int, int]] = []
        for pb, sub, n in segs:
            pending.append((pb, sub))
            acc += n
            if acc >= target:
                for pb_, sub_ in pending:
                    mapping.append((s, pb_, sub_, bkt, off, cnt))
                bkt += 1
                off += acc
                acc = 0
                pending = []
        for pb_, sub_ in pending:
            mapping.append((s, pb_, sub_, bkt, off, cnt))
    mdf = _mapping_df(
        spark, df, stratum_col, mapping, [(cnt_col, "long")]
    )
    sub = _sub_expr(stratum_col, prebucket_shift, tiebreak_col, hot, tied)
    order = F.desc(score_col) if descending else F.asc(score_col)
    w_in = W.partitionBy(stratum_col, "_bkt").orderBy(order, tiebreak_col)
    return (
        df.withColumn("_sub", sub)
        .join(F.broadcast(mdf), [stratum_col, "_pb", "_sub"])
        .withColumn(
            rk_col,
            (F.col("_off") + F.row_number().over(w_in)).cast("long"),
        )
        .drop("_k", "_pb", "_sub", "_bkt", "_off")
    )


def stratified_drop_leading(
    df: DataFrame,
    stratum_col: str,
    score_col: str,
    *,
    den: int,
    descending: bool = False,
    tiebreak_col: str = "doc_id",
    n_buckets: int = 1024,
    prebucket_shift: int = 10,
    hot_cap: Optional[int] = None,
) -> DataFrame:
    """Drop each stratum's FIRST ⌊cnt/den⌋ rows in (score [DESC],
    tiebreak) order — the fraction gate — without ranking the
    survivors at all.

    When the caller doesn't need a rank column (the composed
    pipelines filter and immediately drop it), the full distributed
    rank is overkill: only the segments around the boundary rank
    k* = cnt div den matter — every other segment passes or drops
    WHOLESALE on its broadcast prefix offset.  Dropped segments are
    simply ABSENT from the broadcast mapping (the inner join
    eliminates their rows map-side), passed segments flow through
    with no exchange, and only straddling segments' rows are exactly
    ranked for the deterministic tie-break at the boundary.  An
    over-cap pre-bucket splits (by exact score, then by tie-break
    prefix) ONLY when it straddles k* — wholesale pass/drop needs no
    split however large it is.  Results are row-identical to
    filtering ``rk > cnt div den`` on :func:`stratified_row_number`
    (pinned in tests/test_rank.py).
    """
    from kcidb_spark.cache import scoped_persist

    _check_schema(df, score_col)
    spark = df.sparkSession
    df = _keyed(scoped_persist(df), score_col, descending, prebucket_shift)

    # k* per stratum comes from the same first aggregation the
    # planner runs; the straddle test exempts non-straddling hot
    # pre-buckets from the split aggregations.
    kstars: Dict[object, int] = {}

    def hot_eligible(s, pb, off, n):
        return off < kstars[s] < off + n

    by_stratum = _collect_prebucket_counts(df, stratum_col)
    for s, pbs in by_stratum.items():
        kstars[s] = sum(n for _, n in pbs) // den
    segments, hot, tied, _ = _plan_segments(
        df, stratum_col, prebucket_shift, tiebreak_col, n_buckets,
        hot_cap, hot_eligible=hot_eligible, precounted=by_stratum,
    )
    mapping: List[tuple] = []
    for s, segs in segments.items():
        kstar = kstars[s]
        off = 0
        for pb, sub, n in segs:
            if off >= kstar:                       # wholesale pass
                mapping.append((s, pb, sub, 0, off, False, kstar))
            elif off + n > kstar:                  # straddle
                mapping.append((s, pb, sub, 0, off, True, kstar))
            # else: wholly below k* — omitted, join drops the rows
            off += n
    mdf = _mapping_df(
        spark, df, stratum_col, mapping,
        [("_straddle", "boolean"), ("_kstar", "long")],
    )
    sub = _sub_expr(stratum_col, prebucket_shift, tiebreak_col, hot, tied)
    j = df.withColumn("_sub", sub).join(
        F.broadcast(mdf), [stratum_col, "_pb", "_sub"]
    )
    drop_cols = ("_k", "_pb", "_sub", "_bkt", "_off", "_straddle", "_kstar")
    passed = j.filter(~F.col("_straddle")).drop(*drop_cols)
    order = F.desc(score_col) if descending else F.asc(score_col)
    # Straddle segments are (pb, sub)-granular; expose the segment
    # under the _bkt name so the plan-pin regex in test_rank.py keys
    # on the same (stratum, _bkt, score) window shape.  _sub < 2^22
    # (10 low bits + 12 tie bits), so the composite is collision-free.
    straddle = j.filter(F.col("_straddle")).withColumn(
        "_bkt",
        F.shiftleft(F.col("_pb"), 22).bitwiseOR(F.col("_sub")),
    )
    w_in = W.partitionBy(stratum_col, "_bkt").orderBy(order, tiebreak_col)
    kept = (
        straddle.withColumn("_rn", F.row_number().over(w_in))
        .filter(F.col("_off") + F.col("_rn") > F.col("_kstar"))
        .drop("_rn", *drop_cols)
    )
    return passed.unionByName(kept)
