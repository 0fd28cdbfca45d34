"""Distributed stratified rank: exactness + the no-stratum-sort pin.

VERDICT r9 finding #1: the six per-stratum selection gates ranked with
``row_number() OVER (PARTITION BY lang_or_source ORDER BY score, id)``
— every row of a stratum funnels to ONE reducer.  operators/rank.py
replaces that with the bucketed two-phase construction; these tests
pin (a) bit-exact equivalence to the naive window on adversarial
distributions, and (b) the PLAN property that no ``row_number`` in any
of the six gates partitions by the stratum alone while sorting the
selection score — the exact shape that becomes a multi-TB single-task
sort when one language is half the crawl.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import Row, Window as W
from pyspark.sql import functions as F

from kcidb_spark.operators.rank import stratified_row_number

SF = "/root/testdata/sf0.001"


def _naive(df, stratum, score, descending, tiebreak="doc_id"):
    order = F.desc(score) if descending else F.asc(score)
    w_rank = W.partitionBy(stratum).orderBy(order, tiebreak)
    w_all = W.partitionBy(stratum)
    return df.select(
        "*",
        F.row_number().over(w_rank).cast("long").alias("rk"),
        F.count(F.lit(1)).over(w_all).alias("cnt"),
    )


def _rows(df):
    return sorted(
        tuple(r) for r in df.select("doc_id", "rk", "cnt").collect()
    )


@pytest.mark.parametrize("descending", [False, True])
@pytest.mark.parametrize("n_buckets", [1, 3, 1024])
def test_matches_naive_window(spark, descending, n_buckets):
    """Equivalence across bucket counts, heavy score ties (ties span
    bucket boundaries in value space but share a bucket by
    construction), a single-row stratum, and a constant-score stratum
    (the documented kmax == kmin degenerate case)."""
    from kcidb_spark.cache import release_persisted

    rows = [
        Row(doc_id=f"d{i:04d}", lang="en", score=(i * 7) % 13)
        for i in range(200)
    ]
    rows += [
        Row(doc_id=f"x{i:04d}", lang="de", score=5) for i in range(40)
    ]
    rows += [Row(doc_id="solo", lang="fr", score=-3)]
    df = spark.createDataFrame(rows).withColumn(
        "score", F.col("score").cast("long")
    )
    got = stratified_row_number(
        df, "lang", "score", descending=descending, n_buckets=n_buckets
    )
    want = _naive(df, "lang", "score", descending)
    try:
        assert _rows(got) == _rows(want)
    finally:
        release_persisted()


def test_negative_and_wide_scores(spark):
    """Micro-bit-scale magnitudes and negative values bucket safely."""
    from kcidb_spark.cache import release_persisted

    rows = [
        Row(doc_id=f"d{i}", lang="en", score=(i - 50) * 1_000_003)
        for i in range(100)
    ]
    df = spark.createDataFrame(rows).withColumn(
        "score", F.col("score").cast("long")
    )
    got = stratified_row_number(df, "lang", "score", descending=True)
    want = _naive(df, "lang", "score", True)
    try:
        assert _rows(got) == _rows(want)
    finally:
        release_persisted()


# ---------------------------------------------------------------------------
# Plan pins: the six gates must never sort a whole stratum
# ---------------------------------------------------------------------------

#: query name -> (stratum, selection score) of its gate window(s).
_GATES = {
    "lm_surprisal_filter": [("lang", "avg_nll_micros")],
    "quality_percentile_filter": [("lang", "n_chars")],
    "dsir_select_per_source": [("source", "weight_micros")],
    "dsir_gumbel_sample": [("source", "gumbel_micros")],
    "pipeline_select_corpus": [
        ("lang", "avg_nll_micros"),
        ("source", "gumbel_micros"),
    ],
    "pipeline_assemble_corpus": [("lang", "n_chars")],
}


def _bad_pattern(stratum: str, score: str) -> re.Pattern:
    # windowspecdefinition(lang#12, avg_nll_micros#34L DESC ... —
    # partition spec is exactly the stratum, first sort key the score:
    # the single-task whole-stratum sort.
    return re.compile(
        rf"windowspecdefinition\({stratum}#\d+,\s*{score}#\d+L?\s+(ASC|DESC)"
    )


def _good_pattern(stratum: str, score: str) -> re.Pattern:
    # ...(lang#12, _bkt#56L, avg_nll_micros#34L DESC... — the
    # distributed form: partition extended by the range bucket.
    return re.compile(
        rf"windowspecdefinition\({stratum}#\d+,\s*_bkt#\d+L?,"
        rf"\s*{score}#\d+L?\s+(ASC|DESC)"
    )


@pytest.mark.parametrize("name", sorted(_GATES))
def test_gate_plans_never_sort_a_stratum(spark, name):
    from kcidb_spark.cache import release_persisted
    from kcidb_spark.queries import REGISTRY

    df = REGISTRY[name].spark(spark, SF)
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        release_persisted()
    for stratum, score in _GATES[name]:
        assert not _bad_pattern(stratum, score).search(plan), (
            f"{name}: row_number sorts the whole {stratum} stratum"
        )
        # The distributed form: either the bucket-extended window is
        # present, or the optimizer removed the straddle leg WHOLESALE
        # — since r16 the broadcast mapping is a true LocalRelation
        # (kcidb_spark/localrel.py), so when no segment straddles the
        # k* boundary Catalyst folds filter(_straddle) to an empty
        # relation and prunes the dead join+window subtree (strictly
        # fewer stages, row-identical — pinned by
        # test_drop_leading_matches_rank_filter).  A plan with NO
        # window on the score at all is that pruned case; a
        # whole-stratum window would have tripped the assert above.
        any_score_window = re.search(
            rf"windowspecdefinition\([^)]*{score}#\d+L?\s+(ASC|DESC)",
            plan,
        )
        assert (
            _good_pattern(stratum, score).search(plan)
            or not any_score_window
        ), (
            f"{name}: expected bucket-extended rank window on "
            f"({stratum}, _bkt, {score}) (or a wholly pruned "
            f"straddle leg)"
        )


@pytest.mark.parametrize("descending", [False, True])
@pytest.mark.parametrize("den", [4, 10, 1000])
def test_drop_leading_matches_rank_filter(spark, descending, den):
    """stratified_drop_leading (wholesale bucket pass/drop + straddle
    rank) is row-identical to filtering rk > cnt div den on the full
    distributed rank — including den > cnt (k*=0: nothing dropped)
    and heavy ties at the boundary."""
    from kcidb_spark.cache import release_persisted
    from kcidb_spark.operators.rank import stratified_drop_leading

    rows = [
        Row(doc_id=f"d{i:04d}", lang="en", score=(i * 7) % 13)
        for i in range(200)
    ]
    rows += [Row(doc_id=f"x{i:04d}", lang="de", score=5) for i in range(40)]
    rows += [Row(doc_id="solo", lang="fr", score=-3)]
    df = spark.createDataFrame(rows).withColumn(
        "score", F.col("score").cast("long")
    )
    got = stratified_drop_leading(
        df, "lang", "score", den=den, descending=descending
    )
    want = (
        stratified_row_number(df, "lang", "score", descending=descending)
        .filter(F.col("rk") > F.floor(F.col("cnt") / den))
        .drop("rk", "cnt")
    )
    try:
        assert sorted(tuple(r) for r in got.collect()) == sorted(
            tuple(r) for r in want.collect()
        )
    finally:
        release_persisted()


# ---------------------------------------------------------------------------
# r11: tie-concentrated hot pre-buckets, and the ADVICE r10 guards
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("descending", [False, True])
def test_tie_concentrated_stratum_sub_splits(spark, descending):
    """VERDICT r10 #5: a stratum whose score is ONE repeated value
    (constant-size chunks ranked by length) must not collapse to a
    single bucket.  With hot_cap forced low, the tie-break-prefix
    sub-split engages; the result stays bit-identical to the naive
    window AND the plan's rank window partitions by (stratum, _bkt)."""
    from kcidb_spark.cache import release_persisted

    rows = [Row(doc_id=f"d{i:05d}", lang="en", score=4096) for i in range(600)]
    rows += [Row(doc_id=f"m{i:04d}", lang="en", score=(i % 7) + 5000)
             for i in range(60)]
    rows += [Row(doc_id=f"x{i:04d}", lang="de", score=9) for i in range(30)]
    df = spark.createDataFrame(rows).withColumn(
        "score", F.col("score").cast("long")
    )
    got = stratified_row_number(
        df, "lang", "score", descending=descending,
        n_buckets=8, hot_cap=50,
    )
    want = _naive(df, "lang", "score", descending)
    try:
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert _good_pattern("lang", "score").search(plan)
        assert not _bad_pattern("lang", "score").search(plan)
        assert _rows(got) == _rows(want)
    finally:
        release_persisted()


@pytest.mark.parametrize("den", [4, 10])
def test_drop_leading_tie_straddle(spark, den):
    """The boundary form's straddling hot pre-bucket sub-splits and
    still matches the rank-filter semantics exactly at the tie
    boundary."""
    from kcidb_spark.cache import release_persisted
    from kcidb_spark.operators.rank import stratified_drop_leading

    rows = [Row(doc_id=f"d{i:05d}", lang="en", score=7) for i in range(500)]
    rows += [Row(doc_id=f"a{i:04d}", lang="en", score=3) for i in range(20)]
    df = spark.createDataFrame(rows).withColumn(
        "score", F.col("score").cast("long")
    )
    got = stratified_drop_leading(
        df, "lang", "score", den=den, n_buckets=8, hot_cap=50
    )
    want = (
        stratified_row_number(df, "lang", "score", n_buckets=8, hot_cap=50)
        .filter(F.col("rk") > F.floor(F.col("cnt") / den))
        .drop("rk", "cnt")
    )
    try:
        assert sorted(tuple(r) for r in got.collect()) == sorted(
            tuple(r) for r in want.collect()
        )
    finally:
        release_persisted()


def test_reserved_column_collision_raises(spark):
    """ADVICE r10: inputs already carrying a temp/output name must
    raise, not silently mis-join."""
    df = spark.createDataFrame(
        [Row(doc_id="a", lang="en", score=1, _bkt=9)]
    ).withColumn("score", F.col("score").cast("long"))
    with pytest.raises(ValueError, match="collide"):
        stratified_row_number(df, "lang", "score")
    df2 = spark.createDataFrame(
        [Row(doc_id="a", lang="en", score=1, rk=9)]
    ).withColumn("score", F.col("score").cast("long"))
    with pytest.raises(ValueError, match="collide"):
        stratified_row_number(df2, "lang", "score")


def test_null_stratum_or_score_raises(spark):
    """ADVICE r10: NULL stratum rows were silently dropped by the
    inner stats join and an all-NULL score raised a bare TypeError;
    both now fail loudly with the non-null precondition."""
    from kcidb_spark.cache import release_persisted

    df = spark.createDataFrame(
        [Row(doc_id="a", lang=None, score=1), Row(doc_id="b", lang="en", score=2)]
    ).withColumn("score", F.col("score").cast("long"))
    try:
        with pytest.raises(ValueError, match="NULL stratum or score"):
            stratified_row_number(df, "lang", "score")
        df2 = spark.createDataFrame(
            [("a", "en", None)], "doc_id string, lang string, score long"
        )
        with pytest.raises(ValueError, match="NULL stratum or score"):
            stratified_row_number(df2, "lang", "score")
    finally:
        release_persisted()


def test_tie_sub_split_actually_spreads(spark):
    """The r11 skew rehearsal caught the first tie sub-split silently
    collapsing (its sub-key's top bits came from the constant score
    bits; then from the shared leading bytes of realistic ids).  Pin
    the SPREAD itself, not just result equality: on a 600-row
    constant-score stratum with common-prefix ids, no planned segment
    may exceed ~2x the equalization target."""
    from kcidb_spark.cache import release_persisted, scoped_persist
    from kcidb_spark.operators.rank import _keyed, _plan_segments

    rows = [Row(doc_id=f"d{i:05d}", lang="en", score=4096)
            for i in range(600)]
    df = spark.createDataFrame(rows).withColumn(
        "score", F.col("score").cast("long")
    )
    keyed = _keyed(scoped_persist(df), "score", False, 10)
    try:
        segments, hot, tied, targets = _plan_segments(
            keyed, "lang", 10, "doc_id", 8, 50
        )
        assert hot and tied
        target = targets["en"]
        max_seg = max(n for _, _, n in segments["en"])
        assert max_seg <= 2 * target, (max_seg, target)
    finally:
        release_persisted()


def test_float_score_raises(spark):
    """ADVICE r11: a non-integral score must raise the documented
    ValueError instead of being silently truncated by the long cast
    (truncation collapses distinct scores onto one bucket key, whose
    tie-split then orders them by tiebreak AGAINST the true rank)."""
    from kcidb_spark.operators.rank import stratified_drop_leading

    df = spark.createDataFrame(
        [Row(doc_id="a", lang="en", score=1.5),
         Row(doc_id="b", lang="en", score=2.5)]
    )
    with pytest.raises(ValueError, match="integral"):
        stratified_row_number(df, "lang", "score")
    with pytest.raises(ValueError, match="integral"):
        stratified_drop_leading(df, "lang", "score", den=4)


def test_prebucket_bound_guards_before_collect(spark, monkeypatch):
    """ADVICE r11 / VERDICT r11 #3: the control-plane bound must fire
    BEFORE the pre-bucket table is materialized on the driver.  With
    the bound shrunk to 8, a 100-distinct-prebucket input raises the
    contract error; the limit(bound+1) form transfers at most 9 rows,
    so the raise cannot itself be the OOM it guards against."""
    import kcidb_spark.operators.rank as rank_mod
    from kcidb_spark.cache import release_persisted

    monkeypatch.setattr(rank_mod, "_PREBUCKET_BOUND", 8)
    rows = [Row(doc_id=f"d{i}", lang="en", score=i << 10) for i in range(100)]
    df = spark.createDataFrame(rows).withColumn(
        "score", F.col("score").cast("long")
    )
    try:
        with pytest.raises(ValueError, match="control-plane bound"):
            stratified_row_number(df, "lang", "score")
    finally:
        release_persisted()


def test_tie_prefix_collapse_raises(spark):
    """VERDICT r11 #6: an over-cap tied group whose 7-byte tie-break
    prefixes are ALL equal cannot be spread; planning must raise
    naming the tie-break column, not silently plan one oversized
    segment."""
    from kcidb_spark.cache import release_persisted

    # 120 rows, one score, ids sharing the first 7 bytes (the
    # same-host-URL shape): "commonprefix-<i>" -> first 7 = "commonp".
    rows = [
        Row(doc_id=f"commonprefix-{i:04d}", lang="en", score=7)
        for i in range(120)
    ]
    df = spark.createDataFrame(rows).withColumn(
        "score", F.col("score").cast("long")
    )
    try:
        with pytest.raises(ValueError, match="doc_id"):
            stratified_row_number(
                df, "lang", "score", n_buckets=8, hot_cap=20
            )
    finally:
        release_persisted()


def test_tie_bucket_clamped_at_range_edge(spark):
    """ADVICE r11 (medium): the tie sub-bucket uses IEEE double
    division; for a span of 2^56−1 with q = span//4096 + 1 = 2^44,
    double(2^56−1) rounds to 2^56 and the unclamped quotient floors
    to 4096 — bit 12 set, colliding with the next low-bits
    sub-segment.  Pin that the shipped expression clamps to
    n_sub−1 = 4095 (= the exact integer quotient)."""
    from kcidb_spark.operators.rank import _sub_expr, _tb56

    doc = "zdoc0001"
    tb = int.from_bytes(doc.encode()[:7].ljust(7, b"\x00"), "big")
    span = (1 << 56) - 1
    tied = {("en", 3, 5): (tb - span, 1 << 44, 4096)}
    hot = {"en": {3}}
    df = spark.createDataFrame(
        [Row(doc_id=doc, lang="en")]
    ).withColumn("_k", F.lit((3 << 10) | 5).cast("long")).withColumn(
        "_pb", F.lit(3).cast("long")
    )
    got = df.select(
        _sub_expr("lang", 10, "doc_id", hot, tied).alias("_sub")
    ).collect()[0]["_sub"]
    # Sanity: the Spark-side prefix integer matches the python model.
    got_tb = df.select(_tb56("doc_id").alias("t")).collect()[0]["t"]
    assert got_tb == tb
    assert got == (5 << 12) | 4095, got


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_randomized_adversarial_matches_naive(spark, seed):
    """Randomized fuzz over the planner's branch space: mixed tie
    density (some score values hot, some unique), negative scores,
    multi-stratum, small hot_cap and n_buckets so the two-level split
    and the equalization walk all engage; must stay bit-identical to
    the naive window in both directions."""
    import random

    from kcidb_spark.cache import release_persisted

    rng = random.Random(seed)
    rows = []
    i = 0
    for lang in ("en", "de", "fr"):
        n = rng.randint(50, 400)
        values = [rng.randint(-5, 5) * 997 for _ in range(5)]
        for _ in range(n):
            if rng.random() < 0.6:
                score = rng.choice(values)       # tie mass
            else:
                score = rng.randint(-10_000, 10_000)
            rows.append(Row(doc_id=f"doc{i:06d}", lang=lang, score=score))
            i += 1
    df = spark.createDataFrame(rows).withColumn(
        "score", F.col("score").cast("long")
    )
    for descending in (False, True):
        got = stratified_row_number(
            df, "lang", "score", descending=descending,
            n_buckets=7, hot_cap=20, prebucket_shift=6,
        )
        want = _naive(df, "lang", "score", descending)
        try:
            assert _rows(got) == _rows(want), (seed, descending)
        finally:
            release_persisted()


@pytest.mark.parametrize("seed", [0, 1])
def test_randomized_drop_leading_matches(spark, seed):
    """Same fuzz for the boundary form, k* landing inside tie mass."""
    import random

    from kcidb_spark.cache import release_persisted
    from kcidb_spark.operators.rank import stratified_drop_leading

    rng = random.Random(100 + seed)
    rows = [
        Row(
            doc_id=f"doc{i:06d}",
            lang=rng.choice(("en", "de")),
            score=rng.choice((7, 7, 7, 7, 3, 11, rng.randint(0, 50))),
        )
        for i in range(500)
    ]
    df = spark.createDataFrame(rows).withColumn(
        "score", F.col("score").cast("long")
    )
    for den in (3, 7):
        got = stratified_drop_leading(
            df, "lang", "score", den=den,
            n_buckets=5, hot_cap=30, prebucket_shift=2,
        )
        want = (
            stratified_row_number(
                df, "lang", "score",
                n_buckets=5, hot_cap=30, prebucket_shift=2,
            )
            .filter(F.col("rk") > F.floor(F.col("cnt") / den))
            .drop("rk", "cnt")
        )
        try:
            assert sorted(tuple(r) for r in got.collect()) == sorted(
                tuple(r) for r in want.collect()
            ), (seed, den)
        finally:
            release_persisted()
