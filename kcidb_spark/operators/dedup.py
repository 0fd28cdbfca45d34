"""Near-duplicate detection operators: MinHash + LSH, Jaccard, SimHash.

Scale design:
* signatures are per-row projections (no shuffle — see
  queries/pipeline.py minhash rationale);
* LSH banding turns all-pairs comparison into an equi-join on band
  keys: only documents sharing a band bucket ever meet, so the
  shuffle is proportional to bucket sizes, not n²;
* candidate pairs are verified with exact shingle Jaccard — an
  explode + equi-join on shingle restricted to candidate documents
  only (the corpus-wide shingle explode never happens).

Performance note (measured at sf0.1): higher-order functions built
from *Python* lambdas (``F.transform(col, lambda ...)``), especially
nested ones, run interpreted and were ~50× slower than the identical
expressions written as SQL lambda strings via ``F.expr`` — 73 s vs
1.4 s for the signature projection.  Every HOF here is therefore a
SQL-text lambda, and the shingle array is materialized once in a
preceding projection instead of being re-derived inside each of the
8 hash columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from kcidb_spark.cache import scoped_persist
from pyspark.sql import functions as F

#: normalized-token split of a text column (SQL fragment, applied to
#: a column named ``text``)
_NORM_EXPR = "split(trim(regexp_replace(lower({col}), '[^a-z0-9]+', ' ')), ' ')"


def _shingle_expr(k: int) -> str:
    """SQL expr: array of k-word shingles over a ``tokens`` array
    column (1-based sequence mirrors DuckDB list indexing)."""
    parts = ", ".join(f"tokens[i-1+{j}]" if j else "tokens[i-1]" for j in range(k))
    return (
        f"transform(sequence(1, size(tokens) - {k - 1}),"
        f" i -> concat_ws(' ', {parts}))"
    )


def _norm(col: Column) -> Column:
    return F.trim(F.regexp_replace(F.lower(col), "[^a-z0-9]+", " "))


def tokenized(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
              min_tokens: int = 1) -> DataFrame:
    """(id, tokens) — normalized whitespace tokens per document."""
    return df.select(
        F.col(id_col),
        F.expr(_NORM_EXPR.format(col=text_col)).alias("tokens"),
    ).filter(F.size("tokens") >= min_tokens)


def shingled(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
             k: int = 3) -> DataFrame:
    """(id, shingles) — k-word shingle array per document, materialized
    once so downstream hash columns share it."""
    return tokenized(df, id_col, text_col, min_tokens=k).select(
        F.col(id_col), F.expr(_shingle_expr(k)).alias("shingles")
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 8,
    k: int = 3,
) -> DataFrame:
    """(id, h0..h{n-1}) MinHash signature per document — a pure
    projection (min over a multiset == min over the set): no explode,
    no shuffle; embarrassingly parallel over the corpus at any scale.
    """
    sh = shingled(df, id_col, text_col, k)
    cols = [
        F.expr(
            f"array_min(transform(shingles, s -> md5(concat('{seed}:', s))))"
        ).alias(f"h{seed}")
        for seed in range(n_hashes)
    ]
    return sh.select(F.col(id_col), *cols)


def lsh_bands(signatures: DataFrame, id_col: str = "doc_id",
              n_hashes: int = 8, n_bands: int = 2,
              carry: tuple[str, ...] = ()) -> DataFrame:
    """Fold a signature into band keys: (id, band, key) — documents
    agreeing on ALL rows of any band share that band's key.

    Single pass: the per-band keys are built as one array column and
    posexploded, so the (possibly expensive) signature subtree is
    scanned exactly once — not once per band.
    """
    rows_per_band = n_hashes // n_bands
    keys = F.array(
        *[
            F.md5(
                F.concat_ws(
                    "|",
                    *[
                        F.col(f"h{b * rows_per_band + r}")
                        for r in range(rows_per_band)
                    ],
                )
            )
            for b in range(n_bands)
        ]
    )
    bands = signatures.select(
        F.col(id_col),
        keys.alias("_keys"),
        F.posexplode(keys).alias("band", "key"),
        *carry,
    )
    # prior_keys = this document's keys for the bands BEFORE this row's
    # band — lets the pair join deduplicate by filter instead of by a
    # second shuffle (see lsh_candidate_pairs).
    return bands.withColumn(
        "prior_keys", F.expr("slice(_keys, 1, band)")
    ).drop("_keys")


def lsh_candidate_pairs(signatures: DataFrame, id_col: str = "doc_id",
                        n_hashes: int = 8, n_bands: int = 2,
                        carry: tuple[str, ...] = (),
                        max_bucket: int | None = None,
                        materialize_bands: bool = False) -> DataFrame:
    """Distinct candidate pairs (a < b) sharing at least one band
    bucket — the n²-avoiding core of MinHash dedup.  Shuffle volume is
    bucket-sized, never all-pairs; AQE's skew-join handles hot buckets.

    ``max_bucket`` is the 100 TB safety valve for pathological
    duplication (SCALE.md rehearsal: pair count grows as
    Σ bucket², and a spam flood can put millions of byte-similar
    documents in ONE bucket): buckets wider than the cap are truncated
    to their ``max_bucket`` lowest ids (deterministic, and the kept
    lowest id is exactly the survivor exact-style dedup would pick),
    bounding any bucket's pair contribution at cap².  None (default)
    caps nothing.

    ``carry`` lists signature columns to ride along through the band
    join as ``a_<col>``/``b_<col>`` — both sides' signatures are
    already in scope inside the join, so a consumer that needs them
    (sketch-only Jaccard estimation) avoids re-joining the signature
    frame twice afterwards.  Dedup then keys on (a, b) alone; carried
    values are functionally dependent on the ids, so the kept row is
    deterministic.
    """
    bands = lsh_bands(signatures, id_col, n_hashes, n_bands, carry=carry)
    if materialize_bands:
        # The self-join otherwise evaluates the whole signature
        # subtree twice (once per side — alias divergence defeats
        # exchange reuse).  A lazy localCheckpoint computes it once
        # and feeds both sides from the stored partitions: measured
        # 0.41 s vs 0.68 s one-shot at sf0.1 for the sketch-Jaccard
        # consumer.  Trade-off at scale: lineage truncation means an
        # executor loss fails the job instead of recomputing — use
        # only when the carried columns make the subtree expensive.
        bands = bands.localCheckpoint(eager=False)
    if max_bucket is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("band", "key").orderBy(F.col(id_col))
        bands = (
            bands.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= max_bucket)
            .drop("__rn")
        )
    prior = ("prior_keys",) if max_bucket is None else ()
    left = bands.select(
        F.col("band"), F.col("key"), F.col(id_col).alias("a"),
        *[F.col(c).alias(f"a_{c}") for c in (*carry, *prior)],
    )
    right = bands.select(
        F.col("band"), F.col("key"), F.col(id_col).alias("b"),
        *[F.col(c).alias(f"b_{c}") for c in (*carry, *prior)],
    )
    joined = (
        left.join(right, on=["band", "key"])
        .filter(F.col("a") < F.col("b"))
    )
    if max_bucket is None:
        # Dedup by FILTER, not by a second shuffle: a pair can only
        # repeat across bands (each doc emits one row per band), so
        # keep a band-b match iff the two docs do NOT already collide
        # in any earlier band — each row carries its doc's earlier
        # band keys (lsh_bands prior_keys), making the check a local
        # zip_with.  Exactly the distinct pair set, one shuffle total.
        # Under max_bucket this is unsound (the cap can drop a pair
        # from its earliest shared band while a later band keeps it),
        # so the capped path below still dedups by shuffle.
        first_band = F.expr(
            "forall(zip_with(a_prior_keys, b_prior_keys,"
            " (x, y) -> x != y), t -> t)"
        )
        return joined.filter(first_band).select(
            "a", "b",
            *[f"a_{c}" for c in carry], *[f"b_{c}" for c in carry],
        )
    if not carry:
        return joined.select("a", "b").distinct()
    return joined.select(
        "a", "b",
        *[f"a_{c}" for c in carry], *[f"b_{c}" for c in carry],
    ).dropDuplicates(["a", "b"])


def jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Exact shingle-set Jaccard for given (a, b) pairs:
    |∩| / (|A| + |B| − |∩|) via IN-ROW set intersection — each
    candidate doc's distinct-shingle ARRAY joins onto the pair row
    and ``array_intersect`` counts the overlap locally.  Integer
    arithmetic, bit-stable.

    Scale: shingle sets are built only for documents that appear in a
    candidate pair (broadcast semi-join first), so verify cost is
    proportional to the candidate set, not the corpus.  Versus the
    explode→equi-join→groupBy formulation this moves candidate
    shingles as packed arrays through TWO pair-keyed joins instead of
    pair×shingle ROWS through two exchanges plus a groupBy — one less
    shuffle stage and ~|pair|-bounded row counts throughout.  The
    pair set and the shingle-set frame are persisted: both feed two
    join sides and would otherwise re-execute their (projection-only,
    hence not exchange-reusable) subtrees.
    """
    pairs = scoped_persist(pairs)
    cand_ids = (
        pairs.select(F.col("a").alias(id_col))
        .unionByName(pairs.select(F.col("b").alias(id_col)))
        .distinct()
    )
    docs = df.join(F.broadcast(cand_ids), on=id_col, how="left_semi")
    sh = scoped_persist(
        shingled(docs, id_col, text_col, k).select(
            F.col(id_col), F.array_distinct("shingles").alias("sh")
        )
    )
    a_sh = sh.select(F.col(id_col).alias("a"), F.col("sh").alias("sa"))
    b_sh = sh.select(F.col(id_col).alias("b"), F.col("sh").alias("sb"))
    # Inner joins drop pairs whose doc has < k tokens (no shingle
    # set) — identical to the former sizes-join semantics.
    return (
        pairs.join(a_sh, on="a")
        .join(b_sh, on="b")
        .select(
            "a",
            "b",
            F.size(F.array_intersect("sa", "sb")).cast("long")
            .alias("n_inter"),
            (F.size("sa") + F.size("sb")).cast("long").alias("__nsum"),
        )
        .select(
            "a",
            "b",
            "n_inter",
            (
                F.col("n_inter")
                / (F.col("__nsum") - F.col("n_inter")).cast("double")
            ).alias("jaccard"),
        )
    )


def simhash_bits(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", n_bits: int = 16) -> DataFrame:
    """n-bit SimHash over tokens: bit i = sign of Σ_tokens (±1),
    where a token votes +1 on bit i iff bit i of its md5 prefix is
    set.  Bits come from the first n_bits/4 hex chars (4 bits each) so
    both engines extract them with pure string ops — no binary casts.

    The per-token hex prefix is materialized once; the n bit-vote
    aggregations run over that shared array as SQL-text lambdas
    (codegen-friendly — see module docstring).  ``n_bits`` must be a
    multiple of 4 and at most 63 bits fit the signed BIGINT output
    (use ≤60 to keep the banding arithmetic comfortable).
    """
    assert n_bits % 4 == 0 and n_bits <= 60
    # Decode each token's hex prefix ONCE into an integer (conv), so
    # the per-bit vote folds are shift/mask arithmetic instead of
    # substring+instr string ops per (token, bit) — bit i of the
    # decoded word sits at shift n_bits−1−i (digit ci = i//4+1 is the
    # (C−ci)-th most significant of C = n_bits/4, bit-in-digit
    # 3−i%4 ⇒ 4·(C−ci) + 3−i%4 = n_bits−1−i).  Same zero-shuffle
    # projection shape, same votes, same hash.
    hx = tokenized(df, id_col, text_col).select(
        F.col(id_col),
        F.expr(
            f"transform(tokens, t -> cast(conv(substring(md5(t), 1,"
            f" {n_bits // 4}), 16, 10) as bigint))"
        ).alias("hws"),
    )
    bit_exprs = []
    for i in range(n_bits):
        vote = (
            f"CASE WHEN (shiftright(h, {n_bits - 1 - i}) & 1) = 1"
            f" THEN 1 ELSE -1 END"
        )
        bit_exprs.append(
            f"CASE WHEN aggregate(transform(hws, h -> {vote}), 0,"
            f" (acc, x) -> acc + x) > 0 THEN {1 << i} ELSE 0 END"
        )
    total = " + ".join(bit_exprs)
    return hx.select(F.col(id_col), F.expr(f"CAST({total} AS BIGINT)").alias("simhash"))


def simhash16(df: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """16-bit SimHash (see :func:`simhash_bits`)."""
    return simhash_bits(df, id_col, text_col, n_bits=16)


def simhash_bits_multi(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", n_bits: int = 120) -> DataFrame:
    """SimHash wider than one BIGINT: ``(id, simhash array<bigint>)``
    with 60 bits per word — the implementation of the width sizing
    rule (one 60-bit BIGINT holds to ~10⁷ docs; every additional word
    doubles-and-more the key space, 120 bits ≈ the classic 128-bit
    fingerprint).  Words carry 60 bits, not 64: 15 hex nibbles per
    word keeps the bit→hex-char extraction pure string ops shared
    verbatim with the DuckDB oracle, and no word ever touches the
    sign bit — both engines' shift/OR arithmetic stays in range
    (DuckDB raises on ``1::BIGINT << 63``).  md5's 128-bit budget
    caps n_bits at 120.

    Word w's bit i votes from global bit g = 60·w + i of the token's
    md5 prefix, so word 0 of a 120-bit fingerprint EQUALS the 60-bit
    :func:`simhash_bits` output — widening refines, never reshuffles,
    an existing fingerprint corpus.

    Execution shape: explode tokens → 120 partial-aggregated SUMs
    grouped by document, NOT the per-bit array-HOF fold the ≤60-bit
    path uses.  Higher-order-function lambdas evaluate INTERPRETED
    per element; 120 of them re-traversing every token array measured
    a >10× per-doc cliff at the 100× rehearsal (6 M docs), while the
    exploded SUM form is whole-stage-codegen'd end to end.  The cost
    is one shuffle of (id × n_bits longs) with map-side combine —
    linear, and each doc's partial row collapses before the exchange.
    """
    assert n_bits % 60 == 0 and n_bits <= 120
    n_words = n_bits // 60
    # Each word's 15-hex-char slice decodes ONCE per token via conv()
    # into a 60-bit integer whose bit (59 − i) is exactly global bit
    # g = 60·w + i of the old per-char extraction (char ci = g//4+1 is
    # the (16-ci)-th most significant digit, bit-in-digit 3 − g%4 ⇒
    # shift 4·(15−ci) + 3−g%4 = 59 − g): two conv+cast per token
    # replace 120 substring+instr string ops, and the per-bit votes
    # become codegen'd shift/mask arithmetic (guide §1.2 "per-task
    # work" — same exploded partial-agg shape, cheaper row function).
    ex = tokenized(df, id_col, text_col).select(
        F.col(id_col), F.explode("tokens").alias("t")
    ).select(
        id_col,
        *[
            F.expr(
                f"cast(conv(substring(md5(t), {60 * w // 4 + 1}, 15),"
                f" 16, 10) as bigint)"
            ).alias(f"hw{w}")
            for w in range(n_words)
        ],
    )
    sums = []
    for g in range(n_bits):
        w, i = g // 60, g % 60
        sums.append(
            F.sum(
                F.expr(
                    f"CASE WHEN (shiftright(hw{w}, {59 - i}) & 1) = 1"
                    f" THEN 1 ELSE -1 END"
                )
            ).alias(f"c{g}")
        )
    cnt = ex.groupBy(id_col).agg(*sums)
    words = []
    for w in range(n_words):
        total = " + ".join(
            f"CASE WHEN c{60 * w + i} > 0 THEN {1 << i} ELSE 0 END"
            for i in range(60)
        )
        words.append(f"CAST({total} AS BIGINT)")
    return cnt.select(
        F.col(id_col),
        F.expr(f"array({', '.join(words)})").alias("simhash"),
    )


def simhash_hamming_pairs_multi(
    sig: DataFrame,
    id_col: str = "doc_id",
    n_bits: int = 120,
    n_bands: int = 8,
    max_hamming: int = 7,
    max_bucket: int | None = None,
) -> DataFrame:
    """:func:`simhash_hamming_pairs` over the multi-word fingerprint
    (``simhash`` = array<bigint>, 60 bits/word): identical banded
    pigeonhole blocking (``max_hamming < n_bands`` ⇒ exact pair set)
    with bands sliced out of their containing word.  ``band_bits``
    must divide 60 so no band spans a word boundary.  At 120 bits /
    8 bands the per-band key space is the same 2^15 as the 60-bit /
    4-band default — what widening buys is the OUTPUT side of the
    sizing rule: random Hamming-≤7 collisions at 2⁻¹²⁰ stay ≪ 1 out
    to ~10¹⁵ docs, and doubled band count halves per-bucket density
    at equal corpus size.

    The fingerprint array is FLATTENED to one primitive BIGINT column
    per word before the band join: every in-bucket candidate pair
    evaluates the first-band mask + two bit_counts, and doing that
    through array element extraction measured a multi-× per-row cliff
    at the 100× rehearsal (GenericArrayData access inside a ~10⁹-row
    join loop) versus flat long columns that codegen keeps in
    registers."""
    assert max_hamming < n_bands and n_bits % n_bands == 0
    band_bits = n_bits // n_bands
    assert 60 % band_bits == 0, "bands must not span 60-bit words"
    mask = (1 << band_bits) - 1
    n_words = n_bits // 60
    flat = sig.select(
        F.col(id_col),
        *[F.col("simhash")[w].alias(f"sh{w}") for w in range(n_words)],
    )

    def band_key(j: int) -> str:
        w, off = (j * band_bits) // 60, (j * band_bits) % 60
        return f"(shiftright(sh{w}, {off}) & {mask})"

    bands = flat.select(
        F.col(id_col),
        *[f"sh{w}" for w in range(n_words)],
        F.explode(
            F.array(*[
                F.expr(f"named_struct('band', {j}, 'key', {band_key(j)})")
                for j in range(n_bands)
            ])
        ).alias("b"),
    ).select(
        id_col, *[f"sh{w}" for w in range(n_words)], "b.band", "b.key"
    )
    if max_bucket is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("band", "key").orderBy(F.col(id_col))
        bands = (
            bands.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= max_bucket)
            .drop("__rn")
        )
    a = bands.select(
        F.col(id_col).alias("id_a"),
        *[F.col(f"sh{w}").alias(f"a{w}") for w in range(n_words)],
        "band", "key",
    )
    b = bands.select(
        F.col(id_col).alias("id_b"),
        *[F.col(f"sh{w}").alias(f"b{w}") for w in range(n_words)],
        "band", "key",
    )

    # First-agreeing-band dedup, in-row (see simhash_hamming_pairs):
    # band j's mask lives in word (j·band_bits)//60.
    def band_disagrees(j: int) -> str:
        w, off = (j * band_bits) // 60, (j * band_bits) % 60
        return f"((a{w} ^ b{w}) & {mask << off}) != 0"

    lower_disagrees = [band_disagrees(j) for j in range(n_bands - 1)]
    first_band = F.expr(
        "CASE band "
        + " ".join(
            f"WHEN {jb} THEN ({' AND '.join(lower_disagrees[:jb]) or 'true'})"
            for jb in range(n_bands)
        )
        + " END"
    )
    joined = a.join(b, on=["band", "key"]).filter(F.col("id_a") < F.col("id_b"))
    if max_bucket is None:
        joined = joined.filter(first_band)
    hamming = " + ".join(
        f"bit_count(a{w} ^ b{w})" for w in range(n_words)
    )
    out = joined.select(
        "id_a", "id_b",
        F.expr(hamming).cast("long").alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)
    if max_bucket is not None:
        out = out.dropDuplicates(["id_a", "id_b"])
    return out


def simhash_hamming_pairs(
    sig: DataFrame,
    id_col: str = "doc_id",
    n_bits: int = 60,
    n_bands: int = 4,
    max_hamming: int = 3,
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance, found via
    banded blocking: split the n-bit fingerprint into ``n_bands``
    equal bands and equi-join on (band index, band value) — by the
    pigeonhole principle any pair with Hamming distance ≤
    ``n_bands - 1`` agrees on at least one whole band, so with
    ``max_hamming < n_bands`` the banded result EQUALS the all-pairs
    result while the shuffle stays proportional to band-bucket sizes
    (never n²).  Survivors are verified exactly with
    ``bit_count(a ^ b) <= max_hamming``.

    THE WIDTH IS THE SCALE PARAMETER.  Band keys live in a fixed
    2^(n_bits/n_bands) space, so bucket occupancy — and the in-bucket
    join, Σ bucket² — grows quadratically with corpus size once
    n ≫ 2^(bits/bands).  Measured (SCALE.md round 6): 32-bit/8-bit
    bands ran 2.4 s at 5 k docs but 234 s at 500 k — and at that size
    the 32-bit OUTPUT itself is semantic noise (expected random
    Hamming≤3 collisions ≈ C(n,2)·5489/2³² ≈ 160 M pairs).  At 60
    bits (15-bit bands) the same corpus measures linear, and the
    random-collision expectation stays ≪ 1 out to ~10⁷ docs; beyond
    that, widen past one BIGINT (two-long fingerprint) before
    reaching for the cap.

    ``max_bucket`` is the flood valve for *skewed* corpora (one
    boilerplate fingerprint dominating): buckets are truncated to
    their ``max_bucket`` lowest ids (deterministic; the kept lowest
    id is the survivor exact dedup would pick), bounding any bucket's
    pair contribution at cap² — same contract as
    :func:`lsh_candidate_pairs`.  Capping can only *drop* true pairs
    inside oversized buckets, never invent them.
    """
    assert max_hamming < n_bands and n_bits % n_bands == 0
    band_bits = n_bits // n_bands
    mask = (1 << band_bits) - 1
    bands = sig.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(*[
                F.expr(
                    f"named_struct('band', {j}, "
                    f"'key', shiftright(simhash, {j * band_bits}) & {mask})"
                )
                for j in range(n_bands)
            ])
        ).alias("b"),
    ).select(id_col, "simhash", "b.band", "b.key")
    if max_bucket is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("band", "key").orderBy(F.col(id_col))
        bands = (
            bands.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= max_bucket)
            .drop("__rn")
        )
    a = bands.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"),
        "band", "key",
    )
    b = bands.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"),
        "band", "key",
    )
    # Dedup by FILTER, not a second shuffle: a pair repeats once per
    # agreeing band, and since each row carries the FULL fingerprint
    # the "is this the FIRST agreeing band" check is pure in-row bit
    # math over sh_a ^ sh_b — keep the match only at the lowest
    # agreeing band.  Exactly the distinct pair set, one shuffle
    # total (the LSH prior-band trick with zero carried columns).
    # Unrolled as a CASE of plain mask tests — an earlier HOF form
    # (forall over sequence(0, band-1)) ran interpreted on EVERY
    # joined row and cost 3× at 10× duplicate density.
    lower_disagrees = [
        f"((sh_a ^ sh_b) & {mask << (j * band_bits)}) != 0"
        for j in range(n_bands - 1)
    ]
    first_band = F.expr(
        "CASE band "
        + " ".join(
            f"WHEN {jb} THEN ({' AND '.join(lower_disagrees[:jb]) or 'true'})"
            for jb in range(n_bands)
        )
        + " END"
    )
    joined = a.join(b, on=["band", "key"]).filter(F.col("id_a") < F.col("id_b"))
    if max_bucket is None:
        joined = joined.filter(first_band)
    out = joined.select(
        "id_a", "id_b",
        F.expr("bit_count(sh_a ^ sh_b)").cast("long").alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)
    if max_bucket is not None:
        # Under the cap the lowest-agreeing-band filter is unsound
        # (the cap can drop a pair from its lowest agreeing band while
        # a higher band keeps it), so dedup by shuffle — the capped
        # pair set is bounded at cap²·buckets anyway.
        out = out.dropDuplicates(["id_a", "id_b"])
    return out
