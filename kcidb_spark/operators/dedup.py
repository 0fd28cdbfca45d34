"""Near-duplicate detection operators: MinHash + LSH, Jaccard, SimHash.

Scale design:
* signatures are per-row projections (no shuffle — see
  queries/pipeline.py minhash rationale);
* LSH banding turns all-pairs comparison into an equi-join on band
  keys: only documents sharing a band bucket ever meet, so the
  shuffle is proportional to bucket sizes, not n²;
* candidate pairs are verified with exact shingle Jaccard — an
  explode + self-join on shingle restricted to candidates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _norm(col: Column) -> Column:
    return F.trim(F.regexp_replace(F.lower(col), "[^a-z0-9]+", " "))


def shingle_array(text: Column, k: int = 3) -> Column:
    """Array of k-word shingles of normalized text (1-based
    element_at mirrors DuckDB list indexing for oracle parity)."""
    tokens = F.split(_norm(text), " ")
    return F.transform(
        F.sequence(F.lit(1), F.size(tokens) - (k - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(tokens, i + j) for j in range(k)]
        ),
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 8,
    k: int = 3,
) -> DataFrame:
    """(id, h0..h{n-1}) MinHash signature per document — a pure
    projection (min over a multiset == min over the set)."""
    sh = shingle_array(F.col(text_col), k)

    def salted(seed: int):
        # NB: a defaulted extra lambda param would receive the array
        # INDEX from Spark's HOF binding — capture via closure instead.
        prefix = f"{seed}:"
        return lambda s: F.md5(F.concat(F.lit(prefix), s))

    cols = [
        F.array_min(F.transform(sh, salted(seed))).alias(f"h{seed}")
        for seed in range(n_hashes)
    ]
    return df.filter(F.size(F.split(_norm(F.col(text_col)), " ")) >= k).select(
        F.col(id_col), *cols
    )


def lsh_bands(signatures: DataFrame, id_col: str = "doc_id",
              n_hashes: int = 8, n_bands: int = 2) -> DataFrame:
    """Fold a signature into band keys: (id, band, key) — documents
    agreeing on ALL rows of any band share that band's key."""
    rows_per_band = n_hashes // n_bands
    out = []
    for b in range(n_bands):
        hs = [F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
        out.append(
            signatures.select(
                F.col(id_col),
                F.lit(b).alias("band"),
                F.md5(F.concat_ws("|", *hs)).alias("key"),
            )
        )
    df = out[0]
    for o in out[1:]:
        df = df.unionByName(o)
    return df


def lsh_candidate_pairs(signatures: DataFrame, id_col: str = "doc_id",
                        n_hashes: int = 8, n_bands: int = 2) -> DataFrame:
    """Distinct candidate pairs (a < b) sharing at least one band
    bucket — the n²-avoiding core of MinHash dedup."""
    bands = lsh_bands(signatures, id_col, n_hashes, n_bands)
    left = bands.select(F.col("band"), F.col("key"), F.col(id_col).alias("a"))
    right = bands.select(F.col("band"), F.col("key"), F.col(id_col).alias("b"))
    return (
        left.join(right, on=["band", "key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Exact shingle-set Jaccard for given (a, b) pairs: explode
    distinct shingles, equi-join on shingle restricted to candidate
    pairs, |∩| / (|A| + |B| − |∩|) — integer arithmetic, bit-stable."""
    sh = (
        df.select(F.col(id_col), F.explode(shingle_array(F.col(text_col), k)).alias("s"))
        .distinct()
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    a_sh = sh.select(F.col(id_col).alias("a"), "s")
    b_sh = sh.select(F.col(id_col).alias("b"), "s")
    inter = (
        pairs.join(a_sh, on="a").join(b_sh, on=["b", "s"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    na = sizes.select(F.col(id_col).alias("a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col(id_col).alias("b"), F.col("n").alias("n_b"))
    return (
        pairs.join(inter, on=["a", "b"], how="left")
        .fillna({"n_inter": 0})
        .join(na, on="a")
        .join(nb, on="b")
        .select(
            "a",
            "b",
            "n_inter",
            (
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double")
            ).alias("jaccard"),
        )
    )


def simhash16(df: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """16-bit SimHash over tokens: bit i = sign of Σ_tokens (±1),
    where a token votes +1 on bit i iff bit i of its md5 prefix is
    set.  Bits come from the first 4 hex chars (4 bits each) so both
    engines extract them with pure string ops — no binary casts."""
    tokens = F.split(_norm(F.col(text_col)), " ")
    hexes = F.transform(tokens, lambda t: F.substring(F.md5(t), 1, 4))

    def digit_at(ci: int):
        return lambda h: (
            F.instr(F.lit("0123456789abcdef"), F.substring(h, ci, 1)) - 1
        )

    def vote_for(bit: int):
        mask = 1 << bit
        return lambda d: F.when((d.bitwiseAND(F.lit(mask))) > 0, 1).otherwise(-1)

    bit_cols = []
    for i in range(16):
        ci = i // 4 + 1  # hex char index (1-based)
        bit = 3 - (i % 4)  # bit within the hex digit
        digit = F.transform(hexes, digit_at(ci))
        votes = F.aggregate(
            F.transform(digit, vote_for(bit)),
            F.lit(0),
            lambda acc, x: acc + x,
        )
        bit_cols.append(F.when(votes > 0, F.lit(1 << i)).otherwise(0))
    simhash = bit_cols[0]
    for c in bit_cols[1:]:
        simhash = simhash + c
    return df.select(F.col(id_col), simhash.cast("long").alias("simhash"))
