"""BPE tokenizer training at corpus scale.

Classic byte-pair-encoding training (Sennrich et al. 2016,
arXiv:1508.07909): start from characters, repeatedly merge the most
frequent adjacent symbol pair.  The Spark shape that survives 100 TB:

* The CORPUS is touched exactly once — stage 0 aggregates it into a
  (word, freq) table (one shuffle).  Zipf's law makes that table
  orders of magnitude smaller than the corpus, and it is the ONLY
  thing the training loop ever processes; distinct words stay a
  DataFrame (1e8–1e9 rows at web scale), never driver-held.
* Each merge round is: explode adjacent pairs weighted by word freq →
  partial-aggregated groupBy-sum → take the top pair (ONE row to the
  driver — the same driver-held-tiny-state pattern as k-means
  centroids, operators/clustering.py) → apply the merge as an IN-ROW
  left-to-right fold over each word's symbol array (SQL-text
  ``aggregate`` HOF — codegen-friendly, no Python in the loop).
* Lineage is truncated per round (``localCheckpoint``) exactly like
  connected_components: round N's plan references round N-1 and the
  logical plan would otherwise double every iteration.

Cost model: one corpus shuffle + ``n_merges`` shuffles of the word
TABLE (not the corpus).  Determinism: ties on pair count break
lexicographically, so the learned merge sequence is reproducible
under any partitioning.

The symbol alphabet after ``tokenized()`` normalization is
``[a-z0-9]`` plus the end-of-word marker and merged concatenations —
embedding symbols in SQL-text lambdas needs no quoting machinery.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: End-of-word marker (classic BPE: lets merges learn word-final
#: units; "_" is outside the normalized [a-z0-9] alphabet).
EOW = "_"

#: The only symbols a merge rule may contain: the ``tokenized()``
#: alphabet plus the end-of-word marker and their concatenations.
#: Enforced (not just documented) because ``bpe_encode`` accepts
#: caller-supplied merge lists and the symbols are embedded in
#: SQL-text lambdas — anything outside this set is rejected before it
#: can reach the SQL parser.
_SYMBOL_RE = re.compile(r"^[a-z0-9_]+$")

_STATE = "named_struct('out', cast(array() as array<string>), 'carry', cast(null as string))"


def _merge_expr(left: str, right: str, col: str = "symbols") -> str:
    """SQL fold: replace adjacent (left, right) with left||right,
    left-to-right, non-overlapping — the standard BPE apply."""
    for sym in (left, right):
        if not _SYMBOL_RE.match(sym):
            raise ValueError(
                f"BPE merge symbol {sym!r} outside the normalized"
                f" [a-z0-9_] alphabet"
            )
    merged = left + right
    return (
        f"aggregate({col}, {_STATE}, (acc, s) -> CASE"
        f" WHEN acc.carry IS NULL THEN named_struct('out', acc.out, 'carry', s)"
        f" WHEN acc.carry = '{left}' AND s = '{right}'"
        f"  THEN named_struct('out', array_append(acc.out, '{merged}'),"
        f"                    'carry', cast(null as string))"
        f" ELSE named_struct('out', array_append(acc.out, acc.carry), 'carry', s)"
        f" END,"
        f" acc -> CASE WHEN acc.carry IS NULL THEN acc.out"
        f"             ELSE array_append(acc.out, acc.carry) END)"
    )


def word_freq_symbols(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """(word, freq, symbols) — the Zipf-compressed working set: one
    corpus pass, symbols = characters + end-of-word marker."""
    from kcidb_spark.operators.dedup import tokenized

    words = (
        tokenized(docs, id_col, text_col)
        .select(F.explode("tokens").alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return words.withColumn(
        "symbols",
        F.expr(f"array_append(split(word, ''), '{EOW}')"),
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_pair_freq: int = 2,
) -> DataFrame:
    """Learn ``n_merges`` BPE merge rules from a document corpus.

    Returns a DataFrame (rank, left, right, merged, pair_freq) —
    the ordered merge table a tokenizer applies at encode time.
    Stops early when no pair reaches ``min_pair_freq``.
    """
    spark = docs.sparkSession
    words = word_freq_symbols(docs, id_col, text_col).select(
        "freq", "symbols"
    ).localCheckpoint()
    rules = []
    for rank in range(n_merges):
        pairs = (
            words.select(
                "freq",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(symbols) - 1),"
                        " i -> struct(symbols[i-1] AS l, symbols[i] AS r))"
                    )
                ).alias("p"),
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("n"))
            # Deterministic under any partitioning: count desc, then
            # lexicographic.
            .orderBy(F.desc("n"), "l", "r")
            .limit(1)
            .collect()
        )
        if not pairs or pairs[0]["n"] < min_pair_freq:
            break
        left, right, n = pairs[0]["l"], pairs[0]["r"], int(pairs[0]["n"])
        rules.append((rank, left, right, left + right, n))
        words = words.select(
            "freq", F.expr(_merge_expr(left, right)).alias("symbols")
        ).localCheckpoint()
    return spark.createDataFrame(
        rules, "rank INT, left STRING, right STRING, merged STRING,"
               " pair_freq BIGINT"
    )


def bpe_encode(docs: DataFrame, merges: list[tuple[str, str]],
               id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, bpe_tokens, n_tokens): apply an ordered merge list to every
    document — pure in-row projection (the encode side of the trained
    tokenizer; zero shuffle at any corpus size)."""
    from kcidb_spark.operators.dedup import tokenized

    expr = f"array_append(split(word, ''), '{EOW}')"
    for left, right in merges:
        expr = _merge_expr(left, right, col=expr)
    per_word = (
        f"flatten(transform(tokens, word -> {expr}))"
    )
    return tokenized(docs, id_col, text_col).select(
        F.col(id_col),
        F.expr(per_word).alias("bpe_tokens"),
    ).withColumn("n_tokens", F.size("bpe_tokens"))
