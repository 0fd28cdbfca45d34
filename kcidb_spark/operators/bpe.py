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

Cost model: one corpus shuffle + ``ceil(n_merges / batch_size)``
shuffles of the word TABLE (not the corpus) — batched selection
(``batch_size>1``) takes the top-K mutually-compatible pairs per
round, so realistic vocabularies (32k merges) cost ~1k rounds, not
32k.  Determinism: ties on pair count break lexicographically, so the
learned merge sequence is reproducible under any partitioning.

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


def _merge_batch_expr(rules: list[tuple[str, str]], col: str = "symbols") -> str:
    """SQL fold applying a batch of symbol-disjoint merge rules in ONE
    left-to-right pass, non-overlapping — the standard BPE apply.
    Because batch members share no symbols (and none consumes
    another's merged output — enforced by the greedy selection in
    :func:`bpe_train`), a single pass is exactly equivalent to
    applying the rules sequentially in any order."""
    for left, right in rules:
        for sym in (left, right):
            if not _SYMBOL_RE.match(sym):
                raise ValueError(
                    f"BPE merge symbol {sym!r} outside the normalized"
                    f" [a-z0-9_] alphabet"
                )
    whens = "".join(
        f" WHEN acc.carry = '{left}' AND s = '{right}'"
        f"  THEN named_struct('out', array_append(acc.out, '{left + right}'),"
        f"                    'carry', cast(null as string))"
        for left, right in rules
    )
    return (
        f"aggregate({col}, {_STATE}, (acc, s) -> CASE"
        f" WHEN acc.carry IS NULL THEN named_struct('out', acc.out, 'carry', s)"
        f"{whens}"
        f" ELSE named_struct('out', array_append(acc.out, acc.carry), 'carry', s)"
        f" END,"
        f" acc -> CASE WHEN acc.carry IS NULL THEN acc.out"
        f"             ELSE array_append(acc.out, acc.carry) END)"
    )


def _merge_expr(left: str, right: str, col: str = "symbols") -> str:
    return _merge_batch_expr([(left, right)], col)


def _select_batch(
    rows, batch_size: int, min_pair_freq: int
) -> list[tuple[str, str, int]]:
    """Greedy top-K mutually-compatible pair selection (the standard
    batched-BPE trick) over count-sorted candidate rows: accept a pair
    unless its left, right, or concatenation collides with a symbol
    already claimed by an accepted pair — collisions would make the
    one-pass batch apply order-dependent (a rule consuming another's
    merged output, or sharing a boundary symbol).  Deterministic: the
    input is totally ordered (count desc, then lexicographic)."""
    used: set[str] = set()
    batch: list[tuple[str, str, int]] = []
    for row in rows:
        left, right, n = row["l"], row["r"], int(row["n"])
        if n < min_pair_freq:
            break
        if {left, right, left + right} & used:
            continue
        batch.append((left, right, n))
        used.update((left, right, left + right))
        if len(batch) == batch_size:
            break
    return batch


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
    batch_size: int = 1,
) -> DataFrame:
    """Learn ``n_merges`` BPE merge rules from a document corpus.

    Returns a DataFrame (rank, round, left, right, merged, pair_freq)
    — the ordered merge table a tokenizer applies at encode time
    (``round`` = which batch the rule was learned in; rules in one
    round are symbol-disjoint, which lets :func:`bpe_encode_grouped`
    fold a whole round in one pass).  Stops early when no pair reaches
    ``min_pair_freq``.

    ``batch_size=1`` is exact sequential BPE (Sennrich et al.).
    ``batch_size=K`` is batched BPE: each round selects the top-K
    MUTUALLY-COMPATIBLE pairs (no shared or consumed symbols — see
    :func:`_select_batch`) from the round's count table and applies
    them in one fold pass, cutting the driver round-trips (and Spark
    jobs) from ``n_merges`` to ``n_merges / K`` — what makes a 32k-
    vocabulary training run viable (32k sequential jobs → ~1k).  The
    candidate window per round is the top ``max(8·K, 64)`` pairs;
    counts recorded per rule are the round's pre-batch counts, which
    batch compatibility makes exact (a batch member cannot change
    another member's count).  Tie-breaks stay deterministic: count
    desc, then lexicographic, at both selection and windowing.
    """
    if batch_size < 1:
        raise ValueError("batch_size must be >= 1")
    spark = docs.sparkSession
    words = word_freq_symbols(docs, id_col, text_col).select(
        "freq", "symbols"
    ).localCheckpoint()
    rules = []
    rnd = 0
    while len(rules) < n_merges:
        k = min(batch_size, n_merges - len(rules))
        window = max(8 * k, 64) if k > 1 else 1
        pairs = (
            words.select(
                "freq",
                # Adjacent pairs via slice+zip_with, NOT
                # sequence(1, size-1): SQL sequence(1, 0) is the
                # DESCENDING [1, 0] (caught by the 10× rehearsal at
                # 256 merges, where hot words collapse to ONE symbol
                # and the old form indexed out of bounds).  The slice
                # form degrades to an empty pair list instead.
                F.explode(
                    F.expr(
                        "zip_with(slice(symbols, 1, size(symbols) - 1),"
                        " slice(symbols, 2, size(symbols) - 1),"
                        " (l, r) -> struct(l AS l, r AS r))"
                    )
                ).alias("p"),
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("n"))
            # Deterministic under any partitioning: count desc, then
            # lexicographic.
            .orderBy(F.desc("n"), "l", "r")
            .limit(window)
            .collect()
        )
        batch = _select_batch(pairs, k, min_pair_freq)
        if not batch:
            break
        for left, right, n in batch:
            rules.append((len(rules), rnd, left, right, left + right, n))
        words = words.select(
            "freq",
            F.expr(
                _merge_batch_expr([(l, r) for l, r, _ in batch])
            ).alias("symbols"),
        ).localCheckpoint()
        rnd += 1
    return spark.createDataFrame(
        rules, "rank INT, round INT, left STRING, right STRING,"
               " merged STRING, pair_freq BIGINT"
    )


def bpe_encode(docs: DataFrame, merges: list[tuple[str, str]],
               id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, bpe_tokens, n_tokens): apply an ordered merge list to every
    document — pure in-row projection (the encode side of the trained
    tokenizer; zero shuffle at any corpus size)."""
    return bpe_encode_grouped(
        docs, [[m] for m in merges], id_col=id_col, text_col=text_col
    )


def bpe_encode_grouped(
    docs: DataFrame,
    rule_rounds: list[list[tuple[str, str]]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Encode with the merge rules GROUPED as trained (one inner list
    per training round; rules within a round are symbol-disjoint, so
    each round folds in a single pass).  This is what keeps the encode
    expression tractable at real vocabulary sizes: a 32k-rule table
    trained at batch_size=32 nests ~1k fold layers instead of 32k —
    expression depth scales with ROUNDS, not rules."""
    from kcidb_spark.operators.dedup import tokenized

    expr = f"array_append(split(word, ''), '{EOW}')"
    for batch in rule_rounds:
        expr = _merge_batch_expr(batch, col=expr)
    per_word = (
        f"flatten(transform(tokens, word -> {expr}))"
    )
    return tokenized(docs, id_col, text_col).select(
        F.col(id_col),
        F.expr(per_word).alias("bpe_tokens"),
    ).withColumn("n_tokens", F.size("bpe_tokens"))


def rule_rounds(rules) -> list[list[tuple[str, str]]]:
    """Group a collected ``bpe_train`` result (Rows with round/rank)
    into the per-round rule lists ``bpe_encode_grouped`` takes."""
    rounds: dict[int, list[tuple[int, str, str]]] = {}
    for r in rules:
        rounds.setdefault(r["round"], []).append(
            (r["rank"], r["left"], r["right"])
        )
    return [
        [(left, right) for _, left, right in sorted(rounds[k])]
        for k in sorted(rounds)
    ]
