"""Unigram-LM tokenizer training at corpus scale (SentencePiece's
unigram model, Kudo 2018, arXiv:1804.10959 — simplified to hard EM).

The Spark shape mirrors :mod:`kcidb_spark.operators.bpe`:

* The CORPUS is touched exactly once — aggregated into the
  Zipf-compressed ``(word, freq)`` table (one shuffle).  Everything
  the EM loop does runs over that table, never the corpus.
* Seed vocabulary: every substring of length ≤ ``max_piece_len``
  over distinct words, frequency-weighted (in-row substring
  explosion → one partial-aggregated groupBy), truncated to
  ``seed_mult × vocab_size`` top pieces, plus ALL single characters
  (the closure guarantee: any word stays segmentable at any prune).
* EM round = Viterbi-segment every distinct word under the current
  piece costs (an Arrow-batched ``mapInPandas`` over the word table —
  Python on the VOCAB-SIZED working set is the documented acceptable
  pattern, exactly like k-means' driver-held centroids; the corpus
  never crosses the Python boundary) → piece counts (groupBy sum) →
  driver-side M-step renormalize + prune to the target size.
  Per-round driver state is the vocabulary itself — small by
  definition (it IS the tokenizer being learned).

Determinism: Viterbi ties break on (cost, longer piece first, then
lexicographic); prune order is (count desc, piece) — reproducible
under any partitioning.  tests/test_unigram.py pins segmentation
optimality against brute-force enumeration and the trainer against an
independent pure-Python reference.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_freqs(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """(word, freq): the Zipf-compressed working set (one corpus
    pass; reuses the BPE normalization so both tokenizers train on
    the identical token stream)."""
    from kcidb_spark.operators.dedup import tokenized

    return (
        tokenized(docs, id_col, text_col)
        .select(F.explode("tokens").alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def oov_cost(costs: dict[str, float]) -> float:
    """The out-of-vocabulary character penalty for a cost table —
    computed ONCE per table (it is an O(|vocab|) scan; at 32k-vocab
    scale recomputing it per word would dwarf the Viterbi DP itself)
    and passed into :func:`viterbi_segment` by every batch loop."""
    return max(costs.values()) + 10.0 if costs else 10.0


def viterbi_segment(word: str, costs: dict[str, float],
                    max_piece_len: int, oov: float | None = None) -> list[str]:
    """Min-cost segmentation of ``word`` into vocabulary pieces.
    Deterministic: on equal cost the LONGER piece wins, then the
    lexicographically smaller one.  Single characters are assumed
    present in ``costs`` (the closure guarantee); characters outside
    the vocabulary get an out-of-vocabulary penalty cost so
    segmentation never fails.  Callers segmenting many words should
    pass ``oov`` precomputed via :func:`oov_cost`."""
    if oov is None:
        oov = oov_cost(costs)
    n = len(word)
    # best[i] = (cost, -final_piece_len, final_piece, start_of_final):
    # plain tuple comparison IS the deterministic total order (cost,
    # then longer final piece, then lexicographic).
    best: list[tuple] = [(0.0, 0, "", 0)] + [None] * n
    for i in range(1, n + 1):
        cur = None
        for j in range(max(0, i - max_piece_len), i):
            if best[j] is None:
                continue
            piece = word[j:i]
            c = costs.get(piece)
            if c is None:
                if len(piece) > 1:
                    continue
                c = oov
            cand = (best[j][0] + c, -len(piece), piece, j)
            if cur is None or cand < cur:
                cur = cand
        best[i] = cur
    pieces: list[str] = []
    i = n
    while i > 0:
        _, _, piece, j = best[i]
        pieces.append(piece)
        i = j
    pieces.reverse()
    return pieces


def _count_pieces(words: DataFrame, costs: dict[str, float],
                  max_piece_len: int) -> DataFrame:
    """(piece, n): frequency-weighted Viterbi piece counts over the
    distinct-word table — the E-step, Arrow-batched."""
    spark = words.sparkSession
    bc = spark.sparkContext.broadcast((costs, max_piece_len))

    def run(batches):
        import pandas as pd

        cost_map, mpl = bc.value
        oov = oov_cost(cost_map)
        for pdf in batches:
            counts: dict[str, int] = {}
            for word, freq in zip(pdf["word"], pdf["freq"]):
                for piece in viterbi_segment(word, cost_map, mpl, oov):
                    counts[piece] = counts.get(piece, 0) + int(freq)
            yield pd.DataFrame(
                {"piece": list(counts), "n": list(counts.values())}
            )

    return (
        words.mapInPandas(run, schema="piece string, n long")
        .groupBy("piece")
        .agg(F.sum("n").alias("n"))
    )


def unigram_train(
    docs: DataFrame,
    vocab_size: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_piece_len: int = 6,
    seed_mult: int = 4,
    n_rounds: int = 3,
    prune_frac: float = 0.25,
) -> DataFrame:
    """Learn a unigram tokenizer vocabulary.

    Returns (rank, piece, logprob, count): pieces ordered by final
    count desc then lexicographic; ``logprob`` is the piece's
    log-probability under the final counts.  Single-character pieces
    are never pruned (closure), and the vocabulary shrinks by
    ``prune_frac`` of the excess per round until ``vocab_size``.
    """
    spark = docs.sparkSession
    words = word_freqs(docs, id_col, text_col).localCheckpoint()

    # Seed: frequency-weighted substrings (≤ max_piece_len) + chars.
    subs = words.select(
        "freq",
        F.explode(
            F.expr(
                f"flatten(transform(sequence(1, length(word)),"
                f" i -> transform(sequence(1, least({max_piece_len},"
                f" length(word) - i + 1)),"
                f" l -> substring(word, i, l))))"
            )
        ).alias("piece"),
    ).groupBy("piece").agg(F.sum("freq").alias("n"))
    n_seed = seed_mult * vocab_size
    top = subs.orderBy(F.desc("n"), "piece").limit(n_seed).collect()
    chars = {
        r["piece"]: r["n"] for r in subs.filter(F.length("piece") == 1).collect()
    }
    seed = {r["piece"]: r["n"] for r in top}
    seed.update(chars)

    def to_costs(counts: dict[str, int]) -> dict[str, float]:
        total = sum(counts.values())
        return {p: -math.log(c / total) for p, c in counts.items() if c > 0}

    schema = "rank INT, piece STRING, logprob DOUBLE, count BIGINT"
    if not seed:
        # Empty corpus: an empty vocabulary with the output schema.
        return spark.createDataFrame([], schema)
    costs = to_costs(seed)
    counted = dict(seed)  # n_rounds=0 → the seed IS the vocabulary
    for _ in range(n_rounds):
        counted = {
            r["piece"]: r["n"]
            for r in _count_pieces(words, costs, max_piece_len).collect()
        }
        # Closure: unused single chars survive with a floor count.
        for ch in chars:
            counted.setdefault(ch, 1)
        multi = sorted(
            ((p, c) for p, c in counted.items() if len(p) > 1),
            key=lambda pc: (-pc[1], pc[0]),
        )
        n_chars = sum(1 for p in counted if len(p) == 1)
        target_multi = max(0, vocab_size - n_chars)
        if len(multi) > target_multi:
            # Shed prune_frac of the excess per round (gradual, as in
            # SentencePiece — pieces losing to the re-estimated costs
            # free their mass for the survivors' next E-step).
            drop = max(1, int((len(multi) - target_multi) * prune_frac))
            multi = multi[: max(target_multi, len(multi) - drop)]
        counted = {p: c for p, c in multi} | {
            p: c for p, c in counted.items() if len(p) == 1
        }
        costs = to_costs(counted)
        if len(counted) <= vocab_size:
            break
    # Final truncation to the target (chars always kept).
    multi = sorted(
        ((p, c) for p, c in counted.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0]),
    )[: max(0, vocab_size - sum(1 for p in counted if len(p) == 1))]
    counted = {p: c for p, c in multi} | {
        p: c for p, c in counted.items() if len(p) == 1
    }
    final = sorted(counted.items(), key=lambda pc: (-pc[1], pc[0]))
    total = sum(c for _, c in final)
    rows = [
        (rank, p, math.log(c / total), int(c))
        for rank, (p, c) in enumerate(final)
    ]
    return spark.createDataFrame(rows, schema)


def unigram_encode(
    docs: DataFrame,
    vocab: list[tuple[str, float]],
    id_col: str = "doc_id",
    text_col: str = "text",
    max_piece_len: int = 6,
) -> DataFrame:
    """(id, pieces, n_pieces): Viterbi-encode every document with a
    trained vocabulary (list of (piece, logprob)).  Arrow-batched
    ``mapInPandas``; the JVM side tokenizes and the Python side only
    segments — zero shuffle at any corpus size."""
    from kcidb_spark.operators.dedup import tokenized

    spark = docs.sparkSession
    costs = {p: -lp for p, lp in vocab}
    bc = spark.sparkContext.broadcast((costs, max_piece_len))

    def run(batches):
        import pandas as pd

        cost_map, mpl = bc.value
        oov = oov_cost(cost_map)
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            out = []
            for toks in pdf["tokens"]:
                pieces: list[str] = []
                for w in toks:
                    seg = cache.get(w)
                    if seg is None:
                        seg = viterbi_segment(w, cost_map, mpl, oov)
                        cache[w] = seg
                    pieces.extend(seg)
                out.append(pieces)
            yield pd.DataFrame({"id": pdf["id"], "pieces": out})

    toks = tokenized(docs, id_col, text_col).select(
        F.col(id_col).alias("id"), "tokens"
    )
    # The id column keeps ITS declared type through the Python hop —
    # a string/int id store must not be silently cast to long.
    id_type = docs.schema[id_col].dataType.simpleString()
    return (
        toks.mapInPandas(run, schema=f"id {id_type}, pieces array<string>")
        .select(
            F.col("id").alias(id_col),
            "pieces",
            F.size("pieces").alias("n_pieces"),
        )
    )
