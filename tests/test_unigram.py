"""Unigram-LM tokenizer trainer: Viterbi optimality vs brute force,
trainer vs an independent pure-Python reference, encode round-trip.

No SQL oracle exists for an EM trainer (data-dependent iterative
state), so — like the BPE trainer — its gate is an executable spec.
"""

from __future__ import annotations

import itertools
import math

import pytest

from kcidb_spark.operators.unigram import (
    unigram_encode,
    unigram_train,
    viterbi_segment,
    word_freqs,
)

CORPUS = [
    (0, "internal international internet interface"),
    (1, "national nation international internals"),
    (2, "interface interface internals nation"),
    (3, "the net the face the nation the inter"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def _brute_best(word, costs, max_piece_len):
    """Minimum-cost segmentation by enumerating ALL segmentations."""
    n = len(word)
    oov = max(costs.values()) + 10.0
    best = None
    for cuts in itertools.product([0, 1], repeat=n - 1):
        pieces, start = [], 0
        for i, cut in enumerate(cuts, start=1):
            if cut:
                pieces.append(word[start:i])
                start = i
        pieces.append(word[start:])
        if any(len(p) > max_piece_len for p in pieces):
            continue
        cost = 0.0
        ok = True
        for p in pieces:
            c = costs.get(p)
            if c is None:
                if len(p) > 1:
                    ok = False
                    break
                c = oov
            cost += c
        if ok and (best is None or cost < best[0]):
            best = (cost, pieces)
    return best


def test_viterbi_matches_bruteforce():
    costs = {
        "i": 3.0, "n": 3.0, "t": 3.0, "e": 3.0, "r": 3.0, "a": 3.0,
        "l": 3.0, "o": 3.0, "f": 3.0, "c": 3.0, "s": 3.0, "h": 3.0,
        "inter": 1.2, "nation": 1.1, "inte": 2.0, "rn": 2.2,
        "al": 1.8, "face": 1.5, "net": 1.6, "the": 1.0,
    }
    for word in ["international", "interface", "internet", "nationals",
                 "the", "internals", "xyzzy"]:
        got = viterbi_segment(word, costs, max_piece_len=6)
        assert "".join(got) == word
        want = _brute_best(word, costs, 6)
        got_cost = sum(
            costs.get(p, max(costs.values()) + 10.0) for p in got
        )
        assert math.isclose(got_cost, want[0]), (word, got, want)


def test_viterbi_deterministic_ties():
    # Two segmentations with identical cost: the longer-piece-first
    # tie-break must pick the same one every time.
    costs = {"a": 1.0, "b": 1.0, "ab": 2.0, "ba": 2.0}
    assert viterbi_segment("aba", costs, 2) == viterbi_segment("aba", costs, 2)
    # "ab"+"a" (2+1=3) ties "a"+"ba" (1+2=3) ties singles (3): the
    # final-piece tie-break prefers the longer final piece ("ba").
    assert viterbi_segment("aba", costs, 2) == ["a", "ba"]


def _py_unigram_reference(texts, **kw):
    """Independent reference: same algorithm over plain dicts."""
    from kcidb_spark.operators.unigram import viterbi_segment as vs

    vocab_size = kw.get("vocab_size", 24)
    mpl = kw.get("max_piece_len", 6)
    seed_mult = kw.get("seed_mult", 4)
    n_rounds = kw.get("n_rounds", 3)
    prune_frac = kw.get("prune_frac", 0.25)

    import re

    freqs: dict[str, int] = {}
    for t in texts:
        for w in re.sub(r"[^a-z0-9]+", " ", t.lower()).split():
            freqs[w] = freqs.get(w, 0) + 1
    subs: dict[str, int] = {}
    for w, f in freqs.items():
        for i in range(len(w)):
            for L in range(1, min(mpl, len(w) - i) + 1):
                p = w[i:i + L]
                subs[p] = subs.get(p, 0) + f
    top = sorted(subs.items(), key=lambda pc: (-pc[1], pc[0]))
    seed = dict(top[: seed_mult * vocab_size])
    for p, c in subs.items():
        if len(p) == 1:
            seed[p] = c
    chars = {p for p in subs if len(p) == 1}

    def to_costs(counts):
        tot = sum(counts.values())
        return {p: -math.log(c / tot) for p, c in counts.items() if c > 0}

    costs = to_costs(seed)
    counted: dict[str, int] = {}
    for _ in range(n_rounds):
        counted = {}
        for w, f in freqs.items():
            for p in vs(w, costs, mpl):
                counted[p] = counted.get(p, 0) + f
        for ch in chars:
            counted.setdefault(ch, 1)
        multi = sorted(
            ((p, c) for p, c in counted.items() if len(p) > 1),
            key=lambda pc: (-pc[1], pc[0]),
        )
        n_chars = sum(1 for p in counted if len(p) == 1)
        target_multi = max(0, vocab_size - n_chars)
        if len(multi) > target_multi:
            drop = max(1, int((len(multi) - target_multi) * prune_frac))
            multi = multi[: max(target_multi, len(multi) - drop)]
        counted = {p: c for p, c in multi} | {
            p: c for p, c in counted.items() if len(p) == 1
        }
        costs = to_costs(counted)
        if len(counted) <= vocab_size:
            break
    multi = sorted(
        ((p, c) for p, c in counted.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0]),
    )[: max(0, vocab_size - sum(1 for p in counted if len(p) == 1))]
    counted = {p: c for p, c in multi} | {
        p: c for p, c in counted.items() if len(p) == 1
    }
    return sorted(counted.items(), key=lambda pc: (-pc[1], pc[0]))


def test_trainer_matches_reference(spark, docs):
    got = [
        (r["rank"], r["piece"], r["count"])
        for r in unigram_train(docs, vocab_size=24).orderBy("rank").collect()
    ]
    want = [
        (rank, p, c)
        for rank, (p, c) in enumerate(
            _py_unigram_reference([t for _, t in CORPUS], vocab_size=24)
        )
    ]
    assert got == want
    pieces = {p for _, p, _ in got}
    # Multi-character morphemes of this corpus must be learned.
    assert {"inter", "nation"} <= pieces or {"inter", "nation"} & pieces
    # Closure: every character of the corpus survives pruning.
    corpus_chars = {c for _, t in CORPUS for c in t if c.isalnum()}
    assert corpus_chars <= pieces


def test_encode_round_trip(spark, docs):
    rules = unigram_train(docs, vocab_size=24).collect()
    vocab = [(r["piece"], r["logprob"]) for r in rules]
    enc = {
        r["doc_id"]: list(r["pieces"])
        for r in unigram_encode(docs, vocab).collect()
    }
    # Concatenating pieces reproduces the normalized text.
    flat = "".join(enc[0])
    assert flat == CORPUS[0][1].replace(" ", "")
    # Compression: fewer pieces than characters.
    assert len(enc[0]) < len(flat)


def test_word_freqs(spark, docs):
    wf = {r["word"]: r["freq"] for r in word_freqs(docs).collect()}
    assert wf["interface"] == 3 and wf["the"] == 4


def test_train_zero_rounds_returns_seed(spark, docs):
    """n_rounds=0 must return the (truncated) seed vocabulary, not
    raise NameError (ADVICE r7)."""
    rows = unigram_train(docs, vocab_size=24, n_rounds=0).collect()
    assert len(rows) > 0
    pieces = {r["piece"] for r in rows}
    corpus_chars = {c for _, t in CORPUS for c in t if c.isalnum()}
    assert corpus_chars <= pieces


def test_encode_preserves_id_type(spark, docs):
    """unigram_encode keeps the id column's declared type through the
    Python hop — a string-id store must not be cast to long
    (ADVICE r7)."""
    from pyspark.sql import functions as F

    rules = unigram_train(docs, vocab_size=24).collect()
    vocab = [(r["piece"], r["logprob"]) for r in rules]
    sdocs = docs.select(
        F.concat(F.lit("doc-"), F.col("doc_id").cast("string")).alias(
            "doc_id"
        ),
        "text",
    )
    out = unigram_encode(sdocs, vocab)
    assert out.schema["doc_id"].dataType.simpleString() == "string"
    got = {r["doc_id"] for r in out.collect()}
    assert got == {f"doc-{i}" for i, _ in CORPUS}
