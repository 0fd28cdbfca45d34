"""BPE trainer: Spark merge loop vs a pure-Python reference.

The trainer has no SQL oracle (data-dependent iterative rules), so
its correctness gate is this executable specification: an
in-memory BPE implementation following Sennrich et al.'s algorithm
with the identical tie-break (count desc, then lexicographic pair).
"""

from __future__ import annotations

import pytest

from kcidb_spark.operators.bpe import EOW, bpe_encode, bpe_train


def _py_bpe(word_freqs: dict[str, int], n_merges: int,
            min_pair_freq: int = 2):
    words: dict[tuple, int] = {}
    for w, f in word_freqs.items():
        words[tuple(list(w) + [EOW])] = words.get(tuple(list(w) + [EOW]), 0) + f
    rules = []
    for rank in range(n_merges):
        counts: dict[tuple, int] = {}
        for sym, f in words.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        (left, right), n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if n < min_pair_freq:
            break
        rules.append((rank, left, right, left + right, n))
        merged: dict[tuple, int] = {}
        for sym, f in words.items():
            out, carry = [], None
            for s in sym:
                if carry is None:
                    carry = s
                elif carry == left and s == right:
                    out.append(left + right)
                    carry = None
                else:
                    out.append(carry)
                    carry = s
            if carry is not None:
                out.append(carry)
            merged[tuple(out)] = merged.get(tuple(out), 0) + f
        words = merged
    return rules


CORPUS = [
    (0, "low low low low low"),
    (1, "lower lower newest newest"),
    (2, "newest newest newest newest"),
    (3, "widest widest widest"),
    (4, "low lower newest"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_trainer_matches_reference(spark, docs):
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_freq"])
        for r in bpe_train(docs, n_merges=8).orderBy("rank").collect()
    ]
    freqs: dict[str, int] = {}
    for _, text in CORPUS:
        for w in text.split():
            freqs[w] = freqs.get(w, 0) + 1
    want = _py_bpe(freqs, n_merges=8)
    assert got == want
    assert len(got) == 8  # this corpus supports all 8 merges


def test_trainer_stops_at_min_freq(spark):
    docs = spark.createDataFrame(
        [(0, "ab cd ef")], "doc_id long, text string"
    )
    # Every pair occurs once — below min_pair_freq=2, zero rules.
    assert bpe_train(docs, n_merges=5).count() == 0


def test_encode_applies_learned_merges(spark, docs):
    rules = bpe_train(docs, n_merges=8).orderBy("rank").collect()
    merges = [(r["left"], r["right"]) for r in rules]
    enc = {
        r["doc_id"]: list(r["bpe_tokens"])
        for r in bpe_encode(docs, merges).collect()
    }
    # 'newest' dominates the corpus: after 8 merges it encodes into
    # few units, and every token stream ends words with the marker
    # folded into a merged unit or the bare marker.
    assert enc[2]  # non-empty
    n_newest_units = len(enc[2]) // 4  # doc 2 = 'newest' ×4
    assert n_newest_units <= 3
    # Round-trip property: concatenating a doc's BPE tokens and
    # removing markers reproduces the normalized text.
    flat = "".join(enc[0]).replace(EOW, " ").strip()
    assert flat == CORPUS[0][1]


def test_merge_symbols_validated(spark, docs):
    """Caller-supplied merge symbols outside the normalized [a-z0-9_]
    alphabet are rejected before reaching the SQL parser (ADVICE r6:
    a quote in a symbol would break parsing or inject SQL)."""
    import pytest

    for bad in [("a'", "b"), ("a", "b;drop"), ("A", "b"), ("", "b")]:
        with pytest.raises(ValueError, match="alphabet"):
            bpe_encode(docs, [bad]).collect()
