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
            min_pair_freq: int = 2, batch_size: int = 1):
    """Executable spec mirroring bpe_train exactly, including batched
    mode: per round, greedy top-K compatible selection over the top
    max(8K, 64) count-sorted pairs, all batch rules applied in ONE
    left-to-right carry pass."""
    words: dict[tuple, int] = {}
    for w, f in word_freqs.items():
        words[tuple(list(w) + [EOW])] = words.get(tuple(list(w) + [EOW]), 0) + f
    rules = []
    while len(rules) < n_merges:
        k = min(batch_size, n_merges - len(rules))
        window = max(8 * k, 64) if k > 1 else 1
        counts: dict[tuple, int] = {}
        for sym, f in words.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                counts[p] = counts.get(p, 0) + f
        candidates = sorted(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )[:window]
        used: set[str] = set()
        batch = []
        for (left, right), n in candidates:
            if n < min_pair_freq:
                break
            if {left, right, left + right} & used:
                continue
            batch.append((left, right, n))
            used.update((left, right, left + right))
            if len(batch) == k:
                break
        if not batch:
            break
        lookup = {(left, right): left + right for left, right, _ in batch}
        for left, right, n in batch:
            rules.append((len(rules), left, right, left + right, n))
        merged: dict[tuple, int] = {}
        for sym, f in words.items():
            out, carry = [], None
            for s in sym:
                if carry is None:
                    carry = s
                elif (carry, s) in lookup:
                    out.append(lookup[(carry, s)])
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


def test_batched_trainer_matches_reference(spark, docs):
    """Batched mode (top-K compatible pairs per round) matches the
    mirrored pure-Python spec rule-for-rule, and batching with K=1 is
    exactly sequential BPE."""
    freqs: dict[str, int] = {}
    for _, text in CORPUS:
        for w in text.split():
            freqs[w] = freqs.get(w, 0) + 1
    for k in (2, 3, 8):
        got = [
            (r["rank"], r["left"], r["right"], r["merged"], r["pair_freq"])
            for r in bpe_train(docs, n_merges=8, batch_size=k)
            .orderBy("rank").collect()
        ]
        assert got == _py_bpe(freqs, n_merges=8, batch_size=k), k
        assert len(got) == 8, k
    # K=1 batched spec == the sequential spec (same code path).
    assert _py_bpe(freqs, 8, batch_size=1) == _py_bpe(freqs, 8)


def test_batched_rules_round_trip_through_encode(spark, docs):
    """A batched-trained merge table drives bpe_encode losslessly:
    batch members are symbol-disjoint, so sequential encode-time
    application reproduces the one-pass training apply."""
    rules = (
        bpe_train(docs, n_merges=8, batch_size=4).orderBy("rank").collect()
    )
    merges = [(r["left"], r["right"]) for r in rules]
    enc = {
        r["doc_id"]: list(r["bpe_tokens"])
        for r in bpe_encode(docs, merges).collect()
    }
    flat = "".join(enc[0]).replace(EOW, " ").strip()
    assert flat == CORPUS[0][1]


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


def test_encode_grouped_equals_sequential(spark, docs):
    """Per-round grouped folding == rule-at-a-time folding (the rules
    within a round are symbol-disjoint by construction)."""
    from kcidb_spark.operators.bpe import bpe_encode_grouped, rule_rounds

    rules = bpe_train(docs, n_merges=8, batch_size=4).orderBy("rank").collect()
    assert max(r["round"] for r in rules) <= 2  # batched: few rounds
    seq = {
        r["doc_id"]: list(r["bpe_tokens"])
        for r in bpe_encode(
            docs, [(r["left"], r["right"]) for r in rules]
        ).collect()
    }
    grp = {
        r["doc_id"]: list(r["bpe_tokens"])
        for r in bpe_encode_grouped(docs, rule_rounds(rules)).collect()
    }
    assert seq == grp
