"""corpus_unimax_budget: the waterfilling invariants no single-SF
oracle row can see at once (the gate corpus pins one budget/corpus
ratio; these sweep the ratio)."""

from __future__ import annotations

import math

import pytest


def _alloc(counts: dict[str, int], epochs: int, budget: int):
    """Reference implementation of the closed-form waterfilling, used
    to cross-check the engine on swept budgets."""
    caps = sorted((n * epochs, lang) for lang, n in counts.items())
    L = len(caps)
    alloc = {}
    csum = 0
    k = 0
    for i, (cap, lang) in enumerate(caps, start=1):
        if cap * (L - i + 1) <= budget - csum:
            alloc[lang] = cap
            csum += cap
            k = i
        else:
            break
    m = L - k
    if m:
        rem = budget - csum
        base, extra = divmod(rem, m)
        for j, (cap, lang) in enumerate(caps[k:], start=1):
            alloc[lang] = base + (1 if j <= extra else 0)
    return alloc


@pytest.mark.parametrize("budget_scale", [0.3, 0.8, 1.0, 1.5, 3.0])
def test_unimax_invariants_swept(budget_scale):
    """Invariants at every budget/corpus ratio: (a) nothing exceeds
    its epoch cap; (b) the full budget is spent unless the corpus
    runs out first, in which case exactly the corpus is spent; (c)
    unbound languages differ by at most one token; (d) no unbound
    language gets less than a bound one's cap."""
    counts = {"de": 3549, "fr": 3758, "es": 3958, "zh": 4143, "en": 11757}
    epochs = 2
    total_caps = sum(n * epochs for n in counts.values())
    budget = int(total_caps * budget_scale)
    alloc = _alloc(counts, epochs, budget)
    assert set(alloc) == set(counts)
    for lang, a in alloc.items():
        assert 0 <= a <= counts[lang] * epochs
    assert sum(alloc.values()) == min(budget, total_caps)
    unbound = [a for lang, a in alloc.items()
               if a < counts[lang] * epochs]
    if unbound:
        assert max(unbound) - min(unbound) <= 1
        bound = [counts[lang] * epochs for lang, a in alloc.items()
                 if a == counts[lang] * epochs]
        if bound:
            assert min(unbound) >= max(bound) - 1


def test_unimax_engine_matches_reference(spark):
    """The registry entry's allocation equals the reference
    waterfilling on the gate corpus (the oracle pins this
    cross-engine; this pins it against an independent Python
    derivation, so a matched-but-wrong SQL pair cannot hide)."""
    from kcidb_spark.queries.mixing import (
        _UNIMAX_BUDGET,
        _UNIMAX_EPOCHS,
        corpus_unimax_budget,
    )

    rows = corpus_unimax_budget(spark, "/root/testdata/sf0.01").collect()
    counts = {r["lang"]: r["n_tokens"] for r in rows}
    expect = _alloc(counts, _UNIMAX_EPOCHS, _UNIMAX_BUDGET)
    got = {r["lang"]: r["alloc_tokens"] for r in rows}
    assert got == expect
    # The gate constants really exercise the split regime.
    bound = [r for r in rows if r["alloc_tokens"] == r["cap"]]
    unbound = [r for r in rows if r["alloc_tokens"] < r["cap"]]
    assert bound and unbound
