"""Gate-staleness auto-detection (VERDICT r12 "Next round" #5): an
edited query implementation must land in the next correctness window
WITHOUT a manual _GATE_RECHECK edit."""

from __future__ import annotations

import json
from pathlib import Path

from kcidb_spark.queries import (
    REGISTRY,
    _certified_names,
    _gate_order,
    _stale_certified,
)
from kcidb_spark.queries.impl_hash import impl_hashes, registry_hashes

REPO = Path(__file__).resolve().parents[1]


def test_current_hashes_are_stable_and_total():
    hashes = registry_hashes()
    assert set(hashes) == set(REGISTRY)
    again = registry_hashes()
    assert hashes == again


def test_edited_function_body_is_flagged_first():
    """Simulate last-certification records where one query's own
    function hash and another's module-environment hash are stale:
    both are flagged, own-body changes ordered first."""
    certified, _ = _certified_names()
    names = sorted(n for n in certified if n in REGISTRY)[:3]
    assert len(names) == 3, "need certified queries to simulate"
    rec = {}
    for n in names:
        fn_h, env_h = impl_hashes(REGISTRY[n].spark)
        rec[n] = {"fn": fn_h, "env": env_h}
    rec[names[0]]["env"] = "0" * 16          # helper-neighborhood edit
    rec[names[1]]["fn"] = "0" * 16           # own-body edit
    stale = _stale_certified(certified, recorded=rec)
    # Certified-but-unrecorded names are ALSO flagged (safe-side),
    # after the hash mismatches; within the recorded trio the
    # own-body change outranks the env change and the untouched
    # entry is not flagged.
    flagged_trio = [n for n in stale if n in names]
    assert flagged_trio == [names[1], names[0]]
    unrecorded = [n for n in stale if n not in rec]
    assert stale == flagged_trio + unrecorded


def test_committed_records_match_head_or_are_queued():
    """Every certified query is either hash-current against the
    committed GATE_HASHES.json or already queued in the upcoming gate
    window's re-check region — there is no third state in which a
    changed implementation silently keeps its old gate row."""
    certified, _ = _certified_names()
    recorded = json.loads((REPO / "GATE_HASHES.json").read_text())
    stale = set(_stale_certified(certified))
    order = _gate_order()
    # The driver gate window is 50 rows.  Every stale entry sits
    # inside it, UNLESS the stale set itself overflows the window —
    # then the weaker (and only satisfiable) safety property holds:
    # no window slot is wasted on an entry that doesn't need
    # (re)certification while a stale one waits outside.  Overflow
    # self-heals across rounds: entries not re-certified this round
    # keep their old GATE_HASHES record, stay stale, and sort to the
    # head of the NEXT round's window.
    from kcidb_spark.queries import _GATE_RECHECK

    window = order[:50]
    needs_cert = {
        n
        for n in window
        if n in stale or n not in certified or n in _GATE_RECHECK
    }
    overflow = [n for n in stale if n not in set(window)]
    if overflow:
        assert len(needs_cert) == len(window), (
            f"{len(overflow)} stale entries outside the window while "
            f"certified-and-current entries occupy slots: "
            f"{sorted(set(window) - needs_cert)[:5]}"
        )
    for name in certified & set(REGISTRY):
        if name not in recorded:
            continue
        fn_h, env_h = impl_hashes(REGISTRY[name].spark)
        current = recorded[name] == {"fn": fn_h, "env": env_h}
        assert current or name in stale
