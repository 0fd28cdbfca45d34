#!/usr/bin/env python
"""Refresh GATE_HASHES.json — the per-query implementation hashes
recorded at certification time (VERDICT r12 "Next round" #5).

Run at ROUND START, before touching any code: HEAD is then exactly
the code the driver's latest CORRECTNESS_r{N}.json certified, so
recording current hashes for that file's hash-green names is sound.
Any code edited later in the round diverges from its recorded hash
and is auto-prioritized by the gate ordering (_stale_certified).

``--seed`` additionally records hashes for every query certified in
ANY past round (the initial migration: the per-round local parity
sweep — test_oracle_parity.py — re-proves the whole oracle-bearing
registry green against the current code each round, so "current code
is the certified code" holds for the union too at seed time).
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    from kcidb_spark.queries import REGISTRY  # noqa: F401 — load registry
    from kcidb_spark.queries.impl_hash import registry_hashes

    seed = "--seed" in sys.argv
    paths = sorted(
        REPO.glob("CORRECTNESS_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)),
    )
    green: set[str] = set()
    scan = paths if seed else paths[-1:]
    for path in scan:
        try:
            rows = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if isinstance(row, dict) and row.get("hash_match") is True:
                green.add(name)

    rec_path = REPO / "GATE_HASHES.json"
    try:
        recorded = json.loads(rec_path.read_text())
    except (OSError, ValueError):
        recorded = {}
    current = registry_hashes()
    updated = 0
    for name in sorted(green):
        if name in current and recorded.get(name) != current[name]:
            recorded[name] = current[name]
            updated += 1
    # Drop records for queries no longer registered.
    dropped = [n for n in recorded if n not in current]
    for n in dropped:
        del recorded[n]
    rec_path.write_text(json.dumps(recorded, indent=1, sort_keys=True))
    print(
        json.dumps(
            {
                "recorded": len(recorded),
                "updated": updated,
                "dropped": len(dropped),
                "source": [p.name for p in scan][-3:],
            }
        )
    )


if __name__ == "__main__":
    main()
