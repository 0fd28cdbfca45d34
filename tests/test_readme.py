"""README claims that can drift are pinned to the code (VERDICT r9
"Next round" #6: the registry counts were one round behind)."""

from __future__ import annotations

import re
from pathlib import Path


def test_readme_registry_counts_match():
    from kcidb_spark.queries import REGISTRY

    text = (Path(__file__).resolve().parents[1] / "README.md").read_text()
    m = re.search(
        r"exposes (\d+) registry queries \((\d+) with full DuckDB hash",
        text,
    )
    assert m, "README registry-count sentence not found"
    assert int(m.group(1)) == len(REGISTRY)
    assert int(m.group(2)) == sum(
        1 for q in REGISTRY.values() if q.oracle is not None
    )
