"""Implementation hashing for gate-staleness detection (VERDICT r12
"Next round" #5): every registered query gets a content hash of its
implementation source — the function body plus the defining module
and that module's direct in-repo imports — recorded in
``GATE_HASHES.json`` when the query was last driver-certified.  The
gate ordering compares current hashes against the recorded ones and
auto-prioritizes mismatches, so an edited query body lands in the
next correctness window WITHOUT a hand-curated ``_GATE_RECHECK``
entry (the r12 failure mode: t19/t20/pipeline_assemble_corpus changed
implementation and slipped the window because the manual list was
ordered optimistically).

Granularity is deliberately coarse on the module axis: an edit
anywhere in a query's defining module (or a module it directly
imports from the repo) marks every query of that module stale.  That
over-flags — the cost is a few extra re-check rows in a 50-row
window — and never under-flags a helper edit, which is the failure
that matters.  Function-level hashes let the ordering put queries
whose OWN body changed ahead of module-neighbor flags.
"""

from __future__ import annotations

import hashlib
import inspect
import re
import sys

#: module name -> source text (read once per process).
_MOD_SRC_CACHE: dict[str, str] = {}
#: module name -> sorted direct kcidb_spark imports (textual scan, so
#: function-level imports — the repo's dominant style — are caught).
_MOD_DEPS_CACHE: dict[str, tuple[str, ...]] = {}

_IMPORT_RE = re.compile(
    r"^\s*(?:from|import)\s+(kcidb_spark(?:\.\w+)*)", re.MULTILINE
)


def _module_source(mod_name: str) -> str:
    if mod_name not in _MOD_SRC_CACHE:
        mod = sys.modules.get(mod_name)
        if mod is None:
            # The textual _IMPORT_RE scan can surface a module name
            # from a commented-out or since-deleted import line; an
            # unimportable name must stay SAFE-SIDE (hash over an
            # empty source only over-flags staleness), not crash the
            # gate ordering (ADVICE r13).
            try:
                __import__(mod_name)
                mod = sys.modules.get(mod_name)
            except ImportError:
                mod = None
        if mod is None:
            _MOD_SRC_CACHE[mod_name] = ""
            return ""
        try:
            _MOD_SRC_CACHE[mod_name] = inspect.getsource(mod)
        except (OSError, TypeError):
            _MOD_SRC_CACHE[mod_name] = ""
    return _MOD_SRC_CACHE[mod_name]


def _direct_deps(mod_name: str) -> tuple[str, ...]:
    if mod_name not in _MOD_DEPS_CACHE:
        found = set(_IMPORT_RE.findall(_module_source(mod_name)))
        found.discard(mod_name)
        # The registry/queries packages are plumbing, not semantics.
        found -= {"kcidb_spark", "kcidb_spark.queries",
                  "kcidb_spark.queries.registry"}
        _MOD_DEPS_CACHE[mod_name] = tuple(sorted(found))
    return _MOD_DEPS_CACHE[mod_name]


def impl_hashes(fn) -> tuple[str, str]:
    """(fn_hash, env_hash) for a registered query callable: the hash
    of its own source, and the hash of its defining module plus that
    module's direct in-repo imports' sources."""
    try:
        fn_src = inspect.getsource(fn)
    except (OSError, TypeError):
        fn_src = fn.__qualname__
    fn_hash = hashlib.sha256(fn_src.encode()).hexdigest()[:16]
    mod_name = fn.__module__
    h = hashlib.sha256()
    h.update(_module_source(mod_name).encode())
    for dep in _direct_deps(mod_name):
        h.update(dep.encode())
        h.update(_module_source(dep).encode())
    return fn_hash, h.hexdigest()[:16]


def registry_hashes() -> dict[str, dict[str, str]]:
    """name -> {"fn": fn_hash, "env": env_hash} for every registered
    query (imports the registry — call after module load)."""
    from kcidb_spark.queries.registry import REGISTRY

    return {
        name: dict(zip(("fn", "env"), impl_hashes(q.spark)))
        for name, q in REGISTRY.items()
    }
