"""Generate tests/golden/stable_* files by rendering the REFERENCE's
own Jinja2 stable-tree templates (kcidb/templates/stable_*.j2) over
the shared fixture revision of tests/test_render_stable.py — the same
provenance as the original 12 goldens: a passing golden test means the
engine-side Column render is byte-identical to what the reference
monitor would email.

The mock objects below implement exactly the attribute surface the
templates consume from the reference OO layer (kcidb/oo/__init__.py:
Revision.builds/tests/checkouts/tests_root/repo_branch_checkouts...).
Ordering choices (dict insertion order, list order) follow the
DETERMINISTIC orders the engine renders with (sorted URLs, sorted
origins/paths/architectures) — the fixture is constructed so both
agree (one element per ambiguous group).

Run:  python tools/gen_stable_goldens.py
"""

import sys
from pathlib import Path

import jinja2

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tests"))

from stable_fixture import (  # noqa: E402
    MAINLINE_URL,  # noqa: F401 — part of the shared fixture surface
    OMAP_URL,
    STABLE_RT_URL,
    FIXTURE,
    FIXTURE_ALLPASS,
    FIXTURE_EMPTY,
)

TEMPLATES = Path("/root/reference/kcidb/templates")
GOLDEN = REPO / "tests" / "golden"


class O:
    def __init__(self, **kw):
        self.__dict__.update(kw)


def _build_objects(fixture):
    cos, blds, tsts = {}, {}, []
    for c in fixture["checkouts"]:
        cos[c["id"]] = O(
            origin=c["origin"],
            git_repository_url=c["git_repository_url"],
            git_repository_branch=c["git_repository_branch"],
            git_commit_hash=c["git_commit_hash"],
            git_commit_name=c.get("git_commit_name"),
            git_commit_tags=c.get("git_commit_tags"),
            comment=c.get("comment"),
            valid=c.get("valid"),
        )
    for b in fixture["builds"]:
        blds[b["id"]] = O(
            id=b["id"],
            origin=b["origin"],
            status=b.get("status"),
            architecture=b.get("architecture"),
            config_name=b.get("config_name"),
            log_excerpt=b.get("log_excerpt"),
            checkout=cos[b["checkout_id"]],
        )
    for t in fixture["tests"]:
        tsts.append(
            O(
                id=t["id"],
                origin=t["origin"],
                status=t.get("status"),
                path=t.get("path"),
                environment_misc=(t.get("environment") or {}).get(
                    "misc"
                ),
                build=blds[t["build_id"]],
            )
        )
    return cos, blds, tsts


class Node:
    """tests_root[path].status_tests[status] — the subtree of tests
    whose top-level path component equals ``path``, keyed by status
    (kcidb/oo/__init__.py tests_root node surface)."""

    def __init__(self, tests):
        self._tests = tests

    def __getitem__(self, top):
        sub = [
            t
            for t in self._tests
            if t.path is not None and t.path.split(".")[0] == top
        ]
        return O(
            status_tests={
                s: [t for t in sub if t.status == s]
                for s in ("FAIL", "ERROR", "MISS", "PASS", "DONE", "SKIP")
            }
        )


def make_revision(fixture):
    cos, blds, tsts = _build_objects(fixture)
    # Deterministic ordering: URLs sorted ascending (the engine's
    # array_sort choice); branches sorted within a URL; checkout lists
    # in id order.
    rbc = {}
    ordered = sorted(
        cos.values(),
        key=lambda c: (c.git_repository_url, c.git_repository_branch),
    )
    for c in ordered:
        rbc.setdefault(c.git_repository_url, {}).setdefault(
            c.git_repository_branch, []
        ).append(c)
    first = ordered[0]
    # Reference VALID_PRIORITY rollup (kcidb/oo/__init__.py:110,464):
    # False beats True beats None.
    valids = [c.valid for c in ordered]
    checkouts_valid = min(
        valids, key=lambda v: {False: 1, True: 2, None: 3}[v],
        default=None,
    )
    return O(
        git_commit_hash=first.git_commit_hash,
        git_commit_name=next(
            (
                c.git_commit_name
                for c in ordered
                if c.git_commit_name is not None
            ),
            None,
        ),
        patchset_hash=next(
            (
                c["patchset_hash"]
                for c in fixture["checkouts"]
                if c.get("patchset_hash")
            ),
            "",
        ),
        patchset_files=[
            O(**f)
            for c in sorted(fixture["checkouts"], key=lambda c: c["id"])
            for f in c.get("patchset_files", [])
        ],
        checkouts=ordered,
        checkouts_valid=checkouts_valid,
        builds=sorted(blds.values(), key=lambda b: b.id),
        tests=sorted(tsts, key=lambda t: t.id),
        tests_root=Node(sorted(tsts, key=lambda t: t.id)),
        repo_branch_checkouts=rbc,
    )


def main():
    env = jinja2.Environment(
        loader=jinja2.FileSystemLoader(str(TEMPLATES)),
        trim_blocks=True,
        lstrip_blocks=True,
        keep_trailing_newline=True,
    )

    def render(fixture, main_repo_url, sfx=""):
        rev = make_revision(fixture)
        return {
            f"stable_revision_summary{sfx}.txt": env.get_template(
                "stable_revision_summary.txt.j2"
            ).render(revision=rev),
            f"stable_rc_revision_description{sfx}.txt": env.get_template(
                "stable_rc_revision_description.txt.j2"
            ).render(revision=rev, main_repo_url=main_repo_url),
            f"stable_rt_revision_description{sfx}.txt": env.get_template(
                "stable_rt_revision_description.txt.j2"
            ).render(revision=rev),
        }

    out = {}
    out.update(render(FIXTURE, OMAP_URL))
    out.update(render(FIXTURE_ALLPASS, STABLE_RT_URL, "_allpass"))
    out.update(render(FIXTURE_EMPTY, STABLE_RT_URL, "_empty"))
    for name, text in out.items():
        (GOLDEN / name).write_text(text)
        print(f"wrote {name}: {len(text)} bytes")


if __name__ == "__main__":
    main()
