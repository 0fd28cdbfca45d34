"""The static kcidb object graph and per-type id fields.

Reference: io.SCHEMA.graph as consumed by the SQL generators
(kcidb/db/postgresql/v04_00.py:686-740) and id_fields
(kcidb/db/abstract.py:261-267, kcidb/orm/data.py:342,451):

    ""(root) ─→ checkouts ─→ builds ─→ tests ─┐
         └────→ issues ───────────────────────┼─→ incidents
                              builds ─────────┘

The graph is fixed and shallow (depth ≤ 3), so relational closures are
unrolled joins — no recursion needed (SURVEY.md §2.3 J2/J3).
"""

from __future__ import annotations

from dataclasses import dataclass

#: Load/creation order (parents before children).
TABLES = ("checkouts", "builds", "tests", "issues", "incidents")

#: Primary-key fields per object list (issues have a composite PK).
ID_FIELDS: dict[str, tuple[str, ...]] = {
    "checkouts": ("id",),
    "builds": ("id",),
    "tests": ("id",),
    "issues": ("id", "version"),
    "incidents": ("id",),
}


@dataclass(frozen=True)
class Edge:
    """A parent→child relation: child rows carry the parent key in
    ``child_fk`` columns (reference naming: <parent>_<field>)."""

    parent: str
    child: str
    child_fk: tuple[str, ...]
    parent_key: tuple[str, ...]


EDGES: tuple[Edge, ...] = (
    Edge("checkouts", "builds", ("checkout_id",), ("id",)),
    Edge("builds", "tests", ("build_id",), ("id",)),
    Edge("builds", "incidents", ("build_id",), ("id",)),
    Edge("tests", "incidents", ("test_id",), ("id",)),
    Edge("issues", "incidents", ("issue_id", "issue_version"), ("id", "version")),
)

#: Top-down traversal order for children closures.
TOPO_DOWN = ("checkouts", "builds", "tests", "issues", "incidents")
#: Bottom-up traversal order for parents closures.
TOPO_UP = tuple(reversed(TOPO_DOWN))


def parents_of(table: str) -> list[Edge]:
    return [e for e in EDGES if e.child == table]


def children_of(table: str) -> list[Edge]:
    return [e for e in EDGES if e.parent == table]
