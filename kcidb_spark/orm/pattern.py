"""Pattern query language parser.

Implements the reference's pattern-string grammar (ABNF documented at
kcidb/orm/query.py:626-716; examples: ``>checkout[x]#>build#>test#``,
``>test%<build#``, ``>revision[hash,phash]#>*#``, ``>*#``).

A pattern string is a series of specifications::

    <relation> <type> [<id list>] [<match>]

    relation: ">" children of bases (or root types)  |  "<" parents
    type:     a type name, or "*" = traverse recursively
    id list:  "[id; id…]" inline (fields comma-separated, quotable)
              or "%" placeholder consuming from a supplied list
    match:    "#" match all traversed  |  "$" match only the furthest

Parsing produces a set of leaf :class:`Pattern` nodes (linked to their
bases) plus the match set — the same expansion algorithm as the
reference (kcidb/orm/query.py:419-479): "*" iterates relation levels
until exhausted; bases without a matching relation are "unused" and
matched by "$".
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Iterable, Optional

from kcidb_spark.orm.types import TYPES, children_of, parents_of

_SPEC_RE = re.compile(
    r"\s*(?P<relation>[<>])"
    r"\s*(?P<type>\*|[a-z0-9_]+)"
    r"(?:\s*(?P<spec>%|\[(?:[^]\"]|\"(?:[^\"\\]|\\.)*\")*\]))?"
    r"(?:\s*(?P<match>[#$]))?"
)

_ID_FIELD_UNQUOTED_RE = re.compile(r"[A-Za-z0-9_:/.?%+-]+")


@dataclass(frozen=True)
class Pattern:
    """One traversal step; ``base`` chains towards the pattern start."""

    base: Optional["Pattern"]
    child: bool  # True: obj_type is a child of base; False: a parent
    obj_type: str
    obj_id_set: Optional[frozenset[tuple]]  # None = no id filter

    def __repr__(self) -> str:  # for debugging/tests
        ids = "" if self.obj_id_set is None else f"[{len(self.obj_id_set)} ids]"
        rel = ">" if self.child else "<"
        return f"{self.base or ''}{rel}{self.obj_type}{ids}"


def _parse_id_list(text: str) -> frozenset[tuple]:
    """Parse the inside of ``[...]``: ids separated by ';', id fields
    by ',', fields unquoted or double-quoted with backslash escapes."""
    ids = []
    pos = 0
    n = len(text)

    def skip_ws(p: int) -> int:
        while p < n and text[p] in " \t\n\r\x0b\x0c":
            p += 1
        return p

    fields: list[str] = []
    pos = skip_ws(pos)
    if pos == n:
        return frozenset()
    while True:
        pos = skip_ws(pos)
        if pos < n and text[pos] == '"':
            # quoted field
            pos += 1
            buf = []
            while pos < n and text[pos] != '"':
                if text[pos] == "\\" and pos + 1 < n:
                    buf.append(text[pos + 1])
                    pos += 2
                else:
                    buf.append(text[pos])
                    pos += 1
            if pos >= n:
                raise ValueError(f"unterminated quoted id field in {text!r}")
            pos += 1  # closing quote
            fields.append("".join(buf))
        else:
            m = _ID_FIELD_UNQUOTED_RE.match(text, pos)
            if not m:
                raise ValueError(f"invalid id field at {text[pos:]!r}")
            fields.append(m.group(0))
            pos = m.end()
        pos = skip_ws(pos)
        if pos == n:
            ids.append(tuple(fields))
            break
        if text[pos] == ",":
            pos += 1
            continue
        if text[pos] == ";":
            ids.append(tuple(fields))
            fields = []
            pos += 1
            continue
        raise ValueError(f"unexpected character {text[pos]!r} in id list {text!r}")
    return frozenset(ids)


def _coerce_ids(obj_type: str, ids: frozenset[tuple]) -> frozenset[tuple]:
    """Coerce string id fields to the type's field types (int for
    issue_version.version_num) and validate arity."""
    id_fields = TYPES[obj_type].id_fields
    out = set()
    for i in ids:
        if len(i) != len(id_fields):
            raise ValueError(
                f"invalid number of ID fields ({len(i)}) for {obj_type!r}; "
                f"expecting {len(id_fields)}: {i!r}"
            )
        coerced = tuple(
            int(part) if f == "version_num" and part is not None else part
            for f, part in zip(id_fields, i)
        )
        out.add(coerced)
    return frozenset(out)


def _expand(
    base_set: set[Pattern | None],
    match_set: set[Pattern],
    child: bool,
    type_expr: str,
    ids: Optional[frozenset[tuple]],
    match_spec: Optional[str],
) -> set[Pattern]:
    """One pattern-spec expansion (reference algorithm,
    kcidb/orm/query.py:419-479)."""

    def relation_step(bases: set) -> tuple[set[Pattern], set[Pattern]]:
        new_set: set[Pattern] = set()
        unused: set[Pattern] = set()
        if bases:
            for base in bases:
                base_new = set()
                related = (
                    [r.child for r in children_of(base.obj_type)]
                    if child
                    else [r.parent for r in parents_of(base.obj_type)]
                )
                for t in related:
                    if type_expr in ("*", t):
                        base_new.add(
                            Pattern(base, child, t,
                                    None if ids is None else _coerce_ids(t, ids))
                        )
                if base_new:
                    new_set |= base_new
                elif type_expr == "*":
                    unused.add(base)
                else:
                    rel = "child" if child else "parent"
                    raise ValueError(f"cannot find {rel} type {type_expr!r}")
        elif child:
            # Based on root: any type can start a chain.
            for t in TYPES:
                if type_expr in ("*", t):
                    new_set.add(
                        Pattern(None, True, t,
                                None if ids is None else _coerce_ids(t, ids))
                    )
            if not new_set and type_expr != "*":
                raise ValueError(f"cannot find type {type_expr!r}")
        return new_set, unused

    ref_set: set[Pattern] = set()
    bases = set(base_set)
    while True:
        bases, unused = relation_step(bases)
        if type_expr == "*":
            ref_set |= unused
            if match_spec == "$":
                match_set |= unused
            if not bases:
                break
            if match_spec == "#":
                match_set |= bases
        else:
            ref_set |= bases
            if match_spec is not None:
                match_set |= bases
            break
    return ref_set


def parse_pattern(
    string: str,
    id_set_list: Optional[list[Iterable[tuple]]] = None,
) -> set[Pattern]:
    """Parse a pattern string into the set of *match* patterns.

    ``id_set_list`` supplies one id set per ``%`` placeholder, in
    order (reference obj_str_id_set_list).
    """
    base_set: set[Pattern] = set()
    match_set: set[Pattern] = set()
    pos = 0
    placeholder_idx = 0
    while pos < len(string):
        if string[pos:].strip() == "":
            break
        m = _SPEC_RE.match(string, pos)
        if not m or m.end() == pos:
            raise ValueError(f"invalid pattern at {string[pos:]!r}")
        pos = m.end()
        child = m.group("relation") == ">"
        type_expr = m.group("type")
        spec = m.group("spec")
        if spec is None:
            ids = None
        elif spec == "%":
            if id_set_list is None:
                raise ValueError("'%' placeholder without supplied id sets")
            if placeholder_idx >= len(id_set_list):
                raise ValueError("not enough id sets for '%' placeholders")
            ids = frozenset(tuple(i) if isinstance(i, (tuple, list)) else (i,)
                            for i in id_set_list[placeholder_idx])
            placeholder_idx += 1
        else:
            ids = _parse_id_list(spec[1:-1])
        base_set = _expand(
            base_set, match_set, child, type_expr, ids, m.group("match")
        )
    return match_set
