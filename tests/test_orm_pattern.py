"""Pattern language: parsing combinatorics + compiled query results.

Modeled on the reference's kcidb/test_orm.py pattern-parse tests
(:150-408) and per-type query tests (:1060-1985), against the graph
and revision fixtures.
"""

from __future__ import annotations

import pytest

from kcidb_spark.orm import compile_patterns, parse_pattern, type_views
from kcidb_spark.orm.pattern import Pattern
from kcidb_spark.schema.graph import TABLES
from kcidb_spark.store import Store
from tests.kcidb_fixtures import graph_fixture


# ---------------------------------------------------------------------------
# Parsing
# ---------------------------------------------------------------------------


def _leaf(p: Pattern) -> tuple:
    return (p.obj_type, p.child, p.obj_id_set)


def test_parse_single_type():
    pats = parse_pattern(">checkout#")
    assert {_leaf(p) for p in pats} == {("checkout", True, None)}


def test_parse_id_list():
    pats = parse_pattern(">build[redhat:1077837]#")
    (p,) = pats
    assert p.obj_type == "build"
    assert p.obj_id_set == frozenset({("redhat:1077837",)})


def test_parse_multi_ids_and_fields():
    pats = parse_pattern(">test[a_0; a_1]<build#")
    (p,) = pats
    assert p.obj_type == "build"
    assert p.child is False
    assert p.base.obj_type == "test"
    assert p.base.obj_id_set == frozenset({("a_0",), ("a_1",)})


def test_parse_composite_revision_id():
    pats = parse_pattern(">revision[c763deac7ff, 932e2d61add]#")
    (p,) = pats
    assert p.obj_id_set == frozenset({("c763deac7ff", "932e2d61add")})


def test_parse_quoted_ids():
    pats = parse_pattern('>checkout["we;ird, id"; "x\\"y"]#')
    (p,) = pats
    assert p.obj_id_set == frozenset({("we;ird, id",), ('x"y',)})


def test_parse_issue_version_int_coercion():
    pats = parse_pattern(">issue_version[abc,7]#")
    (p,) = pats
    assert p.obj_id_set == frozenset({("abc", 7)})


def test_parse_chain():
    pats = parse_pattern(">checkout[x]>build#>test#")
    assert {p.obj_type for p in pats} == {"build", "test"}
    test_p = next(p for p in pats if p.obj_type == "test")
    assert test_p.base.obj_type == "build"
    assert test_p.base.base.obj_type == "checkout"
    assert test_p.base.base.obj_id_set == frozenset({("x",)})


def test_parse_star_children():
    pats = parse_pattern(">checkout[x]>*#")
    # all descendant types of checkout
    assert {p.obj_type for p in pats} == {"build", "test", "incident"}


def test_parse_star_match_everything():
    pats = parse_pattern(">*#")
    assert {p.obj_type for p in pats} == set(
        ("revision", "checkout", "build", "test", "issue",
         "issue_version", "incident")
    )


def test_parse_star_dollar_roots():
    # furthest parents of a test: revision (childless in the parent
    # direction walk)
    pats = parse_pattern(">test[t]<*$")
    assert {p.obj_type for p in pats} == {"revision"}


def test_parse_placeholder():
    pats = parse_pattern(">build%#", id_set_list=[{("b1",), ("b2",)}])
    (p,) = pats
    assert p.obj_id_set == frozenset({("b1",), ("b2",)})


def test_parse_placeholder_missing():
    with pytest.raises(ValueError, match="placeholder"):
        parse_pattern(">build%#")


def test_parse_unknown_type():
    with pytest.raises(ValueError, match="cannot find type"):
        parse_pattern(">bogus#")


def test_parse_unknown_child():
    with pytest.raises(ValueError, match="cannot find child type"):
        parse_pattern(">checkout>incident#")


def test_parse_empty_id_list_matches_nothing():
    pats = parse_pattern(">checkout[]#")
    (p,) = pats
    assert p.obj_id_set == frozenset()


def test_parse_empty_and_markerless():
    """Reference test_pattern_parse_misc: the empty pattern, parent
    walks from nothing, and specs without a match marker all yield no
    patterns (kcidb/test_orm.py:152-176)."""
    for s in ("", "<*", "<*$", "<*#", ">revision", ">checkout",
              ">build", ">test"):
        assert parse_pattern(s) == frozenset(), s


def test_parse_dollar_equals_hash_on_single_type():
    """`$` and `#` are both match markers for a single-type spec
    (kcidb/test_orm.py:156-176)."""
    for t in ("revision", "checkout", "build", "test"):
        for marker in ("$", "#"):
            pats = parse_pattern(f">{t}{marker}")
            assert {_leaf(p) for p in pats} == {(t, True, None)}


def test_parse_trail_discard():
    """Unmatched trailing specs are discarded
    (kcidb/test_orm.py:374-391): only the marked spec produces a
    pattern; the un-marked >test>* trail after it is dropped."""
    for marker in ("#", "$"):
        pats = parse_pattern(f">checkout[123]>build{marker}>test>*")
        (p,) = pats
        assert p.obj_type == "build"
        assert p.base.obj_type == "checkout"
        assert p.base.obj_id_set == frozenset({("123",)})


def test_parse_whitespace_tolerant():
    """Spaces between every token parse identically
    (kcidb/test_orm.py:366-369)."""
    pats = parse_pattern(' > revision [ "abc" , "def" ; "ghi" , "jkl" ] #')
    (p,) = pats
    assert p.obj_id_set == frozenset({("abc", "def"), ("ghi", "jkl")})


def test_parse_quoted_escapes():
    """Escaped quotes and backslashes inside quoted IDs
    (kcidb/test_orm.py:356-362)."""
    (p,) = parse_pattern('>checkout["1\\"2\\"3"]#')
    assert p.obj_id_set == frozenset({('1"2"3',)})
    (p,) = parse_pattern('>checkout["1\\\\2\\\\3"]#')
    assert p.obj_id_set == frozenset({("1\\2\\3",)})
    (p,) = parse_pattern('>checkout["1,2;3"]#')
    assert p.obj_id_set == frozenset({("1,2;3",)})
    (p,) = parse_pattern('>checkout["1 2 3"]#')
    assert p.obj_id_set == frozenset({("1 2 3",)})


def test_parse_multiple_placeholders():
    """Each `%` consumes the next entry of id_set_list in spec order
    (kcidb/test_orm.py:193-203)."""
    pats = parse_pattern(
        ">revision%>checkout%>build#", [{("abc", "def")}, {("123",)}]
    )
    (p,) = pats
    assert p.obj_type == "build" and p.obj_id_set is None
    assert p.base.obj_type == "checkout"
    assert p.base.obj_id_set == frozenset({("123",)})
    assert p.base.base.obj_type == "revision"
    assert p.base.base.obj_id_set == frozenset({("abc", "def")})


def test_parse_id_field_count_mismatch():
    """Wrong ID arity for a type raises
    (kcidb/test_orm.py:398-408: 'Invalid number of ID fields')."""
    with pytest.raises(ValueError, match="number of ID fields"):
        parse_pattern(">revision[abc]#")


def test_parse_marked_prefix_and_star():
    """A marked intermediate spec plus a star trail matches both the
    type itself and every descendant (kcidb/test_orm.py:243-281)."""
    pats = parse_pattern(">build#>*#")
    types = sorted(p.obj_type for p in pats)
    # incident appears twice: once under build directly, once under
    # build>test — distinct patterns, same reference combinatorics.
    assert types == ["build", "incident", "incident", "test"]


def test_parse_parents_then_descendants():
    """>build%<*$>*# — roots of the build's ancestry plus every
    descendant chain below the build (kcidb/test_orm.py:283-329)."""
    pats = parse_pattern(">build%<*$>*#", [{("abc",)}])
    assert sorted(p.obj_type for p in pats) == [
        "build", "checkout", "incident", "incident", "revision", "test"
    ]


# ---------------------------------------------------------------------------
# Compiled queries over the graph fixture
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def views(spark, tmp_path_factory):
    store = Store(spark, str(tmp_path_factory.mktemp("orm") / "store"))
    store.load(graph_fixture())
    return type_views({t: store.table(t, with_metadata=True) for t in TABLES})


def _run(spark, views, pattern, id_set_list=None):
    pats = parse_pattern(pattern, id_set_list)
    result = compile_patterns(spark, views, pats)
    return {t: df.collect() for t, df in result.items()}


def _ids(result, t):
    return {r["id"] for r in result.get(t, [])}


def test_query_checkout_by_id(spark, views):
    r = _run(spark, views, ">checkout[_:1]#")
    assert _ids(r, "checkout") == {"_:1"}
    assert set(r) == {"checkout"}


def test_query_chain_children(spark, views):
    r = _run(spark, views, ">checkout[_:1]>build#>test#")
    assert _ids(r, "build") == {"_:1"}
    assert _ids(r, "test") == {"_:1"}
    assert "checkout" not in r


def test_query_parents(spark, views):
    r = _run(spark, views, ">test[_:2]<build<checkout#")
    assert _ids(r, "checkout") == {"_:2"}
    assert set(r) == {"checkout"}


def test_query_star_children(spark, views):
    r = _run(spark, views, ">checkout[_:1]>*#")
    assert _ids(r, "build") == {"_:1"}
    assert _ids(r, "test") == {"_:1"}
    assert _ids(r, "incident") == {"_:1", "_:2", "_:4"}


def test_query_match_everything(spark, views):
    r = _run(spark, views, ">*#")
    assert _ids(r, "checkout") == {"_:1", "_:2"}
    assert _ids(r, "incident") == {"_:1", "_:2", "_:3", "_:4", "_:5"}
    assert len(r["revision"]) == 0 or "revision" in r  # no commit hashes in fixture


def test_query_empty_id_list(spark, views):
    r = _run(spark, views, ">checkout[]#")
    assert _ids(r, "checkout") == set()


def test_query_incident_parents_issue(spark, views):
    r = _run(spark, views, ">incident[_:3]<issue_version<issue#")
    assert _ids(r, "issue") == {"_:3"}
