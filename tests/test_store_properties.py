"""Property-based tests of the merge-load semantics (SURVEY §1.4).

The dedup view's contract: per column, the value of the LATEST load
where it was non-NULL; `_timestamp` = MAX; ties on _timestamp resolve
deterministically.  From that, three properties every re-delivery /
reordering scenario relies on:

* idempotency   — loading the same report twice changes nothing;
* commutativity — two loads with fixed timestamps produce the same
  view in either order;
* field-wise fallback — a later partial update overrides exactly its
  non-NULL fields, earlier values shine through elsewhere.

Generated with hypothesis over randomized field subsets; examples are
kept small because each one is a real Spark load/dump round-trip.
"""

from __future__ import annotations

import datetime
import shutil
import uuid

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kcidb_spark.store import Store

UTC = datetime.timezone.utc
T1 = datetime.datetime(2025, 1, 1, tzinfo=UTC)
T2 = datetime.datetime(2025, 1, 2, tzinfo=UTC)

#: Optional checkout fields and small value pools (None = absent).
_FIELD_POOLS = {
    "tree_name": [None, "mainline", "next"],
    "comment": [None, "a", "b"],
    "git_repository_url": [None, "https://x.example/r.git"],
    "git_commit_hash": [None, "aa" * 20, "bb" * 20],
    "valid": [None, True, False],
}

checkout_fields = st.fixed_dictionaries(
    {name: st.sampled_from(pool) for name, pool in _FIELD_POOLS.items()}
)


def _report(ids_fields: list[tuple[str, dict]]) -> dict:
    checkouts = []
    for cid, fields in ids_fields:
        obj = {"id": cid, "origin": "hyp"}
        obj.update({k: v for k, v in fields.items() if v is not None})
        checkouts.append(obj)
    return {"version": {"major": 5, "minor": 3}, "checkouts": checkouts}


def _view(spark, tmp_root, loads) -> dict:
    """Load reports (with fixed timestamps) into a fresh store and
    return the dumped checkouts keyed by id."""
    root = f"{tmp_root}/{uuid.uuid4().hex}"
    store = Store(spark, root)
    try:
        for report, ts in loads:
            store.load(report, timestamp=ts)
        dump = store.dump()
        return {o["id"]: o for o in dump.get("checkouts", [])}
    finally:
        shutil.rmtree(root, ignore_errors=True)


_SETTINGS = settings(
    max_examples=5,  # each example is a real Spark load/dump round-trip
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(fields=checkout_fields)
@_SETTINGS
def test_load_idempotent(spark, tmp_path_factory, fields):
    tmp = str(tmp_path_factory.mktemp("prop"))
    rep = _report([("hyp:c1", fields)])
    once = _view(spark, tmp, [(rep, T1)])
    twice = _view(spark, tmp, [(rep, T1), (rep, T1)])
    assert once == twice


@given(fields_a=checkout_fields, fields_b=checkout_fields)
@_SETTINGS
def test_load_commutative(spark, tmp_path_factory, fields_a, fields_b):
    tmp = str(tmp_path_factory.mktemp("prop"))
    ra = _report([("hyp:c1", fields_a)])
    rb = _report([("hyp:c1", fields_b)])
    ab = _view(spark, tmp, [(ra, T1), (rb, T2)])
    ba = _view(spark, tmp, [(rb, T2), (ra, T1)])
    assert ab == ba


@given(fields_a=checkout_fields, fields_b=checkout_fields)
@_SETTINGS
def test_later_nonnull_fields_win(spark, tmp_path_factory, fields_a, fields_b):
    tmp = str(tmp_path_factory.mktemp("prop"))
    ra = _report([("hyp:c1", fields_a)])
    rb = _report([("hyp:c1", fields_b)])
    merged = _view(spark, tmp, [(ra, T1), (rb, T2)])["hyp:c1"]
    for name in _FIELD_POOLS:
        expect = fields_b[name] if fields_b[name] is not None else fields_a[name]
        assert merged.get(name) == (expect if expect is not None else None), name


@given(fields_a=checkout_fields, fields_b=checkout_fields)
@_SETTINGS
def test_sqlite_backend_equivalent(spark, tmp_path_factory, fields_a, fields_b):
    """Backend equivalence: the same load sequence into the SQLite
    driver and the parquet Store dumps identical reports — the raw-row
    encodings differ (JSON TEXT vs parquet), the merge semantics must
    not."""
    from kcidb_spark.store.sqlite import SqliteStore

    tmp = str(tmp_path_factory.mktemp("prop"))
    ra = _report([("hyp:c1", fields_a)])
    rb = _report([("hyp:c1", fields_b)])
    parquet = _view(spark, tmp, [(ra, T1), (rb, T2)])
    sq = SqliteStore(spark, ":memory:")
    sq.load(ra, timestamp=T1)
    sq.load(rb, timestamp=T2)
    sqlite_view = {o["id"]: o for o in sq.dump().get("checkouts", [])}
    sq.close()
    assert sqlite_view == parquet
