"""CLI parity surface (kcidb-* tool equivalents).

In-process invocations (monkeypatched stdio) — the CLI shares the test
SparkSession via getOrCreate, so these stay fast.
"""

from __future__ import annotations

import io
import json

import pytest

from kcidb_spark import cli
from tests.kcidb_fixtures import COMPREHENSIVE, graph_fixture


def run_cli(monkeypatch, capsys, argv, stdin: str = ""):
    monkeypatch.setattr("sys.stdin", io.StringIO(stdin))
    rc = cli.main(argv)
    out = capsys.readouterr().out
    return rc, out


def test_validate_count_merge(monkeypatch, capsys):
    rep = json.dumps(COMPREHENSIVE)
    rc, out = run_cli(monkeypatch, capsys, ["validate"], rep)
    assert rc == 0 and json.loads(out)["version"]["major"] == 5

    rc, out = run_cli(monkeypatch, capsys, ["count"], rep)
    assert rc == 0 and json.loads(out) == sum(
        len(v) for k, v in COMPREHENSIVE.items() if isinstance(v, list)
    )

    two = "\n".join([json.dumps(graph_fixture()), json.dumps(COMPREHENSIVE)])
    rc, out = run_cli(monkeypatch, capsys, ["merge"], two)
    merged = json.loads(out)
    assert rc == 0
    assert len(merged["checkouts"]) == len(graph_fixture()["checkouts"]) + 1


def test_validate_rejects_garbage(monkeypatch, capsys):
    with pytest.raises(Exception):
        run_cli(monkeypatch, capsys, ["validate"], '{"version": {"major": 99}}')


def test_db_load_dump_query(monkeypatch, capsys, tmp_path, spark):
    d = str(tmp_path / "db")
    rc, _ = run_cli(monkeypatch, capsys, ["db-load", "-d", d], json.dumps(COMPREHENSIVE))
    assert rc == 0

    rc, out = run_cli(monkeypatch, capsys, ["db-dump", "-d", d])
    dumped = json.loads(out)
    assert {o["id"] for o in dumped["builds"]} == {
        o["id"] for o in COMPREHENSIVE["builds"]
    }

    # Closure query: checkout + children reaches builds and tests.
    cid = COMPREHENSIVE["checkouts"][0]["id"]
    rc, out = run_cli(
        monkeypatch, capsys, ["query", "-d", d, "-c", cid, "--children"]
    )
    got = json.loads(out)
    assert {o["id"] for o in got["builds"]} == {
        o["id"] for o in COMPREHENSIVE["builds"]
    }
    assert "tests" in got

    rc, out = run_cli(monkeypatch, capsys, ["oo-query", "-d", d, "-p", ">build#"])
    oo = json.loads(out)
    assert [o["id"] for o in oo["build"]] == [o["id"] for o in COMPREHENSIVE["builds"]]

    rc, _ = run_cli(monkeypatch, capsys, ["db-empty", "-d", d])
    rc, out = run_cli(monkeypatch, capsys, ["db-dump", "-d", d])
    assert "builds" not in json.loads(out)


def test_ingest_inline(monkeypatch, capsys, tmp_path, spark):
    d = str(tmp_path / "db2")
    spool = str(tmp_path / "spool")
    rc, out = run_cli(
        monkeypatch,
        capsys,
        ["ingest", "-d", d, "--spool", spool],
        json.dumps(graph_fixture()),
    )
    assert rc == 0
    assert json.loads(out)["loaded_reports"] == 1


def test_db_dump_objects_per_report(monkeypatch, capsys, tmp_path, spark):
    from kcidb_spark.schema.io import count as io_count

    d = str(tmp_path / "db")
    rc, _ = run_cli(monkeypatch, capsys, ["db-load", "-d", d],
                    json.dumps(COMPREHENSIVE))
    assert rc == 0
    rc, out = run_cli(
        monkeypatch, capsys,
        ["db-dump", "-d", d, "--objects-per-report", "2"],
    )
    assert rc == 0
    reports = [json.loads(line) for line in out.splitlines() if line.strip()]
    assert len(reports) >= 2
    assert all(io_count(r) <= 2 for r in reports)
    total = sum(
        len(v) for k, v in COMPREHENSIVE.items() if isinstance(v, list)
    )
    assert sum(io_count(r) for r in reports) == total


def test_url_stats(monkeypatch, capsys):
    rc, out = run_cli(monkeypatch, capsys, ["url-stats"],
                      json.dumps(COMPREHENSIVE))
    assert rc == 0
    stats = json.loads(out)
    assert stats["total_urls"] == stats["distinct_urls"] > 5
    assert "example.org" in stats["by_host"]
