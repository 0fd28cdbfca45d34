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


def test_schema_and_db_schemas(monkeypatch, capsys):
    rc, out = run_cli(monkeypatch, capsys, ["schema"])
    assert rc == 0
    doc = json.loads(out)
    assert doc.get("type") == "object" and "properties" in doc

    rc, out = run_cli(monkeypatch, capsys, ["db-schemas"])
    assert rc == 0
    assert json.loads(out)["5.3"] == "current"


def test_db_init_cleanup(monkeypatch, capsys, tmp_path, spark):
    d = str(tmp_path / "fresh")
    rc, _ = run_cli(monkeypatch, capsys, ["db-init", "-d", d])
    assert rc == 0
    # Second init fails without the flag, succeeds with it.
    rc, _ = run_cli(monkeypatch, capsys, ["db-init", "-d", d])
    assert rc == 1
    rc, _ = run_cli(
        monkeypatch, capsys, ["db-init", "-d", d, "--ignore-initialized"]
    )
    assert rc == 0
    rc, _ = run_cli(monkeypatch, capsys, ["db-cleanup", "-d", d])
    assert rc == 0
    rc, _ = run_cli(monkeypatch, capsys, ["db-cleanup", "-d", d])
    assert rc == 1
    rc, _ = run_cli(
        monkeypatch, capsys,
        ["db-cleanup", "-d", d, "--ignore-not-initialized"],
    )
    assert rc == 0


def test_db_time(monkeypatch, capsys, tmp_path, spark):
    import datetime

    rc, out = run_cli(
        monkeypatch, capsys, ["db-time", "-d", str(tmp_path / "db")]
    )
    assert rc == 0
    now = datetime.datetime.fromisoformat(out.strip())
    assert now.tzinfo is not None
    delta = abs(
        datetime.datetime.now(datetime.timezone.utc) - now
    )
    assert delta.total_seconds() < 300


def test_submit_then_notify(monkeypatch, capsys, tmp_path, spark):
    import os

    q = str(tmp_path / "queue")
    rep = graph_fixture()
    rc, out = run_cli(
        monkeypatch, capsys, ["submit", "--queue", q], json.dumps(rep)
    )
    assert rc == 0 and json.loads(out)["submitted"] == 1
    files = os.listdir(q)
    assert len(files) == 1 and files[0].endswith(".json")

    # Load the submitted report, then notify over the store: the
    # fixture's "test"-origin objects match the default subscription.
    d = str(tmp_path / "db")
    with open(os.path.join(q, files[0]), encoding="utf-8") as f:
        rc, _ = run_cli(monkeypatch, capsys, ["db-load", "-d", d], f.read())
    assert rc == 0
    rc, out = run_cli(monkeypatch, capsys, ["notify", "-d", d])
    assert rc == 0
    lines = [json.loads(x) for x in out.splitlines() if x.strip()]
    origins = {
        o.get("origin")
        for objs in rep.values() if isinstance(objs, list)
        for o in objs
    }
    if "test" in origins:
        assert any(n["subscription"] == "test" for n in lines)
    # Every notification is capped and well-formed.
    for n in lines:
        assert len(n["subject"]) <= 256 and len(n["body"]) <= 65536


def test_monitor_spool_wipe(monkeypatch, capsys, tmp_path, spark):
    from kcidb_spark.streaming.notify import NotificationSpool

    spool_dir = str(tmp_path / "spool")
    spool = NotificationSpool(spark, spool_dir)
    df = spark.createDataFrame(
        [("n1", "s", "build", "b1", "subj", "body")],
        "id string, subscription string, obj_type string,"
        " obj_id string, subject string, body string",
    )
    assert spool.spool(df) == 1
    rc, out = run_cli(
        monkeypatch, capsys, ["monitor-spool-wipe", "--spool", spool_dir]
    )
    assert rc == 0 and json.loads(out)["wiped"] == 1
    assert spool.all().count() == 0


def test_tests_validate(monkeypatch, capsys):
    good = "\n".join(
        [
            "boot:",
            "  title: Boot test",
            "  home: https://kernelci.org/boot",
            "ltp-syscalls:",
            "  title: LTP syscall suite",
            "  description: longer text",
            "  home: https://linux-test-project.github.io/",
        ]
    )
    rc, _ = run_cli(monkeypatch, capsys, ["tests-validate"], good)
    assert rc == 0
    rc, _ = run_cli(monkeypatch, capsys, ["tests-validate", "-u"], good)
    assert rc == 0

    import jsonschema
    import pytest as _pytest

    # Missing required "home".
    with _pytest.raises(jsonschema.ValidationError):
        run_cli(monkeypatch, capsys, ["tests-validate"],
                "boot:\n  title: only a title\n")
    # Invalid test name (patternProperties + additionalProperties).
    with _pytest.raises(jsonschema.ValidationError):
        run_cli(monkeypatch, capsys, ["tests-validate"],
                "bad name!:\n  title: t\n  home: https://x.example/\n")
    # Structurally-broken home URL fails the -u check.
    rc, _ = run_cli(monkeypatch, capsys, ["tests-validate", "-u"],
                    "boot:\n  title: t\n  home: not-a-url\n")
    assert rc == 1


def test_mq_io_roundtrip(monkeypatch, capsys, tmp_path):
    """publish → subscribe round-trip on the file-transport queue,
    with at-least-once redelivery until ack."""
    q = str(tmp_path / "q")
    rep = json.dumps(COMPREHENSIVE)
    rc, _ = run_cli(monkeypatch, capsys,
                    ["mq-io-publisher", "--queue", q, "init"])
    assert rc == 0
    rc, out = run_cli(monkeypatch, capsys,
                      ["mq-io-publisher", "--queue", q, "publish"], rep)
    assert rc == 0 and out.strip()
    rc, _ = run_cli(monkeypatch, capsys,
                    ["mq-io-subscriber", "--queue", q, "-s", "sub1", "init"])
    assert rc == 0
    rc, out = run_cli(monkeypatch, capsys,
                      ["mq-io-subscriber", "--queue", q, "-s", "sub1",
                       "--messages", "5", "pull"])
    assert rc == 0
    assert json.loads(out)["version"]["major"] == 5
    # acked: second pull is empty
    rc, out = run_cli(monkeypatch, capsys,
                      ["mq-io-subscriber", "--queue", q, "-s", "sub1",
                       "pull"])
    assert rc == 0 and out == ""
    # a second subscription sees the message independently
    rc, _ = run_cli(monkeypatch, capsys,
                    ["mq-io-subscriber", "--queue", q, "-s", "sub2", "init"])
    rc, out = run_cli(monkeypatch, capsys,
                      ["mq-io-subscriber", "--queue", q, "-s", "sub2",
                       "pull"])
    assert json.loads(out)["version"]["major"] == 5


def test_mq_io_publish_rejects_invalid(monkeypatch, capsys, tmp_path):
    q = str(tmp_path / "q")
    with pytest.raises(Exception):
        run_cli(monkeypatch, capsys,
                ["mq-io-publisher", "--queue", q, "publish"],
                json.dumps({"version": {"major": 9}}))


def test_mq_pattern_roundtrip(monkeypatch, capsys, tmp_path):
    q = str(tmp_path / "q")
    run_cli(monkeypatch, capsys,
            ["mq-pattern-publisher", "--queue", q, "init"])
    rc, out = run_cli(monkeypatch, capsys,
                      ["mq-pattern-publisher", "--queue", q, "publish"],
                      '>checkout["o:c1"]>build#\n')
    assert rc == 0 and out.strip()
    run_cli(monkeypatch, capsys,
            ["mq-pattern-subscriber", "--queue", q, "-s", "s", "init"])
    rc, out = run_cli(monkeypatch, capsys,
                      ["mq-pattern-subscriber", "--queue", q, "-s", "s",
                       "pull"])
    assert rc == 0 and "build" in out


def test_mq_email_roundtrip(monkeypatch, capsys, tmp_path):
    q = str(tmp_path / "q")
    msg = "Subject: Build failed\nTo: a@b.c\n\nbody text\n"
    run_cli(monkeypatch, capsys, ["mq-email-publisher", "--queue", q, "init"])
    rc, out = run_cli(monkeypatch, capsys,
                      ["mq-email-publisher", "--queue", q, "publish"], msg)
    assert rc == 0
    run_cli(monkeypatch, capsys,
            ["mq-email-subscriber", "--queue", q, "-s", "s", "init"])
    rc, out = run_cli(monkeypatch, capsys,
                      ["mq-email-subscriber", "--queue", q, "-s", "s",
                       "pull"])
    assert rc == 0 and "Subject: Build failed" in out


def test_issue_edit_roundtrip(monkeypatch, capsys, tmp_path, spark):
    """create issue → a12-style latest reflects it; edit →
    auto-incremented version becomes latest; incidents link to it."""
    d = str(tmp_path / "store")
    common = ["--subject", "kernel NULL deref in foo",
              "--culprit", "code", "--name", "Dev One",
              "--email", "dev@example.org"]
    rc, out = run_cli(monkeypatch, capsys,
                      ["issue-edit", "-d", d] + common)
    assert rc == 0
    issue = json.loads(out)["issues"][0]
    assert issue["version"] == 0
    assert issue["culprit"] == {"code": True, "tool": False, "harness": False}
    assert json.loads(issue["misc"]) if isinstance(issue["misc"], str) else issue["misc"]

    # edit: same id, version auto-increments
    rc, out = run_cli(monkeypatch, capsys,
                      ["issue-edit", "-d", d, "--id", issue["id"],
                       "--comment", "narrowed to commit X"] + common)
    assert rc == 0
    issue2 = json.loads(out)["issues"][0]
    assert issue2["id"] == issue["id"] and issue2["version"] == 1

    from pyspark.sql import functions as F

    from kcidb_spark.oo import latest_issue_version
    from kcidb_spark.store import Store

    store = Store(spark, d)
    latest = latest_issue_version(
        store.table("issues").withColumn("version_num", F.col("version"))
    ).collect()
    assert len(latest) == 1
    assert latest[0]["version"] == 1
    assert latest[0]["comment"] == "narrowed to commit X"

    # incidents against the new version
    rc, out = run_cli(monkeypatch, capsys,
                      ["incident-edit", "-d", d, "--issue-id", issue["id"],
                       "--issue-version", "1", "--type", "test",
                       "--ids", "o:t1", "o:t2",
                       "--name", "Dev One", "--email", "dev@example.org"])
    assert rc == 0
    incs = store.table("incidents").collect()
    assert {r["test_id"] for r in incs} == {"o:t1", "o:t2"}
    assert all(r["issue_version"] == 1 and r["present"] for r in incs)


def test_issue_edit_dry_run_and_queue(monkeypatch, capsys, tmp_path):
    q = str(tmp_path / "q")
    common = ["--subject", "s", "--culprit", "tool",
              "--name", "n", "--email", "e@x.y"]
    rc, out = run_cli(monkeypatch, capsys,
                      ["issue-edit", "--dry-run"] + common)
    assert rc == 0
    rep = json.loads(out)
    assert rep["issues"][0]["culprit"]["tool"] is True

    rc, out = run_cli(monkeypatch, capsys,
                      ["issue-edit", "--queue", q] + common)
    assert rc == 0 and out.strip()
    from kcidb_spark.mq import IOQueue

    queue = IOQueue(q)
    queue.init_subscription("s")
    pulled = list(queue.pull_reports("s", 5))
    assert len(pulled) == 1 and pulled[0][1]["issues"][0]["origin"] == "maestro"


def test_notify_mainline_email_queue(monkeypatch, capsys, tmp_path, spark):
    """notify --mainline --email-queue: rich revision notifications
    render to RFC-822 e-mails on the file-transport email queue."""
    import email.parser
    import email.policy

    from tests.test_render import FIXTURE

    d = str(tmp_path / "db")
    q = str(tmp_path / "emailq")
    rc, _ = run_cli(monkeypatch, capsys, ["db-load", "-d", d],
                    json.dumps(FIXTURE))
    assert rc == 0
    rc, out = run_cli(monkeypatch, capsys,
                      ["notify", "-d", d, "--mainline",
                       "--email-queue", q])
    assert rc == 0
    lines = [json.loads(x) for x in out.splitlines() if x.strip()]
    assert any(n["subscription"] == "mainline" for n in lines)

    from kcidb_spark.mq import EmailQueue

    queue = EmailQueue(q)
    queue.init_subscription("smtp")
    pulled = list(queue.pull("smtp", 10))
    assert len(pulled) == len(lines)
    parser = email.parser.Parser(policy=email.policy.SMTPUTF8)
    msgs = [parser.parsestr(payload) for _, payload in pulled]
    mainline = [m for m in msgs
                if m["Subject"].startswith("Builds failed for ")]
    assert mainline
    m = mainline[0]
    assert m["X-KCIDB-Notification-ID"].startswith("mainline:revision:")
    parts = [p.get_content_type() for p in m.iter_parts()]
    assert parts == ["text/plain", "text/html"]
    body = list(m.iter_parts())[0].get_content()
    assert "LEGEND" in body and "BUILDS" in body


def test_describe_objects(monkeypatch, capsys, tmp_path, spark):
    """describe renders the reference-fidelity description text for
    any object type, engine-side."""
    from tests.test_render import FIXTURE

    d = str(tmp_path / "db")
    rc, _ = run_cli(monkeypatch, capsys, ["db-load", "-d", d],
                    json.dumps(FIXTURE))
    assert rc == 0
    rc, out = run_cli(monkeypatch, capsys,
                      ["describe", "-d", d, "--type", "test",
                       "-i", "redhat:t2"])
    assert rc == 0
    [row] = [json.loads(x) for x in out.splitlines() if x.strip()]
    assert row["id"] == "redhat:t2"
    assert row["description"].startswith(
        "Below is the summary of execution results")
    assert "ltp.sem02" in row["description"]

    rc, out = run_cli(monkeypatch, capsys,
                      ["describe", "-d", d, "--type", "revision"])
    assert rc == 0
    [row] = [json.loads(x) for x in out.splitlines() if x.strip()]
    assert "LEGEND" in row["description"] and "BUILDS" in row["description"]


def test_describe_issue_version(monkeypatch, capsys, tmp_path, spark):
    """describe --type issue_version renders the distinct
    issue_version object (version-pinned dashboard URL)."""
    from tests.test_render import _ISSUE_REPORT

    d = str(tmp_path / "db")
    rc, _ = run_cli(monkeypatch, capsys, ["db-load", "-d", d],
                    json.dumps(_ISSUE_REPORT))
    assert rc == 0
    rc, out = run_cli(monkeypatch, capsys,
                      ["describe", "-d", d, "--type", "issue_version",
                       "-i", "maestro:deadbeef"])
    assert rc == 0
    [row] = [json.loads(x) for x in out.splitlines() if x.strip()]
    assert "&var-version=1" in row["description"]
    assert "Detected 3 times in 2 builds, 1 test runs" in row["description"]


def test_notify_stock_family(monkeypatch, capsys, tmp_path, spark):
    """notify --stock evaluates the stock subscription family: the
    linux_stable repo-set and ltp_maintainers node-rollup analogs
    alongside mainline and the flat subscriptions."""
    from kcidb_spark.streaming.render import STABLE_REPO_URLS

    report = {
        "version": {"major": 5, "minor": 3},
        "checkouts": [
            {"id": "s:c1", "origin": "s",
             "git_commit_hash": "a" * 40, "patchset_hash": "",
             "git_repository_url": STABLE_REPO_URLS[0],
             "git_repository_branch": "linux-6.6.y"},
        ],
        "builds": [
            {"id": "s:b1", "origin": "s", "checkout_id": "s:c1",
             "status": "PASS", "architecture": "x86_64"},
        ],
        "tests": [
            {"id": "s:t1", "origin": "s", "build_id": "s:b1",
             "path": "ltp.sem01", "status": "FAIL"},
        ],
    }
    d = str(tmp_path / "db")
    rc, _ = run_cli(monkeypatch, capsys, ["db-load", "-d", d],
                    json.dumps(report))
    assert rc == 0
    rc, out = run_cli(monkeypatch, capsys, ["notify", "-d", d, "--stock"])
    assert rc == 0
    rows = [json.loads(x) for x in out.splitlines() if x.strip()]
    by_sub = {}
    for r in rows:
        by_sub.setdefault(r["subscription"], []).append(r)
    # stable tree with a failing (non-syzbot) test -> Tests failed
    assert any(r["subject"].startswith("Tests failed for ")
               for r in by_sub["linux_stable"])
    assert any(r["subject"].startswith("LTP failed for ")
               for r in by_sub["ltp_maintainers"])


def test_explain(monkeypatch, capsys, spark):
    rc, out = run_cli(monkeypatch, capsys, ["explain", "--list"])
    assert rc == 0 and "o3_topk_orders" in out
    rc, out = run_cli(
        monkeypatch, capsys,
        ["explain", "o3_topk_orders", "--oracle",
         "--sf-dir", "/root/testdata/sf0.001"],
    )
    assert rc == 0
    assert "TakeOrderedAndProject" in out  # the plan-audit invariant
    assert "DuckDB oracle" in out and "ORDER BY" in out
    rc, _ = run_cli(monkeypatch, capsys, ["explain", "nope"])
    assert rc == 1


def test_db_sql_and_compact(monkeypatch, capsys, tmp_path, spark):
    db = str(tmp_path / "sqldb")
    rc, _ = run_cli(monkeypatch, capsys, ["db-load", "-d", db],
                    stdin=json.dumps(COMPREHENSIVE))
    assert rc == 0
    rc, out = run_cli(
        monkeypatch, capsys,
        ["db-sql", "-d", db,
         "SELECT origin, count(*) AS n FROM builds GROUP BY origin"],
    )
    assert rc == 0
    rows = [json.loads(line) for line in out.splitlines() if line]
    assert rows and rows[0]["n"] >= 1
    rc, _ = run_cli(monkeypatch, capsys, ["db-compact", "-d", db])
    assert rc == 0
    # Compaction must not change the queryable view.
    rc, out2 = run_cli(
        monkeypatch, capsys,
        ["db-sql", "-d", db,
         "SELECT origin, count(*) AS n FROM builds GROUP BY origin"],
    )
    assert rc == 0
    assert [json.loads(x) for x in out2.splitlines() if x] == rows


def test_db_upgrade_mux_lattice(monkeypatch, capsys, spark, tmp_path):
    """db-upgrade on a mux spec walks the schema-version lattice:
    the held-back v4 member migrates in place (valid→status etc.),
    after which the mux speaks the current schema."""
    from kcidb_spark.store.versioning import STORE_VERSION, read_version
    from tests.test_store_versioning import _write_v4_store

    root4 = str(tmp_path / "mux_v4")
    root5 = str(tmp_path / "mux_v5")
    _write_v4_store(spark, root4)
    spec = f"mux:{root4} {root5}"
    rc, _ = run_cli(monkeypatch, capsys, ["db-upgrade", "-d", spec])
    assert rc == 0
    assert read_version(root4) == STORE_VERSION
    # The migrated member answers v5 dumps through the mux.
    rc, out = run_cli(monkeypatch, capsys, ["db-dump", "-d", spec])
    assert rc == 0
    dump = json.loads(out)
    assert dump["version"]["major"] == STORE_VERSION[0]
    assert any(b.get("status") == "PASS" for b in dump["builds"])


def test_db_init_cleanup_mux_fanout(monkeypatch, capsys, spark, tmp_path):
    """db-init / db-cleanup fan out over mux member specs."""
    import os

    a, b = str(tmp_path / "fan_a"), str(tmp_path / "fan_b")
    spec = f"mux:{a} {b}"
    rc, _ = run_cli(monkeypatch, capsys, ["db-init", "-d", spec])
    assert rc == 0
    assert os.path.exists(os.path.join(a, "_schema.json"))
    assert os.path.exists(os.path.join(b, "_schema.json"))
    rc, _ = run_cli(monkeypatch, capsys, ["db-cleanup", "-d", spec])
    assert rc == 0
    assert not os.path.exists(a) and not os.path.exists(b)


def test_db_init_null_member_is_noop(monkeypatch, capsys, spark, tmp_path):
    """A 'null' member spec in db-init/db-cleanup is a no-op success
    (reference null driver) — it must NOT create a literal ./null
    directory via the generic parquet branch (ADVICE r7)."""
    import os

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        a = str(tmp_path / "fan_a")
        spec = f"mux:null {a}"
        rc, _ = run_cli(monkeypatch, capsys, ["db-init", "-d", spec])
        assert rc == 0
        assert not os.path.exists(tmp_path / "null")
        assert os.path.exists(os.path.join(a, "_schema.json"))
        rc, _ = run_cli(monkeypatch, capsys, ["db-cleanup", "-d", spec])
        assert rc == 0
        assert not os.path.exists(a)
        rc, _ = run_cli(monkeypatch, capsys, ["db-init", "-d", "null"])
        assert rc == 0
        assert not os.path.exists(tmp_path / "null")
    finally:
        os.chdir(cwd)
