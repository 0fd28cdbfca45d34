"""Command-line parity surface — the ``kcidb-*`` tool set re-expressed
over the Spark store (reference: kcidb/__init__.py CLI entry points,
kcidb/db/__init__.py db tools).

    python -m kcidb_spark.cli validate           < report.json
    python -m kcidb_spark.cli upgrade            < report.json
    python -m kcidb_spark.cli count              < report.json
    python -m kcidb_spark.cli merge              < reports.jsonl
    python -m kcidb_spark.cli db-load  -d DIR    < report.json
    python -m kcidb_spark.cli db-dump  -d DIR [--after ISO] [--until ISO]
    python -m kcidb_spark.cli db-empty -d DIR
    python -m kcidb_spark.cli db-purge -d DIR --before ISO
    python -m kcidb_spark.cli query    -d DIR [-c ID]... [--parents] [--children]
    python -m kcidb_spark.cli oo-query -d DIR -p PATTERN
    python -m kcidb_spark.cli ingest   -d DIR --spool DIR < reports.jsonl
    python -m kcidb_spark.cli schema
    python -m kcidb_spark.cli db-schemas
    python -m kcidb_spark.cli db-init    -d DIR [--ignore-initialized]
    python -m kcidb_spark.cli db-cleanup -d DIR [--ignore-not-initialized]
    python -m kcidb_spark.cli db-upgrade -d DIR
    python -m kcidb_spark.cli db-time    -d DIR
    python -m kcidb_spark.cli notify     -d DIR
    python -m kcidb_spark.cli submit     --queue DIR < reports.jsonl
    python -m kcidb_spark.cli monitor-spool-wipe --spool DIR [--before ISO]
    python -m kcidb_spark.cli tests-validate [-u]       < catalog.yaml
    python -m kcidb_spark.cli mq-{io,pattern,email}-publisher --queue DIR \
        {init,cleanup,publish}                          < payload
    python -m kcidb_spark.cli mq-{io,pattern,email}-subscriber --queue DIR \
        [-s NAME] [--messages N] {init,cleanup,pull}
    python -m kcidb_spark.cli issue-edit    [-d DIR | --queue DIR | --dry-run]
        --subject S --culprit {code,tool,harness} --name N --email E
        [--id ISSUE_ID]   (edit: version auto-increments past the latest)
    python -m kcidb_spark.cli incident-edit [-d DIR | --queue DIR | --dry-run]
        --issue-id I --issue-version V --type {build,test} --ids ID...
    python -m kcidb_spark.cli describe -d DIR --type OBJ [-i ID]

Stream tools (validate/upgrade/count/merge) are pure Python — no
SparkSession is started for them (CLI latency parity with the
reference's thin stdin tools).
"""

from __future__ import annotations

import argparse
import datetime
import json
import sys
from typing import Any


def _read_reports(stream) -> list[dict[str, Any]]:
    """Reports from a stream: one JSON document, or one per line."""
    text = stream.read().strip()
    if not text:
        return []
    try:
        return [json.loads(text)]
    except json.JSONDecodeError:
        return [json.loads(line) for line in text.splitlines() if line.strip()]


def _emit(data: Any) -> None:
    json.dump(data, sys.stdout, indent=2, sort_keys=True)
    sys.stdout.write("\n")


def _emit_line(data: Any) -> None:
    """One compact JSON document per line (paginated output)."""
    json.dump(data, sys.stdout, sort_keys=True, default=str)
    sys.stdout.write("\n")
    sys.stdout.flush()


def _spark():
    from kcidb_spark.session import get_spark

    return get_spark(app_name="kcidb_spark_cli")


def _store(args):
    from kcidb_spark.store.drivers import open_store

    return open_store(_spark(), args.database)


def _parse_ts(s: str) -> datetime.datetime:
    dt = datetime.datetime.fromisoformat(s)
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=datetime.timezone.utc)
    return dt


def _mq_main(args) -> int:
    """kcidb-mq-* analogs (reference kcidb/mq/__init__.py:871-1009)
    over the file-transport queue."""
    from kcidb_spark.mq import EmailQueue, IOQueue, PatternQueue

    flavor = args.cmd.split("-")[1]
    role = args.cmd.rsplit("-", 1)[1]
    queue = {"io": IOQueue, "pattern": PatternQueue, "email": EmailQueue}[
        flavor
    ](args.queue)

    if role == "publisher":
        if args.command == "init":
            queue.init()
        elif args.command == "cleanup":
            queue.cleanup()
        else:  # publish — print one message id per publish, like the
            # reference prints publishing ids
            if flavor == "io":
                for report in _read_reports(sys.stdin):
                    print(queue.publish_report(report))
            elif flavor == "pattern":
                print(queue.publish_patterns(sys.stdin.readlines()))
            else:
                print(queue.publish_email(sys.stdin.read()))
        return 0

    # subscriber
    if args.command == "init":
        queue.init_subscription(args.subscription)
    elif args.command == "cleanup":
        queue.cleanup_subscription(args.subscription)
    else:  # pull: emit each payload, then ack (at-least-once)
        for ack_id, payload in queue.pull(args.subscription, args.messages):
            sys.stdout.write(payload)
            if not payload.endswith("\n"):
                sys.stdout.write("\n")
            sys.stdout.flush()
            queue.ack(args.subscription, ack_id)
    return 0


def _issue_editor_main(args) -> int:
    """Issue/incident editor (reference kcidb/issue_editor/__init__.py:
    28-194 — a Flask form publishing to the new-data topic; same
    report construction here, minus the HTTP frame): sha1-derived ids,
    author stamped into misc, culprit booleans, validate, then publish
    to the queue or load into the store.  Editing an existing issue
    auto-increments issue_version past the store's latest
    (latest_issue_version — the a12 rollup)."""
    import hashlib

    from kcidb_spark.schema.io import IO_VERSION, validate

    now = datetime.datetime.now(datetime.timezone.utc)
    stamp = now.strftime("%Y%m%d%H%M%S")
    misc_obj = json.loads(args.misc) if args.misc else {}
    misc_obj["author"] = {"name": args.name, "email": args.email}

    if args.cmd == "issue-edit":
        if args.issue_id:
            issue_id = args.issue_id
            if not args.database:
                print("--id requires -d to look up the latest version",
                      file=sys.stderr)
                return 1
            store = _store(args)
            from pyspark.sql import functions as F

            latest = (
                store.table("issues")
                .filter(F.col("id") == issue_id)
                .agg(F.max("version"))
                .collect()[0][0]
            )
            version = 0 if latest is None else int(latest) + 1
        else:
            digest = hashlib.sha1(
                f"{args.report_subject}_{stamp}".encode()
            ).hexdigest()
            issue_id = f"{args.origin}:{digest}"
            version = 0
        issue = {
            "id": issue_id,
            "version": version,
            "origin": args.origin,
            "report_subject": args.report_subject,
            "culprit": {
                "code": args.culprit == "code",
                "tool": args.culprit == "tool",
                "harness": args.culprit == "harness",
            },
            "misc": misc_obj,
        }
        if args.comment:
            issue["comment"] = args.comment
        if args.report_url:
            issue["report_url"] = args.report_url
        report = {"version": dict(IO_VERSION), "issues": [issue]}
    else:  # incident-edit
        incidents = []
        for item_id in args.ids:
            digest = hashlib.sha1(f"{item_id}_{stamp}".encode()).hexdigest()
            incident = {
                "id": f"{args.origin}:{digest}",
                "origin": args.origin,
                "issue_id": args.issue_id,
                "issue_version": args.issue_version,
                "present": True,
                "misc": dict(misc_obj),
            }
            if args.comment:
                incident["comment"] = args.comment
            incident[f"{args.incident_type}_id"] = item_id
            incidents.append(incident)
        report = {"version": dict(IO_VERSION), "incidents": incidents}

    validate(report)
    if args.dry_run:
        _emit(report)
        return 0
    if args.queue:
        from kcidb_spark.mq import IOQueue

        print(IOQueue(args.queue).publish_report(report))
        return 0
    if args.database:
        _store(args).load(report)
        _emit(report)
        return 0
    print("need -d, --queue, or --dry-run", file=sys.stderr)
    return 1


def _db_lifecycle(args) -> int:
    """db-init / db-cleanup / db-upgrade over a driver spec.

    parquet: prefixes strip to their directory; sqlite: specs
    init/cleanup the database FILE (table DDL runs on open); mux:
    specs fan init/cleanup out over member specs (reference
    kcidb/db/mux.py:219-246) and route db-upgrade through the mux
    schema-version lattice (mux.py:373-395)."""
    if args.database == "null":
        # The null driver has no storage: init/cleanup/upgrade are
        # no-op successes (reference null driver semantics) — without
        # this a mux member spec "null" would fall through to the
        # generic parquet branch and create a literal ./null directory.
        return 0
    if args.database.startswith("mux:"):
        if args.cmd == "db-upgrade":
            _store(args).upgrade()
            return 0
        import copy as _copy

        rc = 0
        for member in args.database[4:].split():
            sub = _copy.copy(args)
            sub.database = member
            rc = max(rc, _db_lifecycle(sub) or 0)
        return rc
    if args.database.startswith("parquet:"):
        args.database = args.database[len("parquet:"):]
    elif args.database.startswith("sqlite:"):
        import os

        path = args.database[len("sqlite:"):]
        if args.cmd == "db-init":
            if path != ":memory:" and os.path.exists(path):
                if not args.ignore_initialized:
                    print(f"store {args.database} is already "
                          "initialized", file=sys.stderr)
                    return 1
                return 0
            _store(args)
            return 0
        if args.cmd == "db-cleanup":
            if path == ":memory:" or not os.path.exists(path):
                if not args.ignore_not_initialized:
                    print(f"store {args.database} is not initialized",
                          file=sys.stderr)
                    return 1
                return 0
            os.remove(path)
            return 0
        return 0  # db-upgrade: single-schema driver, nothing to do

    if args.cmd == "db-init":
        import os

        from kcidb_spark.store.versioning import (
            read_version,
            write_version,
        )

        if read_version(args.database) is not None:
            if not args.ignore_initialized:
                print(f"store {args.database} is already initialized",
                      file=sys.stderr)
                return 1
            return 0
        os.makedirs(args.database, exist_ok=True)
        write_version(args.database)
        return 0

    if args.cmd == "db-cleanup":
        import shutil

        from kcidb_spark.store.versioning import read_version

        if read_version(args.database) is None:
            if not args.ignore_not_initialized:
                print(f"store {args.database} is not initialized",
                      file=sys.stderr)
                return 1
            return 0
        shutil.rmtree(args.database)
        return 0

    # db-upgrade
    from kcidb_spark.store.versioning import ensure_current

    ensure_current(_spark(), args.database)
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="kcidb-spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    for name in ("validate", "upgrade", "count", "merge", "url-stats",
                 "schema", "db-schemas"):
        sub.add_parser(name)

    def add_db(name):
        p = sub.add_parser(name)
        p.add_argument("-d", "--database", required=True, help="store directory")
        return p

    p = add_db("db-load")
    p = add_db("db-dump")
    p.add_argument("--after", type=_parse_ts)
    p.add_argument("--until", type=_parse_ts)
    p.add_argument("--with-metadata", action="store_true")
    p.add_argument("--objects-per-report", type=int, default=None,
                   help="paginate: emit one report per line, each with "
                        "at most N objects")
    add_db("db-empty")
    p = add_db("db-purge")
    p.add_argument("--before", type=_parse_ts, required=True)
    p = add_db("db-sql")
    p.add_argument("statement", help="Spark SQL over the object tables"
                                     " and ORM views")
    p.add_argument("--with-metadata", action="store_true")
    add_db("db-compact")

    p = add_db("query")
    p.add_argument("-c", "--checkout", action="append", default=[])
    p.add_argument("-b", "--build", action="append", default=[])
    p.add_argument("-t", "--test", action="append", default=[])
    p.add_argument("-i", "--issue", action="append", default=[],
                   metavar="ID^VERSION")
    p.add_argument("-n", "--incident", action="append", default=[])
    p.add_argument("--parents", action="store_true")
    p.add_argument("--children", action="store_true")
    p.add_argument("--objects-per-report", type=int, default=None,
                   help="paginate: emit one report per line, each with "
                        "at most N objects")

    p = add_db("oo-query")
    p.add_argument("-p", "--pattern", action="append", required=True)

    p = add_db("ingest")
    p.add_argument("--spool", required=True, help="notification spool dir")

    p = add_db("db-init")
    p.add_argument("--ignore-initialized", action="store_true")
    p = add_db("db-cleanup")
    p.add_argument("--ignore-not-initialized", action="store_true")
    add_db("db-upgrade")
    add_db("db-time")
    p = sub.add_parser("explain")
    p.add_argument("query", nargs="?", default=None,
                   help="registry query name (omit with --list)")
    p.add_argument("--list", action="store_true", dest="list_queries",
                   help="list registry query names and tags")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001",
                   help="data dir the plan binds to")
    p.add_argument("--mode", default="formatted",
                   choices=["simple", "extended", "formatted", "cost",
                            "codegen"])
    p.add_argument("--oracle", action="store_true",
                   help="also print the DuckDB oracle SQL")

    p = add_db("describe")
    p.add_argument("--type", required=True, dest="obj_type",
                   choices=["revision", "checkout", "build", "test",
                            "issue", "issue_version", "incident"])
    p.add_argument("-i", "--id", dest="obj_id", default=None,
                   help="only this object id (revisions: "
                        "git_commit_hash)")

    p = add_db("notify")
    p.add_argument("--mainline", action="store_true",
                   help="include reference-fidelity revision messages")
    p.add_argument("--stock", action="store_true",
                   help="also evaluate the stock subscription family "
                        "(mainline + linux_stable + ltp_maintainers)")
    p.add_argument("--email-queue", default=None,
                   help="also publish rendered RFC-822 e-mails on this "
                        "file-transport email queue")
    p.add_argument("--to", default="kernelci-results@groups.io",
                   help="To: header for rendered e-mails")
    p.add_argument("--subscriptions", default=None,
                   help="directory of user subscription modules to load "
                        "in addition to the built-in set (analog of the "
                        "reference's kcidb/monitor/subscriptions/ package)")

    p = sub.add_parser("submit")
    p.add_argument("--queue", required=True,
                   help="ingest queue directory (file-source inbox)")

    p = sub.add_parser("monitor-spool-wipe")
    p.add_argument("--spool", required=True)
    p.add_argument("--before", type=_parse_ts, default=None)

    p = sub.add_parser("tests-validate")
    p.add_argument("-u", "--urls", action="store_true",
                   help="also verify catalog home URLs (syntactic "
                        "check — no network in this environment)")

    # kcidb-mq-{io,pattern,email}-{publisher,subscriber} analogs over
    # the file-transport queue (kcidb_spark.mq).
    for flavor in ("io", "pattern", "email"):
        p = sub.add_parser(f"mq-{flavor}-publisher")
        p.add_argument("--queue", required=True, help="queue directory")
        p.add_argument("command", choices=["init", "cleanup", "publish"])
        p = sub.add_parser(f"mq-{flavor}-subscriber")
        p.add_argument("--queue", required=True, help="queue directory")
        p.add_argument("-s", "--subscription", default="default")
        p.add_argument("--messages", type=int, default=1)
        p.add_argument("command", choices=["init", "cleanup", "pull"])

    # Issue editor (reference kcidb/issue_editor/__init__.py — a Flask
    # UI publishing to the new-data topic; here a CLI writing through
    # the validated submit/load paths).
    p = sub.add_parser("issue-edit")
    p.add_argument("-d", "--database", default=None,
                   help="store directory to load the report into")
    p.add_argument("--queue", default=None,
                   help="publish to this ingest queue instead of "
                        "loading directly")
    p.add_argument("--origin", default="maestro")
    p.add_argument("--id", dest="issue_id", default=None,
                   help="existing issue id to edit — the new "
                        "issue_version auto-increments past the "
                        "store's latest")
    p.add_argument("--subject", required=True, dest="report_subject")
    p.add_argument("--culprit", required=True,
                   choices=["code", "tool", "harness"])
    p.add_argument("--name", required=True, help="author name")
    p.add_argument("--email", required=True, help="author e-mail")
    p.add_argument("--report-url", default=None)
    p.add_argument("--comment", default=None)
    p.add_argument("--misc", default=None, help="extra misc JSON object")
    p.add_argument("--dry-run", action="store_true")

    p = sub.add_parser("incident-edit")
    p.add_argument("-d", "--database", default=None)
    p.add_argument("--queue", default=None)
    p.add_argument("--origin", default="maestro")
    p.add_argument("--issue-id", required=True)
    p.add_argument("--issue-version", required=True, type=int)
    p.add_argument("--type", required=True, choices=["build", "test"],
                   dest="incident_type")
    p.add_argument("--ids", required=True, nargs="+",
                   help="build/test ids to link")
    p.add_argument("--name", required=True)
    p.add_argument("--email", required=True)
    p.add_argument("--comment", default=None)
    p.add_argument("--misc", default=None)
    p.add_argument("--dry-run", action="store_true")

    args = ap.parse_args(argv)

    # -- sparkless stream tools ----------------------------------------
    if args.cmd == "url-stats":
        # Reference kcidb-get-url-stats (main.py:689-730): aggregate
        # artifact-URL statistics over reports on stdin.
        from collections import Counter
        from urllib.parse import urlparse

        from kcidb_spark.functions import walk_urls

        urls: list[str] = []
        for r in _read_reports(sys.stdin):
            urls.extend(walk_urls(r))
        hosts = Counter(urlparse(u).netloc for u in urls)
        _emit(
            {
                "total_urls": len(urls),
                "distinct_urls": len(set(urls)),
                "by_host": dict(sorted(hosts.items())),
            }
        )
        return 0

    if args.cmd == "schema":
        # Reference kcidb-schema: print the I/O JSON schema document.
        from kcidb_spark.schema.validation import io_json_schema

        _emit(io_json_schema())
        return 0

    if args.cmd == "db-schemas":
        # Reference kcidb-db-schemas: the store versions this engine
        # can open (and migrate between).
        from kcidb_spark.store.versioning import STORE_VERSION

        _emit(
            {
                "4.0": "legacy store (valid columns, no issue versions)"
                       " — openable via db-upgrade",
                f"{STORE_VERSION[0]}.{STORE_VERSION[1]}": "current",
            }
        )
        return 0

    if args.cmd == "submit":
        # Reference kcidb-submit publishes reports to the ingest queue
        # (Pub/Sub there; the streaming file-source inbox here — the
        # ingest pipeline's readStream watches this directory).
        import os
        import uuid

        os.makedirs(args.queue, exist_ok=True)
        n = 0
        for r in _read_reports(sys.stdin):
            from kcidb_spark.schema.io import validate

            validate(r)
            name = os.path.join(args.queue, f"report-{uuid.uuid4().hex}.json")
            with open(name + ".tmp", "w", encoding="utf-8") as f:
                json.dump(r, f)
            os.rename(name + ".tmp", name)  # atomic appearance
            n += 1
        _emit({"submitted": n})
        return 0

    if args.cmd == "tests-validate":
        # Reference kcidb-tests-validate (kcidb/tests/__init__.py).
        import yaml

        from kcidb_spark.tests_catalog import check_urls, validate_catalog

        catalog = yaml.safe_load(sys.stdin) or {}
        validate_catalog(catalog)
        if args.urls:
            bad = check_urls(catalog)
            for url in bad:
                print(f"bad home URL: {url}", file=sys.stderr)
            if bad:
                return 1
        return 0

    if args.cmd == "monitor-spool-wipe":
        from kcidb_spark.streaming.notify import NotificationSpool

        spool = NotificationSpool(_spark(), args.spool)
        _emit({"wiped": spool.wipe(before=args.before)})
        return 0

    if args.cmd in ("validate", "upgrade", "count", "merge"):
        from kcidb_spark.schema.io import count, merge, upgrade, validate

        reports = _read_reports(sys.stdin)
        if args.cmd == "validate":
            for r in reports:
                validate(r)
                _emit(r)
        elif args.cmd == "upgrade":
            for r in reports:
                _emit(validate(upgrade(r)))
        elif args.cmd == "count":
            _emit(sum(count(r) for r in reports))
        elif args.cmd == "merge":
            reports = [r for r in reports]
            if not reports:
                from kcidb_spark.schema.io import new

                _emit(new())
            else:
                _emit(merge(reports[0], reports[1:]))
        return 0

    if args.cmd.startswith("mq-"):
        return _mq_main(args)

    if args.cmd in ("issue-edit", "incident-edit"):
        return _issue_editor_main(args)

    # -- store tools ----------------------------------------------------
    # Directory-lifecycle commands understand the driver-spec syntax
    # too: parquet: prefixes strip to their directory; sqlite: specs
    # init/cleanup the database FILE (table DDL runs on open).
    if args.cmd in ("db-init", "db-cleanup", "db-upgrade"):
        return _db_lifecycle(args)

    if args.cmd == "explain":
        # Plan transparency: print any registry query's physical plan
        # (the same .explain() audit tests/test_plans.py pins) so a
        # user can check pushdown/broadcast/shuffle shape on THEIR
        # data layout before running at scale.
        from kcidb_spark.queries import REGISTRY

        if args.list_queries:
            for name, q in sorted(REGISTRY.items()):
                tags = ",".join(q.tags)
                print(f"{name}\t{tags}")
            return 0
        if not args.query:
            print("explain: need a query name or --list", file=sys.stderr)
            return 1
        q = REGISTRY.get(args.query)
        if q is None:
            print(f"unknown query {args.query!r} (see explain --list)",
                  file=sys.stderr)
            return 1
        df = q.spark(_spark(), args.sf_dir)
        print(df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), args.mode))
        if args.oracle:
            print("-- DuckDB oracle --")
            print(q.oracle or "(no oracle: rows-only check)")
        return 0

    if args.cmd == "db-time":
        # Reference kcidb-db-time: the database's own notion of "now"
        # (used as a consistent --until bound for dumps).
        spark = _spark()
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        row = spark.sql(
            "SELECT date_format(current_timestamp(),"
            " \"yyyy-MM-dd'T'HH:mm:ss.SSSSSSxxx\") AS now"
        ).collect()[0]
        print(row["now"])
        return 0

    if args.cmd == "describe":
        # Reference-fidelity description bodies (the text the monitor
        # e-mails) for any object type — rendered engine-side, printed
        # one JSON {id, description} per line.
        from pyspark.sql import functions as F

        from kcidb_spark.streaming import render as R

        store = _store(args)
        v = {t: store.table(t) for t in
             ("checkouts", "builds", "tests", "issues", "incidents")}
        if args.obj_type == "revision":
            frame = R.revision_frame(
                v["checkouts"], v["builds"], v["tests"]
            ).select(
                F.col("git_commit_hash").alias("id"), "description"
            )
        elif args.obj_type == "checkout":
            frame = R.checkout_description_frame(
                v["checkouts"], v["builds"], v["tests"])
        elif args.obj_type == "build":
            frame = R.build_description_frame(
                v["checkouts"], v["builds"], v["tests"])
        elif args.obj_type == "test":
            frame = R.test_description_frame(
                v["checkouts"], v["builds"], v["tests"]
            ).select("id", "description")
        elif args.obj_type == "issue":
            frame = R.issue_description_frame(
                v["checkouts"], v["builds"], v["tests"],
                v["issues"], v["incidents"])
        elif args.obj_type == "issue_version":
            frame = R.issue_version_description_frame(
                v["checkouts"], v["builds"], v["tests"],
                v["issues"], v["incidents"])
        else:
            frame = R.incident_description_frame(
                v["builds"], v["tests"], v["issues"], v["incidents"])
        if args.obj_id:
            frame = frame.filter(F.col("id") == args.obj_id)
        for row in frame.collect():
            _emit_line({"id": row["id"], "description": row["description"]})
        return 0

    if args.cmd == "notify":
        # Reference kcidb-notify: evaluate subscriptions over the data
        # and emit one notification JSON per line.  With --mainline,
        # the reference-fidelity revision messages (rich Jinja-parity
        # bodies, streaming/render.py) are included; with
        # --email-queue, each notification is additionally rendered to
        # an RFC-822 e-mail (output.py semantics) and published on the
        # file-transport email queue — the monitor→email-queue hop of
        # the reference deployment.
        from kcidb_spark.orm.types import type_views
        from kcidb_spark.schema.graph import TABLES
        from kcidb_spark.streaming.notify import (
            default_subscriptions,
            load_subscriptions,
            match_subscriptions,
        )

        store = _store(args)
        views = type_views(
            {t: store.table(t, with_metadata=True) for t in TABLES}
        )
        subs = default_subscriptions()
        if args.subscriptions:
            subs += load_subscriptions(args.subscriptions)
        notifications = match_subscriptions(views, subs)
        if args.mainline or args.stock:
            from kcidb_spark.streaming.render import (
                STABLE_REPO_URLS,
                as_notifications,
                ltp_messages,
                mainline_messages,
                testing_done_messages,
            )

            cbt = (
                store.table("checkouts"),
                store.table("builds"),
                store.table("tests"),
            )
            rich_frames = [as_notifications(mainline_messages(*cbt))]
            if args.stock:
                # The remaining stock subscription modules — with the
                # stable-tree trio this evaluates analogs of all NINE
                # reference modules (kcidb/monitor/subscriptions/):
                # test (default_subscriptions) + mainline +
                # linux_stable + ltp_maintainers + mark_brown +
                # linux_stable_rt + linux_omap + nikolai_kondrashov
                # (disabled in the reference, evaluated empty here).
                from kcidb_spark.streaming.stable import (
                    nikolai_messages,
                    omap_messages,
                    stable_rt_messages,
                )

                # mark_brown repo set
                # (subscriptions/mark_brown.py:10-22).
                brown_urls = tuple(
                    "https://git.kernel.org/pub/scm/linux/kernel/git/"
                    f"{r}.git"
                    for r in (
                        "arm64/linux", "soc/soc", "broonie/ci",
                        "broonie/misc", "broonie/regmap",
                        "broonie/regulator", "broonie/sound",
                        "broonie/spi",
                    )
                )
                rich_frames.append(
                    as_notifications(
                        mainline_messages(*cbt, repo_url=STABLE_REPO_URLS),
                        subscription="linux_stable",
                    )
                )
                rich_frames.append(
                    as_notifications(
                        ltp_messages(*cbt), subscription="ltp_maintainers"
                    )
                )
                rich_frames.append(
                    as_notifications(
                        testing_done_messages(*cbt, repo_url=brown_urls),
                        subscription="mark_brown",
                    )
                )
                rich_frames.append(
                    as_notifications(
                        stable_rt_messages(*cbt),
                        subscription="linux_stable_rt",
                    )
                )
                rich_frames.append(
                    as_notifications(
                        omap_messages(*cbt), subscription="linux_omap"
                    )
                )
                rich_frames.append(
                    as_notifications(
                        nikolai_messages(*cbt),
                        subscription="nikolai_kondrashov",
                    )
                )
            for rich in rich_frames:
                notifications = (
                    rich
                    if notifications is None
                    else notifications.unionByName(
                        rich, allowMissingColumns=True
                    )
                )
        if notifications is None:
            return 0
        rows = notifications.collect()
        for row in rows:
            _emit_line(row.asDict())
        if args.email_queue:
            from kcidb_spark.mq import EmailQueue
            from kcidb_spark.streaming.email_out import render_email

            queue = EmailQueue(args.email_queue)
            for row in rows:
                msg = render_email(
                    subject=row["subject"],
                    body=row["body"],
                    to=[args.to],
                    notification_id=row["id"],
                )
                queue.publish_email(msg.as_string())
        return 0

    if args.cmd == "db-load":
        store = _store(args)
        for r in _read_reports(sys.stdin):
            store.load(r)
        return 0

    if args.cmd == "db-sql":
        # The raw-SQL escape hatch (Store.sql): object tables + ORM
        # views as temp views, one Spark SQL statement, JSONL out.
        store = _store(args)
        df = store.sql(args.statement, with_metadata=args.with_metadata)
        from kcidb_spark.functions import iso_utc_timestamps

        for row in iso_utc_timestamps(store.spark, df).toLocalIterator():
            _emit_line(row.asDict(recursive=True))
        return 0

    if args.cmd == "db-compact":
        # Materialize the dedup view into the raw tables (parquet
        # store maintenance; reference BigQuery-view materialization
        # cadence).
        _store(args).compact()
        return 0

    if args.cmd == "db-dump":
        store = _store(args)
        if args.objects_per_report is not None:
            for report in store.dump_iter(
                args.objects_per_report,
                after=args.after,
                until=args.until,
                with_metadata=args.with_metadata,
            ):
                _emit_line(report)
        else:
            _emit(
                store.dump(
                    after=args.after,
                    until=args.until,
                    with_metadata=args.with_metadata,
                )
            )
        return 0

    if args.cmd == "db-empty":
        _store(args).empty()
        return 0

    if args.cmd == "db-purge":
        _store(args).purge(before=args.before)
        return 0

    if args.cmd == "query":
        from kcidb_spark.closure import query_store

        ids: dict[str, list] = {}
        if args.checkout:
            ids["checkouts"] = args.checkout
        if args.build:
            ids["builds"] = args.build
        if args.test:
            ids["tests"] = args.test
        if args.issue:
            # "<id>^<version>" 2-part ids (reference zips issue ids with
            # versions, kcidb/__init__.py:380-384).
            ids["issues"] = [
                (part[0], int(part[1]))
                for part in (i.rsplit("^", 1) for i in args.issue)
            ]
        if args.incident:
            ids["incidents"] = args.incident
        if args.objects_per_report is not None:
            from kcidb_spark.closure import query_store_iter

            for report in query_store_iter(
                _store(args),
                ids,
                parents=args.parents,
                children=args.children,
                objects_per_report=args.objects_per_report,
            ):
                _emit_line(report)
        else:
            _emit(
                query_store(
                    _store(args), ids, parents=args.parents, children=args.children
                )
            )
        return 0

    if args.cmd == "oo-query":
        from kcidb_spark.orm.compiler import compile_patterns
        from kcidb_spark.orm.pattern import parse_pattern
        from kcidb_spark.orm.types import type_views
        from kcidb_spark.schema.graph import TABLES

        store = _store(args)
        patterns = set()
        for s in args.pattern:
            patterns |= parse_pattern(s)
        views = type_views({t: store.table(t, with_metadata=True) for t in TABLES})
        result = compile_patterns(store.spark, views, patterns)
        from kcidb_spark.functions import iso_utc_timestamps

        out = {
            # Timestamps serialize engine-side: collected TimestampType
            # is rendered in the driver's local tz (see functions.iso_
            # utc_timestamps), so stringify before collect.
            typ: [row.asDict(recursive=True)
                  for row in iso_utc_timestamps(store.spark, df).collect()]
            for typ, df in sorted(result.items())
        }
        _emit(_jsonable(out))
        return 0

    if args.cmd == "ingest":
        from kcidb_spark.streaming.ingest import IngestPipeline
        from kcidb_spark.streaming.notify import NotificationSpool

        store = _store(args)
        spool = NotificationSpool(store.spark, args.spool)
        pipe = IngestPipeline(store, spool)
        raw = [json.dumps(r) for r in _read_reports(sys.stdin)]
        pipe.ingest_batch(raw)
        _emit({"loaded_reports": pipe.loaded_reports, "spooled": pipe.spooled})
        return 0

    raise AssertionError(f"unhandled command {args.cmd}")


def _jsonable(v: Any) -> Any:
    if isinstance(v, dict):
        return {k: _jsonable(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_jsonable(x) for x in v]
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    return v


if __name__ == "__main__":
    sys.exit(main())
