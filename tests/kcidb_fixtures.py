"""Test fixtures for the kcidb-domain modules.

COMPREHENSIVE: one object of every type with every v5.3 field
populated (modeled on the reference's golden-object fixture shape,
kcidb/test_db.py:245-385 — content is our own).

GRAPH: the minimal closure-exercising shape from FIXTURES.md §2
(mirror of kcidb/test_db.py:2535-2570).
"""

COMPREHENSIVE = {
    "version": {"major": 5, "minor": 3},
    "checkouts": [
        {
            "id": "origin:checkout-1",
            "origin": "origin",
            "tree_name": "mainline",
            "git_repository_url": "https://git.example.org/kernel.git",
            "git_commit_hash": "deadbeef" * 5,
            "git_commit_name": "v6.6-rc1-15-gdeadbeef",
            "git_commit_tags": ["v6.6-rc1", "next-20990101"],
            "git_commit_message": "Merge branch 'fixes'",
            "git_repository_branch": "master",
            "git_repository_branch_tip": True,
            "patchset_files": [
                {"name": "0001.patch", "url": "https://example.org/0001.patch"},
                {"name": "0002.patch", "url": "https://example.org/0002.patch"},
            ],
            "patchset_hash": "cafef00d" * 8,
            "message_id": "<msg@example.org>",
            "comment": "a comprehensive checkout",
            "start_time": "2025-08-14T23:08:06.967000+00:00",
            "log_url": "https://example.org/checkout.log",
            "log_excerpt": "error: everything is fine",
            "valid": True,
            "origin_builds_finish_time": "2025-08-15T01:00:00.000000+00:00",
            "origin_tests_finish_time": "2025-08-15T02:00:00.000000+00:00",
            "misc": {"pipeline_id": 42, "nested": {"a": [1, 2]}},
        }
    ],
    "builds": [
        {
            "checkout_id": "origin:checkout-1",
            "id": "origin:build-1",
            "origin": "origin",
            "comment": "a comprehensive build",
            "start_time": "2025-08-14T23:30:00.000000+00:00",
            "duration": 600.5,
            "architecture": "x86_64",
            "command": "make -j32 defconfig bzImage",
            "compiler": "gcc-13",
            "input_files": [
                {"name": "fragment.config", "url": "https://example.org/frag.cfg"}
            ],
            "output_files": [
                {"name": "bzImage", "url": "https://example.org/bzImage"},
                {"name": "modules.tar", "url": "https://example.org/modules.tar"},
            ],
            "config_name": "defconfig",
            "config_url": "https://example.org/.config",
            "log_url": "https://example.org/build.log",
            "log_excerpt": "warning: harmless",
            "status": "PASS",
            "misc": {"ccache_hit": True},
        }
    ],
    "tests": [
        {
            "build_id": "origin:build-1",
            "id": "origin:test-1",
            "origin": "origin",
            "environment": {
                "comment": "qemu-x86_64",
                "misc": {"ram_gb": 4},
                "compatible": ["acme,board-v2", "acme,board"],
            },
            "path": "ltp.sem01",
            "comment": "a comprehensive test",
            "log_url": "https://example.org/test.log",
            "log_excerpt": "TPASS sem01",
            "status": "FAIL",
            "start_time": "2025-08-15T00:00:00.000000+00:00",
            "duration": 42.25,
            "number": {"value": 1.625, "unit": "s", "prefix": "metric"},
            "input_files": [
                {"name": "params.yaml", "url": "https://example.org/params.yaml"}
            ],
            "output_files": [
                {"name": "trace.dat", "url": "https://example.org/trace.dat"}
            ],
            "misc": {"retries": 1},
        }
    ],
    "issues": [
        {
            "id": "origin:issue-1",
            "version": 3,
            "origin": "origin",
            "report_url": "https://bugs.example.org/1234",
            "report_subject": "sem01 fails on acme boards",
            "culprit": {"code": True, "tool": False, "harness": False},
            "categories": ["regression", "arch:x86"],
            "comment": "a comprehensive issue",
            "misc": {"severity": "high"},
        }
    ],
    "incidents": [
        {
            "id": "origin:incident-1",
            "origin": "origin",
            "issue_id": "origin:issue-1",
            "issue_version": 3,
            "build_id": "origin:build-1",
            "test_id": "origin:test-1",
            "present": True,
            "comment": "a comprehensive incident",
            "misc": {"confidence": 0.875},
        }
    ],
}


def graph_fixture() -> dict:
    """FIXTURES.md §2 / kcidb/test_db.py:2535-2570 shape."""
    return {
        "version": {"major": 5, "minor": 3},
        "checkouts": [
            {"id": "_:1", "origin": "_"},
            {"id": "_:2", "origin": "_"},
        ],
        "builds": [
            {"id": "_:1", "origin": "_", "checkout_id": "_:1"},
            {"id": "_:2", "origin": "_", "checkout_id": "_:2"},
        ],
        "tests": [
            {"id": "_:1", "origin": "_", "build_id": "_:1"},
            {"id": "_:2", "origin": "_", "build_id": "_:2"},
        ],
        "issues": [
            {"id": "_:1", "origin": "_", "version": 1},
            {"id": "_:2", "origin": "_", "version": 1},
            {"id": "_:3", "origin": "_", "version": 1},
            {"id": "_:4", "origin": "_", "version": 1},
        ],
        "incidents": [
            {"id": "_:1", "origin": "_", "issue_id": "_:1", "issue_version": 1,
             "build_id": "_:1"},
            {"id": "_:2", "origin": "_", "issue_id": "_:2", "issue_version": 1,
             "test_id": "_:1"},
            {"id": "_:3", "origin": "_", "issue_id": "_:3", "issue_version": 1,
             "build_id": "_:2", "test_id": "_:2"},
            {"id": "_:4", "origin": "_", "issue_id": "_:4", "issue_version": 1,
             "test_id": "_:1"},
            {"id": "_:5", "origin": "_", "issue_id": "_:4", "issue_version": 1,
             "test_id": "_:2"},
        ],
    }
