"""Shared fixture revision for the stable-tree template renders —
consumed by tools/gen_stable_goldens.py (reference Jinja render) AND
tests/test_render_stable.py (engine Column render), so both sides
provably render the same input.

Constructed so every ordering the reference leaves to load order
(dict insertion, list position) coincides with the engine's
deterministic sorts: one failed build per origin, one test per
(origin, path, architecture) group, URLs/branches/tags in ascending
order.  ``environment.misc`` is the I/O-schema object; the store
packs it to the JSON string column get_json_object reads.
"""

STABLE_RT_URL = (
    "https://git.kernel.org/pub/scm/linux/kernel/git/rt/"
    "linux-stable-rt.git"
)
OMAP_URL = (
    "https://git.kernel.org/pub/scm/linux/kernel/git/tmlind/"
    "linux-omap.git"
)
MAINLINE_URL = (
    "https://git.kernel.org/pub/scm/linux/kernel/git/torvalds/linux.git"
)

HASH = "9f8e7d6c5b4a39281706f5e4d3c2b1a09876f5e4"

FIXTURE = {
    "version": {"major": 5, "minor": 3},
    "checkouts": [
        {
            "id": "maestro:c1",
            "origin": "maestro",
            "git_repository_url": STABLE_RT_URL,
            "git_repository_branch": "linux-6.6.y-rt",
            "git_commit_hash": HASH,
            "git_commit_name": "v6.6.30-rt30",
            "git_commit_tags": ["v6.6.30-rt30"],
            "patchset_hash": "",
            "comment": "rt tip",
            "valid": True,
        },
        {
            "id": "broonie:c2",
            "origin": "broonie",
            "git_repository_url": OMAP_URL,
            "git_repository_branch": "omap-for-v6.7",
            "git_commit_hash": HASH,
            "patchset_hash": "",
            "valid": True,
        },
        {
            "id": "redhat:c3",
            "origin": "redhat",
            "git_repository_url": MAINLINE_URL,
            "git_repository_branch": "master",
            "git_commit_hash": HASH,
            "git_commit_tags": ["v6.7-rc1"],
            "patchset_hash": "",
            "valid": True,
        },
    ],
    "builds": [
        {
            "id": "broonie:b3",
            "origin": "broonie",
            "checkout_id": "broonie:c2",
            "architecture": "x86_64",
            "config_name": "allmodconfig",
            "status": "FAIL",
        },
        {
            "id": "maestro:b1",
            "origin": "maestro",
            "checkout_id": "maestro:c1",
            "architecture": "x86_64",
            "config_name": "defconfig",
            "status": "PASS",
        },
        {
            "id": "maestro:b2",
            "origin": "maestro",
            "checkout_id": "maestro:c1",
            "architecture": "arm64",
            "config_name": "defconfig",
            "status": "FAIL",
        },
        {
            "id": "maestro:b5",
            "origin": "maestro",
            "checkout_id": "maestro:c1",
            "status": "FAIL",
        },
        {
            "id": "redhat:b4",
            "origin": "redhat",
            "checkout_id": "redhat:c3",
            "architecture": "i686",
            "config_name": "defconfig",
            "status": "FAIL",
        },
    ],
    "tests": [
        {
            "id": "broonie:t3",
            "origin": "broonie",
            "build_id": "broonie:b3",
            "path": "boot",
            "status": "FAIL",
            "environment": {"misc": {}},
        },
        {
            "id": "broonie:t6",
            "origin": "broonie",
            "build_id": "broonie:b3",
            "path": "rt-tests.cyclictest",
            "status": "PASS",
            "environment": {"misc": {"platform": "beagle-x15"}},
        },
        {
            "id": "maestro:t1",
            "origin": "maestro",
            "build_id": "maestro:b1",
            "path": "boot",
            "status": "PASS",
            "environment": {"misc": {"platform": "qemu-x86_64"}},
        },
        {
            "id": "maestro:t2",
            "origin": "maestro",
            "build_id": "maestro:b2",
            "path": "boot.warm",
            "status": "FAIL",
            "environment": {"misc": {"platform": "rpi4"}},
        },
        {
            "id": "maestro:t4",
            "origin": "maestro",
            "build_id": "maestro:b2",
            "path": "rt-tests.cyclictest",
            "status": "FAIL",
            "environment": {"misc": {"platform": "rpi4"}},
        },
        {
            "id": "maestro:t5",
            "origin": "maestro",
            "build_id": "maestro:b1",
            "path": "rt-tests.signaltest",
            "status": "FAIL",
            "environment": {"misc": {"platform": "x86-board"}},
        },
        {
            "id": "redhat:t7",
            "origin": "redhat",
            "build_id": "redhat:b4",
            "path": "boot",
            "status": "FAIL",
            "environment": {"misc": {"platform": "hp-z2"}},
        },
    ],
}




#: All-pass variant: patches applied (3 files), one passing build and
#: passing boot+rt tests — pins the "No build failures found" /
#: "No boot failures found" / "No rt-tests failures found" branches,
#: the Patches badge line, and the patch-list block.
FIXTURE_ALLPASS = {
    "version": {"major": 5, "minor": 3},
    "checkouts": [
        {
            "id": "maestro:c1",
            "origin": "maestro",
            "git_repository_url": STABLE_RT_URL,
            "git_repository_branch": "linux-6.6.y-rt",
            "git_commit_hash": "aa" * 20,
            "patchset_hash": "deadbeef",
            "patchset_files": [
                {
                    "name": f"p{i}.patch",
                    "url": f"https://lore.example/p{i}.patch",
                }
                for i in range(3)
            ],
            "comment": "tip",
            "valid": True,
        },
    ],
    "builds": [
        {
            "id": "maestro:b1",
            "origin": "maestro",
            "checkout_id": "maestro:c1",
            "architecture": "x86_64",
            "config_name": "defconfig",
            "status": "PASS",
        },
    ],
    "tests": [
        {
            "id": "maestro:t1",
            "origin": "maestro",
            "build_id": "maestro:b1",
            "path": "boot",
            "status": "PASS",
            "environment": {"misc": {"platform": "qemu"}},
        },
        {
            "id": "maestro:t2",
            "origin": "maestro",
            "build_id": "maestro:b1",
            "path": "rt-tests.cyclictest",
            "status": "PASS",
            "environment": {"misc": {"platform": "qemu"}},
        },
    ],
}


#: Empty variant: a bare checkout, no builds, no tests — pins the
#: "No builds found" / "No tests found" branches (note the reference
#: emits NO "BUILDS" header in that branch).
FIXTURE_EMPTY = {
    "version": {"major": 5, "minor": 3},
    "checkouts": [
        {
            "id": "maestro:c1",
            "origin": "maestro",
            "git_repository_url": STABLE_RT_URL,
            "git_repository_branch": "linux-6.6.y-rt",
            "git_commit_hash": "bb" * 20,
            "patchset_hash": "",
            "comment": "tip",
        },
    ],
    "builds": [],
    "tests": [],
}
