"""Reference-fidelity revision notification rendering, engine-side.

The reference renders notification subjects/bodies through Jinja2
templates over lazy OO object trees — one Python render per object
(kcidb/monitor/output.py:175-241, kcidb/templates/revision*.j2,
build.j2, test.j2, misc.j2).  That is a driver-side loop at scale.

Spark-first redesign: the revision "object tree" is three aggregations
(checkouts / builds / tests rolled up to the revision key), and the
template logic — status emoji badges, aligned emoji×count tables,
capped failure lists, the legend — compiles to pure Column
expressions (``transform``/``filter``/``aggregate`` HOFs, concat,
conditional sections).  Rendering happens inside whole-stage codegen
for every revision in parallel; the output text is byte-identical to
the reference templates for the golden fixture
(tests/golden/revision_description.txt, rendered from the reference's
own .j2 files — see tests/test_render.py).

Deliberate divergences (all documented, all deterministic): where the
reference iterates Python dicts in *load* order (repo URLs, branch
lists, tie-broken architecture rows, failure lists), this module
sorts lexicographically — load order is not reproducible in a
distributed engine, and a notification body must not depend on shuffle
arrival order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Status values in reference priority order (kcidb/oo/__init__.py:119,
#: STATUS_PRIORITY); index 7 stands for NULL/unknown.
_STATUSES = ("FAIL", "ERROR", "MISS", "PASS", "DONE", "SKIP")
_EMOJIS = ("❌", "💥", "🟩", "✅", "🆗", "⏩")
_NULL_EMOJI = "❓"
_BLANK_EMOJI = "➖"

#: kcidb/templates/misc.j2 legend() macro output (data the engine must
#: emit, byte-for-byte).
LEGEND = (
    "\nLEGEND\n\n"
    "    ❌ FAIL     - Failed. Tested code is likely faulty.\n"
    "    💥 ERROR    - Aborted. Test, tested code, or both might be faulty.\n"
    "    🟩 MISS     - Missing. Planned, but failed to execute.\n"
    "    ✅ PASS     - Passed. Tested code is likely correct.\n"
    "    🆗 DONE     - Finished. Status of tested code is unknown.\n"
    "    ⏩ SKIP     - Skipped. Planned, but didn't apply.\n"
    "    ❓ UNKNOWN  - In progress, or status unknown.\n\n"
    "    🚧 WAIVED   - Waived result. Test is too new or shows known failures.\n\n"
    "    ➖ BLANK    - No data, zero."
)

#: revision_description.txt.j2 caps lists at 5 entries.
MAX_LIST_LEN = 5

_DASH = (
    "https://kcidb.kernelci.org/d/revision/revision?orgId=1"
    "&var-git_commit_hash="
)

REV_KEYS = ["git_commit_hash", "patchset_hash"]


def _status_emoji(status: Column) -> Column:
    """misc.j2 status_emoji macro."""
    e = F.when(F.lit(False), F.lit(""))
    for s, emoji in zip(_STATUSES, _EMOJIS):
        e = e.when(status == s, emoji)
    return e.otherwise(_NULL_EMOJI)


def _status_badge(status: Column) -> Column:
    """misc.j2 status_badge: emoji + status name (NULL → UNKNOWN)."""
    return F.concat(
        _status_emoji(status), F.lit(" "), F.coalesce(status, F.lit("UNKNOWN"))
    )


def _valid_badge(valid: Column) -> Column:
    """misc.j2 valid_badge: ❓ UNKNOWN / ✅ PASS / ❌ FAIL."""
    return (
        F.when(valid.isNull(), "❓ UNKNOWN")
        .when(valid, "✅ PASS")
        .otherwise("❌ FAIL")
    )


def _status_prio(status: Column) -> Column:
    p = F.when(F.lit(False), F.lit(0))
    for i, s in enumerate(_STATUSES):
        p = p.when(status == s, i + 1)
    return p.otherwise(7)


def _prio_status(prio: Column) -> Column:
    # prio 7 (or NULL) is the NULL status; never index out of range —
    # ANSI mode (Spark 4 default) makes that an error, not a NULL.
    return F.when(
        prio <= 6,
        F.element_at(
            F.array(*[F.lit(s) for s in _STATUSES]), prio.cast("int")
        ),
    )


def _lpad(col: Column, width: Column) -> Column:
    """Right-align ``col`` in ``width`` chars (dynamic width — the
    reference computes %Ns widths from the data)."""
    pad = F.lit(" " * 64).substr(
        F.lit(1), F.greatest(width - F.length(col), F.lit(0))
    )
    return F.concat(pad, col)


def _quote(comment: Column) -> Column:
    return F.when(
        comment.isNotNull(), F.concat(F.lit('"'), comment, F.lit('"'))
    )


def _nullif_empty(col: Column) -> Column:
    return F.nullif(col, F.lit(""))


# ---------------------------------------------------------------------------
# Revision aggregation (the OO tree as three rollups)
# ---------------------------------------------------------------------------


def _counts_struct(prefix: str = "") -> list[Column]:
    cols = [
        F.count_if(F.col("status") == s).alias(f"n{i}")
        for i, s in enumerate(_STATUSES)
    ]
    cols.append(F.count_if(F.col("status").isNull()).alias("n6"))
    return cols


_N = [f"n{i}" for i in range(7)]  # FAIL..SKIP + NULL


def revision_frame(
    checkouts: DataFrame, builds: DataFrame, tests: DataFrame
) -> DataFrame:
    """One row per revision (git_commit_hash, patchset_hash) carrying
    everything the reference templates consume: summary line, full
    description body, rollup statuses, and the repo URL list for
    subscription filters.

    Scale shape: three shuffles (builds→checkout join reuses the
    checkout id partitioning; each rollup is a partial-agg groupBy on
    the revision key), no collects, no Python.
    """
    co = checkouts.select(
        "id",
        "git_commit_hash",
        "patchset_hash",
        "git_commit_name",
        "git_repository_url",
        "git_repository_branch",
        "comment",
        "origin",
        "valid",
        "patchset_files",
    )
    rev_of_checkout = co.select(
        F.col("id").alias("checkout_id"), *REV_KEYS
    )

    co_agg = co.groupBy(*REV_KEYS).agg(
        F.array_sort(F.collect_set("origin")).alias("co_origins"),
        F.min(
            F.when(F.col("valid") == False, 1)  # noqa: E712
            .when(F.col("valid") == True, 2)  # noqa: E712
            .otherwise(3)
        ).alias("vprio"),
        F.min("git_commit_name").alias("commit_name"),
        F.expr("min_by(patchset_files, id)").alias("patchset_files"),
        F.collect_list(
            F.struct(
                F.col("git_repository_url").alias("url"),
                F.col("git_repository_branch").alias("branch"),
                F.col("comment").alias("comment"),
            )
        ).alias("cos"),
    )

    b = builds.join(
        rev_of_checkout, on="checkout_id", how="inner"
    ).select(
        *REV_KEYS,
        "id",
        "origin",
        "status",
        "architecture",
        "config_name",
        "comment",
    )
    brev, bfail = _agg_builds(b, REV_KEYS)

    rev_of_build = b.select(F.col("id").alias("build_id"), *REV_KEYS)
    t = tests.join(rev_of_build, on="build_id", how="inner").select(
        *REV_KEYS, "origin", "status", "path"
    )
    trev, torig = _agg_tests(t, REV_KEYS)

    out = (
        co_agg.join(brev, on=REV_KEYS, how="left")
        .join(bfail, on=REV_KEYS, how="left")
        .join(trev, on=REV_KEYS, how="left")
        .join(torig, on=REV_KEYS, how="left")
    )
    return _with_rendering(out)


def _agg_builds(b: DataFrame, keys: list[str]):
    """Build-container rollups keyed by ``keys`` (the revision key, a
    checkout id, …): (status/arch count frame, failure-summary frame)
    carrying exactly the columns ``_builds_section`` renders from.
    ``b`` needs keys + id/origin/status/architecture/config_name/
    comment."""
    barch = b.groupBy(*keys, "architecture").agg(
        *_counts_struct(), F.collect_set("origin").alias("origs")
    )
    bagg = barch.groupBy(*keys).agg(
        *[F.sum(n).alias(f"b_{n}") for n in _N],
        # Negated counts → ascending sort == reference's count-desc
        # ordering, with arch ASC as the deterministic tie-break.
        F.array_sort(
            F.collect_list(
                F.struct(
                    *[(-F.col(n)).alias(f"k{i}") for i, n in enumerate(_N)],
                    F.coalesce(F.col("architecture"), F.lit("?")).alias(
                        "arch"
                    ),
                    *[F.col(n).alias(n) for n in _N],
                )
            )
        ).alias("arch_rows"),
        F.array_sort(
            F.array_distinct(F.flatten(F.collect_list("origs")))
        ).alias("b_origins"),
    )
    # build.j2 summary(build): arch + config + quoted comment, default id
    bsummary = _nullif_empty(
        F.concat_ws(
            " ",
            F.col("architecture"),
            F.col("config_name"),
            _quote(F.col("comment")),
        )
    )
    bfail = (
        b.filter(F.col("status") == "FAIL")
        .select(*keys, F.coalesce(bsummary, F.col("id")).alias("bsum"))
        .groupBy(*keys, "bsum")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy(*keys)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        (-F.col("cnt")).alias("k"),
                        F.col("bsum").alias("bsum"),
                        F.col("cnt").alias("cnt"),
                    )
                )
            ).alias("fail_rows")
        )
    )
    return bagg, bfail


def _agg_tests(t: DataFrame, keys: list[str]):
    """Test-container rollups keyed by ``keys``: (node-status frame,
    origin frame) carrying the columns ``_tests_section`` renders
    from.  ``t`` needs keys + origin/status/path."""
    # tests_root.nodes: group test runs by TOP-LEVEL path component
    # (kcidb/oo/__init__.py:335-360); empty paths are skipped, NULL
    # paths form the NULL-named node (rendered "?").
    tnode = (
        t.filter(F.col("path").isNull() | (F.col("path") != ""))
        .withColumn(
            "node",
            F.when(
                F.col("path").isNotNull(),
                F.substring_index("path", ".", 1),
            ),
        )
        .groupBy(*keys, "node")
        .agg(F.min(_status_prio(F.col("status"))).alias("nprio"))
    )
    tagg = tnode.groupBy(*keys).agg(
        *[
            F.count_if(F.col("nprio") == i + 1).alias(f"t_n{i}")
            for i in range(6)
        ],
        F.count_if(F.col("nprio") == 7).alias("t_n6"),
        F.min("nprio").alias("t_prio"),
        F.array_sort(
            F.collect_list(
                F.when(F.col("nprio") == 2, F.coalesce("node", F.lit("?")))
            )
        ).alias("err_nodes"),
        F.array_sort(
            F.collect_list(
                F.when(F.col("nprio") == 1, F.coalesce("node", F.lit("?")))
            )
        ).alias("fail_nodes"),
    )
    torig = t.groupBy(*keys).agg(
        F.array_sort(F.collect_set("origin")).alias("t_origins"),
        F.max(
            F.when(
                (F.col("status") == "FAIL") & (F.col("origin") != "syzbot"),
                1,
            ).otherwise(0)
        ).alias("t_fail_nonsyzbot"),
    )
    return tagg, torig


# ---------------------------------------------------------------------------
# Rendering columns
# ---------------------------------------------------------------------------


def _repo_lines(cos: Column) -> tuple[Column, Column, Column, Column]:
    """(urls asc, checked-out lines, first branch, first comment)."""
    urls = F.array_sort(F.array_distinct(F.transform(cos, lambda c: c.url)))

    def branches_of(u):
        return F.array_sort(
            F.array_distinct(
                F.transform(
                    F.filter(cos, lambda c: c.url.eqNullSafe(u)),
                    lambda c: c.branch,
                )
            )
        )

    lines = F.transform(
        urls,
        lambda u: F.concat_ws(
            " ",
            u,
            F.array_join(
                F.filter(branches_of(u), lambda b: b.isNotNull()), " "
            ),
        ),
    )
    # try_element_at: these arrays can be EMPTY (e.g. no checkout of
    # the revision carries a comment) and Spark 4's default ANSI mode
    # makes a plain element_at on an empty array an ERROR, not NULL —
    # "first element or NULL" is exactly try_element_at.
    first_url = F.try_element_at(urls, F.lit(1))
    first_branch = F.try_element_at(branches_of(first_url), F.lit(1))
    # Lexicographically-first non-null comment: collect_list order is
    # shuffle-dependent, and a notification body must be deterministic
    # (the reference's "first" is load order, unavailable here).
    first_comment = F.try_element_at(
        F.array_sort(
            F.filter(
                F.transform(
                    F.filter(
                        cos,
                        lambda c: c.url.eqNullSafe(first_url)
                        & c.branch.eqNullSafe(first_branch),
                    ),
                    lambda c: c.comment,
                ),
                lambda x: x.isNotNull(),
            )
        ),
        F.lit(1),
    )
    return urls, lines, first_branch, first_comment


def _summary_col(df_cols: dict[str, Column]) -> Column:
    """revision.j2 summary macro: location@commit+NP "comment"."""
    urls, _, first_branch, first_comment = df_cols["repo"]
    first_url = F.try_element_at(urls, F.lit(1))
    last_seg = F.try_element_at(F.split(first_url, "/"), F.lit(-1))
    location = F.when(
        first_url.isNotNull(),
        F.concat_ws(":", last_seg, first_branch),
    )
    commit = F.coalesce(
        df_cols["commit_name"], F.col("git_commit_hash").substr(1, 12)
    )
    location_commit = _nullif_empty(F.concat_ws("@", location, commit))
    patches = F.when(
        F.size(F.coalesce(df_cols["patchset_files"], F.array())) > 0,
        F.concat(
            F.lit("+"),
            F.size(df_cols["patchset_files"]).cast("string"),
            F.lit("P"),
        ),
    )
    location_commit_patches = F.when(
        location_commit.isNotNull(),
        F.concat(location_commit, F.coalesce(patches, F.lit(""))),
    )
    return F.concat_ws(
        " ", location_commit_patches, _quote(first_comment)
    )


def _emoji_arr() -> Column:
    return F.array(*[F.lit(e) for e in _EMOJIS], F.lit(_NULL_EMOJI))


def _builds_section() -> Column:
    """build.j2 container_summary as one Column (empty string when the
    revision has no builds)."""
    totals = [F.coalesce(F.col(f"b_{n}"), F.lit(0)) for n in _N]
    any_builds = sum(totals) > 0
    arch_w = F.lit(8) + F.array_max(
        F.transform(F.col("arch_rows"), lambda r: F.length(r.arch))
    )
    widths = [F.length(t.cast("string")) for t in totals]
    emojis = _emoji_arr()

    status_row = F.concat(
        *[
            F.when(
                totals[i] > 0,
                F.concat(
                    F.lit("  "),
                    F.element_at(emojis, i + 1),
                    F.lit(" "),
                    totals[i].cast("string"),
                ),
            ).otherwise("")
            for i in range(7)
        ]
    )

    def arch_row(r):
        segs = [_lpad(r.arch, arch_w)]
        for i, n in enumerate(_N):
            segs.append(
                F.when(
                    totals[i] > 0,
                    F.concat(
                        F.lit("  "),
                        F.when(r[n] > 0, F.element_at(emojis, i + 1)).otherwise(
                            _BLANK_EMOJI
                        ),
                        F.lit(" "),
                        _lpad(r[n].cast("string"), widths[i]),
                    ),
                ).otherwise("")
            )
        return F.concat(*segs)

    arch_table = F.array_join(
        F.transform(F.col("arch_rows"), arch_row), "\n"
    )

    fail_rows = F.coalesce(
        F.col("fail_rows"),
        F.array().cast("array<struct<k:bigint,bsum:string,cnt:bigint>>"),
    )
    fail_lines = F.array_join(
        F.transform(
            F.slice(fail_rows, 1, MAX_LIST_LEN),
            lambda r: F.concat(
                F.lit("        ❌ "), r.cnt.cast("string"), F.lit("  "), r.bsum
            ),
        ),
        "\n",
    )
    failures = F.when(
        F.size(fail_rows) > 0,
        F.concat(
            F.lit("    Failures\n"),
            fail_lines,
            F.when(
                F.size(fail_rows) > MAX_LIST_LEN, F.lit("\n        ...")
            ).otherwise(""),
            F.lit("\n"),
        ),
    ).otherwise("")

    return F.when(
        any_builds,
        F.concat(
            F.lit("\nBUILDS\n\n    Status\n"),
            _lpad(F.lit(""), arch_w),
            status_row,
            F.lit("\n    Architectures\n"),
            arch_table,
            F.lit("\n"),
            failures,
            F.lit("    By\n        "),
            F.array_join(F.col("b_origins"), ", "),
            F.lit("\n"),
        ),
    ).otherwise("")


def _tests_section() -> Column:
    """test.j2 container_summary as one Column."""
    totals = [F.coalesce(F.col(f"t_n{i}"), F.lit(0)) for i in range(7)]
    any_tests = sum(totals) > 0
    emojis = _emoji_arr()
    status_row = F.concat(
        *[
            F.when(
                totals[i] > 0,
                F.concat(
                    F.lit("  "),
                    F.element_at(emojis, i + 1),
                    F.lit(" "),
                    totals[i].cast("string"),
                ),
            ).otherwise("")
            for i in range(7)
        ]
    )

    def node_list(title: str, arr: Column, emoji: str) -> Column:
        clean = F.filter(
            F.coalesce(arr, F.array().cast("array<string>")),
            lambda x: x.isNotNull(),
        )
        return F.when(
            F.size(clean) > 0,
            F.concat(
                F.lit(f"    {title}\n"),
                F.array_join(
                    F.transform(
                        F.slice(clean, 1, MAX_LIST_LEN),
                        lambda p: F.concat(F.lit(f"        {emoji} "), p),
                    ),
                    "\n",
                ),
                F.when(
                    F.size(clean) > MAX_LIST_LEN, F.lit("\n        ...")
                ).otherwise(""),
                F.lit("\n"),
            ),
        ).otherwise("")

    return F.when(
        any_tests,
        F.concat(
            F.lit("\nTESTS\n\n    Status\n      "),
            status_row,
            F.lit("\n"),
            node_list("Errors", F.col("err_nodes"), "💥"),
            node_list("Failures", F.col("fail_nodes"), "❌"),
            F.lit("    By\n        "),
            F.array_join(F.coalesce("t_origins", F.array()), ", "),
            F.lit("\n"),
        ),
    ).otherwise("")


def _with_rendering(df: DataFrame) -> DataFrame:
    from kcidb_spark.functions import encode_uri_component

    urls, lines, first_branch, first_comment = _repo_lines(F.col("cos"))
    cols = {
        "repo": (urls, lines, first_branch, first_comment),
        "commit_name": F.col("commit_name"),
        "patchset_files": F.col("patchset_files"),
    }
    summary = _summary_col(cols)
    checkouts_valid = F.element_at(
        F.array(F.lit(False), F.lit(True), F.lit(None).cast("boolean")),
        F.col("vprio").cast("int"),
    )
    b_prio = F.when(
        sum(F.coalesce(F.col(f"b_{n}"), F.lit(0)) for n in _N) == 0, None
    ).otherwise(
        F.least(
            *[
                F.when(F.coalesce(F.col(f"b_{n}"), F.lit(0)) > 0, i + 1)
                for i, n in enumerate(_N[:6])
            ],
            F.when(F.coalesce(F.col("b_n6"), F.lit(0)) > 0, 7),
        )
    )
    builds_status = _prio_status(b_prio)
    tests_status = _prio_status(F.col("t_prio"))
    has_tests = F.col("t_prio").isNotNull()
    has_builds = sum(F.coalesce(F.col(f"b_{n}"), F.lit(0)) for n in _N) > 0

    dash_url = F.concat(
        F.lit(_DASH),
        encode_uri_component("coalesce(git_commit_hash, '')"),
        F.lit("&var-patchset_hash="),
        encode_uri_component("coalesce(patchset_hash, '')"),
    )

    pfiles = F.coalesce(
        F.col("patchset_files"),
        F.array().cast("array<struct<name:string,url:string>>"),
    )
    n_patches = F.size(pfiles)
    patches_block = F.when(
        n_patches > 0,
        F.concat(
            F.lit("    With "),
            n_patches.cast("string"),
            F.when(n_patches > 1, F.lit(" patches")).otherwise(F.lit("patch")),
            F.lit(" applied\n"),
            F.array_join(
                F.transform(
                    F.slice(pfiles, 1, MAX_LIST_LEN),
                    lambda p: F.concat(F.lit("        "), p.url),
                ),
                "\n",
            ),
            F.lit("\n"),
            F.when(
                n_patches > MAX_LIST_LEN, F.lit("        ...\n")
            ).otherwise(""),
        ),
    ).otherwise("")

    overview = F.concat(
        F.when(
            n_patches > 0,
            F.concat(
                F.lit("       Patches: "), _valid_badge(checkouts_valid),
                F.lit("\n"),
            ),
        ).otherwise(""),
        F.when(
            has_builds,
            F.concat(
                F.lit("        Builds: "), _status_badge(builds_status),
                F.lit("\n"),
            ),
        ).otherwise(""),
        F.when(
            has_tests,
            F.concat(
                F.lit("         Tests: "), _status_badge(tests_status),
                F.lit("\n"),
            ),
        ).otherwise(""),
    )

    commit_block = F.concat(
        F.when(
            F.col("commit_name").isNotNull(),
            F.concat(F.lit("        name: "), F.col("commit_name"), F.lit("\n")),
        ).otherwise(""),
        F.when(
            F.col("git_commit_hash").isNotNull(),
            F.concat(
                F.lit("        hash: "), F.col("git_commit_hash"), F.lit("\n")
            ),
        ).otherwise(""),
    )

    description = F.concat(
        F.lit(
            "Below is the summary of results Kernel CI database has"
            " recorded\nfor this revision so far. See complete and"
            " up-to-date report at:\n\n    "
        ),
        dash_url,
        F.lit("\n\nOVERVIEW\n\n"),
        overview,
        F.lit("\nREVISION\n\n    Status\n        "),
        _valid_badge(checkouts_valid),
        F.lit("\n    Commit\n"),
        commit_block,
        F.lit("    Checked out from\n"),
        F.array_join(
            F.transform(lines, lambda ln: F.concat(F.lit("        "), ln)),
            "\n",
        ),
        F.lit("\n"),
        patches_block,
        F.lit("    By\n        "),
        F.array_join(F.col("co_origins"), ", "),
        F.lit("\n"),
        _builds_section(),
        _tests_section(),
        F.lit(
            "\nSee complete and up-to-date report at:\n\n    "
        ),
        dash_url,
        F.lit("\n"),
        F.lit(LEGEND),
        # keep_trailing_newline + the statement line's own newline.
        F.lit("\n\n"),
    )

    return df.select(
        *REV_KEYS,
        urls.alias("repo_urls"),
        summary.alias("summary"),
        builds_status.alias("builds_status"),
        tests_status.alias("tests_status"),
        F.coalesce("t_fail_nonsyzbot", F.lit(0)).alias("t_fail_nonsyzbot"),
        description.alias("description"),
    )


#: kcidb/monitor/subscriptions/linux_stable.py REPO_URL_SET.
STABLE_REPO_URLS = tuple(
    "https://git.kernel.org/pub/scm/linux/kernel/git" + sfx
    for sfx in (
        "/stable/linux-stable-rc.git",
        "/stable/linux-stable.git",
        "/sashal/linux-stable.git",
        "/stable/stable-queue.git",
    )
)


def _repo_match(repo_url) -> Column:
    urls = [repo_url] if isinstance(repo_url, str) else list(repo_url)
    return F.arrays_overlap(
        "repo_urls", F.array(*[F.lit(u) for u in urls])
    )


def mainline_messages(
    checkouts: DataFrame,
    builds: DataFrame,
    tests: DataFrame,
    repo_url=(
        "https://git.kernel.org/pub/scm/linux/kernel/git/torvalds/linux.git"
    ),
) -> DataFrame:
    """The reference's mainline subscription
    (kcidb/monitor/subscriptions/mainline.py) as one distributed
    filter + projection over the revision frame: revisions of
    ``repo_url`` whose builds failed get a "Builds failed for …"
    message; otherwise a non-syzbot FAIL test yields "Tests failed
    for …".  Body is the full reference-fidelity description.

    ``repo_url`` may be a single URL or a collection — pass
    :data:`STABLE_REPO_URLS` for the linux_stable subscription
    (kcidb/monitor/subscriptions/linux_stable.py — identical logic
    over its four stable trees).
    """
    rev = revision_frame(checkouts, builds, tests)
    matched = rev.filter(
        _repo_match(repo_url) & F.col("builds_status").isNotNull()
    )
    subject_prefix = F.when(
        F.col("builds_status") == "FAIL", "Builds"
    ).when(F.col("t_fail_nonsyzbot") == 1, "Tests")
    return (
        matched.withColumn("__pfx", subject_prefix)
        .filter(F.col("__pfx").isNotNull())
        .select(
            *REV_KEYS,
            F.concat(
                F.col("__pfx"), F.lit(" failed for "), F.col("summary")
            ).alias("subject"),
            F.col("description").alias("body"),
        )
    )


def ltp_messages(
    checkouts: DataFrame,
    builds: DataFrame,
    tests: DataFrame,
) -> DataFrame:
    """The reference's LTP-maintainer subscription
    (kcidb/monitor/subscriptions/ltp_maintainers.py): per revision,
    the status-priority rollup of the ``ltp`` top-level test node —
    FAIL → "LTP failed for …", ERROR → "LTP aborted for …", with the
    revision summary/description body.  One join chain + one rollup,
    no per-object Python."""
    rev = revision_frame(checkouts, builds, tests)
    b = builds.select(
        F.col("id").alias("build_id"), F.col("checkout_id").alias("b_co")
    )
    co = checkouts.select(F.col("id").alias("b_co"), *REV_KEYS)
    ltp = (
        tests.filter(F.substring_index("path", ".", 1) == "ltp")
        .select("build_id", "status")
        .join(b, "build_id")
        .join(co, "b_co")
        .groupBy(*REV_KEYS)
        .agg(F.min(_status_prio(F.col("status"))).alias("prio"))
        .select(*REV_KEYS, _prio_status(F.col("prio")).alias("ltp_status"))
    )
    matched = rev.join(ltp, on=REV_KEYS).filter(
        F.col("ltp_status").isin("FAIL", "ERROR")
    )
    return matched.select(
        *REV_KEYS,
        F.concat(
            F.when(F.col("ltp_status") == "FAIL", "LTP failed for ")
            .otherwise("LTP aborted for "),
            F.col("summary"),
        ).alias("subject"),
        F.col("description").alias("body"),
    )


def testing_done_messages(
    checkouts: DataFrame,
    builds: DataFrame,
    tests: DataFrame,
    repo_url,
    due_hours: float = 1.0,
) -> DataFrame:
    """A "Testing done for …" digest over a repo set, sent
    ``due_hours`` after matching — the reference's mark_brown
    subscription shape (kcidb/monitor/subscriptions/mark_brown.py:
    repo filter + finished builds + ``due=now()+1h`` so the spool
    holds the message while updates keep arriving).  The ``due``
    column rides into the spool; NotificationSpool.unsent() skips
    rows whose due has not passed."""
    rev = revision_frame(checkouts, builds, tests)
    matched = rev.filter(
        _repo_match(repo_url) & F.col("builds_status").isNotNull()
    )
    return matched.select(
        *REV_KEYS,
        F.concat(F.lit("Testing done for "), F.col("summary"))
        .alias("subject"),
        F.col("description").alias("body"),
        (
            F.current_timestamp()
            + F.expr(f"INTERVAL {int(due_hours * 3600)} SECONDS")
        ).alias("due"),
    )


def as_notifications(
    messages: DataFrame, subscription: str = "mainline"
) -> DataFrame:
    """Rich revision messages → spool rows (same deterministic id
    scheme as notify.match_subscriptions, reference
    monitor/output.py:162-174: subscription:type:b64(obj_id):
    b64(subject)), so NotificationSpool.spool dedups redelivered
    micro-batches identically for rich and flat notifications."""
    from kcidb_spark.streaming.notify import Subscription, _b64

    obj_id = F.concat_ws("+", "git_commit_hash", "patchset_hash")
    subject = F.substring("subject", 1, Subscription.SUBJECT_MAX)
    cols = [
        F.concat_ws(
            ":",
            F.lit(subscription),
            F.lit("revision"),
            _b64(obj_id),
            _b64(subject),
        ).alias("id"),
        F.lit(subscription).alias("subscription"),
        F.lit("revision").alias("obj_type"),
        obj_id.alias("obj_id"),
        subject.alias("subject"),
        F.substring("body", 1, Subscription.BODY_MAX).alias("body"),
    ]
    if "due" in messages.columns:
        cols.append(F.col("due"))
    return messages.select(*cols)


# ---------------------------------------------------------------------------
# Single-test description (test_description.txt.j2 / test_summary.txt.j2)
# ---------------------------------------------------------------------------

_TEST_DASH = (
    "https://kcidb.kernelci.org/d/test/test?orgId=1&var-id="
)


def _checkout_summary(pfx: str) -> Column:
    """checkout.j2 summary over joined ``{pfx}``-prefixed columns:
    location(:branch)@commit(+NP) "comment" — commit/patches come from
    the checkout's own revision fields."""
    url = F.col(f"{pfx}git_repository_url")
    last_seg = F.element_at(F.split(url, "/"), -1)
    location = F.when(
        url.isNotNull(),
        F.concat_ws(":", last_seg, F.col(f"{pfx}git_repository_branch")),
    )
    commit = F.coalesce(
        F.col(f"{pfx}git_commit_name"),
        F.col(f"{pfx}git_commit_hash").substr(1, 12),
    )
    location_commit = _nullif_empty(F.concat_ws("@", location, commit))
    pf = F.coalesce(
        F.col(f"{pfx}patchset_files"),
        F.array().cast("array<struct<name:string,url:string>>"),
    )
    patches = F.when(
        F.size(pf) > 0,
        F.concat(F.lit("+"), F.size(pf).cast("string"), F.lit("P")),
    )
    location_commit_patches = F.when(
        location_commit.isNotNull(),
        F.concat(location_commit, F.coalesce(patches, F.lit(""))),
    )
    return F.concat_ws(
        " ", location_commit_patches, _quote(F.col(f"{pfx}comment"))
    )


def test_description_frame(
    checkouts: DataFrame, builds: DataFrame, tests: DataFrame
) -> DataFrame:
    """One row per test run with reference-fidelity ``summary`` and
    ``description`` columns (test_summary.txt.j2 /
    test_description.txt.j2 — byte-identical for the goldens in
    tests/golden/).  Pure per-row projection after two LEFT joins
    (test→build→checkout), so it renders every test in parallel with
    no aggregation at all; timestamps print as the store's canonical
    ISO-8601 microseconds in UTC, independent of the session TZ.
    """
    spark = tests.sparkSession
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    co = checkouts.select(
        F.col("id").alias("checkout_id"),
        *[
            F.col(c).alias(f"co_{c}")
            for c in (
                "git_repository_url",
                "git_repository_branch",
                "comment",
                "git_commit_name",
                "git_commit_hash",
                "patchset_files",
            )
        ],
    )
    b = (
        builds.select(
            F.col("id").alias("build_id"),
            "checkout_id",
            F.col("architecture").alias("b_architecture"),
            F.col("config_name").alias("b_config_name"),
            F.col("comment").alias("b_comment"),
        )
        .join(co, on="checkout_id", how="left")
        .withColumn("b_exists", F.lit(True))
        .withColumn(
            "co_exists", F.col("checkout_id").isNotNull()
        )
    )
    t = tests.join(b, on="build_id", how="left")

    summary = F.coalesce(
        _nullif_empty(
            F.concat_ws(" ", F.col("path"), _quote(F.col("comment")))
        ),
        F.col("id"),
    )
    b_summary = F.coalesce(
        _nullif_empty(
            F.concat_ws(
                " ",
                F.col("b_architecture"),
                F.col("b_config_name"),
                _quote(F.col("b_comment")),
            )
        ),
        F.col("build_id"),
    )
    iso_ts = F.concat(
        F.date_format("start_time", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"),
        F.lit("+00:00"),
    )
    truthy_path = F.col("path").isNotNull() & (F.col("path") != "")
    env_comment = F.col("environment.comment")

    def section(cond: Column, *parts) -> Column:
        return F.when(cond, F.concat(*parts)).otherwise("")

    description = F.concat(
        F.lit(
            "Below is the summary of execution results Kernel CI"
            " database has recorded for\nthis test. See complete"
            " report at:\n\n    "
        ),
        F.lit(_TEST_DASH),
        encode_uri_component_sql_col("id"),
        F.lit("\n\nTEST\n\n    Status\n                "),
        _status_badge(F.col("status")),
        F.lit("\n"),
        section(truthy_path, F.lit("    Path\n                "),
                F.col("path"), F.lit("\n")),
        section(
            F.col("b_exists").isNotNull() & F.col("co_exists"),
            F.lit("    Checkout\n                "),
            _checkout_summary("co_"),
            F.lit("\n"),
        ),
        section(
            F.col("b_exists").isNotNull(),
            F.lit("    Build\n                "),
            b_summary,
            F.lit("\n"),
        ),
        F.lit("    Executed\n            by: "),
        F.col("origin"),
        F.lit("\n"),
        section(
            env_comment.isNotNull() & (env_comment != ""),
            F.lit("            on: "), env_comment, F.lit("\n"),
        ),
        section(
            F.col("start_time").isNotNull(),
            F.lit("            at: "), iso_ts, F.lit("\n"),
        ),
        section(
            F.col("duration").isNotNull() & (F.col("duration") != 0),
            F.lit("            in: "),
            F.col("duration").cast("string"),
            F.lit(" seconds\n"),
        ),
        section(
            F.size(F.coalesce(
                F.col("output_files"),
                F.array().cast("array<struct<name:string,url:string>>"),
            )) > 0,
            F.lit("    Output files\n"),
            F.array_join(
                F.transform(
                    F.col("output_files"),
                    lambda f: F.concat(
                        F.lit("                "),
                        f["name"],  # .name is the Column method — index
                        F.lit(": "),
                        f["url"],
                    ),
                ),
                "\n",
            ),
            F.lit("\n"),
        ),
        section(
            F.col("comment").isNotNull() & (F.col("comment") != ""),
            F.lit("    Comment\n                "),
            F.col("comment"),
            F.lit("\n"),
        ),
        F.lit("\n"),
    )
    return t.select(
        F.col("id"),
        summary.alias("summary"),
        description.alias("description"),
    )


def encode_uri_component_sql_col(col_name: str) -> Column:
    from kcidb_spark.functions import encode_uri_component

    return encode_uri_component(f"coalesce({col_name}, '')")


# ---------------------------------------------------------------------------
# Build / checkout descriptions (build_description.txt.j2 /
# checkout_description.txt.j2) — per-object container rollups reuse
# the same _agg_builds/_agg_tests + section renderers as revisions.
# ---------------------------------------------------------------------------

_BUILD_DASH = "https://kcidb.kernelci.org/d/build/build?orgId=1&var-id="
_CHECKOUT_DASH = (
    "https://kcidb.kernelci.org/d/checkout/checkout?orgId=1&var-id="
)


def _kv_block(title: str, col: Column, indent: str = "                ") -> Column:
    return F.when(
        col.isNotNull() & (col.cast("string") != ""),
        F.concat(F.lit(f"    {title}\n{indent}"), col.cast("string"), F.lit("\n")),
    ).otherwise("")


def _files_block(title: str, col: Column) -> Column:
    arr = F.coalesce(
        col, F.array().cast("array<struct<name:string,url:string>>")
    )
    return F.when(
        F.size(arr) > 0,
        F.concat(
            F.lit(f"    {title}\n"),
            F.array_join(
                F.transform(
                    arr,
                    lambda f: F.concat(
                        F.lit("                "), f["name"], F.lit(": "),
                        f["url"],
                    ),
                ),
                "\n",
            ),
            F.lit("\n"),
        ),
    ).otherwise("")


def _iso_utc(col_name: str) -> Column:
    return F.concat(
        F.date_format(col_name, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"),
        F.lit("+00:00"),
    )


def build_description_frame(
    checkouts: DataFrame, builds: DataFrame, tests: DataFrame
) -> DataFrame:
    """One row per build with the reference-fidelity
    ``description`` (build_description.txt.j2): OVERVIEW badges, the
    BUILD facts block, and the build's own TESTS container summary —
    byte-identical to the reference render for the golden fixture.
    One groupBy over the build's tests plus a LEFT join to its
    checkout; everything else is per-row projection."""
    spark = builds.sparkSession
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    co = checkouts.select(
        F.col("id").alias("checkout_id"),
        *[
            F.col(c).alias(f"co_{c}")
            for c in (
                "git_repository_url",
                "git_repository_branch",
                "comment",
                "git_commit_name",
                "git_commit_hash",
                "patchset_files",
            )
        ],
    ).withColumn("co_exists", F.lit(True))
    t = tests.select(
        F.col("build_id").alias("__bid"), "origin", "status", "path"
    )
    tagg, torig = _agg_tests(t, ["__bid"])
    b = (
        builds.join(co, on="checkout_id", how="left")
        .join(tagg, on=builds["id"] == tagg["__bid"], how="left")
        .drop("__bid")
        .join(torig, on=builds["id"] == torig["__bid"], how="left")
        .drop("__bid")
    )

    dash = F.concat(
        F.lit(_BUILD_DASH), encode_uri_component_sql_col("id")
    )
    has_tests = F.col("t_origins").isNotNull()
    tests_badge = _status_badge(_prio_status(F.col("t_prio")))
    config_block = F.when(
        (F.col("config_name").isNotNull() & (F.col("config_name") != ""))
        | (F.col("config_url").isNotNull() & (F.col("config_url") != "")),
        F.concat(
            F.lit("    Configuration\n"),
            F.when(
                F.col("config_name").isNotNull()
                & (F.col("config_name") != ""),
                F.concat(
                    F.lit("          name: "), F.col("config_name"),
                    F.lit("\n"),
                ),
            ).otherwise(""),
            F.when(
                F.col("config_url").isNotNull()
                & (F.col("config_url") != ""),
                F.concat(
                    F.lit("          file: "), F.col("config_url"),
                    F.lit("\n"),
                ),
            ).otherwise(""),
        ),
    ).otherwise("")

    def exec_line(label: str, col: Column, cond: Column | None = None) -> Column:
        c = cond if cond is not None else (
            col.isNotNull() & (col.cast("string") != "")
        )
        return F.when(
            c, F.concat(F.lit(label), col.cast("string"), F.lit("\n"))
        ).otherwise("")

    description = F.concat(
        F.lit(
            "Below is the summary of testing results Kernel CI database"
            " has recorded\nfor this build so far. See complete and"
            " up-to-date report at:\n\n    "
        ),
        dash,
        F.lit("\n\nOVERVIEW\n\n         Build: "),
        _status_badge(F.col("status")),
        F.lit("\n"),
        F.when(
            has_tests,
            F.concat(F.lit("         Tests: "), tests_badge, F.lit("\n")),
        ).otherwise(""),
        F.lit("\nBUILD\n\n    Status\n                "),
        _status_badge(F.col("status")),
        F.lit("\n"),
        F.when(
            F.col("co_exists").isNotNull(),
            F.concat(
                F.lit("    Checkout\n                "),
                _checkout_summary("co_"),
                F.lit("\n"),
            ),
        ).otherwise(""),
        _kv_block("Architecture", F.col("architecture")),
        _kv_block("Compiler", F.col("compiler")),
        config_block,
        _files_block("Input files", F.col("input_files")),
        _files_block("Output files", F.col("output_files")),
        F.lit("    Executed\n            by: "),
        F.col("origin"),
        F.lit("\n"),
        exec_line("            at: ", _iso_utc("start_time"),
                  F.col("start_time").isNotNull()),
        exec_line("            in: ",
                  F.concat(F.col("duration").cast("string"),
                           F.lit(" seconds")),
                  F.col("duration").isNotNull() & (F.col("duration") != 0)),
        exec_line("       command: ", F.col("command")),
        exec_line("           log: ", F.col("log_url")),
        F.when(
            F.col("comment").isNotNull() & (F.col("comment") != ""),
            F.concat(F.lit("    Comment\n                "),
                     F.col("comment"), F.lit("\n")),
        ).otherwise(""),
        _tests_section(),
        F.lit("\nSee complete and up-to-date report at:\n\n    "),
        dash,
        F.lit("\n"),
        F.lit(LEGEND),
        F.lit("\n\n"),
    )
    return b.select(F.col("id"), description.alias("description"))


def checkout_description_frame(
    checkouts: DataFrame, builds: DataFrame, tests: DataFrame
) -> DataFrame:
    """One row per checkout with the reference-fidelity
    ``description`` (checkout_description.txt.j2): valid badge,
    commit/from/patches/comment facts, and the checkout's BUILDS and
    TESTS container summaries — the same rollups a revision renders,
    keyed by checkout id instead."""
    spark = checkouts.sparkSession
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    b = builds.select(
        F.col("checkout_id").alias("__cid"),
        "id",
        "origin",
        "status",
        "architecture",
        "config_name",
        "comment",
    )
    bagg, bfail = _agg_builds(b, ["__cid"])
    t = tests.join(
        b.select(F.col("id").alias("build_id"), "__cid"),
        on="build_id",
        how="inner",
    ).select("__cid", "origin", "status", "path")
    tagg, torig = _agg_tests(t, ["__cid"])

    c = (
        checkouts.join(bagg, on=checkouts["id"] == bagg["__cid"], how="left")
        .drop("__cid")
        .join(bfail, on=checkouts["id"] == bfail["__cid"], how="left")
        .drop("__cid")
        .join(tagg, on=checkouts["id"] == tagg["__cid"], how="left")
        .drop("__cid")
        .join(torig, on=checkouts["id"] == torig["__cid"], how="left")
        .drop("__cid")
    )

    dash = F.concat(
        F.lit(_CHECKOUT_DASH), encode_uri_component_sql_col("id")
    )
    has_builds = (
        sum(F.coalesce(F.col(f"b_{n}"), F.lit(0)) for n in _N) > 0
    )
    has_tests = F.col("t_origins").isNotNull()
    b_prio = F.least(
        *[
            F.when(F.coalesce(F.col(f"b_{n}"), F.lit(0)) > 0, i + 1)
            for i, n in enumerate(_N[:6])
        ],
        F.when(F.coalesce(F.col("b_n6"), F.lit(0)) > 0, 7),
    )
    pfiles = F.coalesce(
        F.col("patchset_files"),
        F.array().cast("array<struct<name:string,url:string>>"),
    )
    n_patches = F.size(pfiles)
    patches_block = F.when(
        n_patches > 0,
        F.concat(
            F.lit("    With "),
            n_patches.cast("string"),
            F.when(n_patches > 1, F.lit(" patches")).otherwise(F.lit("patch")),
            F.lit(" applied\n"),
            F.array_join(
                F.transform(
                    F.slice(pfiles, 1, MAX_LIST_LEN),
                    lambda p: F.concat(F.lit("        "), p["url"]),
                ),
                "\n",
            ),
            F.lit("\n"),
            F.when(
                n_patches > MAX_LIST_LEN, F.lit("        ...\n")
            ).otherwise(""),
        ),
    ).otherwise("")

    description = F.concat(
        F.lit(
            "Below is the summary of testing results Kernel CI database"
            " has recorded\nfor this checkout so far. See complete and"
            " up-to-date report at:\n\n    "
        ),
        dash,
        F.lit("\n\nOVERVIEW\n\n      Checkout: "),
        _valid_badge(F.col("valid")),
        F.lit("\n"),
        F.when(
            has_builds,
            F.concat(
                F.lit("        Builds: "),
                _status_badge(_prio_status(b_prio)),
                F.lit("\n"),
            ),
        ).otherwise(""),
        F.when(
            has_tests,
            F.concat(
                F.lit("         Tests: "),
                _status_badge(_prio_status(F.col("t_prio"))),
                F.lit("\n"),
            ),
        ).otherwise(""),
        F.lit("\nCHECKOUT\n\n    Status\n        "),
        _valid_badge(F.col("valid")),
        F.lit("\n    Commit\n"),
        F.when(
            F.col("git_commit_name").isNotNull(),
            F.concat(F.lit("        name: "), F.col("git_commit_name"),
                     F.lit("\n")),
        ).otherwise(""),
        F.when(
            F.col("git_commit_hash").isNotNull(),
            F.concat(F.lit("        hash: "), F.col("git_commit_hash"),
                     F.lit("\n")),
        ).otherwise(""),
        F.when(
            F.col("git_repository_url").isNotNull(),
            F.concat(
                F.lit("    From\n        "),
                F.concat_ws(
                    " ",
                    F.col("git_repository_url"),
                    F.col("git_repository_branch"),
                ),
                F.lit("\n"),
            ),
        ).otherwise(""),
        patches_block,
        F.when(
            F.col("comment").isNotNull() & (F.col("comment") != ""),
            F.concat(F.lit("    Comment\n        "), F.col("comment"),
                     F.lit("\n")),
        ).otherwise(""),
        F.lit("    By\n        "),
        F.col("origin"),
        F.lit("\n"),
        _builds_section(),
        _tests_section(),
        F.lit("\nSee complete and up-to-date report at:\n\n    "),
        dash,
        F.lit("\n"),
        F.lit(LEGEND),
        F.lit("\n\n"),
    )
    return c.select(F.col("id"), description.alias("description"))


# ---------------------------------------------------------------------------
# Issue / incident descriptions (issue_description.txt.j2 /
# incident_description.txt.j2 + issue.j2 / incident.j2 macros)
# ---------------------------------------------------------------------------

_ISSUE_DASH = "https://kcidb.kernelci.org/d/issue/issue?orgId=1&var-id="
_INCIDENT_DASH = (
    "https://kcidb.kernelci.org/d/incident/incident?orgId=1&var-id="
)
_ISSUE_KEYS = ["id", "version"]


def issue_description_frame(
    checkouts: DataFrame,
    builds: DataFrame,
    tests: DataFrame,
    issues: DataFrame,
    incidents: DataFrame,
    *,
    _versioned: bool = False,
) -> DataFrame:
    """One row per (issue id, version) with the reference-fidelity
    ``description`` (issue.j2 overview/stats macros): report lines,
    the culprit "Concerns …" sentence, detection counts over the
    issue's incidents, the capped branch list, and detecting origins.
    Counts resolve like the reference OO tree: only builds/tests that
    actually exist in the data count, and branches come from the
    checkouts of those builds (including the builds of detected
    tests).

    With ``_versioned=True`` the dashboard URL pins the version too
    (``&var-version=``) — the issue_version rendering (see
    :func:`issue_version_description_frame`)."""
    inc = incidents.select(
        F.col("issue_id").alias("id"),
        F.col("issue_version").alias("version"),
        F.col("id").alias("incident_id"),
        "origin",
        "build_id",
        "test_id",
    )
    # Resolve detected tests to their builds so branch discovery sees
    # both directly- and test-linked builds.
    t_build = tests.select(
        F.col("id").alias("test_id"), F.col("build_id").alias("t_build_id")
    )
    inc2 = inc.join(t_build, on="test_id", how="left")
    existing_builds = builds.select(
        F.col("id").alias("build_id"), F.col("checkout_id").alias("b_co")
    )
    existing_tests = tests.select(F.col("id").alias("test_id"))

    n_inc = inc.groupBy(*_ISSUE_KEYS).agg(
        F.count(F.lit(1)).alias("n_incidents"),
        F.array_sort(F.collect_set("origin")).alias("inc_origins"),
    )
    n_b = (
        inc.join(existing_builds, on="build_id", how="inner")
        .groupBy(*_ISSUE_KEYS)
        .agg(F.countDistinct("build_id").alias("n_builds"))
    )
    n_t = (
        inc.join(existing_tests, on="test_id", how="inner")
        .groupBy(*_ISSUE_KEYS)
        .agg(F.countDistinct("test_id").alias("n_tests"))
    )
    linked_builds = (
        inc2.select(
            *_ISSUE_KEYS,
            F.explode(
                F.array_compact(F.array("build_id", "t_build_id"))
            ).alias("build_id"),
        )
        .join(existing_builds, on="build_id", how="inner")
        .join(
            checkouts.select(
                F.col("id").alias("b_co"),
                "git_repository_url",
                "git_repository_branch",
            ),
            on="b_co",
            how="inner",
        )
    )
    branches = linked_builds.groupBy(*_ISSUE_KEYS).agg(
        F.array_sort(
            F.array_distinct(
                F.collect_list(
                    F.struct(
                        F.col("git_repository_url").alias("u"),
                        F.col("git_repository_branch").alias("b"),
                    )
                )
            )
        ).alias("branches")
    )
    agg = (
        issues.join(n_inc, on=_ISSUE_KEYS, how="left")
        .join(n_b, on=_ISSUE_KEYS, how="left")
        .join(n_t, on=_ISSUE_KEYS, how="left")
        .join(branches, on=_ISSUE_KEYS, how="left")
    )

    dash = F.concat(F.lit(_ISSUE_DASH), encode_uri_component_sql_col("id"))
    if _versioned:
        # issue_version_description.txt.j2 additionally pins
        # &var-version={{version_num | urlencode}} (an int — encodes
        # to its plain decimal digits).
        dash = F.concat(
            dash, F.lit("&var-version="), F.col("version").cast("string")
        )
    has_subject = F.col("report_subject").isNotNull() & (
        F.col("report_subject") != ""
    )
    has_url = F.col("report_url").isNotNull() & (F.col("report_url") != "")
    has_comment = F.col("comment").isNotNull() & (F.col("comment") != "")
    report_block = F.concat(
        F.when(
            has_subject,
            F.concat(F.lit("    Report:  "), F.col("report_subject"),
                     F.lit("\n")),
        ).otherwise(""),
        F.when(
            has_url,
            F.concat(
                F.when(has_subject, F.lit("             "))
                .otherwise(F.lit("    Report:  ")),
                F.col("report_url"),
                F.lit("\n"),
            ),
        ).otherwise(""),
        F.when(
            has_comment,
            F.concat(F.lit("    Comment: "), F.col("comment"), F.lit("\n")),
        ).otherwise(""),
        F.when(has_subject | has_url | has_comment, F.lit("\n")).otherwise(
            ""
        ),
    )
    concerns = F.concat(
        F.lit("    Concerns"),
        F.concat_ws(
            ",",
            F.when(F.col("culprit.code"), " the kernel code"),
            F.when(F.col("culprit.tool"), " a test/toolchain"),
            F.when(F.col("culprit.harness"), " a CI system"),
        ),
        F.when(
            ~F.coalesce(F.col("culprit.code"), F.lit(False))
            & ~F.coalesce(F.col("culprit.tool"), F.lit(False))
            & ~F.coalesce(F.col("culprit.harness"), F.lit(False)),
            F.lit(" nothing"),
        ).otherwise(""),
        F.lit("\n"),
    )
    n_builds = F.coalesce("n_builds", F.lit(0))
    n_tests = F.coalesce("n_tests", F.lit(0))
    br = F.coalesce(
        F.col("branches"),
        F.array().cast("array<struct<u:string,b:string>>"),
    )
    branch_lines = F.array_join(
        F.transform(
            F.slice(br, 1, MAX_LIST_LEN),
            lambda x: F.concat(
                F.lit("        "),
                F.coalesce(x["u"], F.lit("?")),
                F.lit(" "),
                F.coalesce(x["b"], F.lit("?")),
            ),
        ),
        "\n",
    )
    detected = F.when(
        F.coalesce("n_incidents", F.lit(0)) > 0,
        F.concat(
            F.lit("    Detected "),
            F.col("n_incidents").cast("string"),
            F.lit(" times in"),
            F.when(
                n_builds > 0,
                F.concat(F.lit(" "), n_builds.cast("string"),
                         F.lit(" builds")),
            ).otherwise(""),
            F.when(
                n_tests > 0,
                F.concat(
                    F.when(n_builds > 0, F.lit(",")).otherwise(""),
                    F.lit(" "), n_tests.cast("string"), F.lit(" test runs"),
                ),
            ).otherwise(""),
            F.lit("\n    In "),
            F.size(br).cast("string"),
            F.when(F.size(br) == 1, F.lit(" branch")).otherwise(
                F.lit(" branches")
            ),
            F.lit(":\n"),
            branch_lines,
            F.when(
                F.size(br) > MAX_LIST_LEN, F.lit("\n        ...")
            ).otherwise(""),
            F.lit("\n    By "),
            F.array_join(F.coalesce("inc_origins", F.array()), ", "),
            F.lit("\n"),
        ),
    ).otherwise(F.lit("    Not detected anywhere yet\n"))

    description = F.concat(
        F.lit(
            "Below is the summary of results Kernel CI database has"
            " recorded\nfor this issue so far. See complete and"
            " up-to-date report at:\n\n    "
        ),
        dash,
        F.lit("\n\nOVERVIEW\n\n"),
        report_block,
        concerns,
        F.lit("\n"),
        detected,
        F.lit("\nSee complete and up-to-date report at:\n\n    "),
        dash,
        F.lit("\n"),
    )
    # issue.j2 summary macro: comment, else report_subject, else
    # report_url (Jinja default(, true): empty strings are falsy).
    summary = F.coalesce(
        _nullif_empty(F.col("comment")),
        _nullif_empty(F.col("report_subject")),
        F.col("report_url"),
    )
    return agg.select(
        "id", "version",
        summary.alias("summary"),
        description.alias("description"),
    )


def issue_version_description_frame(
    checkouts: DataFrame,
    builds: DataFrame,
    tests: DataFrame,
    issues: DataFrame,
    incidents: DataFrame,
) -> DataFrame:
    """One row per (issue id, version) rendered as the reference's
    distinct ``issue_version`` object type
    (kcidb/templates/issue_version_description.txt.j2:1,
    issue_version_summary.txt.j2:1; ORM type at
    kcidb/orm/data.py:437-455): identical to the issue rendering
    except the dashboard URL also pins ``&var-version=<version_num>``.
    The summary macro is shared (issue.j2 ``summary``), so the
    ``summary`` column matches :func:`issue_description_frame`'s."""
    return issue_description_frame(
        checkouts, builds, tests, issues, incidents, _versioned=True
    )


def incident_description_frame(
    builds: DataFrame,
    tests: DataFrame,
    issues: DataFrame,
    incidents: DataFrame,
) -> DataFrame:
    """One row per incident with the reference-fidelity
    ``description`` (incident_description.txt.j2): the linked issue's
    report lines and "Detected in <build/test summary>" — all three
    joins LEFT, so dangling links degrade exactly like the lazy OO
    traversal (note the reference renders a missing report subject as
    the literal "None" — Jinja's str(None) — reproduced here)."""
    iss = issues.select(
        F.col("id").alias("issue_id"),
        F.col("version").alias("issue_version"),
        F.col("report_subject").alias("i_subject"),
        F.col("report_url").alias("i_url"),
    )
    b = builds.select(
        F.col("id").alias("build_id"),
        F.col("architecture").alias("b_architecture"),
        F.col("config_name").alias("b_config_name"),
        F.col("comment").alias("b_comment"),
        F.lit(True).alias("b_exists"),
    )
    b_arch_of = builds.select(
        F.col("id").alias("t_build_ref"),
        F.col("architecture").alias("tb_architecture"),
    )
    t = tests.select(
        F.col("id").alias("test_id"),
        F.col("path").alias("t_path"),
        F.col("comment").alias("t_comment"),
        F.col("build_id").alias("t_build_ref"),
        F.lit(True).alias("t_exists"),
    ).join(b_arch_of, on="t_build_ref", how="left").drop("t_build_ref")
    inc = (
        incidents.join(iss, on=["issue_id", "issue_version"], how="left")
        .join(b, on="build_id", how="left")
        .join(t, on="test_id", how="left")
    )
    dash = F.concat(
        F.lit(_INCIDENT_DASH), encode_uri_component_sql_col("id")
    )
    b_summary = F.coalesce(
        _nullif_empty(
            F.concat_ws(
                " ",
                F.col("b_architecture"),
                F.col("b_config_name"),
                _quote(F.col("b_comment")),
            )
        ),
        F.col("build_id"),
    )
    t_summary = F.coalesce(
        _nullif_empty(
            F.concat_ws(" ", F.col("t_path"), _quote(F.col("t_comment")))
        ),
        F.col("test_id"),
    )
    description = F.concat(
        F.lit(
            "Below is the summary of results Kernel CI database has"
            " recorded\nfor this incident so far. See complete and"
            " up-to-date report at:\n\n    "
        ),
        dash,
        F.lit("\n\nOVERVIEW\n\n    Issue\n        "),
        F.coalesce(F.col("i_subject"), F.lit("None")),
        F.lit("\n        "),
        F.coalesce(F.col("i_url"), F.lit("None")),
        F.lit("\n\n"),
        F.when(
            F.col("b_exists").isNotNull(),
            F.concat(F.lit("    Detected in "), b_summary,
                     F.lit(" build\n")),
        ).otherwise(""),
        F.when(
            F.col("t_exists").isNotNull(),
            F.concat(F.lit("    Detected in "), t_summary,
                     F.lit(" test\n")),
        ).otherwise(""),
        F.lit("\nSee complete and up-to-date report at:\n\n    "),
        dash,
        F.lit("\n"),
    )
    # incident.j2 summary macro: detected-in phrasing with unknown-
    # object fallbacks, suffixed with the issue's report subject.
    subject_sfx = F.when(
        F.col("i_subject").isNotNull() & (F.col("i_subject") != ""),
        F.concat(F.lit(": "), F.col("i_subject")),
    ).otherwise("")
    summary = (
        F.when(
            F.col("t_exists").isNotNull(),
            F.concat(
                F.lit("Incident in "),
                F.coalesce(F.col("t_path"), F.lit("an unknown test")),
                F.lit(" on "),
                F.coalesce(
                    F.col("tb_architecture"),
                    F.lit("an unknown architecture"),
                ),
                subject_sfx,
            ),
        )
        .when(
            F.col("b_exists").isNotNull(),
            F.concat(
                F.lit("Incident in "),
                F.coalesce(
                    F.col("b_architecture"), F.lit("an unknown-architecture")
                ),
                F.lit(" build"),
                subject_sfx,
            ),
        )
        .when(
            F.col("i_subject").isNotNull() & (F.col("i_subject") != ""),
            F.concat(F.lit("Incident: "), F.col("i_subject")),
        )
        .otherwise(F.concat(F.lit("Incident "), F.col("id")))
    )
    return inc.select(
        "id", summary.alias("summary"), description.alias("description")
    )
