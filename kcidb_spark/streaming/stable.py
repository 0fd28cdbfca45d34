"""Stable-tree notification rendering + subscriptions — the reference's
stable_rc/stable_rt template family and the three remaining stock
subscription modules (VERDICT r14 "Next round" #5).

Reference: kcidb/templates/stable_rc_revision_description.txt.j2,
stable_rt_revision_description.txt.j2, stable_build.j2,
stable_rc_test.j2, stable_rt_test.j2, stable_revision.j2,
stable_revision_summary.txt.j2; subscriptions
kcidb/monitor/subscriptions/{linux_stable_rt,linux_omap,
nikolai_kondrashov}.py.

Spark-first redesign, same as streaming/render.py: the reference
renders per-revision Jinja over lazy OO object trees; here each
template is ONE DataFrame of per-revision aggregates plus pure Column
string composition — a distributed filter + three partial-agg rollups,
no per-object Python.  Byte-parity with the reference's own Jinja
output is pinned by tests/test_render_stable.py against goldens
generated from the reference templates (tools/gen_stable_goldens.py);
the fixtures pin the failure, all-pass, and empty branches of every
macro.

Deterministic-order divergences (same class render.py documents): the
reference leaves group order to load order (dict insertion, list
position); the engine sorts — URLs, branches, tags, origins, paths,
architectures, configs, platforms, ids all ascending.  The golden
fixtures are constructed so both agree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kcidb_spark.streaming.render import (
    REV_KEYS,
    encode_uri_component_sql_col,
)

#: common.j2 ``selected_origins`` — the CI origins the stable reports
#: count and list (public kernel.org CI deployment config).
SELECTED_ORIGINS = ("broonie", "maestro")

#: kcidb/monitor/subscriptions/linux_stable_rt.py repo_url.
STABLE_RT_REPO_URL = (
    "https://git.kernel.org/pub/scm/linux/kernel/git/rt/"
    "linux-stable-rt.git"
)

#: kcidb/monitor/subscriptions/linux_omap.py repo_url.
OMAP_REPO_URL = (
    "https://git.kernel.org/pub/scm/linux/kernel/git/tmlind/"
    "linux-omap.git"
)

_BUILD_DASH = (
    "https://kcidb.kernelci.org/d/build/build?orgId=1&var-id="
)
_TEST_DASH = "https://kcidb.kernelci.org/d/test/test?orgId=1&var-id="
_IND = "      "

def _sel() -> Column:
    """origin ∈ selected_origins (deferred: Column construction needs
    an active session)."""
    return F.col("origin").isin(*SELECTED_ORIGINS)


# ---------------------------------------------------------------------------
# Per-revision aggregation
# ---------------------------------------------------------------------------


def _stable_agg(
    checkouts: DataFrame, builds: DataFrame, tests: DataFrame
) -> DataFrame:
    """One row per revision carrying every aggregate the stable
    templates consume.  Three shuffle stages (checkout rollup; build
    rollup reusing the checkout join; two-level test rollup), all
    partial-agg, no collects."""
    co = checkouts.select(
        "id",
        *REV_KEYS,
        "git_commit_name",
        "git_repository_url",
        "git_repository_branch",
        "comment",
        "origin",
        "valid",
        "patchset_files",
        "git_commit_tags",
    )
    rev_of_checkout = co.select(F.col("id").alias("checkout_id"), *REV_KEYS)

    co_agg = co.groupBy(*REV_KEYS).agg(
        F.array_sort(
            F.collect_set(F.when(_sel(), F.col("origin")))
        ).alias("sel_origins"),
        F.min("git_commit_name").alias("commit_name"),
        F.expr("min_by(patchset_files, id)").alias("patchset_files"),
        # VALID_PRIORITY rollup (oo/__init__.py:110): False < True < None.
        F.min(
            F.when(F.col("valid") == False, 1)  # noqa: E712
            .when(F.col("valid") == True, 2)  # noqa: E712
            .otherwise(3)
        ).alias("vprio"),
        F.array_sort(
            F.array_distinct(
                F.flatten(
                    F.collect_list(
                        F.coalesce(
                            "git_commit_tags",
                            F.array().cast("array<string>"),
                        )
                    )
                )
            )
        ).alias("tags"),
        F.collect_list(
            F.struct(
                F.col("git_repository_url").alias("url"),
                F.col("git_repository_branch").alias("branch"),
                F.col("comment").alias("comment"),
            )
        ).alias("cos"),
    )

    b = builds.join(rev_of_checkout, on="checkout_id", how="inner").select(
        *REV_KEYS, "id", "origin", "status", "architecture", "config_name"
    )
    b_counts = b.groupBy(*REV_KEYS).agg(
        F.count(F.lit(1)).alias("n_builds"),
        F.count_if((F.col("status") == "PASS") & _sel()).alias("b_pass"),
        F.count_if((F.col("status") == "FAIL") & _sel()).alias("b_fail"),
    )
    # Failure groups: FAIL ∩ selected ∩ architecture non-null, grouped
    # by origin (stable_build.j2 container_summary) — builds sorted
    # within a group, groups sorted by origin.
    b_groups = (
        b.filter(
            (F.col("status") == "FAIL")
            & _sel()
            & F.col("architecture").isNotNull()
        )
        .groupBy(*REV_KEYS, "origin")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("architecture").alias("arch"),
                        F.col("config_name").alias("config"),
                        F.col("id").alias("id"),
                    )
                )
            ).alias("bs")
        )
        .groupBy(*REV_KEYS)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("origin"), F.col("bs")))
            ).alias("bgroups")
        )
    )

    rev_of_build = b.select(F.col("id").alias("build_id"), *REV_KEYS)
    b_info = builds.select(
        F.col("id").alias("build_id"),
        F.col("architecture").alias("b_arch"),
        F.col("config_name").alias("b_config"),
    )
    t = (
        tests.join(rev_of_build, on="build_id", how="inner")
        .join(b_info, on="build_id", how="left")
        .select(
            *REV_KEYS,
            "id",
            "origin",
            "status",
            "path",
            F.get_json_object(F.col("environment.misc"), "$.platform")
            .alias("platform"),
            "b_arch",
            "b_config",
        )
        .withColumn("node", F.substring_index("path", ".", 1))
    )
    t_counts = t.groupBy(*REV_KEYS).agg(
        F.count(F.lit(1)).alias("n_tests"),
        *[
            F.count_if(
                (F.col("node") == node)
                & (F.col("status") == st)
                & _sel()
            ).alias(f"{pfx}_{st.lower()}")
            for node, pfx in (("boot", "boot"), ("rt-tests", "rt"))
            for st in ("PASS", "FAIL")
        ],
    )

    def node_groups(node: str, by_path: bool, out: str) -> DataFrame:
        """Per-origin failure groups of one top-level test node:
        (origin, n_fail, groups) where groups is [(path?, [(arch,
        configs, platforms, ids)])] — empty groups ⇒ the template's
        "Missing failure information" branch."""
        f = t.filter(
            (F.col("node") == node) & (F.col("status") == "FAIL") & _sel()
        )
        info = f.filter(
            F.col("platform").isNotNull() & F.col("b_arch").isNotNull()
        )
        path_key = [F.col("path").alias("p")] if by_path else [
            F.lit("").alias("p")
        ]
        ag = (
            info.groupBy(*REV_KEYS, "origin", *path_key, "b_arch")
            .agg(
                F.array_sort(
                    F.array_distinct(F.collect_list("b_config"))
                ).alias("configs"),
                F.array_sort(
                    F.array_distinct(F.collect_list("platform"))
                ).alias("platforms"),
                F.array_sort(F.collect_list("id")).alias("ids"),
            )
            .groupBy(*REV_KEYS, "origin", "p")
            .agg(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("b_arch").alias("arch"),
                            "configs",
                            "platforms",
                            "ids",
                        )
                    )
                ).alias("ags")
            )
            .groupBy(*REV_KEYS, "origin")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct(F.col("p"), F.col("ags")))
                ).alias("pgroups")
            )
        )
        return (
            f.groupBy(*REV_KEYS, "origin")
            .agg(F.count(F.lit(1)).alias("n_fail"))
            .join(ag, on=[*REV_KEYS, "origin"], how="left")
            .groupBy(*REV_KEYS)
            .agg(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("origin"),
                            F.coalesce(
                                "pgroups",
                                F.array().cast(
                                    "array<struct<p:string,ags:array<"
                                    "struct<arch:string,"
                                    "configs:array<string>,"
                                    "platforms:array<string>,"
                                    "ids:array<string>>>>>"
                                ),
                            ).alias("pgroups"),
                        )
                    )
                ).alias(out)
            )
        )

    out = (
        co_agg.join(b_counts, on=REV_KEYS, how="left")
        .join(b_groups, on=REV_KEYS, how="left")
        .join(t_counts, on=REV_KEYS, how="left")
        .join(node_groups("boot", False, "boot_groups"),
              on=REV_KEYS, how="left")
        .join(node_groups("rt-tests", True, "rt_groups"),
              on=REV_KEYS, how="left")
    )
    return out


# ---------------------------------------------------------------------------
# Column rendering — byte-parity with the reference Jinja output
# ---------------------------------------------------------------------------


def _urls_sorted() -> Column:
    return F.array_sort(
        F.array_distinct(F.transform(F.col("cos"), lambda c: c.url))
    )


def _branch_lines(u: Column) -> Column:
    """'{url} {branch} {branch}…' with branches sorted, nulls dropped
    (the template's ``reject("none") | join(" ")``)."""
    branches = F.array_sort(
        F.array_distinct(
            F.transform(
                F.filter(F.col("cos"), lambda c: c.url.eqNullSafe(u)),
                lambda c: c.branch,
            )
        )
    )
    return F.concat_ws(
        " ",
        u,
        F.array_join(F.filter(branches, lambda b: b.isNotNull()), " "),
    )


def stable_summary_col() -> Column:
    """stable_revision.j2 summary: ``branch@commit[+NP] "comment"`` —
    branch of the FIRST (sorted) repo URL; commit name or hash[:12];
    patch count marker; lexicographically-first comment of that
    (url, branch)."""
    urls = _urls_sorted()
    first_url = F.try_element_at(urls, F.lit(1))
    branches = F.array_sort(
        F.array_distinct(
            F.transform(
                F.filter(
                    F.col("cos"), lambda c: c.url.eqNullSafe(first_url)
                ),
                lambda c: c.branch,
            )
        )
    )
    first_branch = F.try_element_at(
        F.filter(branches, lambda b: b.isNotNull()), F.lit(1)
    )
    commit = F.coalesce(
        F.col("commit_name"), F.col("git_commit_hash").substr(1, 12)
    )
    n_patches = F.coalesce(
        F.size(F.col("patchset_files")), F.lit(0)
    )
    patches = F.when(
        n_patches > 0, F.concat(F.lit("+"), n_patches, F.lit("P"))
    )
    lcp = F.when(
        first_branch.isNotNull() | commit.isNotNull(),
        F.concat_ws(
            "",
            F.concat_ws("@", first_branch, commit),
            F.coalesce(patches, F.lit("")),
        ),
    )
    comment = F.try_element_at(
        F.array_sort(
            F.filter(
                F.transform(
                    F.filter(
                        F.col("cos"),
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
    return F.concat_ws(
        " ",
        lcp,
        F.when(comment.isNotNull(), F.concat(F.lit('"'), comment, F.lit('"'))),
    )


def _stats_line(label: str, p: Column, f: Column) -> Column:
    return F.concat(
        F.lit(label), p, F.lit(" passed, "), f, F.lit(" failed\n\n")
    )


def _patches_badge() -> Column:
    return (
        F.when(F.col("vprio") == 1, "❌ FAIL")
        .when(F.col("vprio") == 2, "✅ PASS")
        .otherwise("❓ UNKNOWN")
    )


def _head_col(main_repo_url: str, rt: bool) -> Column:
    """Everything before the BUILDS/TESTS container summaries."""
    has_patches = F.coalesce(F.size("patchset_files"), F.lit(0)) > 0
    has_builds = F.coalesce(F.col("n_builds"), F.lit(0)) > 0
    has_tests = F.coalesce(F.col("n_tests"), F.lit(0)) > 0
    urls = _urls_sorted()
    others = F.filter(urls, lambda u: u != F.lit(main_repo_url))
    n_p = F.size("patchset_files")
    pieces = [
        F.lit("\nOVERVIEW\n\n"),
        F.when(
            has_patches,
            F.concat(
                F.lit("       Patches: "), _patches_badge(), F.lit("\n")
            ),
        ).otherwise(""),
        F.when(
            has_builds,
            _stats_line("        Builds: ", F.col("b_pass"),
                        F.col("b_fail")),
        ).otherwise(""),
        F.when(
            has_tests,
            F.concat(
                _stats_line("    Boot tests: ", F.col("boot_pass"),
                            F.col("boot_fail")),
                *(
                    [
                        _stats_line("      RT tests: ", F.col("rt_pass"),
                                    F.col("rt_fail"))
                    ]
                    if rt
                    else []
                ),
            ),
        ).otherwise(""),
        F.concat(
            F.lit("    CI systems: "),
            F.array_join(F.col("sel_origins"), ", "),
            F.lit("\n\nREVISION\n\n    Commit\n"),
        ),
        F.when(
            F.col("commit_name").isNotNull(),
            F.concat(F.lit("        name: "), F.col("commit_name"),
                     F.lit("\n")),
        ).otherwise(""),
        F.when(
            F.col("git_commit_hash").isNotNull(),
            F.concat(F.lit("        hash: "), F.col("git_commit_hash"),
                     F.lit("\n")),
        ).otherwise(""),
    ]
    if not rt:
        pieces.append(
            F.when(
                F.size("tags") > 0,
                F.concat(
                    F.lit("        tags: "),
                    F.array_join(F.col("tags"), ", "),
                    F.lit("\n"),
                ),
            ).otherwise("")
        )
    pieces.extend(
        [
            F.concat(
                F.lit("    Checked out from\n        "),
                _branch_lines(F.lit(main_repo_url)),
                F.lit("\n"),
            ),
            F.when(
                F.size(others) > 0,
                F.concat(
                    F.lit("    Also checked out from\n"),
                    F.array_join(
                        F.transform(
                            others,
                            lambda u: F.concat(
                                F.lit("        "),
                                _branch_lines(u),
                                F.lit("\n"),
                            ),
                        ),
                        "",
                    ),
                ),
            ).otherwise(""),
            F.when(
                has_patches,
                F.concat(
                    F.lit("    With "),
                    n_p,
                    F.when(n_p > 1, " patches").otherwise("patch"),
                    F.lit(" applied\n"),
                    F.array_join(
                        F.transform(
                            F.slice(F.col("patchset_files"), 1, 5),
                            lambda pf: F.concat(
                                F.lit("        "), pf.url, F.lit("\n")
                            ),
                        ),
                        "",
                    ),
                    F.when(n_p > 5, "        ...\n").otherwise(""),
                ),
            ).otherwise(""),
            F.lit("\n"),
        ]
    )
    return F.concat(*pieces)


def _builds_sec_col() -> Column:
    """stable_build.j2 container_summary."""
    has_builds = F.coalesce(F.col("n_builds"), F.lit(0)) > 0
    groups = F.coalesce(
        F.col("bgroups"),
        F.array().cast(
            "array<struct<origin:string,"
            "bs:array<struct<arch:string,config:string,id:string>>>>"
        ),
    )
    block = F.array_join(
        F.transform(
            groups,
            lambda g: F.concat(
                F.array_join(
                    F.transform(
                        g.bs,
                        lambda b: F.concat(
                            F.lit(_IND + "-"),
                            b.arch,
                            F.when(
                                b.config.isNotNull(),
                                F.concat(F.lit(" ("), b.config,
                                         F.lit(")")),
                            ).otherwise(""),
                            F.lit("\n" + _IND + "Build detail: "
                                  + _BUILD_DASH),
                            b.id,
                            F.lit("\n"),
                        ),
                    ),
                    "",
                ),
                F.lit(_IND + "CI system: "),
                g.origin,
                F.lit("\n\n"),
            ),
        ),
        "",
    )
    return (
        F.when(~has_builds, "\n    No builds found\n")
        .when(
            F.size(groups) == 0,
            "\nBUILDS\n\n    No build failures found\n",
        )
        .otherwise(F.concat(F.lit("\nBUILDS\n\n    Failures\n"), block))
    )


def _arch_block(
    ag: Column, origin: Column, details: bool, lead: str
) -> Column:
    """One architecture group of a test-failure section:
    ``{lead}{arch}:({configs})\\n      -{platforms}[ details ]\\n
    CI system: {origin}\\n`` — continuation configs align under the
    first (the template's ``join(",\\n" + indent + ' ' * (arch +
    ":(")|length)``); platforms join as ``-``-prefixed lines; the rt
    template additionally lists per-test dashboard links."""
    cfg_sep = F.concat(
        F.lit(",\n" + _IND),
        F.repeat(F.lit(" "), (F.length(ag.arch) + F.lit(2)).cast("int")),
    )
    rest = F.slice(
        ag.configs, 2, F.greatest(F.size(ag.configs) - 1, F.lit(0))
    )
    cfg_join = F.aggregate(
        rest,
        F.coalesce(F.try_element_at(ag.configs, F.lit(1)), F.lit("")),
        lambda acc, c: F.concat(acc, cfg_sep, c),
    )
    parts = [
        F.lit(lead),
        ag.arch,
        F.lit(":("),
        cfg_join,
        F.lit(")\n" + _IND + "-"),
        F.array_join(ag.platforms, "\n" + _IND + "-"),
    ]
    if details:
        parts.extend(
            [
                F.lit("\n" + _IND + "Test details:\n"),
                F.array_join(
                    F.transform(
                        ag.ids,
                        lambda i: F.concat(
                            F.lit(_IND + "- " + _TEST_DASH), i,
                            F.lit("\n"),
                        ),
                    ),
                    "",
                ),
            ]
        )
    parts.extend(
        [F.lit("\n" + _IND + "CI system: "), origin, F.lit("\n")]
    )
    return F.concat(*parts)


def _tests_sec_col(
    groups_col: str,
    header: str,
    none_msg: str,
    by_path: bool,
    details: bool,
) -> Column:
    """stable_rc_test.j2 / stable_rt_test.j2 container sections."""
    has_tests = F.coalesce(F.col("n_tests"), F.lit(0)) > 0
    groups = F.coalesce(
        F.col(groups_col),
        F.array().cast(
            "array<struct<origin:string,pgroups:array<struct<p:string,"
            "ags:array<struct<arch:string,configs:array<string>,"
            "platforms:array<string>,ids:array<string>>>>>>>"
        ),
    )
    missing = F.lit(
        "\n" + _IND + "Missing failure information. Sorry, we are"
        " working on improving report for this situation.\n"
    )

    def origin_block(g):
        if by_path:
            # rt-tests: "\n      {path}:\n" then arch blocks flush
            # (lead = indent, no blank between archs of one path).
            per_group = lambda pg: F.concat(  # noqa: E731
                F.lit("\n" + _IND),
                pg.p,
                F.lit(":\n"),
                F.array_join(
                    F.transform(
                        pg.ags,
                        lambda ag: _arch_block(
                            ag, g.origin, details, lead=_IND
                        ),
                    ),
                    "",
                ),
            )
        else:
            # boot: each arch block leads with "\n      " (blank line
            # between arch groups, per the reference emission).
            per_group = lambda pg: F.array_join(  # noqa: E731
                F.transform(
                    pg.ags,
                    lambda ag: _arch_block(
                        ag, g.origin, details, lead="\n" + _IND
                    ),
                ),
                "",
            )
        archy = F.array_join(F.transform(g.pgroups, per_group), "")
        return F.when(
            F.size(g.pgroups) == 0,
            F.concat(
                missing,
                F.lit(_IND + "CI system: "),
                g.origin,
                F.lit("\n"),
            ),
        ).otherwise(archy)

    block = F.array_join(F.transform(groups, origin_block), "")
    return (
        F.when(~has_tests, f"\n{header}\n\n    No tests found\n")
        .when(
            F.size(groups) == 0,
            f"\n{header}\n\n    {none_msg}\n",
        )
        .otherwise(
            F.concat(F.lit(f"\n{header}\n\n    Failures\n"), block)
        )
    )


def _tail_col() -> Column:
    return F.concat(
        F.lit(
            "\nSee complete and up-to-date report at:\n\n"
            "    https://kcidb.kernelci.org/d/revision/revision?orgId=1"
            "&var-git_commit_hash="
        ),
        encode_uri_component_sql_col("git_commit_hash"),
        F.lit("&var-patchset_hash="),
        encode_uri_component_sql_col("patchset_hash"),
        F.lit(
            "\n\n\nTested-by: kernelci.org bot <bot@kernelci.org>\n\n"
            "Thanks,\nKernelCI team\n\n"
        ),
    )


def stable_rc_description_col(main_repo_url: str) -> Column:
    """stable_rc_revision_description.txt.j2 as one Column."""
    return F.concat(
        _head_col(main_repo_url, rt=False),
        _builds_sec_col(),
        _tests_sec_col(
            "boot_groups", "BOOT TESTS", "No boot failures found",
            by_path=False, details=False,
        ),
        _tail_col(),
    )


def stable_rt_description_col() -> Column:
    """stable_rt_revision_description.txt.j2 as one Column."""
    return F.concat(
        _head_col(STABLE_RT_REPO_URL, rt=True),
        _builds_sec_col(),
        _tests_sec_col(
            "boot_groups", "BOOT TESTS", "No boot failures found",
            by_path=False, details=True,
        ),
        _tests_sec_col(
            "rt_groups", "RT TESTS", "No rt-tests failures found",
            by_path=True, details=True,
        ),
        _tail_col(),
    )


def stable_revision_frame(
    checkouts: DataFrame,
    builds: DataFrame,
    tests: DataFrame,
    rc_main_repo_url: str = OMAP_REPO_URL,
) -> DataFrame:
    """Per-revision stable aggregates + rendered summary/descriptions
    — the shared frame all three stable subscriptions filter.
    ``rc_main_repo_url`` is the stable_rc template's context repo (the
    omap subscription passes its repo; linux_stable_rt renders the rt
    body, whose main repo is fixed)."""
    agg = _stable_agg(checkouts, builds, tests)
    urls = _urls_sorted()
    return agg.select(
        *REV_KEYS,
        urls.alias("repo_urls"),
        F.col("sel_origins"),
        F.coalesce(F.col("n_builds"), F.lit(0)).alias("n_builds"),
        F.coalesce(F.col("b_pass"), F.lit(0)).alias("b_pass"),
        F.coalesce(F.col("b_fail"), F.lit(0)).alias("b_fail"),
        stable_summary_col().alias("summary"),
        stable_rc_description_col(rc_main_repo_url).alias(
            "rc_description"
        ),
        stable_rt_description_col().alias("rt_description"),
    )


# ---------------------------------------------------------------------------
# Subscriptions
# ---------------------------------------------------------------------------


def stable_rt_messages(
    checkouts: DataFrame, builds: DataFrame, tests: DataFrame
) -> DataFrame:
    """linux_stable_rt subscription (subscriptions/linux_stable_rt.py):
    revisions of the stable-rt repo with at least one selected-origin
    build whose status is known → 'KernelCI report for stable-rt: …'
    with the stable_rt description body.  The reference's 3-hour due
    is deployment timing, carried as a ``due`` column the spool
    honors (testing_done_messages precedent)."""
    b = builds.join(
        checkouts.select(F.col("id").alias("checkout_id"), *REV_KEYS),
        on="checkout_id",
    ).select(*REV_KEYS, "origin", "status")
    known = (
        b.filter(_sel() & F.col("status").isNotNull())
        .select(*REV_KEYS)
        .distinct()
    )
    rev = stable_revision_frame(checkouts, builds, tests)
    return (
        rev.join(known, on=REV_KEYS, how="left_semi")
        .filter(F.array_contains("repo_urls", STABLE_RT_REPO_URL))
        .select(
            *REV_KEYS,
            F.concat(
                F.lit("KernelCI report for stable-rt: "), F.col("summary")
            ).alias("subject"),
            F.col("rt_description").alias("body"),
            (
                F.current_timestamp() + F.expr("INTERVAL 3 HOURS")
            ).alias("due"),
        )
    )


def omap_messages(
    checkouts: DataFrame, builds: DataFrame, tests: DataFrame
) -> DataFrame:
    """linux_omap subscription (subscriptions/linux_omap.py):
    revisions of the omap repo with a known builds_status and a
    selected-origin checkout → 'KernelCI report for omap: …' with the
    stable_rc description body (main_repo_url = the omap repo)."""
    rev = stable_revision_frame(checkouts, builds, tests)
    has_sel_checkout = F.size("sel_origins") > 0
    # builds_status known ⇔ any build has a non-null status (the
    # reference's status-priority rollup is non-None iff one exists).
    b = builds.join(
        checkouts.select(F.col("id").alias("checkout_id"), *REV_KEYS),
        on="checkout_id",
    ).select(*REV_KEYS, "status")
    known = (
        b.filter(F.col("status").isNotNull())
        .select(*REV_KEYS)
        .distinct()
    )
    return (
        rev.join(known, on=REV_KEYS, how="left_semi")
        .filter(
            F.array_contains("repo_urls", OMAP_REPO_URL)
            & has_sel_checkout
        )
        .select(
            *REV_KEYS,
            F.concat(
                F.lit("KernelCI report for omap: "), F.col("summary")
            ).alias("subject"),
            F.col("rc_description").alias("body"),
            (
                F.current_timestamp() + F.expr("INTERVAL 3 HOURS")
            ).alias("due"),
        )
    )


def nikolai_messages(
    checkouts: DataFrame, builds: DataFrame, tests: DataFrame,
    enabled: bool = False,
) -> DataFrame:
    """nikolai_kondrashov subscription — DISABLED in the reference
    (subscriptions/nikolai_kondrashov.py defines only
    ``_disabled_match_revision``, which the monitor never calls), so
    the stock evaluation yields zero notifications; the match logic is
    kept behind ``enabled`` for parity: Checkouts failed → Builds
    FAIL → tests_root status not in (None, PASS, DONE, SKIP), each
    'X failed for {summary}' with the plain revision description."""
    from kcidb_spark.streaming.render import revision_frame

    rev = revision_frame(checkouts, builds, tests)
    if not enabled:
        return rev.filter(F.lit(False)).select(
            *REV_KEYS,
            F.col("summary").alias("subject"),
            F.col("description").alias("body"),
        )
    vdf = checkouts.groupBy(*REV_KEYS).agg(
        F.min(
            F.when(F.col("valid") == False, 1)  # noqa: E712
            .when(F.col("valid") == True, 2)  # noqa: E712
            .otherwise(3)
        ).alias("vprio")
    )
    pfx = (
        F.when(F.col("vprio") == 1, "Checkouts")
        .when(
            (F.col("vprio") == 2) & (F.col("builds_status") == "FAIL"),
            "Builds",
        )
        .when(
            (F.col("vprio") == 2)
            & F.col("builds_status").isNotNull()
            & F.col("tests_status").isNotNull()
            & ~F.col("tests_status").isin("PASS", "DONE", "SKIP"),
            "Tests",
        )
    )
    return (
        rev.join(vdf, on=REV_KEYS, how="left")
        .withColumn("__pfx", pfx)
        .filter(F.col("__pfx").isNotNull())
        .select(
            *REV_KEYS,
            F.concat(
                F.col("__pfx"), F.lit(" failed for "), F.col("summary")
            ).alias("subject"),
            F.col("description").alias("body"),
        )
    )
