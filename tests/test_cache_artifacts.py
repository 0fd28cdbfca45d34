"""Artifact-cache planning/fetch tests (kcidb_spark/cache_artifacts.py)."""

from __future__ import annotations

import hashlib

import pytest

from kcidb_spark.cache_artifacts import SAMPLE_SUFFIX, ArtifactCache


def _urls(n: int, host: str = "cdn.example.org") -> list[str]:
    return [f"https://{host}/artifact/{i}.log" for i in range(n)]


def _sampled(urls: list[str]) -> list[str]:
    return [
        u
        for u in urls
        if hashlib.md5(u.encode()).hexdigest().endswith(SAMPLE_SUFFIX)
    ]


def test_plan_samples_and_dedups(spark, tmp_path):
    # Defined as a closure: cloudpickle ships it by value, so the
    # executor-side worker doesn't need this test module importable.
    def fake_fetcher(url: str, max_size: int):
        return f"contents of {url}".encode(), "text/plain"

    cache = ArtifactCache(spark, str(tmp_path / "cache"))
    urls = _urls(3000)
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    plan = cache.plan(df).collect()
    expect = set(_sampled(urls))
    assert {r["url"] for r in plan} == expect
    assert expect  # 3000 urls must hit the 1/256 gate at least once
    assert all(r["host"] == "cdn.example.org" for r in plan)

    # Store, then re-plan: everything cached → empty plan.
    n = cache.store(
        spark.createDataFrame(plan), fetcher=fake_fetcher
    )
    assert n == len(expect)
    assert cache.plan(df).count() == 0
    idx = {r["url"]: r for r in cache.index().collect()}
    assert set(idx) == expect
    some = next(iter(expect))
    assert idx[some]["size"] == len(f"contents of {some}".encode())
    assert idx[some]["content_type"] == "text/plain"


def test_plan_per_host_cap(spark, tmp_path):
    cache = ArtifactCache(spark, str(tmp_path / "cache"), sample=False)
    urls = _urls(100, host="a.example.org") + _urls(100, host="b.example.org")
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    plan = cache.plan(df, per_host_cap=7).collect()
    by_host: dict[str, int] = {}
    for r in plan:
        by_host[r["host"]] = by_host.get(r["host"], 0) + 1
    assert by_host == {"a.example.org": 7, "b.example.org": 7}


def test_store_size_cap_and_skips(spark, tmp_path):
    cache = ArtifactCache(
        spark, str(tmp_path / "cache"), sample=False, max_store_size=10
    )
    df = spark.createDataFrame(
        [("https://h.example.org/big",), ("https://h.example.org/x",)],
        "url string",
    )
    plan = cache.plan(df)

    def picky(url: str, max_size: int):
        if url.endswith("/big"):
            return b"x" * 100, "text/plain"  # over the cap -> dropped
        if url.endswith("/x"):
            return b"tiny", "text/plain"
        return None

    assert cache.store(plan, fetcher=picky) == 1
    assert [r["url"] for r in cache.index().collect()] == [
        "https://h.example.org/x"
    ]


def test_default_fetcher_is_a_stub(spark, tmp_path):
    from kcidb_spark.cache_artifacts import no_network_fetcher

    with pytest.raises(NotImplementedError):
        no_network_fetcher("https://x.example.org/a", 10)
