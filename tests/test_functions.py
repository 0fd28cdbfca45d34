"""Scalar-function parity surface (SURVEY §2.8 F6/F12/F13/F16, §2.1 S13)."""

from __future__ import annotations

import urllib.parse

import pytest
from pyspark.sql import functions as F

from kcidb_spark.functions import (
    encode_uri_component,
    last_error_line,
    notification_id,
    reject_nul,
    walk_urls,
)
from tests.kcidb_fixtures import COMPREHENSIVE


def test_encode_uri_component(spark):
    cases = [
        "plain-text_1.2~ok",
        "with space & symbols?",
        "slash/colon:q=a+b",
        "unicode: é",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    got = [r[0] for r in df.select(encode_uri_component("s")).collect()]
    # Python's quote with JS-compatible safe set is the reference
    # behavior for encodeURIComponent.
    want = [urllib.parse.quote(c, safe="-_.!~*'()") for c in cases]
    assert got == want


def test_last_error_line(spark):
    df = spark.createDataFrame(
        [("ok\nERROR: first\nfine\nerror: last\ntrailing",), ("all good",), (None,)],
        "log string",
    )
    got = [r[0] for r in df.select(last_error_line("log")).collect()]
    assert got == ["error: last", None, None]


def test_notification_id(spark):
    df = spark.createDataFrame(
        [("sub", "build", "origin:b1", "msg-1")],
        "sub string, typ string, oid string, mid string",
    )
    got = df.select(notification_id("sub", "typ", "oid", "mid")).collect()[0][0]
    import base64

    assert got == "sub:build:{}:{}".format(
        base64.b64encode(b"origin:b1").decode(),
        base64.b64encode(b"msg-1").decode(),
    )


def test_reject_nul():
    reject_nul(COMPREHENSIVE)  # clean data passes
    with pytest.raises(ValueError, match="NUL"):
        reject_nul({"a": ["fine", "bad\0str"]})
    with pytest.raises(ValueError):
        reject_nul({"bad\0key": 1})


def test_walk_urls():
    urls = walk_urls(COMPREHENSIVE)
    assert "https://example.org/checkout.log" in urls
    assert "https://example.org/0001.patch" in urls
    assert "https://example.org/bzImage" in urls
    assert all(u.startswith("https://") for u in urls)
    # Deterministic order and no duplicates-by-accident.
    assert urls == walk_urls(COMPREHENSIVE)
