"""URL canonicalization: case folding, default ports, fragments,
tracking params, blocklist filtering, and canonical-keyed page dedup."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from graphlab_spark.operators.urlnorm import (
    canonical_url_col,
    filter_blocklist,
    filter_blocklist_df,
    host_col,
)

CASES = [
    # (raw, canonical)
    ("HTTP://WWW.Ex.COM:80/a/1?utm_source=x&q=1#frag", "http://www.ex.com/a/1?q=1"),
    ("https://ex.com:443/b?fbclid=zz", "https://ex.com/b"),
    ("https://ex.com/b?q=1&utm_campaign=c&r=2", "https://ex.com/b?q=1&r=2"),
    ("https://ex.com:8443/b", "https://ex.com:8443/b"),  # non-default port kept
    ("http://ex.com:443/b", "http://ex.com:443/b"),  # 443 is not http's default
    ("http://ex.com", "http://ex.com/"),  # empty path → /
    ("http://ex.com?utm_a=1", "http://ex.com/"),  # query empties → no ?
    ("http://ex.com/?utm_a=1&utm_b=2&keep=3", "http://ex.com/?keep=3"),
    ("http://ex.com/p?gclid=g", "http://ex.com/p"),
    ("not a url at all", "not a url at all"),  # unparseable passes through
]


def test_canonical_url_cases(spark):
    df = spark.createDataFrame([(r,) for r, _ in CASES], "url string")
    got = [r.c for r in df.select(canonical_url_col().alias("c")).collect()]
    assert got == [c for _, c in CASES]


def test_host_and_blocklist(spark):
    df = spark.createDataFrame(
        [("http://ads.example/x",), ("http://sub.ads.example:8080/y",),
         ("http://notads.example/z",), ("http://ok.com/w",)],
        "url string",
    )
    hosts = [r.h for r in df.select(host_col().alias("h")).collect()]
    assert hosts == ["ads.example", "sub.ads.example", "notads.example", "ok.com"]
    kept = [r.url for r in filter_blocklist(df, ["ads.example"]).collect()]
    # subdomain blocked; 'notads.example' is NOT a subdomain of ads.example
    assert kept == ["http://notads.example/z", "http://ok.com/w"]

    bl = spark.createDataFrame([("ads.example",)], "domain string")
    kept2 = sorted(r.url for r in filter_blocklist_df(df, bl).collect())
    assert kept2 == sorted(kept)
    # the corpus side must not shuffle: blocklist is broadcast
    plan = filter_blocklist_df(df, bl)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan and "LeftAnti" in plan


def test_dedup_pages_canonical_key(spark):
    from graphlab_spark.operators.extract import dedup_pages

    t = dt.datetime(2024, 3, 1)
    rows = [
        ("http://a.com/?utm_source=x", t, b"old", None, "en"),
        ("HTTP://A.COM:80/", t + dt.timedelta(hours=1), b"new", None, "en"),
        ("http://b.com/p", t, b"b", None, "en"),
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    for strategy in ("slim", "window"):
        out = dedup_pages(pages, strategy=strategy, canonical=True).collect()
        # the two a.com variants collapse; latest warc_ts wins
        assert sorted(bytes(r.html) for r in out) == [b"b", b"new"], strategy
        assert "_curl" not in dedup_pages(pages, strategy=strategy, canonical=True).columns
    # raw-key dedup unchanged: all three survive
    assert dedup_pages(pages).count() == 3
