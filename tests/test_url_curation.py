"""URL-level curation ops (webtext.canonical_url_col / url_dedup_latest /
host_stats): edge-case spec tests. The sf0.01 value parity vs the independent
DuckDB reimplementation is in test_entry_oracle.py (canonical_urls,
url_dedup_latest, host_stats)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from rustserini_spark.operators.webtext import (
    canonical_url_col,
    host_stats,
    url_dedup_latest,
)


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = df.select("url", canonical_url_col("url").alias("c")).collect()
    return {r.url: r.c for r in rows}


CASES = [
    # scheme + www + host case + trailing slash + param sort + tracker + fragment
    ("https://WWW.Example.COM/Path/A/?utm_source=x&b=2&a=1#frag", "example.com/Path/A?a=1&b=2"),
    ("http://example.com/Path/A?a=1&b=2", "example.com/Path/A?a=1&b=2"),
    # path case is PRESERVED (case-significant), host case is not
    ("https://Example.com/CaseSensitive", "example.com/CaseSensitive"),
    # root url, with and without slash / tracker-only query
    ("https://example.com", "example.com"),
    ("https://example.com/", "example.com"),
    ("https://example.com/?utm_campaign=only", "example.com"),
    # multiple trailing slashes
    ("https://sub.Example.com/other///", "sub.example.com/other"),
    # every tracking key dropped, non-tracking 'utm' lookalike kept
    ("https://h.org/p?fbclid=1&gclid=2&msclkid=3&mc_eid=4&mc_cid=5&keep=1", "h.org/p?keep=1"),
    ("https://h.org/p?utmx=1", "h.org/p?utmx=1"),
    # www only stripped as a PREFIX label, once
    ("https://www.www.h.org/p", "www.h.org/p"),
    ("https://wwwx.h.org/p", "wwwx.h.org/p"),
    # fragment before query parse; '?' inside fragment is gone too
    ("https://h.org/p#frag?not=a-param", "h.org/p"),
    # empty param fragments collapse ('a=1&&b=2' keeps both real params)
    ("https://h.org/p?a=1&&b=2", "h.org/p?a=1&b=2"),
]


def test_canonical_url_spec(spark):
    got = _canon(spark, [u for u, _ in CASES])
    for url, want in CASES:
        assert got[url] == want, f"{url!r}: got {got[url]!r}, want {want!r}"


def test_url_dedup_latest_keeps_newest_then_max_url(spark):
    rows = [
        ("https://h.org/p?b=2&a=1", dt.datetime(2024, 1, 1)),
        ("https://WWW.h.org/p/?a=1&b=2&utm_source=x", dt.datetime(2024, 3, 1)),
        ("http://h.org/p?a=1&b=2", dt.datetime(2024, 2, 1)),
        # ts tie inside one canonical group -> max raw url wins
        ("https://h.org/q", dt.datetime(2024, 5, 1)),
        ("https://h.org/q/", dt.datetime(2024, 5, 1)),
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp")
    out = {r.canonical_url: r for r in url_dedup_latest(df).collect()}
    assert len(out) == 2
    assert out["h.org/p?a=1&b=2"].url == "https://WWW.h.org/p/?a=1&b=2&utm_source=x"
    assert out["h.org/p?a=1&b=2"].warc_ts == dt.datetime(2024, 3, 1)
    assert out["h.org/q"].url == "https://h.org/q/"  # '/q/' > '/q' lexicographically


def test_url_dedup_latest_is_parallelism_invariant(spark):
    rows = [
        (f"https://h{i % 5}.org/p{i % 20}" + ("/" if i % 2 else ""), dt.datetime(2024, 1, 1 + i % 27))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp")
    a = sorted(map(tuple, url_dedup_latest(df.coalesce(1)).collect()))
    b = sorted(map(tuple, url_dedup_latest(df.repartition(13)).collect()))
    assert a == b


def test_host_stats_domains_and_rates(spark):
    rows = [
        # 3 raw crawls, 1 canonical page on sub.news.example.org -> example.org
        ("https://sub.news.example.org/a", "xxxx"),
        ("https://sub.news.example.org/a/", "yyyy"),
        ("http://sub.news.example.org/a?utm_source=f", "zz"),
        # single-label host: domain falls back to the host itself
        ("https://localhost/x", "qqqq"),
    ]
    df = spark.createDataFrame(rows, "url string, text string")
    out = {r.domain: r for r in host_stats(df).collect()}
    assert set(out) == {"example.org", "localhost"}
    ex = out["example.org"]
    assert (ex.n_pages, ex.n_canonical, ex.dup_rate) == (3, 1, round(1 - 1 / 3, 4))
    assert ex.avg_chars == pytest.approx((4 + 4 + 2) / 3, abs=1e-4)
    lo = out["localhost"]
    assert (lo.n_pages, lo.n_canonical, lo.dup_rate) == (1, 1, 0.0)


def test_host_stats_min_pages_filter(spark):
    rows = [("https://a.org/1", "t"), ("https://a.org/2", "t"), ("https://b.org/1", "t")]
    df = spark.createDataFrame(rows, "url string, text string")
    out = host_stats(df, min_pages=2).collect()
    assert [r.domain for r in out] == ["a.org"]


def test_canonicalize_is_map_only(spark):
    # plan must contain no Exchange: canonicalization is a pure projection
    import io
    from contextlib import redirect_stdout

    df = spark.createDataFrame([("https://h.org/p?a=1",)], "url string")
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.select(canonical_url_col("url").alias("c")).explain("formatted")
    assert "Exchange" not in buf.getvalue()
