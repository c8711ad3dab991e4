"""URL canonicalization tests (functions/url.py contract)."""

import pytest

from datachain_spark.functions.url import canonicalize_url, dedup_by_url, url_host

CASES = [
    # (raw, canonical)
    ("https://www.Example.com:443/a/b/?b=2&a=1", "https://example.com/a/b?a=1&b=2"),
    ("HTTPS://example.COM/a/b?a=1&b=2#frag", "https://example.com/a/b?a=1&b=2"),
    (
        "https://EXAMPLE.com/a/b?b=2&utm_source=feed&a=1&gclid=xyz",
        "https://example.com/a/b?a=1&b=2",
    ),
    ("http://www.site.org:80/", "http://site.org"),
    ("http://site.org:8080/x", "http://site.org:8080/x"),  # non-default port kept
    ("https://h.io/p///", "https://h.io/p"),
    ("https://h.io/?utm_campaign=c&ref=home", "https://h.io"),
    ("  https://h.io/x?z=1  ", "https://h.io/x?z=1"),
    ("https://h.io/x?refresh=1", "https://h.io/x?refresh=1"),  # not the ref param
    ("ftp://Files.example.com:21/pub", "ftp://files.example.com:21/pub"),
]


def test_canonicalize_url_cases(spark):
    df = spark.createDataFrame([(i, raw) for i, (raw, _) in enumerate(CASES)], "i int, u string")
    got = {r["i"]: r["c"] for r in df.select("i", canonicalize_url("u").alias("c")).collect()}
    for i, (raw, want) in enumerate(CASES):
        assert got[i] == want, (raw, got[i], want)


def test_url_host(spark):
    df = spark.createDataFrame(
        [("https://WWW.Sub.Example.com:443/x",), ("http://a.b:8080/y",)], "u string"
    )
    hosts = [r[0] for r in df.select(url_host("u")).collect()]
    assert hosts == ["sub.example.com", "a.b"]


def test_dedup_by_url_keeps_lowest_id(spark):
    rows = [
        (1, "https://www.d.com/p?b=2&a=1"),
        (2, "https://d.com/p/?a=1&b=2&utm_source=x"),  # same canon as 1
        (3, "https://d.com/q"),
        (4, "HTTPS://D.com/q#top"),  # same canon as 3
        (5, "https://d.com/r"),
    ]
    df = spark.createDataFrame(rows, "id int, url string")
    kept = sorted(r["id"] for r in dedup_by_url(df, "url", "id").collect())
    assert kept == [1, 3, 5]
    # plan stays UDF-free: canonicalization shows up as codegen expressions
    plan = dedup_by_url(df, "url", "id")._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
