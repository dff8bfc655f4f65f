"""Native Catalyst canonicalize_url must agree with the urllib-backed
python canonicalizer over messy URL shapes (the two implementations
exist so the fast JVM path can be cross-checked)."""

from __future__ import annotations

from pyspark.sql import functions as F

from seo_crawler_spark.functions.urls import _canonicalize_py, canonicalize_url

CASES = [
    "HTTP://WWW.Example.COM:80/a/b.html?z=1&a=2#frag",
    "https://Example.com:443/",
    "https://example.com",
    "http://example.com:8080/path?b=2&a=1",
    "https://user@host.com/p",
    "HTTPS://HOST0.EXAMPLE.COM:443/page/0.html#top",
    "http://h/x.y/z",
    "https://h/p?k=v&k=v2&a=",
    "https://h/p?single",
    "http://a-b.c-d.e/deep/1/2/3.html",
    "https://h/trailing/",
    "https://h/%7Euser/page.html?x=%20y",
]


def test_native_matches_python(spark):
    df = spark.createDataFrame([(u,) for u in CASES], "raw string")
    got = {
        r["raw"]: r["c"]
        for r in df.select("raw", canonicalize_url(F.col("raw")).alias("c")).collect()
    }
    for u in CASES:
        assert got[u] == _canonicalize_py(u), (u, got[u], _canonicalize_py(u))


def test_native_matches_python_generated(spark):
    """Differential check over a generated messy-URL corpus (one Spark
    batch; catches Catalyst-vs-urllib drift beyond the fixed cases)."""
    import itertools

    schemes = ["http", "HTTPS", "Http"]
    hosts = ["Example.COM", "www.h-1.io", "a.b.c.d"]
    ports = ["", ":80", ":443", ":9090"]
    paths = ["", "/", "/x", "/x/y.HTML", "/a.b/c", "/%7Ez"]
    queries = ["", "?b=2&a=1", "?k=v&k=u", "?only"]
    frags = ["", "#f"]
    urls = [
        f"{s}://{h}{po}{pa}{q}{fr}"
        for s, h, po, pa, q, fr in itertools.product(
            schemes, hosts, ports, paths, queries, frags
        )
    ]
    df = spark.createDataFrame([(u,) for u in urls], "raw string")
    got = {
        r["raw"]: r["c"]
        for r in df.select("raw", canonicalize_url(F.col("raw")).alias("c")).collect()
    }
    bad = [(u, got[u], _canonicalize_py(u)) for u in urls if got[u] != _canonicalize_py(u)]
    assert not bad, bad[:5]
