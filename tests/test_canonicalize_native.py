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
