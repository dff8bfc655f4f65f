"""Crawl-trap template cap: unit semantics of template_cap_tag and the
engine-level guarantee that capping throttles per wave without losing
URLs (deferred rows re-admit on later waves)."""

from __future__ import annotations

from pyspark.sql import functions as F

from seo_crawler_spark.operators.frontier import CrawlConfig, CrawlEngine
from seo_crawler_spark.operators.politeness import template_cap_tag, url_template
from seo_crawler_spark.sources.corpus import (
    generate_corpus,
    generate_robots,
    seed_urls,
)


def _frontier(spark, rows):
    return spark.createDataFrame(
        rows, "url string, url_hash long, host string, depth int, wave int, seq long"
    )


def test_url_template_collapses_digit_runs(spark):
    df = spark.createDataFrame(
        [
            ("http://h.com/cal/2024/3/7",),
            ("http://h.com/item/88?session=12345",),
            ("http://h.com/about",),
            ("http://h.com/p/9.html?a=1&b=22",),
        ],
        "url string",
    )
    got = [r[0] for r in df.select(url_template(F.col("url"))).collect()]
    assert got == [
        "/cal/N/N/N",
        "/item/N?session=N",
        "/about",
        "/p/N.html?a=N&b=N",
    ]


def test_template_cap_tag_admits_fifo_per_template(spark):
    rows = [
        # trap template: 20 calendar URLs on one host
        *[
            (f"http://trap.com/cal/2024/{i}/1", i, "trap.com", 1, 1, i)
            for i in range(20)
        ],
        # a different template on the same host
        *[
            (f"http://trap.com/about{i}", 100 + i, "trap.com", 1, 1, 100 + i)
            for i in range(3)
        ],
        # another host entirely, same template shape
        *[
            (f"http://ok.com/cal/2024/{i}/1", 200 + i, "ok.com", 1, 1, 200 + i)
            for i in range(4)
        ],
    ]
    tagged = template_cap_tag(_frontier(spark, rows), cap=5)
    got = {r["url"]: r["trap_admitted"] for r in tagged.collect()}
    assert len(got) == 27  # no rows lost
    # trap template: exactly cap admitted, and they are the lowest seqs
    trap_admitted = [
        u for u, a in got.items() if a and "/cal/" in u and "trap.com" in u
    ]
    assert sorted(trap_admitted) == [
        f"http://trap.com/cal/2024/{i}/1" for i in range(5)
    ]
    # below-cap templates untouched
    assert all(a for u, a in got.items() if "about" in u)
    assert all(a for u, a in got.items() if "ok.com" in u)


def test_url_template_noncanonical_fallback(spark):
    """Scheme-less URLs must NOT collapse into one '' bucket: they
    template as their raw digit-folded string (politeness.py fallback)."""
    df = spark.createDataFrame(
        [("relative/path/1",), ("other/2",), ("http://h.com/x/3",)],
        "url string",
    )
    got = [r[0] for r in df.select(url_template(F.col("url"))).collect()]
    assert got == ["relative/path/N", "other/N", "/x/N"]


def test_template_cap_tag_salted_bounds(spark):
    """Salted trap cap: per-salt FIFO with cap ceil(cap/k); total
    admitted for an over-cap template lands in [cap, k*ceil(cap/k)];
    below-cap templates are untouched."""
    rows = [
        *[
            (f"http://trap.com/cal/2024/{i}/1", i, "trap.com", 1, 1, i)
            for i in range(40)
        ],
        *[
            (f"http://ok.com/page{i}", 100 + i, "ok.com", 1, 1, 100 + i)
            for i in range(3)
        ],
    ]
    cap, k = 6, 4  # per-salt cap = 2
    tagged = template_cap_tag(_frontier(spark, rows), cap=cap, salt_buckets=k)
    got = {r["url"]: r["trap_admitted"] for r in tagged.collect()}
    assert len(got) == 43
    trap_admitted = {
        int(u.rsplit("/", 2)[1]) for u, a in got.items() if a and "trap.com" in u
    }
    assert cap <= len(trap_admitted) <= k * -(-cap // k)
    # deterministic FIFO within each salt bucket: admitted seqs are the
    # per-salt minima (url_hash = seq = i here, salt = i % k)
    by_salt = {}
    for i in sorted(trap_admitted):
        by_salt.setdefault(i % k, []).append(i)
    for s, seqs in by_salt.items():
        expect = [i for i in range(40) if i % k == s][: len(seqs)]
        assert seqs == expect
    assert all(a for u, a in got.items() if "ok.com" in u)


def test_engine_template_cap_defers_not_drops(spark):
    """A capped crawl visits the same final URL set as an uncapped one
    (deferral re-admits cap URLs per wave), just across more waves —
    with salting OFF and ON (salted per-wave bound is k*ceil(cap/k))."""
    # 90 docs / cap 12 (was 150 / cap 5): the unit-level tests above
    # already pin the FIFO/salted cap mechanics — this engine-level
    # test only needs the capped run to drain over MORE waves than the
    # uncapped one. Wave count is what the test pays for (fixed
    # per-wave scheduling cost dominates), and 150/5 burned ~70s in
    # ~25 deferral waves for no extra coverage.
    corpus = generate_corpus(spark, n_docs=90, n_hosts=3, seed=7).localCheckpoint(
        eager=True
    )
    robots = generate_robots(spark, n_hosts=3, seed=7)
    seeds = seed_urls(3)
    cap = 12
    kw = dict(max_depth=2, max_urls=90, crawl_external=True, max_waves=40)
    base = CrawlEngine(spark, corpus, robots, CrawlConfig(**kw)).run(seeds)
    base_urls = {r["url"] for r in base.pages.select("url").collect()}
    base_seen = {r["url"] for r in base.seen.select("url").collect()}

    for salt in (1, 2):
        capped = CrawlEngine(
            spark,
            corpus,
            robots,
            CrawlConfig(template_cap=cap, salt_buckets=salt, **kw),
        ).run(seeds)
        capped_urls = {r["url"] for r in capped.pages.select("url").collect()}
        assert capped_urls == base_urls
        capped_seen = {r["url"] for r in capped.seen.select("url").collect()}
        assert capped_seen == base_seen
        # capping is real: more waves were needed to drain the same set
        assert len(capped.metrics) > len(base.metrics)
        # per-wave cap holds on every scheduled wave
        pages = capped.pages.select(
            "wave", "host", url_template(F.col("url")).alias("tpl")
        )
        max_per = (
            pages.groupBy("wave", "host", "tpl")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.max("n").alias("m"))
            .collect()[0]["m"]
        )
        assert max_per <= salt * -(-cap // salt)


def test_template_cap_zero_rejected(spark):
    import pytest as _pytest

    corpus = generate_corpus(spark, n_docs=10, n_hosts=2, seed=1)
    with _pytest.raises(ValueError, match="template_cap"):
        CrawlEngine(spark, corpus, None, CrawlConfig(template_cap=0))
