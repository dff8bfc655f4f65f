"""Queue-rebuild fallback (crawler.py:455-476): pending frontier
reconstructed from the link graph when no frontier snapshot survives."""

from __future__ import annotations

from urllib.parse import urlparse

from seo_crawler_spark.functions.urls import _canonicalize_py
from seo_crawler_spark.operators.frontier import CrawlConfig, CrawlEngine
from seo_crawler_spark.sources.corpus import (
    generate_corpus,
    generate_robots,
    seed_urls,
)


def test_rebuild_matches_python_expectation(spark):
    corpus = generate_corpus(spark, n_docs=200, n_hosts=4, seed=5).localCheckpoint(
        eager=True
    )
    robots = generate_robots(spark, n_hosts=4, seed=5)
    seeds = seed_urls(4)
    cfg = CrawlConfig(max_depth=2, max_urls=40)  # stop early → pending exists
    engine = CrawlEngine(spark, corpus, robots, cfg)
    res = engine.run(seeds)

    base_domain = urlparse(_canonicalize_py(seeds[0])).netloc
    rebuilt = engine.rebuild_frontier_from_links(
        res.links, res.pages, base_domain, next_seq=0
    )
    got = {r["url"] for r in rebuilt.collect()}

    crawled = {r["url"] for r in res.pages.collect()}
    expected = set()
    for l in res.links.collect():
        if not l["is_internal"]:
            continue
        u = _canonicalize_py(l["target_url"])
        if u in crawled:
            continue
        # the admission predicate also applies (robots + extensions)
        from seo_crawler_spark.reference_model import ReferenceModel

        model = ReferenceModel(
            {}, {r["host"]: list(r["disallow_globs"] or []) for r in robots.collect()}
        )
        model.base_domain = base_domain
        if model._should_crawl(u):
            expected.add(u)
    assert got == expected
    assert len(got) > 0
    # depth defaults to 1 (reference: link.get('depth', 1))
    assert all(r["depth"] == 1 for r in rebuilt.collect())
