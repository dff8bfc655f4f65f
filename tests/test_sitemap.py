"""Sitemap discovery parity: engine wave-0 with sitemaps enabled must
match the reference model (seeds first, then traversal-order sitemap
URLs through the admission gate), including golden crawl order."""

from __future__ import annotations

import pytest

from seo_crawler_spark.operators.frontier import CrawlConfig, CrawlEngine
from seo_crawler_spark.operators.sitemap import (
    discover_sitemap_locs,
    robots_df_to_sitemap_dict,
    sitemaps_df_to_dict,
)
from seo_crawler_spark.reference_model import ReferenceModel
from seo_crawler_spark.sources.corpus import (
    generate_corpus,
    generate_robots,
    generate_sitemaps,
    seed_urls,
)

N_DOCS, N_HOSTS = 300, 5


@pytest.fixture(scope="module")
def fixtures(spark):
    corpus = generate_corpus(spark, n_docs=N_DOCS, n_hosts=N_HOSTS, seed=42).localCheckpoint(
        eager=True
    )
    robots = generate_robots(spark, n_hosts=N_HOSTS, seed=42)
    sitemaps = generate_sitemaps(spark, n_docs=N_DOCS, n_hosts=N_HOSTS, seed=42)
    return corpus, robots, sitemaps


def test_traversal_covers_index_recursion(spark, fixtures):
    _c, robots, sitemaps = fixtures
    locs = discover_sitemap_locs(
        sitemaps_df_to_dict(sitemaps),
        robots_df_to_sitemap_dict(robots),
        ["https://host0.example.com/page/0.html"],
    )
    # the mega-host sitemap is an index → children must be expanded
    assert any("/page/2.html" in u for u in locs)
    assert any(".pdf" in u for u in locs)  # admission must filter later
    assert len(locs) > 10


def test_sitemap_crawl_order_parity(spark, fixtures):
    corpus, robots, sitemaps = fixtures
    seeds = seed_urls(N_HOSTS)

    corpus_dict = {r["doc_id"]: r.asDict() for r in corpus.collect()}
    robots_dict = {r["host"]: list(r["disallow_globs"] or []) for r in robots.collect()}
    model = ReferenceModel(
        corpus_dict,
        robots_dict,
        max_depth=2,
        max_urls=250,
        sitemaps=sitemaps_df_to_dict(sitemaps),
        robots_sitemaps=robots_df_to_sitemap_dict(robots),
        discover_sitemaps=True,
    )
    expected = model.crawl(seeds)
    assert len(expected["order"]) > len(seeds)  # sitemap URLs crawled

    cfg = CrawlConfig(max_depth=2, max_urls=250, discover_sitemaps=True)
    got = CrawlEngine(spark, corpus, robots, cfg, sitemaps=sitemaps).run(seeds)
    got_order = [r["url"] for r in got.order.collect()]
    assert got_order == [u for u, _ in expected["order"]]
    assert {r["url"] for r in got.seen.collect()} == expected["seen"]


def test_metrics_carry_lineage_and_fetch_stats(spark, fixtures):
    corpus, robots, sitemaps = fixtures
    got = CrawlEngine(
        spark, corpus, robots, CrawlConfig(max_depth=1, max_urls=100)
    ).run(seed_urls(N_HOSTS))
    for m in got.metrics:
        assert "fetch" in m and m["fetch"]["n_pages"] == m["scheduled"]
        assert "partitions" in m and sum(p["rows"] for p in m["partitions"]) == m["scheduled"]
