"""Single-page mode (crawler.py:218-222): a seed with a path limits the
crawl to max_depth 0 — links collected, nothing expanded."""

from seo_crawler_spark.operators.frontier import CrawlConfig, CrawlEngine
from seo_crawler_spark.reference_model import ReferenceModel
from seo_crawler_spark.sources.corpus import generate_corpus, generate_robots


def test_single_page_mode_parity(spark):
    corpus = generate_corpus(spark, n_docs=150, n_hosts=3, seed=13).localCheckpoint(
        eager=True
    )
    robots = generate_robots(spark, n_hosts=3, seed=13)
    seeds = ["https://host0.example.com/page/3.html"]

    corpus_dict = {r["doc_id"]: r.asDict() for r in corpus.collect()}
    robots_dict = {r["host"]: list(r["disallow_globs"] or []) for r in robots.collect()}
    expected = ReferenceModel(
        corpus_dict, robots_dict, max_depth=3, max_urls=100, single_page_if_path=True
    ).crawl(seeds)
    assert len(expected["order"]) == 1  # only the seed page

    got = CrawlEngine(
        spark, corpus, robots,
        CrawlConfig(max_depth=3, max_urls=100, single_page_if_path=True),
    ).run(seeds)
    assert [r["url"] for r in got.order.collect()] == [u for u, _ in expected["order"]]
    assert got.links.count() > 0  # links still collected from the page
