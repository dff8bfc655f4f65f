"""Checkpoint-resume: kill after wave k, resume, final tables identical
to an uninterrupted run (reference analogue crawler.py:374-495 — but
wave-atomic, no 1000-URL truncation)."""

from __future__ import annotations

import pytest

from seo_crawler_spark.operators.frontier import CrawlConfig, CrawlEngine
from seo_crawler_spark.sources.corpus import (
    generate_corpus,
    generate_robots,
    seed_urls,
)

N_DOCS, N_HOSTS = 250, 4


@pytest.fixture(scope="module")
def corpus_df(spark):
    return generate_corpus(spark, n_docs=N_DOCS, n_hosts=N_HOSTS, seed=11).localCheckpoint(
        eager=True
    )


@pytest.fixture(scope="module")
def robots_df(spark):
    return generate_robots(spark, n_hosts=N_HOSTS, seed=11)


def test_resume_equals_uninterrupted(spark, corpus_df, robots_df, tmp_path):
    seeds = seed_urls(N_HOSTS)
    state = str(tmp_path / "crawlstate")

    # uninterrupted reference run
    full = CrawlEngine(
        spark, corpus_df, robots_df, CrawlConfig(max_depth=3, max_urls=10_000)
    ).run(seeds)
    full_order = [(r["url"], r["wave"]) for r in full.order.collect()]
    assert len(full_order) > 20

    # interrupted: stop after 2 waves (simulated crash — wave snapshots
    # are the only surviving state)
    partial = CrawlEngine(
        spark, corpus_df, robots_df,
        CrawlConfig(max_depth=3, max_urls=10_000, max_waves=2),
        state_dir=state,
    ).run(seeds)
    assert len(partial.metrics) == 2

    # resume from snapshots with a fresh engine instance
    resumed = CrawlEngine(
        spark, corpus_df, robots_df,
        CrawlConfig(max_depth=3, max_urls=10_000),
        state_dir=state,
    ).resume()

    got_order = [(r["url"], r["wave"]) for r in resumed.order.collect()]
    assert got_order == full_order
    assert {r["url"] for r in resumed.seen.collect()} == {
        r["url"] for r in full.seen.collect()
    }
    # link graph identical too (modulo row order)
    key = lambda df: sorted(
        (r["source_url"], r["target_url"], r["anchor_text"]) for r in df.collect()
    )
    assert key(resumed.links) == key(full.links)
