"""Production-fetch connector contract (sources/fetcher.py): the seam
where a real HTTP layer plugs into the wave loop. Closes the one
by-design gap vs the reference's live-fetch path (crawler.py:781-918):
the engine's corpus join IS the interface, and these tests wire both a
static-corpus fetcher (must be identical to the default path) and a
per-partition fake HTTP fetcher (the aiohttp slot) through real waves.
"""

from __future__ import annotations

import pandas as pd
import pytest

from seo_crawler_spark.operators.frontier import CrawlConfig, CrawlEngine
from seo_crawler_spark.sources.corpus import (
    generate_corpus,
    generate_robots,
    seed_urls,
)
from seo_crawler_spark.sources.fetcher import (
    FETCH_RESULT_SCHEMA,
    HttpFetcher,
    PandasBatchFetcher,
    StaticCorpusFetcher,
)

N_DOCS, N_HOSTS = 120, 3


@pytest.fixture(scope="module")
def corpus_df(spark):
    return generate_corpus(
        spark, n_docs=N_DOCS, n_hosts=N_HOSTS, seed=7
    ).localCheckpoint(eager=True)


@pytest.fixture(scope="module")
def robots_df(spark):
    return generate_robots(spark, n_hosts=N_HOSTS, seed=7)


def _key(result):
    return sorted(
        (r["url"], r["wave"], r["seq"], r["status_code"])
        for r in result.pages.collect()
    )


def test_static_corpus_fetcher_identical_to_default(
    spark, corpus_df, robots_df
):
    cfg = CrawlConfig(max_depth=2, max_urls=400)
    base = CrawlEngine(spark, corpus_df, robots_df, cfg).run(
        seed_urls(N_HOSTS)
    )
    via = CrawlEngine(
        spark,
        corpus_df,
        robots_df,
        cfg,
        fetcher=StaticCorpusFetcher(corpus_df),
    ).run(seed_urls(N_HOSTS))
    assert _key(via) == _key(base)
    assert sorted(r["url"] for r in via.seen.collect()) == sorted(
        r["url"] for r in base.seen.collect()
    )


def test_pandas_batch_fetcher_through_waves(spark, robots_df, corpus_df):
    """A fake per-partition fetch callable drives the full wave loop:
    fetched pages parse, their links expand into wave 2, and omitted
    URLs surface as status-0 'fetch failed' rows — the documented
    failure-by-omission contract. (Defined inside the test so
    cloudpickle ships it by value — executors can't import tests/.)"""
    cols = [f.name for f in FETCH_RESULT_SCHEMA.fields]

    def _fake_http_batch(urls: pd.DataFrame) -> pd.DataFrame:
        # deterministic fake of a per-partition HTTP session: every
        # reachable page responds with one fetchable /next/ link and
        # one /fail/ link the 'server' never answers (omission = hard
        # fetch failure: timeout/DNS)
        rows = []
        for u, h in zip(urls["url"], urls["host"]):
            if "/fail/" in u:
                continue  # omission = fetch failed
            tail = u.rstrip("/").rsplit("/", 1)[-1]
            body = (
                f"<html><head><title>t-{tail}</title></head><body>"
                f'<a href="https://{h}/next/x{tail}">n</a>'
                f'<a href="https://{h}/fail/{tail}">f</a></body></html>'
            )
            rows.append(
                {
                    "doc_id": u,
                    "host": h,
                    "status_code": 200,
                    "content_type": "text/html",
                    "size": len(body),
                    "response_time_ms": 1.0,
                    "raw_html": body,
                }
            )
        return pd.DataFrame(rows, columns=cols)

    res = CrawlEngine(
        spark,
        corpus_df,  # static corpus present but ignored: fetcher wins
        robots_df,
        CrawlConfig(max_depth=2, max_urls=200, crawl_external=True),
        fetcher=PandasBatchFetcher(_fake_http_batch),
    ).run(seed_urls(N_HOSTS))
    rows = res.pages.collect()
    by_status = {}
    for r in rows:
        by_status.setdefault(r["status_code"], []).append(r)
    # both contract halves exercised: fetched pages AND failed omissions
    assert by_status.get(200), "no fetched pages"
    assert by_status.get(0), "no fetch-failed rows"
    assert all(r["error"] == "fetch failed" for r in by_status[0])
    # wave expansion ran off the FAKE bodies: /next/ links only exist there
    waves = {r["wave"] for r in rows}
    assert waves >= {1, 2}
    assert any("/next/" in r["url"] for r in rows if r["wave"] == 2)
    # titles come from the fake fetch layer, not the static corpus
    assert all(
        r["title"].startswith("t-") for r in by_status[200] if r["title"]
    )


def test_http_fetcher_is_an_explicit_stub(spark, corpus_df):
    with pytest.raises(NotImplementedError):
        HttpFetcher().fetch(spark, corpus_df, 1)
