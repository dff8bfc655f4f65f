"""File-size gate (reference crawler.py:789-803): a document whose
content-length exceeds max_file_size becomes an empty error row
('File too large: N bytes', status 0) and its links are never expanded."""

from __future__ import annotations

import pytest

from seo_crawler_spark.operators.frontier import CrawlConfig, CrawlEngine


def _page(url, host, size, links):
    body = "".join(f'<a href="{t}">x</a>' for t in links)
    return (
        url, host, 200, "text/html", size, 10.0,
        f"<html><head><title>T {url}</title></head><body>{body}</body></html>",
    )


@pytest.fixture(scope="module")
def tiny_corpus(spark):
    h = "h.example.com"
    rows = [
        _page(f"https://{h}/", h, 1_000,
              [f"https://{h}/big.html", f"https://{h}/small.html"]),
        _page(f"https://{h}/big.html", h, 9_999_999,
              [f"https://{h}/only-via-big.html"]),
        _page(f"https://{h}/small.html", h, 2_000, []),
        _page(f"https://{h}/only-via-big.html", h, 500, []),
    ]
    return spark.createDataFrame(
        rows,
        "doc_id string, host string, status_code int, content_type string, "
        "size long, response_time_ms double, raw_html string",
    ).localCheckpoint(eager=True)


def test_oversized_doc_becomes_error_row_and_blocks_expansion(spark, tiny_corpus):
    res = CrawlEngine(
        spark, tiny_corpus, None,
        CrawlConfig(max_depth=3, max_urls=100, respect_robots=False,
                    max_file_size=1_000_000),
    ).run(["https://h.example.com/"])
    pages = {r["url"]: r for r in res.pages.collect()}
    big = pages["https://h.example.com/big.html"]
    assert big["status_code"] == 0
    assert big["error"] == "File too large: 9999999 bytes"
    assert big["title"] == ""  # body skipped, not parsed
    # big's link target is neither crawled nor discovered
    assert "https://h.example.com/only-via-big.html" not in pages
    assert "https://h.example.com/only-via-big.html" not in {
        r["url"] for r in res.seen.collect()
    }
    # the small sibling is unaffected
    assert pages["https://h.example.com/small.html"]["status_code"] == 200


def test_no_limit_crawls_everything(spark, tiny_corpus):
    res = CrawlEngine(
        spark, tiny_corpus, None,
        CrawlConfig(max_depth=3, max_urls=100, respect_robots=False),
    ).run(["https://h.example.com/"])
    assert res.pages.count() == 4
