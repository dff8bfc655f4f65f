"""Export sinks: CSV scalarization semantics, JSON/XML sinks, links CSV,
issues-grouped JSON shape, seq>since status feed, viz projection."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from seo_crawler_spark.operators.frontier import CrawlConfig, CrawlEngine
from seo_crawler_spark.operators.issues import detect_issues
from seo_crawler_spark.sources.corpus import generate_corpus, generate_robots, seed_urls
from seo_crawler_spark.sources.exports import (
    _csv_scalarize,
    export_links_csv,
    export_pages_csv,
    export_pages_json,
    export_pages_xml,
    issues_grouped_json,
    status_feed,
    visualization_projection,
)


@pytest.fixture(scope="module")
def crawl(spark):
    corpus = generate_corpus(spark, n_docs=200, n_hosts=4, seed=9).localCheckpoint(
        eager=True
    )
    robots = generate_robots(spark, n_hosts=4, seed=9)
    return CrawlEngine(
        spark, corpus, robots, CrawlConfig(max_depth=2, max_urls=120, crawl_external=True)
    ).run(seed_urls(4))


def test_csv_scalarization_semantics(spark, crawl):
    """Reference main.py:275-314 rules: '<n> tags', '<n> images',
    'N internal links', h2 first-3 + ellipsis, analytics codes."""
    out = _csv_scalarize(crawl.pages, ["url", "og_tags", "images", "internal_links", "h2", "analytics"])
    rows = {r["url"]: r for r in out.collect()}
    src = {r["url"]: r for r in crawl.pages.collect()}
    for u, r in rows.items():
        s = src[u]
        n_og = len(s["og_tags"] or {})
        assert r["og_tags"] == (f"{n_og} tags" if n_og else "")
        n_img = len(s["images"] or [])
        assert r["images"] == (f"{n_img} images" if n_img else "")
        assert r["internal_links"] == f"{s['internal_links']} internal links"
        h2 = s["h2"] or []
        want = ", ".join(h2[:3]) + ("..." if len(h2) > 3 else "")
        assert r["h2"] == want
        if s["analytics"]["gtag"] or s["analytics"]["ga4_id"]:
            assert "GA4" in r["analytics"]


def test_file_sinks_roundtrip(spark, crawl, tmp_path):
    export_pages_csv(crawl.pages, str(tmp_path / "csv"))
    export_pages_json(crawl.pages, str(tmp_path / "json"))
    export_pages_xml(crawl.pages, str(tmp_path / "xml"), export_date="2026-08-16 00:00:00")
    export_links_csv(crawl.links, str(tmp_path / "links"))
    n = crawl.pages.count()
    back = spark.read.option("header", "true").csv(str(tmp_path / "csv"))
    assert back.count() == n
    assert spark.read.json(str(tmp_path / "json")).count() == n
    # XML is now ONE envelope document (reference main.py:344-358 shape)
    [xml_row] = spark.read.text(str(tmp_path / "xml")).collect()
    doc = xml_row["value"]
    assert doc.startswith('<librecrawl_export export_date="2026-08-16 00:00:00"')
    assert f'total_urls="{n}"' in doc
    import xml.etree.ElementTree as ET

    root = ET.fromstring(doc)  # well-formed despite &/< in field values
    assert len(root.find("urls")) == n


def test_xml_escaping_and_json_envelope(spark, tmp_path):
    """Field values with &, <, > must survive the XML round-trip (the
    reference escapes via ElementTree); the JSON envelope carries the
    reference's {export_date, total_urls, fields, data} keys."""
    import json
    import xml.etree.ElementTree as ET

    from seo_crawler_spark.sources.exports import (
        pages_json_envelope,
        pages_xml_envelope,
    )

    df = spark.createDataFrame(
        [("https://x.com/?a=1&b=2", "Ben & Jerry <3", 7, 0)],
        "url string, title string, seq long, depth int",
    )
    [xml_row] = pages_xml_envelope(
        df, "2026-01-01 00:00:00", ["url", "title"]
    ).collect()
    root = ET.fromstring(xml_row["value"])
    url_el = root.find("urls")[0]
    assert url_el.find("title").text == "Ben & Jerry <3"
    assert url_el.find("url").text == "https://x.com/?a=1&b=2"

    [json_row] = pages_json_envelope(
        df, "2026-01-01 00:00:00", ["url", "title"]
    ).collect()
    env = json.loads(json_row["value"])
    assert env["export_date"] == "2026-01-01 00:00:00"
    assert env["total_urls"] == 1
    assert env["fields"] == ["url", "title"]
    assert env["data"][0]["title"] == "Ben & Jerry <3"


def test_links_csv_value_mapping(spark):
    """Reference main.py:361-393: Yes/No booleans, 'Not crawled' for a
    missing target status, 'body' default placement."""
    from seo_crawler_spark.sources.exports import links_csv_projection

    df = spark.createDataFrame(
        [
            ("a", "b", "t", True, "d", 200, "nav"),
            ("a", "c", None, False, "d", None, None),
        ],
        "source_url string, target_url string, anchor_text string, "
        "is_internal boolean, target_domain string, target_status int, "
        "placement string",
    )
    rows = {r["target_url"]: r for r in links_csv_projection(df).collect()}
    assert rows["b"]["is_internal"] == "Yes"
    assert rows["b"]["target_status"] == "200"
    assert rows["c"]["is_internal"] == "No"
    assert rows["c"]["target_status"] == "Not crawled"
    assert rows["c"]["placement"] == "body"


def test_issues_grouped_json_shape(spark, crawl):
    issues = detect_issues(crawl.pages)
    grouped = issues_grouped_json(issues)
    row = grouped.first()
    assert row["issue_count"] == len(row["issues"])
    total = grouped.agg(F.sum("issue_count")).collect()[0][0]
    assert total == issues.count()


def test_status_feed_incremental(spark, crawl):
    mid = crawl.pages.agg(F.expr("percentile_approx(seq, 0.5)")).collect()[0][0]
    feed = status_feed(crawl.pages, since=int(mid))
    assert feed.count() == crawl.pages.filter(F.col("seq") > int(mid)).count()
    assert feed.count() < crawl.pages.count()


def test_visualization_projection(spark, crawl):
    nodes, edges = visualization_projection(crawl.pages, crawl.links, node_cap=50)
    assert nodes.count() <= 50
    ids = {r["node_id"] for r in nodes.collect()}
    for e in edges.collect():
        assert e["source_id"] in ids and e["target_id"] in ids
    assert edges.count() == edges.dropDuplicates(["source_id", "target_id"]).count()


def test_json_envelope_default_fields_and_attr_quotes(spark, crawl):
    """Regression pair: (a) the DEFAULT field list contains map columns
    (og/twitter tags) which array_sort's default comparator cannot
    order — the envelope must sort by seq via an explicit comparator;
    (b) a double quote in the XML export_date attribute must be escaped
    or the attribute terminates early."""
    import json
    import xml.etree.ElementTree as ET

    from seo_crawler_spark.sources.exports import (
        pages_json_envelope,
        pages_xml_envelope,
    )

    [row] = pages_json_envelope(crawl.pages, "2026-01-01").collect()
    env = json.loads(row["value"])
    assert env["total_urls"] == crawl.pages.count()
    # crawl order preserved through the comparator sort
    seqs = {r["url"]: r["seq"] for r in crawl.pages.select("url", "seq").collect()}
    urls = [u["url"] for u in env["data"]]
    assert urls == sorted(urls, key=lambda u: seqs[u])

    [xml_row] = pages_xml_envelope(
        crawl.pages.limit(1), 'Aug "17" 2026', ["url"]
    ).collect()
    root = ET.fromstring(xml_row["value"])  # raises on malformed attr
    assert root.get("export_date") == 'Aug "17" 2026'
