"""crawl_budget_allocation (plans/crawl_queries.py): conservation of
the page budget, share normalization, component consistency with the
registered pagerank operator, and partition invariance."""

from __future__ import annotations

from collections import defaultdict

from seo_crawler_spark.operators.graph import pagerank
from seo_crawler_spark.plans.crawl_queries import (
    CRAWL_BUDGET_TOTAL,
    crawl_budget_allocation,
)
from seo_crawler_spark.sources.tables import load

SF = "/root/testdata/sf0.01"


def test_budget_conserved_and_shares_normalized(spark):
    out = crawl_budget_allocation(spark, SF).collect()
    total = sum(r["budget_pages"] for r in out)
    # floor allocation: loses < 1 page per host, never over-allocates
    assert CRAWL_BUDGET_TOTAL - len(out) < total <= CRAWL_BUDGET_TOTAL
    assert abs(sum(r["share"] for r in out) - 1.0) < 1e-9
    # higher priority never gets less budget
    by_prio = sorted(out, key=lambda r: r["ipriority"])
    budgets = [r["budget_pages"] for r in by_prio]
    assert budgets == sorted(budgets)
    for r in out:
        assert r["ipriority"] == r["ivalue"] * r["iurgency"]
        assert r["iurgency"] >= 1  # exploration floor


def test_value_component_matches_pagerank(spark):
    pr = {
        r["doc_id"]: r["score"] for r in pagerank(spark, SF).collect()
    }
    src = {
        r["doc_id"]: r["source"]
        for r in load(spark, "documents", SF).select("doc_id", "source").collect()
    }
    want = defaultdict(int)
    for d, s in pr.items():
        want[src[d]] += s
    got = {
        r["host"]: r["ivalue"]
        for r in crawl_budget_allocation(spark, SF).collect()
    }
    assert got == dict(want)


def test_budget_partition_invariant(spark):
    a = [tuple(r) for r in crawl_budget_allocation(spark, SF).collect()]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try:
        b = [tuple(r) for r in crawl_budget_allocation(spark, SF).collect()]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b
