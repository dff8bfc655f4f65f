"""Issue rule engine vs an independent pure-Python oracle, and
blocked vs brute-force duplication equivalence."""

from __future__ import annotations

from difflib import SequenceMatcher

import pytest
from pyspark.sql import functions as F

from seo_crawler_spark.operators.extract import extract_pages
from seo_crawler_spark.operators.issues import (
    detect_duplication,
    detect_issues,
    eeat_scores,
)
from seo_crawler_spark.sources.corpus import generate_corpus

STATUS_TEXT = {
    400: "Bad Request", 401: "Unauthorized", 403: "Forbidden",
    404: "Not Found", 405: "Method Not Allowed", 406: "Not Acceptable",
    408: "Request Timeout", 410: "Gone", 429: "Too Many Requests",
    500: "Internal Server Error", 501: "Not Implemented",
    502: "Bad Gateway", 503: "Service Unavailable",
    504: "Gateway Timeout", 505: "HTTP Version Not Supported",
}


@pytest.fixture(scope="module")
def pages(spark):
    corpus = generate_corpus(spark, n_docs=250, n_hosts=4, seed=7)
    fetched = corpus.select(
        F.col("doc_id").alias("url"),
        "status_code", "content_type", "size",
        F.lit(0).alias("depth"), F.lit(0).alias("wave"),
        F.monotonically_increasing_id().alias("seq"),
        "host",
        F.col("response_time_ms").alias("response_time"),
        F.lit(None).cast("string").alias("error"),
        "raw_html",
    )
    return extract_pages(fetched, "host0.example.com").localCheckpoint(eager=True)


def python_issue_oracle(rows):
    out = []

    def add(u, t, c, i, d):
        out.append((u, t, c, i, d))

    for r in rows:
        u = r["url"]
        title = r["title"] or ""
        if not title:
            add(u, "error", "SEO", "Missing Title Tag", "Page has no title tag")
        elif len(title) > 60:
            add(u, "warning", "SEO", "Title Too Long",
                f"Title is {len(title)} characters (recommended: ≤60)")
        elif len(title) < 30:
            add(u, "warning", "SEO", "Title Too Short",
                f"Title is {len(title)} characters (recommended: 30-60)")
        desc = r["meta_description"] or ""
        if not desc:
            add(u, "error", "SEO", "Missing Meta Description", "Page has no meta description")
        elif len(desc) > 160:
            add(u, "warning", "SEO", "Meta Description Too Long",
                f"Description is {len(desc)} characters (recommended: ≤160)")
        elif len(desc) < 120:
            add(u, "warning", "SEO", "Meta Description Too Short",
                f"Description is {len(desc)} characters (recommended: 120-160)")
        if not (r["h1"] or ""):
            add(u, "error", "SEO", "Missing H1 Tag", "Page has no H1 heading")
        if (r["word_count"] or 0) < 300:
            add(u, "warning", "Content", "Thin Content",
                f"Page has only {r['word_count']} words (recommended: ≥300)")
        sc = r["status_code"] or 0
        stext = STATUS_TEXT.get(sc, f"HTTP {sc} Error")
        if 400 <= sc < 500:
            add(u, "error", "Technical", f"{sc} Client Error", stext)
        elif sc >= 500:
            add(u, "error", "Technical", f"{sc} Server Error", stext)
        elif 300 <= sc < 400:
            add(u, "info", "Technical", f"{sc} Redirect", "URL redirects to another location")
        can = r["canonical_url"] or ""
        if not can:
            add(u, "warning", "Technical", "Missing Canonical URL",
                "Page has no canonical URL specified")
        elif can != u:
            add(u, "warning", "Technical", "Canonical URL Different",
                f"Canonical points to: {can}")
        if not (r["viewport"] or ""):
            add(u, "error", "Mobile", "Missing Viewport Meta Tag", "Page is not mobile-optimized")
        if not (r["lang"] or ""):
            add(u, "warning", "Accessibility", "Missing Language Attribute",
                "HTML tag has no lang attribute")
        imgs = r["images"] or []
        noalt = [i for i in imgs if not i["alt"]]
        if noalt:
            add(u, "warning", "Accessibility", "Images Without Alt Text",
                f"{len(noalt)} of {len(imgs)} images lack alt text")
        if not (r["og_tags"] or {}):
            add(u, "warning", "Social", "Missing OpenGraph Tags",
                "Page has no OpenGraph tags for social sharing")
        if not (r["twitter_tags"] or {}):
            add(u, "warning", "Social", "Missing Twitter Card Tags",
                "Page has no Twitter Card tags")
        if not (r["json_ld"] or []) and not (r["schema_org"] or []):
            add(u, "info", "Structured Data", "No Structured Data",
                "Page has no JSON-LD or Schema.org markup")
        rt = r["response_time"] or 0
        if rt > 3000:
            add(u, "error", "Performance", "Slow Response Time",
                f"Page took {rt}ms to respond (recommended: <3000ms)")
        elif rt > 1000:
            add(u, "warning", "Performance", "Moderate Response Time",
                f"Page took {rt}ms to respond (recommended: <1000ms)")
        size = r["size"] or 0
        if size > 3 * 1024 * 1024:
            add(u, "error", "Performance", "Large Page Size",
                f"Page size is {size / 1024 / 1024:.1f}MB (recommended: <3MB)")
        elif size > 1024 * 1024:
            add(u, "warning", "Performance", "Moderate Page Size",
                f"Page size is {size / 1024 / 1024:.1f}MB (recommended: <1MB)")
        robots = (r["robots"] or "").lower()
        if "noindex" in robots:
            add(u, "error", "Indexability", "Noindex Tag Present",
                "Page is BLOCKED from search engines - has noindex directive")
        if "nofollow" in robots:
            add(u, "error", "Indexability", "Nofollow Tag Present",
                "Links on this page are NOT followed by search engines - has nofollow directive")
    return sorted(out)


def _norm_details(s: str) -> str:
    # float formatting differs (Spark '1500.0ms' vs python) — normalize
    return s.replace(".0ms", "ms").replace(".0 ", " ")


def test_issue_rules_match_oracle(spark, pages):
    got = sorted(
        (r["url"], r["type"], r["category"], r["issue"], _norm_details(r["details"]))
        for r in detect_issues(pages).collect()
    )
    rows = [r.asDict() for r in pages.collect()]
    want = [(u, t, c, i, _norm_details(d)) for u, t, c, i, d in python_issue_oracle(rows)]
    assert len(got) == len(want)
    assert got == sorted(want)


def test_duplication_blocked_equals_bruteforce(spark, pages):
    b = detect_duplication(pages, 0.85, blocked=True).collect()
    n = detect_duplication(pages, 0.85, blocked=False).collect()
    key = lambda rows: sorted((r["url"], r["details"]) for r in rows)
    assert key(b) == key(n)
    assert len(b) > 0  # corpus plants near-duplicates


def test_duplication_matches_python_oracle(spark, pages):
    rows = [r.asDict() for r in pages.collect()]
    pairs = set()
    for i, a in enumerate(rows):
        for j, b in enumerate(rows):
            if i >= j:
                continue
            t1, t2 = a["title"].lower().strip(), b["title"].lower().strip()
            d1, d2 = a["meta_description"].lower().strip(), b["meta_description"].lower().strip()
            h1, h2 = a["h1"].lower().strip(), b["h1"].lower().strip()
            ts = SequenceMatcher(None, t1, t2).ratio() if t1 and t2 else 0
            ds = SequenceMatcher(None, d1, d2).ratio() if d1 and d2 else 0
            hs = SequenceMatcher(None, h1, h2).ratio() if h1 and h2 else 0
            w1, w2 = a["word_count"], b["word_count"]
            ws = min(w1, w2) / max(w1, w2) if w1 and w2 else 0
            sim = ts * 0.35 + ds * 0.35 + hs * 0.20 + ws * 0.10
            if sim >= 0.85:
                pairs.add(tuple(sorted([a["url"], b["url"]])))
    got = detect_duplication(pages, 0.85, blocked=True).collect()
    got_pairs = set()
    for r in got:
        other = r["details"].split(" similar to ")[1]
        got_pairs.add(tuple(sorted([r["url"], other])))
    assert got_pairs == pairs


def test_eeat_scores_bounds(spark, pages):
    s = eeat_scores(pages).collect()
    assert all(0 <= r["eeat_score"] <= 100 for r in s)
    assert any(r["eeat_score"] > 0 for r in s)


def test_duplication_banding_handles_padded_titles(spark):
    """Regression: similarity is scored on .strip()'ed strings, so the
    band prune must use trimmed lengths — 'X' vs '   X   ' are a true
    duplicate pair that raw-length bands would place 2 bands apart and
    silently drop."""
    rows = [
        ("http://h/a", "Breaking News Today", "The very same description here", "Same H1", 500),
        ("http://h/b", "   Breaking News Today   ", "The very same description here", "Same H1", 500),
        ("http://h/c", "Completely different topic", "Another description entirely", "Other H1", 100),
    ]
    pages = spark.createDataFrame(
        rows, "url string, title string, meta_description string, h1 string, word_count int"
    )
    blocked = detect_duplication(pages, 0.85, blocked=True).collect()
    brute = detect_duplication(pages, 0.85, blocked=False).collect()
    key = lambda rs: sorted((r["url"], r["details"]) for r in rs)
    assert key(blocked) == key(brute)
    assert len(blocked) == 2  # the padded pair, both directions
