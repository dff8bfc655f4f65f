"""Deterministic synthetic web corpus — the engine's "network".

There is no live network in the graft: fetching a URL means joining the
frontier against this interleaved text+media documents table
(BASELINE.json input_hint). The generator is a pure function of
(doc index, seed): no wall clock, no shared RNG state — so it runs
distributed via mapInPandas over spark.range() and produces identical
bytes at any parallelism. That property is what makes the golden
crawl-order fixtures and the local[8]-vs-local[32] scaling runs
byte-comparable.

Web shape (mirrors what the reference crawler would meet in the wild,
per FIXTURES.md):
  * Zipf-skewed hosts — host 0 is a mega-host (~30% of docs) to
    exercise skew salting;
  * links embedded in HTML as <a href> (relative + absolute forms, plus
    mailto:/tel:/#fragment noise the prefilter must drop);
  * ~10% docs missing titles, ~15% missing meta descriptions, ~5%
    noindex, near-duplicate pairs, css/js/image assets, robots-blocked
    /private/ paths — every issue rule and admission predicate fires.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..schema import CORPUS_SCHEMA, ROBOTS_SCHEMA

_WORDS = (
    "spark frontier crawl index query shard merge batch scan fetch link "
    "anchor parse token stream table column row filter join sort group "
    "window hash state wave seed host depth budget bloom probe salt skew "
    "partition shuffle codegen arrow pandas vector page title heading "
    "content media image script style robot sitemap canonical meta"
).split()
_NW = len(_WORDS)


def _mix64(x: np.ndarray | int) -> np.ndarray | int:
    """splitmix64 finalizer — the per-doc deterministic entropy source.
    uint64 wraparound is the point; numpy's overflow warning is noise."""
    with np.errstate(over="ignore"):
        x = (np.uint64(x) + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x &= np.uint64(0xFFFFFFFFFFFFFFFF)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x &= np.uint64(0xFFFFFFFFFFFFFFFF)
        return x ^ (x >> np.uint64(31))


def _h(i: int, salt: int, seed: int) -> int:
    return int(_mix64(np.uint64(i * 1_000_003 + salt * 7919 + seed)))


def host_boundaries(n_docs: int, n_hosts: int) -> list[tuple[str, int, int]]:
    """(host, start_idx, end_idx) — host 0 gets ~30% (mega-host), the rest
    share the remainder Zipf-ishly (∝ 1/rank). Computed once, driver-side."""
    if n_hosts == 1:
        return [("host0.example.com", 0, n_docs)]
    weights = [0.30] + [0.70 / (sum(1.0 / r for r in range(1, n_hosts)) * r) for r in range(1, n_hosts)]
    total = sum(weights)
    sizes = [max(1, int(round(w / total * n_docs))) for w in weights]
    # fix rounding drift onto the mega-host
    sizes[0] += n_docs - sum(sizes)
    out, start = [], 0
    for h, sz in enumerate(sizes):
        out.append((f"host{h}.example.com", start, start + sz))
        start += sz
    return out


def _find_host(i: int, bounds: list[tuple[str, int, int]]) -> tuple[str, int, int]:
    lo, hi = 0, len(bounds) - 1
    while lo < hi:
        mid = (lo + hi) // 2
        if i >= bounds[mid][2]:
            lo = mid + 1
        else:
            hi = mid
    return bounds[lo]


def doc_url(i: int, bounds: list[tuple[str, int, int]], seed: int) -> str:
    host, start, _end = _find_host(i, bounds)
    k = i - start
    if _h(i, 1, seed) % 100 < 3:
        return f"https://{host}/private/page/{k}.html"  # robots-blocked path
    return f"https://{host}/page/{k}.html"


def _asset_rows(host: str) -> list[dict]:
    """Non-HTML assets per host (extension/content-type filter targets)."""
    rows = []
    for name, ctype in (
        ("styles.css", "text/css"),
        ("app.js", "application/javascript"),
        ("logo.png", "image/png"),
        ("whitepaper.pdf", "application/pdf"),
    ):
        rows.append(
            {
                "doc_id": f"https://{host}/assets/{name}",
                "spans": [],
                "host": host,
                "status_code": 200,
                "content_type": ctype,
                "size": 2048,
                "response_time_ms": 20.0,
                "raw_html": "",
            }
        )
    return rows


def _gen_doc(i: int, bounds: list[tuple[str, int, int]], n_docs: int, seed: int) -> dict:
    host, start, end = _find_host(i, bounds)
    host_size = end - start
    k = i - start
    url = doc_url(i, bounds, seed)
    h0 = _h(i, 0, seed)

    # near-duplicate: clone previous page's content fields with a tiny delta
    is_dup = k > 0 and h0 % 10 == 0
    ci = i - 1 if is_dup else i  # content index
    ch = _h(ci, 2, seed)

    status_roll = h0 % 100
    status = 200 if status_roll < 85 else 301 if status_roll < 90 else 404 if status_roll < 98 else 500

    def words(salt: int, n: int, idx: int = ci) -> str:
        base = _h(idx, salt, seed)
        return " ".join(_WORDS[(base + 31 * j) % _NW] for j in range(n))

    title = "" if ch % 10 == 0 else words(10, 4 + ch % 5).title()
    if is_dup and title:
        title += " V2"
    desc = "" if ch % 100 < 15 else words(11, 12 + ch % 8)
    h1 = "" if ch % 100 < 10 else words(12, 3 + ch % 3).title()
    lang = "" if ch % 100 < 10 else ("en", "de", "fr", "es", "zh")[ch % 5]
    has_viewport = ch % 100 >= 10
    robots_meta = "noindex, nofollow" if ch % 100 < 5 else ""
    n_paras = 1 + ch % 6
    n_h2 = ch % 4
    n_h3 = ch % 3
    n_imgs = ch % 4
    canonical = url if ch % 20 else f"https://{host}/page/0.html"

    spans: list[dict] = []
    html: list[str] = []
    off = 0

    def emit(kind: str, text: str | None = None, media_ref: str | None = None):
        nonlocal off
        spans.append({"kind": kind, "text": text, "media_ref": media_ref, "offset": off})
        off += 1

    html.append("<!DOCTYPE html>")
    html.append(f'<html lang="{lang}">' if lang else "<html>")
    html.append('<head><meta charset="utf-8">')
    if title:
        html.append(f"<title>{title}</title>")
        emit("title", title)
    if desc:
        html.append(f'<meta name="description" content="{desc}">')
        emit("meta_description", desc)
    if has_viewport:
        html.append('<meta name="viewport" content="width=device-width, initial-scale=1">')
    if robots_meta:
        html.append(f'<meta name="robots" content="{robots_meta}">')
    html.append(f'<link rel="canonical" href="{canonical}">')
    if ch % 3 == 0:
        html.append(f'<meta property="og:title" content="{title or "untitled"}">')
        html.append('<meta property="og:type" content="article">')
    if ch % 4 == 0:
        html.append('<meta name="twitter:card" content="summary">')
    if ch % 5 == 0:
        ld = json.dumps({"@type": "Article", "name": title or f"doc {i}"})
        html.append(f'<script type="application/ld+json">{ld}</script>')
        emit("script_jsonld", ld)
    if ch % 6 == 0:
        ga = f"gtag('config','G-{'ABCDEFGHIJ'}');"
        html.append(f"<script>{ga}</script>")
        emit("script_analytics", ga)
    if ch % 7 == 0:
        html.append("<script>window.GTM='GTM-ABC123';</script>")
    html.append("</head><body>")
    if ch % 8 == 0:
        art = title or "untitled"
        html.append(
            f'<div itemtype="https://schema.org/Article">'
            f'<span itemprop="headline">{art}</span>'
            f'<meta itemprop="datePublished" content="2024-01-{1 + ch % 28:02d}">'
            f"</div>"
        )
    html.append(f'<nav><a href="https://{host}/page/0.html">Home</a></nav>')
    emit("link", "Home", f"https://{host}/page/0.html")
    if h1:
        html.append(f"<h1>{h1}</h1>")
        emit("h1", h1)

    # body links: mostly same-host (relative + absolute), some cross-host
    n_links = 4 + h0 % 8
    for j in range(n_links):
        lh = _h(i, 100 + j, seed)
        if lh % 10 < 8 or len(bounds) == 1:  # same-host
            tk = lh % host_size
            if lh % 3 == 0:  # root-relative
                href = f"/page/{tk}.html"
                abs_url = f"https://{host}/page/{tk}.html"
            elif lh % 3 == 1:  # dir-relative (urljoin keeps current dir —
                # dangling for /private/ pages, which the fetch join
                # surfaces as error rows, like a live 404)
                href = f"{tk}.html"
                abs_url = url[: url.rfind("/") + 1] + f"{tk}.html"
            else:
                href = f"https://{host}/page/{tk}.html"
                abs_url = href
        else:  # cross-host
            th, ts, te = bounds[lh % len(bounds)]
            tk = lh % (te - ts)
            href = f"https://{th}/page/{tk}.html"
            abs_url = href
        anchor = words(200 + j, 2, i)
        html.append(f'<a href="{href}">{anchor}</a>')
        emit("link", anchor, abs_url)
        if j < n_paras:
            para = words(300 + j, 20 + lh % 30, ci)
            html.append(f"<p>{para}</p>")
            emit("text", para)
        if j < n_h2:
            t = words(400 + j, 3, ci).title()
            html.append(f"<h2>{t}</h2>")
            emit("h2", t)
        if j < n_h3:
            t = words(500 + j, 3, ci)
            html.append(f"<h3>{t}</h3>")
            emit("h3", t)
        if j < n_imgs:
            src = f"https://{host}/img/{(ch + j) % 50}.png"
            alt = "" if lh % 4 == 0 else words(600 + j, 2, ci)
            html.append(f'<img src="{src}" alt="{alt}">')
            emit("media", alt, src)

    # noise links the prefilter must drop + asset links for extension gates
    html.append('<a href="#section">jump</a>')
    html.append('<a href="mailto:a@b.c">mail</a>')
    html.append('<a href="tel:+1555">call</a>')
    if h0 % 5 == 0:
        html.append(f'<a href="https://{host}/assets/whitepaper.pdf">pdf</a>')
        emit("link", "pdf", f"https://{host}/assets/whitepaper.pdf")
    if h0 % 7 == 0:
        html.append('<a href="https://external-site.org/page.html">elsewhere</a>')
        emit("link", "elsewhere", "https://external-site.org/page.html")
    html.append(f'<footer><a href="https://{host}/page/1.html">About</a></footer>')
    emit("link", "About", f"https://{host}/page/1.html")
    html.append("</body></html>")

    raw = "\n".join(html) if status == 200 else ""
    if status != 200:
        spans = []
    size = len(raw.encode()) if raw else 512
    # a few oversized/slow pages to trip the performance issue rules
    if h0 % 200 == 7:
        size = 4 * 1024 * 1024
    elif h0 % 200 == 8:
        size = 2 * 1024 * 1024
    rt = 30.0 + (h0 % 97) * 10.0
    if h0 % 150 == 9:
        rt = 3500.0
    elif h0 % 150 == 10:
        rt = 1500.0

    return {
        "doc_id": url,
        "spans": spans,
        "host": host,
        "status_code": status,
        "content_type": "text/html; charset=utf-8",
        "size": size,
        "response_time_ms": rt,
        "raw_html": raw,
    }


def generate_corpus(
    spark: SparkSession,
    n_docs: int = 2000,
    n_hosts: int = 20,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic corpus build: spark.range → mapInPandas.

    Scales linearly with cores — each task derives its rows purely from
    the id range it owns (design point: the same function at 10^8 docs
    on a 1000-executor cluster; nothing driver-side but the host table).
    """
    bounds = host_boundaries(n_docs, n_hosts)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_gen_doc(int(i), bounds, n_docs, seed) for i in pdf["id"]]
            # one asset bundle per host, emitted by the partition that owns
            # the host's first page (exactly-once, order-free)
            for host, start, _e in bounds:
                if (pdf["id"] == start).any():
                    rows.extend(_asset_rows(host))
            yield pd.DataFrame(rows)

    rng = spark.range(0, n_docs, numPartitions=partitions or max(8, n_docs // 5000))
    return rng.mapInPandas(gen, schema=CORPUS_SCHEMA)


def generate_robots(spark: SparkSession, n_hosts: int = 20, seed: int = 42) -> DataFrame:
    """Per-host robots dimension (broadcast-joined to the frontier;
    reference analogue: per-host RobotFileParser cache, crawler.py:1181-1201)."""
    rows = []
    for h in range(n_hosts):
        host = f"host{h}.example.com"
        hh = _h(h, 77, seed)
        rows.append(
            {
                "host": host,
                "disallow_globs": ["/private/*"] if hh % 4 != 0 else [],
                "crawl_delay": float(1 + hh % 3),
                "sitemap_urls": [f"https://{host}/sitemap.xml"] if hh % 2 == 0 else [],
            }
        )
    return spark.createDataFrame(pd.DataFrame(rows), schema=ROBOTS_SCHEMA)


SITEMAP_SCHEMA_DDL = "sitemap_url string, kind string, locs array<string>"


def generate_sitemaps(
    spark: SparkSession, n_docs: int = 2000, n_hosts: int = 20, seed: int = 42
) -> DataFrame:
    """Sitemap / sitemapindex fixture docs (reference:
    src/core/sitemap_parser.py:68-132 — recursion, urlset vs index).

    Per host (when the host has one at all): the mega-host gets a
    sitemapindex → two child urlsets; other hosts a flat urlset. Lists
    include a robots-blocked /private/ path and a pdf to exercise the
    admission gate on the sitemap path (crawler.py:305-320).
    """
    bounds = host_boundaries(n_docs, n_hosts)
    rows = []
    for h, (host, start, end) in enumerate(bounds):
        hh = _h(h, 78, seed)
        if hh % 3 == 1:  # some hosts have no sitemap at all
            continue
        size = end - start

        def page(k):
            return f"https://{host}/page/{k % size}.html"

        if h == 0:
            rows.append(
                {
                    "sitemap_url": f"https://{host}/sitemap.xml",
                    "kind": "sitemapindex",
                    "locs": [
                        f"https://{host}/sitemap-a.xml",
                        f"https://{host}/sitemap-b.xml",
                    ],
                }
            )
            rows.append(
                {
                    "sitemap_url": f"https://{host}/sitemap-a.xml",
                    "kind": "urlset",
                    "locs": [page(k) for k in range(2, 14, 2)]
                    + [f"https://{host}/private/page/1.html"],
                }
            )
            rows.append(
                {
                    "sitemap_url": f"https://{host}/sitemap-b.xml",
                    "kind": "urlset",
                    "locs": [page(k) for k in range(3, 15, 2)]
                    + [f"https://{host}/assets/whitepaper.pdf"],
                }
            )
        else:
            rows.append(
                {
                    "sitemap_url": f"https://{host}/sitemap.xml",
                    "kind": "urlset",
                    "locs": [page(2 + (hh + j) % max(size, 1)) for j in range(6)],
                }
            )
    return spark.createDataFrame(pd.DataFrame(rows), schema=SITEMAP_SCHEMA_DDL)


def seed_urls(n_hosts: int = 20, messy: bool = True) -> list[str]:
    """Seed list; raw/messy forms exercise canonicalization (north star:
    canonicalization applied identically before comparing engines)."""
    seeds = []
    for h in range(min(n_hosts, 5)):
        host = f"host{h}.example.com"
        if messy and h % 2 == 0:
            seeds.append(f"HTTPS://{host.upper()}:443/page/0.html#top")
        else:
            seeds.append(f"https://{host}/page/0.html")
    return seeds
