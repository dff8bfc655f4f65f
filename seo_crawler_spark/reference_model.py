"""Pure-Python reference model of the crawler's scheduling semantics.

This is the oracle for the crawl-order / seen-set golden fixtures
(SURVEY.md §5.1). It reimplements — single-threaded, deterministic —
exactly what the reference does:

  * FIFO deque scheduling (link_manager.py:177-182)
  * first-discovery-wins dedupe via all_discovered/visited sets
    (link_manager.py:48-55)
  * depth gate at pop (crawler.py:689-691), expansion gate
    internal ∧ depth < max_depth (crawler.py:895-902), children at
    depth+1
  * max_urls budget counted in crawled pages (crawler.py:680-681)
  * admission predicate (crawler.py:1139-1179)
  * document-order link iteration (link_manager.py:24: soup.find_all('a'))

North-star canonicalization is applied identically to both engines
before any comparison (the reference itself only fragment-strips;
the superset canonicalization is part of the graft contract).

The threaded reference's *completion* order is nondeterministic; the
deterministic contract both engines share is scheduling order = BFS
discovery order, which is what this single-threaded model pins.
"""

from __future__ import annotations

import fnmatch
import re
from collections import deque
from urllib.parse import urlparse

from .functions.html import parse_document
from .functions.urls import _canonicalize_py


def _strip_www(netloc: str) -> str:
    return netloc.replace("www.", "", 1)


class ReferenceModel:
    def __init__(
        self,
        corpus: dict[str, dict],
        robots: dict[str, list[str]] | None = None,
        max_depth: int = 3,
        max_urls: int = 1000,
        crawl_external: bool = False,
        respect_robots: bool = True,
        include_extensions: tuple = ("html", "htm", "php", "asp", "aspx", "jsp"),
        exclude_extensions: tuple = ("pdf", "doc", "docx", "zip", "exe", "dmg"),
        include_patterns: tuple = (),
        exclude_patterns: tuple = (),
        sitemaps: dict[str, dict] | None = None,
        robots_sitemaps: dict[str, list[str]] | None = None,
        discover_sitemaps: bool = False,
        single_page_if_path: bool = False,
    ):
        self.corpus = corpus
        self.robots = robots or {}
        self.max_depth = max_depth
        self.max_urls = max_urls
        self.crawl_external = crawl_external
        self.respect_robots = respect_robots
        self.include_extensions = include_extensions
        self.exclude_extensions = exclude_extensions
        self.include_patterns = include_patterns
        self.exclude_patterns = exclude_patterns
        self.sitemaps = sitemaps or {}
        self.robots_sitemaps = robots_sitemaps or {}
        self.discover_sitemaps = discover_sitemaps
        self.single_page_if_path = single_page_if_path
        self.base_domain = ""

    def _should_crawl(self, url: str) -> bool:
        p = urlparse(url)
        if not self.crawl_external:
            if _strip_www(p.netloc) != _strip_www(self.base_domain):
                return False
        if self.respect_robots:
            for g in self.robots.get(p.netloc, []):
                if fnmatch.fnmatch(p.path, g):
                    return False
        path = p.path.lower()
        if "." in path:
            ext = path.split(".")[-1]
            if ext in self.exclude_extensions:
                return False
            if self.include_extensions and ext not in self.include_extensions:
                return False
        for pat in self.exclude_patterns:
            if pat and re.search(pat, url):
                return False
        if self.include_patterns:
            if not any(p_ and re.search(p_, url) for p_ in self.include_patterns):
                return False
        return True

    def crawl(self, seeds: list[str]) -> dict:
        first = seeds[0] if "://" in seeds[0] else f"https://{seeds[0]}"
        self.base_domain = urlparse(_canonicalize_py(first)).netloc
        if self.single_page_if_path and urlparse(first).path not in ("", "/"):
            self.max_depth = 0  # single-page mode (crawler.py:218-222)

        q: deque[tuple[str, int]] = deque()
        all_discovered: set[str] = set()
        visited: set[str] = set()
        order: list[tuple[str, int]] = []  # (url, depth) in crawl order

        for s in seeds:
            u = _canonicalize_py(s)
            if u not in all_discovered and u not in visited:
                all_discovered.add(u)
                q.append((u, 0))

        # sitemap discovery after seeds (crawler.py:245-252): depth 0,
        # admission-gated, add_url membership dedupe
        if self.discover_sitemaps:
            from .operators.sitemap import discover_sitemap_locs

            for loc in discover_sitemap_locs(
                self.sitemaps, self.robots_sitemaps, seeds
            ):
                u = _canonicalize_py(loc)
                if u in all_discovered or u in visited:
                    continue
                if not self._should_crawl(u):
                    continue
                all_discovered.add(u)
                q.append((u, 0))

        links_rows: list[dict] = []
        while q and len(order) < self.max_urls:
            url, depth = q.popleft()
            if depth > self.max_depth:
                continue
            visited.add(url)
            order.append((url, depth))

            row = self.corpus.get(url)
            if not row or row["status_code"] != 200 or "html" not in row["content_type"] or not row["raw_html"]:
                continue
            parsed = parse_document(url, row["raw_html"], self.base_domain)
            for l in parsed["links"]:
                links_rows.append({"source_url": url, **l})
            page_internal = _strip_www(urlparse(url).netloc) == _strip_www(self.base_domain)
            should_extract = (page_internal or self.crawl_external) and depth < self.max_depth
            if not should_extract:
                continue
            for l in parsed["links"]:
                target = _canonicalize_py(l["target_url"])
                if target == url:
                    continue
                if target in visited or target in all_discovered:
                    continue
                if not self._should_crawl(target):
                    continue
                all_discovered.add(target)
                q.append((target, depth + 1))

        return {
            "order": order,
            "seen": all_discovered,
            "links": links_rows,
        }
