"""Sitemap discovery (reference: src/core/sitemap_parser.py:15-132).

Traversal is inherently sequential recursion over a per-host dimension
measured in KB — it runs driver-side (as the reference runs it on one
thread); everything downstream (admission, dedupe, seq assignment) is
Spark. Semantics pinned to the reference:

  * probe 4 well-known paths, then robots.txt ``Sitemap:`` lines
    (sitemap_parser.py:24-36)
  * recurse sitemapindex → children in document order, depth-first,
    max depth 10 (:68-132)
  * resulting URLs enter the frontier at depth 0 through the admission
    predicate (crawler.py:305-320), AFTER the seeds (crawler.py:245-252)
"""

from __future__ import annotations

WELL_KNOWN = (
    "/sitemap.xml",
    "/sitemap_index.xml",
    "/sitemaps.xml",
    "/sitemap/sitemap.xml",
)
MAX_DEPTH = 10


def discover_sitemap_locs(
    sitemaps: dict[str, dict],
    robots_sitemaps: dict[str, list[str]],
    base_urls: list[str],
) -> list[str]:
    """All page URLs found via sitemap discovery for the given base
    URLs, in reference traversal order (duplicates preserved — the
    frontier's first-discovery-wins dedupe handles them, like add_url).

    ``sitemaps``: sitemap_url -> {kind, locs};
    ``robots_sitemaps``: host -> declared sitemap URLs.
    """
    from urllib.parse import urlparse

    out: list[str] = []

    def parse(sitemap_url: str, depth: int) -> None:
        if depth > MAX_DEPTH:
            return
        doc = sitemaps.get(sitemap_url)
        if doc is None:
            return
        if doc["kind"] == "sitemapindex":
            for child in doc["locs"]:
                parse(child, depth + 1)
        else:
            out.extend(doc["locs"])

    for base in base_urls:
        p = urlparse(base if "://" in base else f"https://{base}")
        scheme = (p.scheme or "https").lower()
        host = (p.hostname or "").lower()
        roots = [f"{scheme}://{host}{path}" for path in WELL_KNOWN]
        roots += robots_sitemaps.get(host, [])
        for r in roots:
            parse(r, depth=1)
    return out


def sitemaps_df_to_dict(sitemaps_df) -> dict[str, dict]:
    return {
        r["sitemap_url"]: {"kind": r["kind"], "locs": list(r["locs"] or [])}
        for r in sitemaps_df.collect()
    }


def robots_df_to_sitemap_dict(robots_df) -> dict[str, list[str]]:
    return {
        r["host"]: list(r["sitemap_urls"] or []) for r in robots_df.collect()
    }
