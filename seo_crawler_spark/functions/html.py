"""Vectorized HTML → (page fields, spans, links) extraction.

One html.parser pass per document, executed batch-at-a-time inside
mapInPandas (Arrow transfer, no per-row Python UDFs — north-star
requirement). Semantics mirror the reference extractor:

  * title/meta_description/first-h1, h2/h3 capped at 10
    (reference: src/core/seo_extractor.py:14-29)
  * word_count = len(re.findall(r'\\w+', all_text))
    (reference: seo_extractor.py:32-34)
  * meta/og/twitter tag maps (:52-103), canonical (:77-79),
    charset sniff (:41-49), hreflang (:205-216), JSON-LD (:105-115),
    analytics regexes (:118-156), images capped at 20 with src
    resolution rules (:159-182), internal/external link counts
    (:184-202)
  * link extraction + placement ancestor walk
    (reference: src/core/link_manager.py:22-156)

The span sequence is the interleaved text+media document-order record
(input_hint invariant: span-sequence equality on kind/text/media_ref/
order vs the corpus ground truth).
"""

from __future__ import annotations

import json
import re
from html.parser import HTMLParser
from urllib.parse import urljoin, urlparse

_VOID = {"meta", "link", "img", "br", "hr", "input", "source", "area", "base", "col", "embed", "track", "wbr"}
_WORD_RE = re.compile(r"\w+")
_GA_RE = re.compile(
    r"gtag\(|ga\(|GoogleAnalyticsObject|google-analytics\.com|googletagmanager\.com",
    re.IGNORECASE,
)
_GA4_RE = re.compile(r"G-[A-Z0-9]{10}")
_GTM_RE = re.compile(r"GTM-[A-Z0-9]+")
_FB_RE = re.compile(r"fbq\(|facebook\.com/tr", re.IGNORECASE)
_HOTJAR_RE = re.compile(r"hotjar\.com|hj\(", re.IGNORECASE)
_MIXPANEL_RE = re.compile(r"mixpanel\.com|mixpanel\.track", re.IGNORECASE)
_CHARSET_RE = re.compile(r"charset=([^;]+)")


def _clean_url(u: str) -> str:
    """Fragment strip + rebuild (reference: link_manager.py:34-38)."""
    p = urlparse(u)
    out = f"{p.scheme}://{p.netloc}{p.path}"
    if p.query:
        out += f"?{p.query}"
    return out


def _strip_www(netloc: str) -> str:
    return netloc.replace("www.", "", 1)


class _Doc(HTMLParser):
    """Single-pass document model builder."""

    def __init__(self, url: str, base_domain: str):
        super().__init__(convert_charrefs=True)
        self.url = url
        self.base_domain = base_domain
        self.stack: list[tuple[str, str, str]] = []  # (tag, classes, id)
        self.spans: list[dict] = []
        self.links: list[dict] = []
        self.text_parts: list[str] = []
        self.title = ""
        self.meta_description = ""
        self.h1 = ""
        self.h2: list[str] = []
        self.h3: list[str] = []
        self.meta_tags: dict[str, str] = {}
        self.og_tags: dict[str, str] = {}
        self.twitter_tags: dict[str, str] = {}
        self.canonical_url = ""
        self.lang = ""
        self.charset = ""
        self.hreflang: list[dict] = []
        self.json_ld: list[str] = []
        self.images: list[dict] = []
        self.schema_org: list[dict] = []
        self.internal_links = 0
        self.external_links = 0
        self._n_imgs_seen = 0
        # microdata state (seo_extractor.py:218-255): open itemtype
        # scopes + pending itemprop text captures
        self._md_scopes: list[tuple[int, dict]] = []  # (elem_depth, scope)
        self._prop_caps: list[dict] = []
        # capture state
        self._cap: list[str] | None = None
        self._cap_tag = ""
        self._script_type = ""
        self._script_buf: list[str] = []
        self._in_script = False
        self._anchor: dict | None = None
        self._anchor_buf: list[str] = []
        self._anchor_stack_depth = 0

    # -- helpers ------------------------------------------------------
    def _emit(self, kind: str, text: str | None, media_ref: str | None):
        self.spans.append(
            {"kind": kind, "text": text, "media_ref": media_ref, "offset": len(self.spans)}
        )

    def _placement(self) -> str:
        """Ancestor walk, innermost first (link_manager.py:126-156)."""
        for tag, classes, eid in reversed(self.stack):
            cl = classes.lower()
            el = eid.lower()
            if tag == "footer" or "footer" in cl or "footer" in el:
                return "footer"
            if tag in ("nav", "header"):
                return "navigation"
            if any(k in cl or k in el for k in ("nav", "menu", "header")):
                return "navigation"
        return "body"

    def _resolve_img_src(self, src: str) -> str:
        """Reference image src resolution (seo_extractor.py:169-175)."""
        if src.startswith("//"):
            return "https:" + src
        if src.startswith("/"):
            p = urlparse(self.url)
            return f"{p.scheme}://{p.netloc}{src}"
        if not src.startswith(("http://", "https://")):
            return urljoin(self.url, src)
        return src

    # -- parser events --------------------------------------------------
    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        classes = a.get("class", "") or ""
        eid = a.get("id", "") or ""

        if tag == "a":
            href = (a.get("href") or "").strip()
            placement = self._placement()
            self._anchor = {"href": href, "placement": placement}
            self._anchor_buf = []
            self._anchor_stack_depth = len(self.stack)
        elif tag == "img":
            src = a.get("src", "") or ""
            alt = a.get("alt", "") or ""
            if src:
                resolved = self._resolve_img_src(src)
                if self._n_imgs_seen < 20:
                    self.images.append(
                        {
                            "src": resolved,
                            "alt": alt,
                            "width": str(a.get("width", "") or ""),
                            "height": str(a.get("height", "") or ""),
                        }
                    )
                self._n_imgs_seen += 1
                self._emit("media", alt, resolved)
        elif tag == "meta":
            name = (a.get("name") or "").lower()
            prop = a.get("property") or ""
            content = a.get("content", "") or ""
            if "charset" in a:
                self.charset = a.get("charset") or ""
            elif (a.get("http-equiv") or "").lower() == "content-type" and not self.charset:
                m = _CHARSET_RE.search(content)
                if m:
                    self.charset = m.group(1)
            if name:
                self.meta_tags[name] = content
                if name == "description":
                    self.meta_description = content.strip()
                    if self.meta_description:
                        self._emit("meta_description", self.meta_description, None)
                elif name.startswith("twitter:"):
                    self.twitter_tags[name[len("twitter:"):]] = content
            if prop.startswith("og:"):
                self.og_tags[prop[len("og:"):]] = content
        elif tag == "link":
            rel = (a.get("rel") or "").lower()
            if rel == "canonical":
                self.canonical_url = a.get("href", "") or ""
            elif rel == "alternate" and a.get("hreflang"):
                href = a.get("href", "") or ""
                if href:
                    self.hreflang.append({"lang": a["hreflang"], "url": href})
        elif tag == "html":
            self.lang = a.get("lang", "") or ""
        elif tag == "script":
            self._in_script = True
            self._script_type = (a.get("type") or "").lower()
            self._script_buf = []
        elif tag in ("title", "h1", "h2", "h3", "p"):
            self._cap = []
            self._cap_tag = tag

        if tag not in _VOID and tag != "script":
            self.stack.append((tag, classes, eid))

        # -- microdata (reference walks subtrees with find_all; here the
        # same semantics stream: a prop belongs to every scope open at
        # its start tag) --------------------------------------------------
        if "itemtype" in a and (a.get("itemtype") or ""):
            scope = {"type": a["itemtype"], "properties": {}}
            self.schema_org.append(scope)
            if tag not in _VOID:
                self._md_scopes.append((len(self.stack), scope))
        if "itemprop" in a and self._md_scopes:
            name = a.get("itemprop") or ""
            if tag == "meta":
                content = a.get("content", "") or ""
            elif tag == "img":
                content = a.get("src", "") or ""
            elif tag == "a":
                content = a.get("href", "") or ""
            else:
                content = None  # captured from subtree text
            if content is not None:
                if name and content:
                    for _d, scope in self._md_scopes:
                        scope["properties"][name] = content
            elif tag not in _VOID:
                self._prop_caps.append(
                    {
                        "name": name,
                        "elem_depth": len(self.stack),
                        "buf": [],
                        "scopes": [s for _d, s in self._md_scopes],
                    }
                )

    def handle_endtag(self, tag):
        if tag == "script":
            self._end_script()
            self._in_script = False
            return
        if tag == "a" and self._anchor is not None:
            self._end_anchor()
        if self._cap is not None and tag == self._cap_tag:
            self._end_capture(tag)
        # pop to matching open tag (tolerates misnesting)
        for idx in range(len(self.stack) - 1, -1, -1):
            if self.stack[idx][0] == tag:
                del self.stack[idx:]
                # close microdata scopes/props at or below the popped depth
                self._md_scopes = [
                    (d, s) for d, s in self._md_scopes if d <= idx
                ]
                done = [c for c in self._prop_caps if c["elem_depth"] > idx]
                self._prop_caps = [
                    c for c in self._prop_caps if c["elem_depth"] <= idx
                ]
                for c in done:
                    text = "".join(c["buf"]).strip()
                    if c["name"] and text:
                        for scope in c["scopes"]:
                            scope["properties"][c["name"]] = text
                break

    def handle_data(self, data):
        if self._in_script:
            self._script_buf.append(data)
            self.text_parts.append(data)  # soup.get_text() includes script text
            return
        self.text_parts.append(data)
        if self._cap is not None:
            self._cap.append(data)
        if self._anchor is not None:
            self._anchor_buf.append(data)
        for c in self._prop_caps:
            c["buf"].append(data)

    # -- element finalizers ---------------------------------------------
    def close(self):
        """EOF flush: finalize elements left open by sloppy HTML (an
        unclosed trailing <p> or <a> still yields its span/link —
        html.parser never auto-closes, unlike a tree builder)."""
        super().close()
        if self._in_script:
            self._end_script()
            self._in_script = False
        if self._anchor is not None:
            self._end_anchor()
        if self._cap is not None:
            self._end_capture(self._cap_tag)

    def _end_capture(self, tag):
        text = "".join(self._cap).strip()
        self._cap = None
        if tag == "title":
            if not self.title:
                self.title = text
            if text:
                self._emit("title", text, None)
        elif tag == "h1":
            if not self.h1:
                self.h1 = text
            if text:
                self._emit("h1", text, None)
        elif tag == "h2":
            self.h2.append(text)
            if text:
                self._emit("h2", text, None)
        elif tag == "h3":
            self.h3.append(text)
            if text:
                self._emit("h3", text, None)
        elif tag == "p":
            if text:
                self._emit("text", text, None)

    def _end_script(self):
        content = "".join(self._script_buf)
        if self._script_type == "application/ld+json":
            try:
                json.loads(content)
            except (json.JSONDecodeError, TypeError):
                return
            self.json_ld.append(content)
            self._emit("script_jsonld", content, None)
        elif _GA_RE.search(content):
            self._emit("script_analytics", content, None)

    def _end_anchor(self):
        info, self._anchor = self._anchor, None
        href = info["href"]
        anchor_text = "".join(self._anchor_buf).strip()[:100]
        if not href or href.startswith(("#", "mailto:", "tel:")):
            return
        try:
            absolute = urljoin(self.url, href)
            clean = _clean_url(absolute)
            target_netloc = urlparse(absolute).netloc
        except ValueError:
            return
        is_internal = _strip_www(target_netloc) == _strip_www(self.base_domain)
        # link-count prefilter additionally drops javascript:
        # (seo_extractor.py:191)
        if not href.startswith("javascript:"):
            if is_internal:
                self.internal_links += 1
            else:
                self.external_links += 1
        self.links.append(
            {
                "target_url": clean,
                "anchor_text": anchor_text or "(no text)",
                "is_internal": is_internal,
                "target_domain": target_netloc,
                "placement": info["placement"],
                "anchor_pos": len(self.links),
            }
        )
        self._emit("link", anchor_text, clean)


def parse_document(url: str, html: str, base_domain: str | None = None) -> dict:
    """Pure single-document extraction — the unit the Arrow UDFs batch."""
    if base_domain is None:
        base_domain = urlparse(url).netloc
    doc = _Doc(url, base_domain)
    try:
        doc.feed(html or "")
        doc.close()
    except Exception:
        pass  # parser tolerance: keep whatever was extracted (reference
        # swallows parse errors per-page, crawler.py try/except)

    full_text = "".join(doc.text_parts)
    word_count = len(_WORD_RE.findall(full_text))

    analytics = {
        "google_analytics": bool(_GA_RE.search(html or "")),
        "gtag": False,
        "ga4_id": "",
        "gtm_id": "",
        "facebook_pixel": bool(_FB_RE.search(html or "")),
        "hotjar": bool(_HOTJAR_RE.search(html or "")),
        "mixpanel": bool(_MIXPANEL_RE.search(html or "")),
    }
    m = _GA4_RE.search(html or "")
    if m:
        analytics["ga4_id"] = m.group()
        analytics["gtag"] = True
    m = _GTM_RE.search(html or "")
    if m:
        analytics["gtm_id"] = m.group()

    return {
        "title": doc.title,
        "meta_description": doc.meta_description,
        "h1": doc.h1,
        "h2": doc.h2[:10],
        "h3": doc.h3[:10],
        "word_count": word_count,
        "meta_tags": doc.meta_tags,
        "og_tags": doc.og_tags,
        "twitter_tags": doc.twitter_tags,
        "canonical_url": doc.canonical_url,
        "lang": doc.lang,
        "charset": doc.charset,
        "viewport": doc.meta_tags.get("viewport", ""),
        "robots": doc.meta_tags.get("robots", ""),
        "author": doc.meta_tags.get("author", ""),
        "keywords": doc.meta_tags.get("keywords", ""),
        "generator": doc.meta_tags.get("generator", ""),
        "theme_color": doc.meta_tags.get("theme-color", ""),
        "json_ld": doc.json_ld,
        "analytics": analytics,
        "images": doc.images,
        "schema_org": doc.schema_org,
        "internal_links": doc.internal_links,
        "external_links": doc.external_links,
        "hreflang": doc.hreflang,
        "spans": doc.spans,
        "links": doc.links,
    }
