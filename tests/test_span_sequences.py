"""Span-sequence golden fixtures — the input-hint invariant.

The interleaved-document contract is
``spans: array<struct<kind,text,media_ref,offset>>`` with spans emitted
in document order. These fixtures freeze the exact (offset, kind, text,
media_ref) sequences for tricky HTML — interleaved text+media, nested
anchors, malformed/unclosed tags, entity references — and additionally
assert the Arrow-batched pipeline (extract_pages via mapInPandas)
reproduces the pure-Python extractor span-for-span, so the vectorized
path can never drift from the per-document semantics.
"""

from __future__ import annotations

from seo_crawler_spark.functions.html import parse_document

DOCS = {
    "interleaved": """<html lang="en"><head><title> Page &amp; Title </title>
<meta name="description" content="A desc"><link rel="canonical" href="https://ex.com/c">
<script type="application/ld+json">{"@type":"Thing"}</script></head>
<body><h1>Main</h1><p>First para with <a href="/rel">inner link</a> tail.</p>
<img src="//cdn.ex.com/a.png" alt="Alt A"><h2>Sec</h2>
<p>Second <img src="/img/b.jpg" alt=""> mixed</p>
<a href="https://other.com/x"><img src="pic.gif" alt="IconAlt">Go</a>
<h3>Deep</h3><p></p><p>   </p>
<script>gtag('config','G-ABC');</script>
</body></html>""",
    "malformed": """<title>T</title><p>open para <h2>H2 inside</h2>
<a href="#frag">skip</a><a href="mailto:x@y">skip</a><a href="tel:1">skip</a>
<a href="javascript:void(0)">js</a><img alt="noref"><img src="x.png">
<p>tail""",
    "entities": """<html><body><h1>A &lt; B &amp; C</h1><p>caf&eacute; &#8212; dash</p>
<a href="q?b=2&amp;a=1">Amp link</a></body></html>""",
}

# frozen (offset, kind, text, media_ref) — reviewed by hand:
#  * completed inner elements (anchor, img) emit before their container's
#    text span, exactly as a tree-walk would complete them first
#  * empty/whitespace-only <p> and alt-less src-less <img> emit nothing
#  * #/mailto:/tel: anchors are dropped by the link prefilter
#  * EOF flushes an unclosed trailing element (malformed 'tail')
GOLDEN = {
    "interleaved": [
        (0, "title", "Page & Title", None),
        (1, "meta_description", "A desc", None),
        (2, "script_jsonld", '{"@type":"Thing"}', None),
        (3, "h1", "Main", None),
        (4, "link", "inner link", "https://ex.com/rel"),
        (5, "text", "First para with inner link tail.", None),
        (6, "media", "Alt A", "https://cdn.ex.com/a.png"),
        (7, "h2", "Sec", None),
        (8, "media", "", "https://ex.com/img/b.jpg"),
        (9, "text", "Second  mixed", None),
        (10, "media", "IconAlt", "https://ex.com/pic.gif"),
        (11, "link", "Go", "https://other.com/x"),
        (12, "h3", "Deep", None),
        (13, "script_analytics", "gtag('config','G-ABC');", None),
    ],
    "malformed": [
        (0, "title", "T", None),
        (1, "h2", "H2 inside", None),
        (2, "link", "js", "javascript://void(0)"),
        (3, "media", "", "https://ex.com/x.png"),
        (4, "text", "tail", None),
    ],
    "entities": [
        (0, "h1", "A < B & C", None),
        (1, "text", "café — dash", None),
        (2, "link", "Amp link", "https://ex.com/q?b=2&a=1"),
    ],
}


def _seq(spans):
    return [(s["offset"], s["kind"], s["text"], s["media_ref"]) for s in spans]


def test_span_sequences_match_golden():
    for name, html in DOCS.items():
        d = parse_document(f"https://ex.com/{name}", html, "ex.com")
        assert _seq(d["spans"]) == GOLDEN[name], name


def test_arrow_pipeline_spans_equal_pure_python(spark):
    """extract_pages (mapInPandas over Arrow batches) must reproduce the
    pure-Python extractor's span sequence exactly, per document."""
    from seo_crawler_spark.operators.extract import extract_pages

    rows = [
        (
            f"https://ex.com/{name}", 200, "text/html", len(html), 0, 0, i,
            "ex.com", 1.0, None, html,
        )
        for i, (name, html) in enumerate(sorted(DOCS.items()))
    ]
    fetched = spark.createDataFrame(
        rows,
        "url string, status_code int, content_type string, size long, "
        "depth int, wave int, seq long, host string, response_time double, "
        "error string, raw_html string",
    )
    got = {
        r["url"]: [
            (s["offset"], s["kind"], s["text"], s["media_ref"]) for s in r["spans"]
        ]
        for r in extract_pages(fetched, "ex.com").collect()
    }
    for name in DOCS:
        assert got[f"https://ex.com/{name}"] == GOLDEN[name], name


def test_offsets_are_dense_and_ordered():
    """offset == position in the sequence, for every fixture (the order
    carrier of the span contract)."""
    for name, html in DOCS.items():
        spans = parse_document(f"https://ex.com/{name}", html, "ex.com")["spans"]
        assert [s["offset"] for s in spans] == list(range(len(spans))), name
