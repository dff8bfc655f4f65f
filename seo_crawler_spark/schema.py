"""Canonical schemas — the single source of truth for every table.

The reference keeps its row shape as hand-maintained dict literals
duplicated in three places (reference: src/crawler.py:824-867, :935-979,
src/core/seo_extractor.py:258-304) mirrored in SQLite DDL
(src/crawl_db.py:46-92). Here each dataset has exactly one StructType.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Interleaved document spans (BASELINE.json input_hint):
#   (doc_id string, spans array<struct<kind,text,media_ref,offset>>)
# kind ∈ {title, meta_description, h1, h2, h3, text, link, media,
#         script_jsonld, script_analytics}
# ---------------------------------------------------------------------------
SPAN_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("offset", T.IntegerType(), False),
    ]
)

SPANS_TYPE = T.ArrayType(SPAN_SCHEMA)

# The interleaved-documents corpus table ("fetch" target — there is no live
# network; fetching a URL = joining the frontier against this table).
CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),  # canonical URL
        T.StructField("spans", SPANS_TYPE, False),
        T.StructField("host", T.StringType(), False),
        T.StructField("status_code", T.IntegerType(), False),
        T.StructField("content_type", T.StringType(), False),
        T.StructField("size", T.LongType(), False),
        T.StructField("response_time_ms", T.DoubleType(), False),
        T.StructField("raw_html", T.StringType(), False),
    ]
)

# ---------------------------------------------------------------------------
# Pages — one row per fetched URL (~35 SEO fields; reference row shape
# src/crawler.py:824-867, DDL src/crawl_db.py:46-92).
# ---------------------------------------------------------------------------
IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("src", T.StringType(), True),
        T.StructField("alt", T.StringType(), True),
        T.StructField("width", T.StringType(), True),
        T.StructField("height", T.StringType(), True),
    ]
)

HREFLANG_SCHEMA = T.StructType(
    [
        T.StructField("lang", T.StringType(), True),
        T.StructField("url", T.StringType(), True),
    ]
)

ANALYTICS_SCHEMA = T.StructType(
    [
        T.StructField("google_analytics", T.BooleanType(), False),
        T.StructField("gtag", T.BooleanType(), False),
        T.StructField("ga4_id", T.StringType(), True),
        T.StructField("gtm_id", T.StringType(), True),
        T.StructField("facebook_pixel", T.BooleanType(), False),
        T.StructField("hotjar", T.BooleanType(), False),
        T.StructField("mixpanel", T.BooleanType(), False),
    ]
)

PAGE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("status_code", T.IntegerType(), True),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("size", T.LongType(), True),
        T.StructField("is_internal", T.BooleanType(), True),
        T.StructField("depth", T.IntegerType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("meta_description", T.StringType(), True),
        T.StructField("h1", T.StringType(), True),
        T.StructField("h2", T.ArrayType(T.StringType()), True),
        T.StructField("h3", T.ArrayType(T.StringType()), True),
        T.StructField("word_count", T.IntegerType(), True),
        T.StructField("meta_tags", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("og_tags", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("twitter_tags", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("canonical_url", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("charset", T.StringType(), True),
        T.StructField("viewport", T.StringType(), True),
        T.StructField("robots", T.StringType(), True),
        T.StructField("author", T.StringType(), True),
        T.StructField("keywords", T.StringType(), True),
        T.StructField("generator", T.StringType(), True),
        T.StructField("theme_color", T.StringType(), True),
        T.StructField("json_ld", T.ArrayType(T.StringType()), True),  # JSON strings
        T.StructField("analytics", ANALYTICS_SCHEMA, True),
        T.StructField("images", T.ArrayType(IMAGE_SCHEMA), True),
        T.StructField(
            "schema_org",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("type", T.StringType(), True),
                        T.StructField(
                            "properties", T.MapType(T.StringType(), T.StringType()), True
                        ),
                    ]
                )
            ),
            True,
        ),
        T.StructField("external_links", T.IntegerType(), True),
        T.StructField("internal_links", T.IntegerType(), True),
        T.StructField("response_time", T.DoubleType(), True),
        T.StructField("hreflang", T.ArrayType(HREFLANG_SCHEMA), True),
        T.StructField("linked_from", T.ArrayType(T.StringType()), True),
        T.StructField("error", T.StringType(), True),
        # engine bookkeeping (crawl-order contract)
        T.StructField("wave", T.IntegerType(), True),
        T.StructField("seq", T.LongType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Link graph edges (reference: src/core/link_manager.py:98-121,
# DDL src/crawl_db.py:95-113).
# ---------------------------------------------------------------------------
LINK_SCHEMA = T.StructType(
    [
        T.StructField("source_url", T.StringType(), False),
        T.StructField("target_url", T.StringType(), False),
        T.StructField("anchor_text", T.StringType(), True),
        T.StructField("is_internal", T.BooleanType(), True),
        T.StructField("target_domain", T.StringType(), True),
        T.StructField("target_status", T.IntegerType(), True),
        T.StructField("placement", T.StringType(), True),
        T.StructField("anchor_pos", T.IntegerType(), True),  # document order
    ]
)

# ---------------------------------------------------------------------------
# Issues (reference: src/core/issue_detector.py:13,16-40,
# DDL src/crawl_db.py:116-131).
# ---------------------------------------------------------------------------
ISSUE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("type", T.StringType(), False),  # error|warning|info
        T.StructField("category", T.StringType(), False),
        T.StructField("issue", T.StringType(), False),
        T.StructField("details", T.StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Frontier — partitioned replacement for the reference's FIFO deque
# (src/core/link_manager.py:13). (wave, seq) is the crawl-order contract:
# depth-major BFS, within a page = anchor document order.
# ---------------------------------------------------------------------------
FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),  # canonical
        T.StructField("url_hash", T.LongType(), False),  # xxhash64(url)
        T.StructField("host", T.StringType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("wave", T.IntegerType(), False),  # discovery wave
        T.StructField("seq", T.LongType(), False),  # global BFS order
    ]
)

SEEN_SCHEMA = T.StructType(
    [
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("wave", T.IntegerType(), False),
    ]
)

ROBOTS_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("disallow_globs", T.ArrayType(T.StringType()), True),
        T.StructField("crawl_delay", T.DoubleType(), True),
        T.StructField("sitemap_urls", T.ArrayType(T.StringType()), True),
    ]
)
