"""Export sinks — CSV scalarization / JSON envelope / XML rows.

Reference semantics: main.py:264-318 (CSV per-field scalarization),
:321-341 (JSON keeps nesting + envelope), :344-358 (XML flat
stringification), :361-393 (links CSV), :431-477 (issues JSON grouped
by URL). All scalarization is column expressions; the writers are
Spark's distributed csv/json/text sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# fields whose CSV form is a scalarization of a nested value
_DEFAULT_FIELDS = [
    "url", "status_code", "title", "meta_description", "h1", "h2", "h3",
    "word_count", "internal_links", "external_links", "images",
    "og_tags", "twitter_tags", "json_ld", "analytics", "canonical_url",
    "lang", "response_time", "size", "depth",
]


def _csv_scalarize(pages: DataFrame, fields: list[str]) -> DataFrame:
    """Reference CSV scalarization rules (main.py:275-314), as exprs."""
    cols = []
    for f in fields:
        if f == "analytics":
            a = F.col("analytics")
            parts = F.array(
                F.when(a["gtag"] | (a["ga4_id"] != ""), F.lit("GA4")),
                F.when(a["google_analytics"], F.lit("GA")),
                F.when(a["gtm_id"] != "", F.lit("GTM")),
                F.when(a["facebook_pixel"], F.lit("FB")),
                F.when(a["hotjar"], F.lit("HJ")),
                F.when(a["mixpanel"], F.lit("MP")),
            )
            cols.append(
                F.array_join(F.filter(parts, lambda x: x.isNotNull()), ", ").alias(f)
            )
        elif f in ("og_tags", "twitter_tags"):
            n = F.size(F.map_keys(F.col(f)))
            cols.append(
                F.when(n > 0, F.concat(n.cast("string"), F.lit(" tags")))
                .otherwise(F.lit("")).alias(f)
            )
        elif f == "json_ld":
            n = F.size(F.col(f))
            cols.append(
                F.when(n > 0, F.concat(n.cast("string"), F.lit(" scripts")))
                .otherwise(F.lit("")).alias(f)
            )
        elif f == "images":
            n = F.size(F.col(f))
            cols.append(
                F.when(n > 0, F.concat(n.cast("string"), F.lit(" images")))
                .otherwise(F.lit("")).alias(f)
            )
        elif f == "internal_links":
            cols.append(
                F.concat(F.coalesce(F.col(f), F.lit(0)).cast("string"),
                         F.lit(" internal links")).alias(f)
            )
        elif f == "external_links":
            cols.append(
                F.concat(F.coalesce(F.col(f), F.lit(0)).cast("string"),
                         F.lit(" external links")).alias(f)
            )
        elif f in ("h2", "h3"):
            first3 = F.array_join(F.slice(F.col(f), 1, 3), ", ")
            cols.append(
                F.when(F.size(F.col(f)) > 3, F.concat(first3, F.lit("...")))
                .otherwise(first3).alias(f)
            )
        else:
            cols.append(F.col(f).cast("string").alias(f))
    return pages.select(*cols)


def export_pages_csv(pages: DataFrame, path: str, fields: list[str] | None = None) -> None:
    df = _csv_scalarize(pages, fields or _DEFAULT_FIELDS)
    df.write.mode("overwrite").option("header", "true").csv(path)


def export_pages_json(pages: DataFrame, path: str, fields: list[str] | None = None) -> None:
    """Nested values kept intact (main.py:321-341); envelope metadata
    lives in the manifest sidecar, not per-line (JSONL at scale)."""
    fields = fields or _DEFAULT_FIELDS
    pages.select(*fields).write.mode("overwrite").json(path)


def export_pages_xml(pages: DataFrame, path: str, fields: list[str] | None = None) -> None:
    """Flat stringification per field (main.py:344-358) via to_xml-style
    concat (no spark-xml jar offline — a text sink of <url> rows)."""
    fields = fields or _DEFAULT_FIELDS
    parts = [F.lit("<url>")]
    for f in fields:
        parts += [
            F.lit(f"<{f}>"),
            F.coalesce(F.col(f).cast("string"), F.lit("")),
            F.lit(f"</{f}>"),
        ]
    parts.append(F.lit("</url>"))
    pages.select(F.concat(*parts).alias("value")).write.mode("overwrite").text(path)


def export_links_csv(links: DataFrame, path: str) -> None:
    """Fixed columns (main.py:361-393)."""
    links.select(
        "source_url", "target_url", "anchor_text", "is_internal",
        "target_domain", "target_status", "placement",
    ).write.mode("overwrite").option("header", "true").csv(path)


def issues_grouped_json(issues: DataFrame) -> DataFrame:
    """Issues grouped per URL (main.py:451-477 JSON export shape)."""
    return issues.groupBy("url").agg(
        F.collect_list(
            F.struct("type", "category", "issue", "details")
        ).alias("issues"),
        F.count(F.lit(1)).alias("issue_count"),
    )


def status_feed(df: DataFrame, since: int) -> DataFrame:
    """Incremental status feed: the reference slices in-memory arrays by
    client offsets (main.py:790-796); with a monotonic ``seq`` column the
    same contract is a predicate-pushed filter."""
    return df.filter(F.col("seq") > since)


def visualization_projection(pages: DataFrame, links: DataFrame, node_cap: int = 500):
    """Graph viz projection (main.py:826-890): first ``node_cap`` pages in
    crawl order become nodes; internal edges with both endpoints
    materialized, deduped."""
    nodes = (
        pages.orderBy("seq")
        .limit(node_cap)
        .select(
            F.col("url"),
            F.col("seq").alias("node_id"),
            "status_code", "title", "depth",
        )
    )
    n1 = nodes.select(F.col("url").alias("__src"), F.col("node_id").alias("source_id"))
    n2 = nodes.select(F.col("url").alias("__dst"), F.col("node_id").alias("target_id"))
    edges = (
        links.filter(F.col("is_internal"))
        .join(n1, links.source_url == F.col("__src"))
        .join(n2, links.target_url == F.col("__dst"))
        .select("source_id", "target_id")
        .dropDuplicates(["source_id", "target_id"])
    )
    return nodes, edges
