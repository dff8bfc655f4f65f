"""DUST rule mining — detecting URL parameters that Don't affect content.

"DUST: Different URLs with Similar Text" (Bar-Yossef, Keidar, Schonfeld,
WWW 2007) and the follow-up URL-normalization-for-dedup literature
(Agarwal et al., WWW 2009) mine rewrite rules from crawl output: if
stripping a query parameter never merges two URLs with *different*
content but does merge many same-content aliases, the crawler should
canonicalize it away — every alias fetched is a wasted request AND a
duplicate document downstream. The reference crawler hard-codes its
alias rules (fragment strip, www strip — functions/urls.py cites them);
this operator LEARNS parameter rules from evidence, which is what a
10^10-frontier crawl needs because alias schemes are per-site
(sessionid=, utm_*, ref=, PHPSESSID...).

Rule decision per parameter p over the (url, content_hash) crawl table:

* strip p from every URL → group by the stripped key;
* ``support``    = Σ_groups (distinct_urls − 1)   — aliases the rule
  would collapse (merges achieved);
* ``violations`` = Σ_groups (distinct_contents − 1) — merges that mix
  different content (counterexamples);
* ``safe`` ⇔ violations = 0 AND support ≥ DUST_MIN_SUPPORT.

All three are exact integers, so the verdict is bit-identical
cross-engine. Three outcomes are exercised by the synthesized corpus:
session-style params (safe, high support), the content-selecting ``id``
param (violations > 0 → unsafe), and a param whose strip never merges
anything (support 0 → insufficient evidence, not flagged safe).

Scale shape: the input explodes each URL row once per parameter
(|params| ≤ a few dozen on real crawls — bounded fan-out, row-local),
then ONE shuffle groups (param, stripped_key) — posting-list
discipline: the group row carries two exact distinct-counts computed
by a pre-collapse on (param, key, url, content), all map-side
combinable — and the final per-param rollup aggregates a frame with
one row per (param, stripped key), far smaller than the crawl. No
pairwise stage anywhere: the classic DUST pair-enumeration is replaced
by group-cardinality arithmetic (distinct_urls − 1 counts exactly the
spanning-tree merges pair-mining would find).

URLs are synthesized deterministically from `documents` (the
crawl_queries.py convention) so the DuckDB oracle sees byte-identical
input: each doc yields DUST_VARIANTS alias URLs sharing the doc's
content hash; two docs share each base path so the ``id`` param is
load-bearing.

Reference parity: the reference's URL cleaning (crawler.py clean_url,
cited at functions/urls.py:75) strips fragments unconditionally; this
operator is the evidence-driven generalization (SURVEY §2.7 URL-clean
family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load

DUST_VARIANTS = 3        # alias URLs synthesized per document
DUST_MIN_SUPPORT = 10    # merges required before a rule is trusted

# parameter names in canonical order; the stripped key concatenates the
# OTHER three values positionally, so both engines build identical keys
# without string-rewriting a URL.
_PARAMS = ("id", "page", "ref", "sess")


def _urls(docs: DataFrame) -> DataFrame:
    """(url, content, id/page/ref/sess, base): DUST_VARIANTS alias rows
    per doc. Each content-irrelevant param varies in ISOLATION (v=1
    changes only sess, v=2 changes only ref) so a single-param strip
    has merges to find; id selects between the two docs sharing a base
    path (content-relevant — stripping it merges different content);
    page is a function of the base path (strip merges nothing →
    insufficient evidence)."""
    v = F.explode(
        F.sequence(F.lit(0), F.lit(DUST_VARIANTS - 1))
    ).alias("v")
    d = docs.select("doc_id", "text", v)
    b = (F.col("doc_id") / 2).cast("long")
    base = F.concat(F.lit("/p/"), b.cast("string"))
    p_id = (F.col("doc_id") % 2).cast("string")
    p_page = (b % 7).cast("string")
    p_ref = F.when(F.col("v") == 2, 1).otherwise(0).cast("string")
    p_sess = (
        (b * 31 + F.when(F.col("v") == 1, 17).otherwise(0)) % 101
    ).cast("string")
    return d.select(
        F.concat(
            base,
            F.lit("?id="), p_id,
            F.lit("&page="), p_page,
            F.lit("&ref="), p_ref,
            F.lit("&sess="), p_sess,
        ).alias("url"),
        F.md5("text").alias("content"),
        base.alias("base"),
        p_id.alias("id"),
        p_page.alias("page"),
        p_ref.alias("ref"),
        p_sess.alias("sess"),
    )


_URLS_SQL = f"""
SELECT '/p/' || CAST(doc_id // 2 AS VARCHAR)
         || '?id='   || CAST(doc_id % 2 AS VARCHAR)
         || '&page=' || CAST((doc_id // 2) % 7 AS VARCHAR)
         || '&ref='  || CAST(CASE WHEN v = 2 THEN 1 ELSE 0 END AS VARCHAR)
         || '&sess=' || CAST(((doc_id // 2) * 31
                              + CASE WHEN v = 1 THEN 17 ELSE 0 END) % 101 AS VARCHAR) AS url,
       md5(text) AS content,
       '/p/' || CAST(doc_id // 2 AS VARCHAR) AS base,
       CAST(doc_id % 2 AS VARCHAR)        AS id,
       CAST((doc_id // 2) % 7 AS VARCHAR) AS page,
       CAST(CASE WHEN v = 2 THEN 1 ELSE 0 END AS VARCHAR) AS ref,
       CAST(((doc_id // 2) * 31
             + CASE WHEN v = 1 THEN 17 ELSE 0 END) % 101 AS VARCHAR) AS sess
FROM documents, (SELECT unnest(range({DUST_VARIANTS})) AS v)
"""


def dust_param_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(param, n_groups, merged_groups, support, violations, safe):
    learned strip-this-parameter rules; see module docstring."""
    urls = _urls(load(spark, "documents", sf_dir).select("doc_id", "text"))
    kept = {
        p: F.concat_ws(
            "&", *[F.col(q) for q in _PARAMS if q != p]
        )
        for p in _PARAMS
    }
    stack = ", ".join(f"'{p}', skey_{p}" for p in _PARAMS)
    exploded = urls.select(
        "url",
        "content",
        *[
            F.concat(F.col("base"), F.lit("?"), kept[p]).alias(f"skey_{p}")
            for p in _PARAMS
        ],
    ).selectExpr(
        "url",
        "content",
        f"stack({len(_PARAMS)}, {stack}) AS (param, skey)",
    )
    groups = (
        # pre-collapse to distinct rows so the counts below are exact
        # distincts computed by ordinary map-side-combinable aggs
        exploded.select("param", "skey", "url", "content")
        .distinct()
        .groupBy("param", "skey")
        .agg(
            F.countDistinct("url").alias("n_urls"),
            F.countDistinct("content").alias("n_contents"),
        )
    )
    return (
        groups.groupBy("param")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum(
                F.when(F.col("n_urls") >= 2, 1).otherwise(0)
            ).alias("merged_groups"),
            F.sum(F.col("n_urls") - 1).alias("support"),
            F.sum(F.col("n_contents") - 1).alias("violations"),
        )
        .select(
            "param",
            "n_groups",
            "merged_groups",
            "support",
            "violations",
            (
                (F.col("violations") == 0)
                & (F.col("support") >= DUST_MIN_SUPPORT)
            ).alias("safe"),
        )
        .orderBy("param")
    )


def dust_param_rules_sql() -> str:
    strips = " UNION ALL ".join(
        "SELECT url, content, '{p}' AS param, base || '?' || {key} AS skey FROM urls".format(
            p=p,
            key=" || '&' || ".join(q for q in _PARAMS if q != p),
        )
        for p in _PARAMS
    )
    return f"""
WITH urls AS MATERIALIZED ({_URLS_SQL}),
exploded AS ({strips}),
groups AS (
  SELECT param, skey,
         count(DISTINCT url) AS n_urls,
         count(DISTINCT content) AS n_contents
  FROM exploded GROUP BY param, skey
)
SELECT param,
       count(*) AS n_groups,
       sum(CASE WHEN n_urls >= 2 THEN 1 ELSE 0 END)::BIGINT AS merged_groups,
       sum(n_urls - 1)::BIGINT AS support,
       sum(n_contents - 1)::BIGINT AS violations,
       (sum(n_contents - 1) = 0
        AND sum(n_urls - 1) >= {DUST_MIN_SUPPORT}) AS safe
FROM groups GROUP BY param ORDER BY param
"""


def dust_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the MINED safe rules — close the mine→apply loop: strip
    every parameter `dust_param_rules` certified safe from every crawl
    URL, group aliases under their canonical form, and report per
    canonical URL how many fetches the rules collapse plus the soundness
    witness (n_contents must be 1 under safe rules — the rule-safety
    definition, re-checked on the applied result rather than assumed).
    This is the canonicalization table a frontier consults before
    enqueueing (the evidence-driven upgrade of the reference's
    hard-coded clean_url; functions/urls.py:75 cites it).

    The safe-parameter set is a |params|-row driver constant (the
    trained-quantizer pattern: a learned rule table IS a model); the
    apply pass itself is ROW-LOCAL key construction + ONE
    (canonical-url) aggregate with exact distinct counts — no joins
    against the rule frame in the hot path."""
    rules = dust_param_rules(spark, sf_dir).collect()
    safe = {r["param"] for r in rules if r["safe"]}
    kept = [p for p in _PARAMS if p not in safe]
    urls = _urls(load(spark, "documents", sf_dir).select("doc_id", "text"))
    canon = F.concat(
        F.col("base"),
        F.lit("?"),
        F.concat_ws(
            "&",
            *[F.concat(F.lit(f"{p}="), F.col(p)) for p in kept],
        ),
    )
    return (
        urls.select(canon.alias("curl"), "url", "content")
        .groupBy("curl")
        .agg(
            F.countDistinct("url").alias("n_aliases"),
            F.countDistinct("content").alias("n_contents"),
        )
        .select(
            "curl",
            "n_aliases",
            "n_contents",
            (F.col("n_aliases") - 1).alias("saved_fetches"),
            (F.col("n_contents") == 1).alias("clean"),
        )
        .orderBy("curl")
    )


def dust_apply_sql() -> str:
    rules = dust_param_rules_sql()
    # the safe set is data-dependent; mirror the driver-constant pattern
    # with scalar subqueries per parameter (|params| of them)
    keep_frags = []
    for p in _PARAMS:
        keep_frags.append(
            f"CASE WHEN (SELECT safe FROM rules WHERE param = '{p}') "
            f"THEN NULL ELSE '{p}=' || {p} END"
        )
    return f"""
WITH u2 AS MATERIALIZED ({_URLS_SQL}),
rules AS MATERIALIZED ({rules}),
canon AS (
  SELECT base || '?' || concat_ws('&', {', '.join(keep_frags)}) AS curl,
         url, content
  FROM u2
)
SELECT curl,
       count(DISTINCT url) AS n_aliases,
       count(DISTINCT content) AS n_contents,
       (count(DISTINCT url) - 1)::BIGINT AS saved_fetches,
       count(DISTINCT content) = 1 AS clean
FROM canon GROUP BY curl ORDER BY curl
"""
