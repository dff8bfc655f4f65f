"""Corpus-level statistics for a training-data pipeline.

Three operators a 100 TB curation run needs beyond per-doc scoring:

- substring-level duplication (fraction of a document's token 8-grams
  that also appear in other documents — the signal behind exact
  substring dedup, Lee et al. 2022 "Deduplicating Training Data Makes
  Language Models Better"),
- per-source (host) rollups (docs, bytes, language spread, intra-source
  exact-dup rate — the table a curator reads to keep or drop a source),
- exact per-language length quantiles (the cutoffs used to pick
  min/max-length filters per language).

All plans are equi-join + map-side-combined aggregations; no windows
over the full corpus, no cartesian products. Every query has a DuckDB
oracle twin built from the same md5-derived hashes, so the whole
pipeline — not just the final aggregate — is cross-engine checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import (
    BPE_RE,
    BPE_SQL,
    MD5INT_SQL,
    MOD,
    TOKENS_SQL,
    md5int,
    shingles,
    shingles_sql,
    tokens,
)
from ..sources.tables import load
from ..session import SCAN_FANOUT
from .dedup import _token_arrays

# ---------------------------------------------------------------------------
# substring-level duplication
# ---------------------------------------------------------------------------

SUB_NGRAM = 8        # window length in tokens (Lee et al. use 50 BPE tokens;
                     # 8 word-tokens is the same idea at testdata doc sizes)
SUB_DUP_FRAC = 0.2   # flag docs with >20% duplicated windows


def substring_dup_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document fraction of token 8-gram windows whose hash occurs
    in >= 2 distinct documents, plus a dup flag at >20%.

    Scale shape (the point of doing this distributed):
      1. gram construction is ROW-LOCAL (shingles over the token array —
         no shuffle to form windows);
      2. occurrences collapse to (doc_id, h, c) with a map-side-combined
         count BEFORE any join, so the join input is bounded by distinct
         grams per doc, not total tokens;
      3. document frequency per hash is a second map-side-combined agg
         over the distinct (doc_id, h) pairs;
      4. one hash equi-join occ⋈df on h, then a per-doc agg.
    Worst case is a boilerplate gram shared by d docs — it contributes d
    join rows (linear), never d² pairs, because this computes per-doc
    fractions, not pairs. Documents shorter than SUB_NGRAM tokens have
    no windows and drop out (same in the oracle)."""
    d = _token_arrays(load(spark, "documents", sf_dir))
    occ = d.select(
        "doc_id",
        F.explode(shingles(F.col("tok"), SUB_NGRAM)).alias("g"),
    ).select("doc_id", (md5int(F.col("g")) % MOD).alias("h"))
    # barrier: occ_counts feeds BOTH the df aggregate and the join
    # probe side — without it Spark replays the explode+hash pipeline
    # twice (no exchange reuse across the two consumers)
    occ_counts = (
        occ.groupBy("doc_id", "h")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    df_ = occ_counts.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    per_doc = (
        occ_counts.join(df_, "h")
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_grams"),
            F.sum(F.when(F.col("df") >= 2, F.col("c")).otherwise(0)).alias(
                "dup_grams"
            ),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_grams",
        "dup_grams",
        F.round(F.col("dup_grams") / F.col("n_grams"), 6).alias("dup_frac"),
        (F.col("dup_grams") / F.col("n_grams") > SUB_DUP_FRAC).alias(
            "substring_dup"
        ),
    ).orderBy("doc_id")


def substring_dup_fraction_sql() -> str:
    tok = TOKENS_SQL.format(c="text")
    grams = shingles_sql("tok", SUB_NGRAM)
    h = MD5INT_SQL.format(c="g")
    return f"""
WITH tokd AS (SELECT doc_id, {tok} AS tok FROM documents),
occ AS (
  SELECT doc_id, ({h} % {MOD}) AS h
  FROM (SELECT doc_id, unnest({grams}) AS g
        FROM tokd WHERE len(tok) >= {SUB_NGRAM})
),
occ_counts AS (SELECT doc_id, h, count(*) AS c FROM occ GROUP BY doc_id, h),
df AS (SELECT h, count(*) AS df FROM occ_counts GROUP BY h),
per_doc AS (
  SELECT doc_id,
         sum(c) AS n_grams,
         sum(CASE WHEN df >= 2 THEN c ELSE 0 END) AS dup_grams
  FROM occ_counts JOIN df USING (h)
  GROUP BY doc_id
)
SELECT doc_id,
       n_grams::BIGINT AS n_grams,
       dup_grams::BIGINT AS dup_grams,
       round(dup_grams * 1.0 / n_grams, 6) AS dup_frac,
       (dup_grams * 1.0 / n_grams) > {SUB_DUP_FRAC} AS substring_dup
FROM per_doc ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# exact-substring removal (the production step behind the fraction above)
# ---------------------------------------------------------------------------


def exact_substring_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr dedup (Lee et al. 2022): REMOVE duplicated token
    windows from every document, keeping exactly one copy corpus-wide.

    Semantics (deterministic, occurrence-granular keep-first): a token
    8-gram occurrence is removable iff its hash occurs >= 2 times in the
    corpus AND it is not the canonical copy — the occurrence at the
    lexicographically-smallest ``doc_id``, earliest start within that
    doc. Removable windows are cut from the doc's token sequence
    (overlapping windows union); output is the cleaned lowercased token
    text plus removal stats. Docs shorter than the window keep all
    tokens.

    Scale shape — same discipline as :func:`substring_dup_fraction`:
      1. window construction + start positions are ROW-LOCAL
         (posexplode over the shingle array);
      2. the canonical-copy rule is TWO map-side-combined aggs
         ((h, doc) then (h): sum/min/min_by) — no window function over
         occurrences, so a boilerplate gram with df = d costs d rows at
         every stage, never a d-row sort partition;
      3. one equi-join occ ⋈ per-hash verdicts on h, then one per-doc
         collect of removable starts (bounded by windows/doc);
      4. the cut itself is row-local higher-order exprs (exists-scan of
         the start list per token — O(tokens × dup-windows) per doc;
         fine until a doc is mostly boilerplate, at which point it
         should have been dropped by the quality gate first).
    No windows over the corpus, no cartesian, shuffles = 2 aggs + 1
    equi-join + 1 per-doc agg."""
    docs = load(spark, "documents", sf_dir)
    d = _token_arrays(docs)
    grams = d.select(
        "doc_id",
        "tok",
        F.posexplode(shingles(F.col("tok"), SUB_NGRAM)).alias("p", "g"),
    )
    # 1-based start index of the window in the token array
    occ = grams.select(
        "doc_id",
        (F.col("p") + 1).alias("s"),
        (md5int(F.col("g")) % MOD).alias("h"),
    ).localCheckpoint(eager=True)
    hd = occ.groupBy("h", "doc_id").agg(
        F.min("s").alias("ms"), F.count(F.lit(1)).alias("c")
    )
    byh = hd.groupBy("h").agg(
        F.sum("c").alias("n_occ"),
        F.min("doc_id").alias("kdoc"),
        # earliest start inside the keeper doc ((h, doc_id) is unique
        # in hd, so min_by has no tie to break)
        F.min_by("ms", "doc_id").alias("ks"),
    )
    removable = (
        occ.join(byh, "h")
        .filter(
            (F.col("n_occ") >= 2)
            & ~((F.col("doc_id") == F.col("kdoc")) & (F.col("s") == F.col("ks")))
        )
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_set("s")).alias("starts"))
    )
    n = F.lit(SUB_NGRAM)
    out = (
        d.join(removable, "doc_id", "left")
        .withColumn(
            "starts",
            F.coalesce(F.col("starts"), F.array().cast("array<int>")),
        )
        .withColumn(
            "kept",
            F.filter(
                F.transform(
                    F.sequence(F.lit(1), F.size("tok")),
                    lambda i: F.struct(
                        F.element_at("tok", i).alias("t"), i.alias("i")
                    ),
                ),
                lambda x: ~F.exists(
                    "starts",
                    lambda st: (st <= x["i"]) & (x["i"] < st + n),
                ),
            ),
        )
    )
    # merged removed-span count: equal-length windows sorted by start
    # merge iff the gap to the previous start is < window length
    n_spans = F.when(F.size("starts") == 0, F.lit(0)).otherwise(
        F.lit(1)
        + F.size(
            F.filter(
                F.sequence(F.lit(2), F.greatest(F.size("starts"), F.lit(2))),
                lambda j: (j <= F.size("starts"))
                & (
                    F.element_at("starts", j) - F.element_at("starts", j - 1)
                    >= n
                ),
            )
        )
    )
    return out.select(
        "doc_id",
        F.size("tok").alias("n_tokens"),
        (F.size("tok") - F.size("kept")).alias("removed_tokens"),
        n_spans.alias("n_spans"),
        F.concat_ws(" ", F.transform("kept", lambda x: x["t"])).alias(
            "cleaned_text"
        ),
    ).orderBy("doc_id")


def exact_substring_trim_sql() -> str:
    tok = TOKENS_SQL.format(c="text")
    grams = shingles_sql("tok", SUB_NGRAM)
    h = MD5INT_SQL.format(c="g")
    n = SUB_NGRAM
    return f"""
WITH tokd AS (SELECT doc_id, {tok} AS tok FROM documents),
occ AS (
  -- unnest + generate_subscripts must sit in the SAME select so they
  -- zip positionally (separating them cross-products the two)
  SELECT doc_id, s, ({h} % {MOD}) AS h
  FROM (SELECT doc_id, generate_subscripts(grams, 1) AS s,
               unnest(grams) AS g
        FROM (SELECT doc_id, {grams} AS grams
              FROM tokd WHERE len(tok) >= {n}))
),
hd AS (SELECT h, doc_id, min(s) AS ms, count(*) AS c
       FROM occ GROUP BY h, doc_id),
byh AS (SELECT h, sum(c) AS n_occ, min(doc_id) AS kdoc,
               arg_min(ms, doc_id) AS ks
        FROM hd GROUP BY h),
removable AS (
  SELECT doc_id, list_sort(list(DISTINCT s)) AS starts
  FROM occ JOIN byh USING (h)
  WHERE n_occ >= 2 AND NOT (doc_id = kdoc AND s = ks)
  GROUP BY doc_id
),
cut AS (
  SELECT t.doc_id, t.tok,
         coalesce(r.starts, []) AS starts,
         list_filter(
           list_transform(range(1, len(t.tok) + 1),
                          i -> {{'t': t.tok[i], 'i': i}}),
           x -> len(list_filter(coalesce(r.starts, []),
                                st -> st <= x['i'] AND x['i'] < st + {n})) = 0
         ) AS kept
  FROM tokd t LEFT JOIN removable r USING (doc_id)
)
SELECT doc_id,
       len(tok)::BIGINT AS n_tokens,
       (len(tok) - len(kept))::BIGINT AS removed_tokens,
       (CASE WHEN len(starts) = 0 THEN 0 ELSE
         1 + len(list_filter(range(2, greatest(len(starts), 2) + 1),
                  j -> j <= len(starts)
                       AND starts[j] - starts[j-1] >= {n}))
        END)::INT AS n_spans,
       -- DuckDB's array_to_string([]) is NULL; Spark's concat_ws is ''
       coalesce(array_to_string(list_transform(kept, x -> x['t']), ' '), '')
         AS cleaned_text
FROM cut ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# crawl-order n-gram novelty
# ---------------------------------------------------------------------------

NOVELTY_STALE = 0.5  # docs adding <50% new grams are marked stale


def ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-order marginal utility: per document, the fraction of its
    distinct token 8-grams whose corpus-wide FIRST occurrence (min
    doc_id = arrival order) is this document — i.e. how much NEW text
    the document added when it arrived. The signal behind "stop
    crawling this source" decisions and repeated-token accounting in
    data-constrained scaling (Muennighoff et al. 2023): a stale doc
    re-serves text the corpus already has even when no single earlier
    doc is a near-duplicate of it (which is why dedup pair metrics
    can't see it).

    Where :func:`substring_dup_fraction` is SYMMETRIC (df >= 2 flags
    both copies), novelty is ORDER-AWARE: the first copy keeps full
    credit. Scale shape: distinct (doc, gram-hash) collapse, ONE
    map-side-combined min-agg per hash, one equi-join back, one
    per-doc agg — no windows, no pair generation; a df = d boilerplate
    gram costs d rows at every stage."""
    d = _token_arrays(load(spark, "documents", sf_dir))
    occ = (
        d.select(
            "doc_id",
            F.explode(shingles(F.col("tok"), SUB_NGRAM)).alias("g"),
        )
        .select("doc_id", (md5int(F.col("g")) % MOD).alias("h"))
        .distinct()
        # barrier: occ feeds both the first-arrival agg and the join
        .localCheckpoint(eager=True)
    )
    first = occ.groupBy("h").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        occ.join(first, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                (F.col("first_doc") == F.col("doc_id")).cast("int")
            ).alias("novel_grams"),
        )
    )
    frac = F.round(F.col("novel_grams") / F.col("n_grams"), 6)
    return per_doc.select(
        "doc_id",
        "n_grams",
        "novel_grams",
        frac.alias("novelty_frac"),
        (frac < NOVELTY_STALE).alias("stale"),
    ).orderBy("doc_id")


def ngram_novelty_sql() -> str:
    tok = TOKENS_SQL.format(c="text")
    grams = shingles_sql("tok", SUB_NGRAM)
    h = MD5INT_SQL.format(c="g")
    return f"""
WITH tokd AS (SELECT doc_id, {tok} AS tok FROM documents),
occ AS (
  SELECT DISTINCT doc_id, ({h} % {MOD}) AS h
  FROM (SELECT doc_id, unnest({grams}) AS g
        FROM tokd WHERE len(tok) >= {SUB_NGRAM})
),
first AS (SELECT h, min(doc_id) AS first_doc FROM occ GROUP BY h),
per_doc AS (
  SELECT doc_id,
         count(*) AS n_grams,
         sum((first_doc = doc_id)::INT) AS novel_grams
  FROM occ JOIN first USING (h) GROUP BY doc_id
)
SELECT doc_id, n_grams::BIGINT AS n_grams,
       novel_grams::BIGINT AS novel_grams,
       round(novel_grams * 1.0 / n_grams, 6) AS novelty_frac,
       round(novel_grams * 1.0 / n_grams, 6) < {NOVELTY_STALE} AS stale
FROM per_doc ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# paragraph-granularity dedup
# ---------------------------------------------------------------------------

# paragraph block size in tokens. The shipped synthetic corpus has no
# newline structure, so "paragraph" is derived as fixed 20-token blocks;
# a real web corpus swaps the splitter to split(text, '\n\n') — every
# stage downstream of the split is splitter-agnostic.
PARA_TOKENS = 20
# paragraphs-per-doc bound for the (doc_id, pidx) -> int64 encoding of
# the first-occurrence key; 1e5 blocks x 20 tokens = 2M tokens/doc,
# far above any document a quality gate keeps
PARA_ENC = 100_000


def paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-level exact dedup (the NearDup granularity between
    whole-document ``dedup_exact`` and token-window
    ``exact_substring_trim``; Lee et al. 2022 run the same rule on
    '\\n\\n' paragraphs): every paragraph occurrence is kept iff it is
    the corpus-wide FIRST occurrence of its hash — smallest
    (doc_id, pidx) — so repeated boilerplate paragraphs survive exactly
    once. Output per doc: paragraph counts, kept fraction, and the md5
    of the recomposed kept text (proves the recomposition, compactly).

    Scale shape — same discipline as :func:`substring_dup_fraction`:
      1. the paragraph split is ROW-LOCAL (slice over the token array,
         posexplode);
      2. the first-occurrence rule is ONE map-side-combined min-agg per
         hash over an int64-encoded (doc_id, pidx) key — no window, so
         a df = d boilerplate paragraph costs d rows, never a d-row
         sort partition;
      3. one hash equi-join back to occurrences, then one per-doc agg
         whose collect_list is bounded by paragraphs/doc.
    Shuffles = 1 agg + 1 equi-join + 1 per-doc agg."""
    d = _token_arrays(load(spark, "documents", sf_dir))
    p = F.lit(PARA_TOKENS)
    blocks = F.transform(
        F.sequence(F.lit(1), F.ceil(F.size("tok") / p).cast("int")),
        lambda i: F.concat_ws(" ", F.slice("tok", (i - 1) * p + 1, p)),
    )
    paras = (
        d.filter(F.size("tok") > 0)
        .select("doc_id", F.posexplode(blocks).alias("p0", "para"))
        .select(
            "doc_id",
            (F.col("p0") + 1).alias("pidx"),
            "para",
            (md5int(F.col("para")) % MOD).alias("h"),
            (F.col("doc_id") * PARA_ENC + F.col("p0") + 1).alias("ek"),
        )
        # barrier: paras feeds BOTH the first-occurrence agg and the
        # join probe side (exchange reuse doesn't cover the two)
        .localCheckpoint(eager=True)
    )
    return _first_occurrence_rollup(paras, "pidx", "para", "n_paras")


def _first_occurrence_rollup(
    occ: DataFrame, idx: str, piece: str, n_name: str
) -> DataFrame:
    """Keep-first rollup shared by :func:`paragraph_dedup` and
    :func:`cdc_chunk_dedup`: given occurrences (doc_id, <idx>, <piece>,
    h, ek) where ek is the int64-encoded (doc_id, idx) arrival key,
    keep each occurrence iff ek is the corpus-wide minimum for its
    hash, and roll up per doc — counts, kept fraction, and the md5 of
    the recomposed kept text. ONE map-side min-agg + one equi-join +
    one per-doc agg; no window over occurrences."""
    byh = occ.groupBy("h").agg(F.min("ek").alias("kek"))
    kept = F.col("ek") == F.col("kek")
    g = (
        occ.join(byh, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias(n_name),
            F.sum(kept.cast("int")).alias("n_kept"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(kept, F.struct(F.col(idx), F.col(piece)))
                        )
                    ),
                    lambda x: x[piece],
                ),
            ).alias("kept_text"),
        )
    )
    return g.select(
        "doc_id",
        n_name,
        "n_kept",
        F.round(F.col("n_kept") / F.col(n_name), 6).alias("kept_frac"),
        F.md5("kept_text").alias("kept_md5"),
    ).orderBy("doc_id")


def paragraph_dedup_sql() -> str:
    tok = TOKENS_SQL.format(c="text")
    h = MD5INT_SQL.format(c="para")
    p = PARA_TOKENS
    return f"""
WITH tokd AS (SELECT doc_id, {tok} AS tok FROM documents),
paras AS (
  SELECT doc_id, generate_subscripts(ps, 1) AS pidx, unnest(ps) AS para
  FROM (SELECT doc_id,
          list_transform(range(1, cast(ceil(len(tok) / {p}.0) AS INT) + 1),
                         i -> array_to_string(tok[(i-1)*{p}+1 : i*{p}], ' '))
            AS ps
        FROM tokd WHERE len(tok) > 0)
),
occ AS (SELECT doc_id, pidx, para, ({h} % {MOD}) AS h,
               doc_id * {PARA_ENC} + pidx AS ek FROM paras),
byh AS (SELECT h, min(ek) AS kek FROM occ GROUP BY h)
SELECT doc_id,
       count(*) AS n_paras,
       sum((ek = kek)::INT)::BIGINT AS n_kept,
       round(sum((ek = kek)::INT) * 1.0 / count(*), 6) AS kept_frac,
       md5(coalesce(
         string_agg(CASE WHEN ek = kek THEN para END, ' ' ORDER BY pidx),
         '')) AS kept_md5
FROM occ JOIN byh USING (h)
GROUP BY doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# per-source rollup
# ---------------------------------------------------------------------------


def host_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source curation rollup: doc count, char volume, language
    spread, and the intra-source exact-duplicate rate (docs minus
    distinct text hashes). One hash-partitioned aggregation; every
    measure is map-side combinable (count_distinct becomes a partial
    distinct-aggregate under whole-stage codegen)."""
    docs = load(spark, "documents", sf_dir)
    g = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.count_distinct("lang").alias("n_langs"),
        (F.count(F.lit(1)) - F.count_distinct(F.md5("text"))).alias(
            "n_exact_dups"
        ),
    )
    return g.select(
        "source",
        "n_docs",
        "total_chars",
        "avg_chars",
        "n_langs",
        "n_exact_dups",
        F.round(F.col("n_exact_dups") / F.col("n_docs"), 6).alias("dup_rate"),
    ).orderBy("source")


HOST_STATS_SQL = """
SELECT source,
       count(*) AS n_docs,
       sum(n_chars)::BIGINT AS total_chars,
       round(avg(n_chars), 4) AS avg_chars,
       count(DISTINCT lang) AS n_langs,
       (count(*) - count(DISTINCT md5(text))) AS n_exact_dups,
       round((count(*) - count(DISTINCT md5(text))) * 1.0 / count(*), 6)
         AS dup_rate
FROM documents GROUP BY source ORDER BY source
"""


# ---------------------------------------------------------------------------
# exact per-language length quantiles
# ---------------------------------------------------------------------------

QUANTILE_PS = (0.25, 0.5, 0.75, 0.95)


def length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated quantiles of document length per
    language — the numbers behind per-language min/max-length filters.

    Spark's ``percentile`` (exact, not approx) and DuckDB's
    ``quantile_cont`` share the standard definition (position p·(n-1),
    linear interpolation), and the inputs are integers, so the values
    match bit-for-bit. Scale note: exact percentile aggregates a
    per-partition counts map keyed by distinct value — document length
    has bounded cardinality (≤ max doc bytes), so the map stays small
    even at 10^10 docs; for unbounded-cardinality metrics the approx
    sketch (percentile_approx) is the scale path."""
    docs = load(spark, "documents", sf_dir)
    ps = F.array(*[F.lit(p) for p in QUANTILE_PS])
    g = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.percentile("n_chars", ps).alias("q"),
    )
    cols = [
        F.round(F.element_at("q", i + 1), 4).alias(
            f"p{int(p * 100)}_chars"
        )
        for i, p in enumerate(QUANTILE_PS)
    ]
    return g.select("lang", "n_docs", *cols).orderBy("lang")


def length_quantiles_sql() -> str:
    cols = ", ".join(
        f"round(quantile_cont(n_chars, {p}), 4) AS p{int(p * 100)}_chars"
        for p in QUANTILE_PS
    )
    return f"""
SELECT lang, count(*) AS n_docs, {cols}
FROM documents GROUP BY lang ORDER BY lang
"""


# ---------------------------------------------------------------------------
# keep-best-copy resolution
# ---------------------------------------------------------------------------


def dedup_keep_best(
    spark: SparkSession, sf_dir: str, clusters: DataFrame | None = None
) -> DataFrame:
    """End-to-end curation step: near-dup clusters (transitive closure
    of the n-gram-Jaccard pairs) resolved to ONE survivor each by
    quality — argmax quality_score, ties by doc_id asc. This is the
    decision a training pipeline actually ships: not "these docs are
    similar" but "keep this one, drop those".

    Scale shape: both inputs are existing operators (no new shuffles
    beyond theirs); the survivor pick is a per-cluster window over
    cluster members only — near-dup clusters are tiny, so the window
    fan-in is bounded."""
    from pyspark.sql import Window

    from .graph import dedup_clusters
    from .textstats import quality_scores

    # ``clusters`` lets a composite (curation_funnel) resolve the
    # near-dup closure ONCE and share the checkpointed result between
    # keep-best and the leakage-safe split
    if clusters is None:
        clusters = dedup_clusters(spark, sf_dir)
    clusters = clusters.select("doc_id", "cluster_id")
    quality = quality_scores(spark, sf_dir).select("doc_id", "quality_score")
    j = clusters.join(quality, "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("quality_score"), F.asc("doc_id")
    )
    return (
        j.withColumn("rnk", F.row_number().over(w))
        .select(
            "doc_id",
            "cluster_id",
            "quality_score",
            (F.col("rnk") == 1).alias("keep"),
        )
        .orderBy("doc_id")
    )


def dedup_keep_best_sql() -> str:
    from .graph import dedup_clusters_sql
    from .textstats import quality_scores_sql

    return f"""
WITH clusters AS ({dedup_clusters_sql()}),
qual AS ({quality_scores_sql()}),
j AS (
  SELECT c.doc_id, c.cluster_id, q.quality_score
  FROM clusters c JOIN qual q ON c.doc_id = q.doc_id
)
SELECT doc_id, cluster_id, quality_score,
       row_number() OVER (PARTITION BY cluster_id
                          ORDER BY quality_score DESC, doc_id ASC) = 1
         AS keep
FROM j ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# training-mixture token allocation
# ---------------------------------------------------------------------------

# target mixture proportions per language (per-mille, integers so the
# arithmetic is exact in both engines); unlisted langs share "other"
MIX_TARGETS = {"en": 400, "de": 150, "fr": 150, "es": 150, "zh": 150}
MIX_BUDGET_TOKENS = 50_000


def mixture_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixing allocation (the LLaMA/Pile-style step): given the
    available token mass per language and target mixture proportions,
    compute each language's token budget and the sampling rate that
    achieves it. rate > 1 means the lang is under-represented (needs
    up-sampling / more crawling); < 1 means down-sample.

    All arithmetic is integers plus ONE final division (rounded), so
    Spark and DuckDB agree exactly. Scale shape: one map-side-combined
    agg over the corpus; the allocation table is O(|langs|) — a
    driver-side broadcast in the sampler that consumes it."""
    docs = load(spark, "documents", sf_dir)
    bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_RE), 0))
    avail = docs.groupBy("lang").agg(
        F.sum(bpe).alias("available_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    target = F.coalesce(
        *[
            F.when(F.col("lang") == lang, F.lit(pm))
            for lang, pm in MIX_TARGETS.items()
        ],
        F.lit(0),
    )
    budget = (F.lit(MIX_BUDGET_TOKENS) * target / 1000).cast("long")
    return avail.select(
        "lang",
        "n_docs",
        "available_tokens",
        target.alias("target_permille"),
        budget.alias("budget_tokens"),
        F.round(budget / F.col("available_tokens"), 6).alias("sample_rate"),
    ).orderBy("lang")


def mixture_allocation_sql() -> str:
    whens = " ".join(
        f"WHEN '{lang}' THEN {pm}" for lang, pm in MIX_TARGETS.items()
    )
    return f"""
WITH avail AS (
  SELECT lang,
         count(*) AS n_docs,
         sum(len({BPE_SQL.format(c="text")}))::BIGINT
           AS available_tokens
  FROM documents GROUP BY lang
)
SELECT lang, n_docs, available_tokens,
       (CASE lang {whens} ELSE 0 END) AS target_permille,
       ({MIX_BUDGET_TOKENS} * (CASE lang {whens} ELSE 0 END) // 1000)::BIGINT
         AS budget_tokens,
       round(({MIX_BUDGET_TOKENS} * (CASE lang {whens} ELSE 0 END) // 1000)
             * 1.0 / available_tokens, 6) AS sample_rate
FROM avail ORDER BY lang
"""


# ---------------------------------------------------------------------------
# content-defined chunking dedup (CDC)
# ---------------------------------------------------------------------------

CDC_K = 4        # boundary decision looks at the k-token gram ending here
CDC_D = 8        # boundary probability 1/D -> mean chunk ~D tokens
CDC_ENC = 100_000  # chunks-per-doc bound for the int64 (doc_id, cidx) key


def cdc_chunk_dedup(
    spark: SparkSession, sf_dir: str, k: int = CDC_K, d: int = CDC_D
) -> DataFrame:
    """Content-defined-chunking dedup: cut each document AFTER any token
    whose trailing k-gram hashes to 0 mod D (the text analog of
    gear/Rabin CDC used by dedup storage systems and by corpus-level
    passage dedup), then keep each chunk occurrence iff it is the
    corpus-wide FIRST occurrence of its hash — the same rule as
    :func:`paragraph_dedup` at a granularity that is INSERTION-ROBUST:
    because every boundary is a pure function of the k tokens ending at
    it, editing or prepending text re-chunks only up to the first
    surviving boundary, after which all cuts — and therefore all chunk
    hashes — realign. Fixed blocks (paragraph_dedup's splitter) lose
    every block after an insertion point; CDC loses at most one.

    Scale shape: gram hashing, boundary selection, and chunk slicing
    are ROW-LOCAL higher-order exprs over two checkpoint-barriered
    arrays (the gram-hash array, then the materialized bounds array —
    without the second barrier each chunk re-evaluates the whole
    filter+concat bounds expression, O(L²/D) per doc; with it chunk
    slicing is O(L)). The dedup tail is paragraph_dedup's: ONE
    map-side min-agg per hash, one equi-join, one per-doc agg."""
    t = _token_arrays(load(spark, "documents", sf_dir)).filter(
        F.size("tok") > 0
    )
    hv = F.transform(shingles(F.col("tok"), k), lambda g: md5int(g) % MOD)
    hs = t.select("doc_id", "tok", hv.alias("hv")).localCheckpoint(eager=True)
    # cut after token e = j+k-1 for gram j (1-based); the gram ending at
    # the LAST token never cuts — doc end is an implicit boundary
    cuts = F.when(
        F.size("hv") >= 2,
        F.filter(
            F.sequence(F.lit(1), F.size("hv") - 1),
            lambda j: F.element_at(F.col("hv"), j) % d == 0,
        ),
    ).otherwise(F.array().cast("array<int>"))
    bounds = F.concat(
        F.array(F.lit(0)),
        F.transform(cuts, lambda j: j + F.lit(k - 1)),
        F.array(F.size("tok")),
    )
    hb = hs.select(
        "doc_id", "tok", bounds.alias("bounds")
    ).localCheckpoint(eager=True)
    chunks = F.transform(
        F.sequence(F.lit(1), F.size("bounds") - 1),
        lambda i: F.concat_ws(
            " ",
            F.slice(
                F.col("tok"),
                F.element_at(F.col("bounds"), i) + 1,
                F.element_at(F.col("bounds"), i + 1)
                - F.element_at(F.col("bounds"), i),
            ),
        ),
    )
    occ = (
        hb.select("doc_id", F.posexplode(chunks).alias("c0", "chunk"))
        .select(
            "doc_id",
            (F.col("c0") + 1).alias("cidx"),
            "chunk",
            (md5int(F.col("chunk")) % MOD).alias("h"),
            (F.col("doc_id") * CDC_ENC + F.col("c0") + 1).alias("ek"),
        )
        # barrier: occ feeds BOTH the first-occurrence agg and the join
        # probe side (exchange reuse doesn't cover the two)
        .localCheckpoint(eager=True)
    )
    return _first_occurrence_rollup(occ, "cidx", "chunk", "n_chunks")


def cdc_chunk_dedup_sql(k: int = CDC_K, d: int = CDC_D) -> str:
    tok = TOKENS_SQL.format(c="text")
    grams = shingles_sql("tok", k)
    hg = MD5INT_SQL.format(c="g")
    hc = MD5INT_SQL.format(c="chunk")
    return f"""
WITH tokd AS (SELECT doc_id, {tok} AS tok FROM documents),
hs AS (
  SELECT doc_id, tok, list_transform({grams}, g -> {hg} % {MOD}) AS hv
  FROM tokd WHERE len(tok) > 0
),
bd AS (
  SELECT doc_id, tok,
         list_concat(list_concat([0],
           list_transform(list_filter(range(1, len(hv)),
                                      j -> hv[j] % {d} = 0),
                          j -> j + {k - 1})),
           [len(tok)]) AS bounds
  FROM hs
),
chunks AS (
  SELECT doc_id, generate_subscripts(cs, 1) AS cidx, unnest(cs) AS chunk
  FROM (SELECT doc_id,
          list_transform(range(1, len(bounds)),
            i -> array_to_string(tok[bounds[i]+1 : bounds[i+1]], ' ')) AS cs
        FROM bd)
),
occ AS (SELECT doc_id, cidx, chunk, ({hc} % {MOD}) AS h,
               doc_id * {CDC_ENC} + cidx AS ek FROM chunks),
byh AS (SELECT h, min(ek) AS kek FROM occ GROUP BY h)
SELECT doc_id,
       count(*) AS n_chunks,
       sum((ek = kek)::INT)::BIGINT AS n_kept,
       round(sum((ek = kek)::INT) * 1.0 / count(*), 6) AS kept_frac,
       md5(coalesce(
         string_agg(CASE WHEN ek = kek THEN chunk END, ' ' ORDER BY cidx),
         '')) AS kept_md5
FROM occ JOIN byh USING (h)
GROUP BY doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# mirror-host detection
# ---------------------------------------------------------------------------

MIRROR_DF_CAP = 50      # max hosts sharing one paragraph hash (df-cap)
MIRROR_FLAG_PCT = 2     # mirror iff 100·shared >= pct·min(|A|,|B|)


def mirror_hosts(
    spark: SparkSession, sf_dir: str, df_cap: int = MIRROR_DF_CAP
) -> DataFrame:
    """Mirror-host detection (Bharat & Broder, WWW 1999 "A comparison
    of techniques to find mirrored hosts"): host pairs sharing
    paragraph-level content — the signal a crawler uses to collapse
    mirrors into one fetch budget and a curation pipeline uses to stop
    double-counting a source. Content unit = the PARA_TOKENS-block
    paragraph hash (full-document hashing is vacuous across hosts by
    construction on the shipped corpus; real mirrors share paragraphs
    long before they share byte-identical pages). overlap =
    shared / min(|A|, |B|) over each host's distinct paragraph set;
    the mirror verdict is stated on the INTEGERS
    (100·shared >= MIRROR_FLAG_PCT·min) so it is exact cross-engine.

    Scale shape — the posting-list discipline: (source, h) pairs
    collapse map-side via distinct; ONE shuffle builds
    hash -> sorted host set; the df-cap is a free size() filter (a
    boilerplate paragraph on d hosts costs d(d-1)/2 pair rows ONLY
    below the cap — above it the hash is stopworded, same rationale as
    JACCARD_DF_CAP); pair-gen is row-local from each posting array;
    host sizes join back broadcast (the host dimension is tiny next to
    the corpus at any scale)."""
    docs = load(spark, "documents", sf_dir)
    d = _token_arrays(docs).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    p = F.lit(PARA_TOKENS)
    blocks = F.transform(
        F.sequence(F.lit(1), F.ceil(F.size("tok") / p).cast("int")),
        lambda i: F.concat_ws(" ", F.slice("tok", (i - 1) * p + 1, p)),
    )
    ph = (
        d.filter(F.size("tok") > 0)
        .select("source", F.explode(blocks).alias("para"))
        .select("source", (md5int(F.col("para")) % MOD).alias("h"))
        .distinct()
        # barrier: ph feeds the posting build AND the size agg (which
        # itself feeds BOTH sides of the pair join) — without it the
        # explode+md5+distinct pipeline replays up to 3×
        .localCheckpoint(eager=True)
    )
    sz = (
        ph.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_paras"))
        # host-dimension-sized; barriered so sa/sb don't re-aggregate
        .localCheckpoint(eager=True)
    )
    posts = (
        ph.groupBy("h")
        .agg(F.sort_array(F.collect_set("source")).alias("ss"))
        .filter((F.size("ss") >= 2) & (F.size("ss") <= df_cap))
    )
    pairs = posts.selectExpr(
        "inline(flatten(transform(ss, "
        "x -> transform(filter(ss, y -> y > x), "
        "y -> struct(x AS host_a, y AS host_b)))))"
    )
    shared = pairs.groupBy("host_a", "host_b").agg(
        F.count(F.lit(1)).alias("shared_paras")
    )
    sa = sz.select(
        F.col("source").alias("host_a"), F.col("n_paras").alias("n_a")
    )
    sb = sz.select(
        F.col("source").alias("host_b"), F.col("n_paras").alias("n_b")
    )
    mn = F.least(F.col("n_a"), F.col("n_b"))
    return (
        shared.join(F.broadcast(sa), "host_a")
        .join(F.broadcast(sb), "host_b")
        .select(
            "host_a",
            "host_b",
            "shared_paras",
            "n_a",
            "n_b",
            F.round(F.col("shared_paras") / mn, 6).alias("overlap"),
            (F.col("shared_paras") * 100 >= mn * MIRROR_FLAG_PCT).alias(
                "mirror"
            ),
        )
        .orderBy("host_a", "host_b")
    )


def mirror_hosts_sql(df_cap: int = MIRROR_DF_CAP) -> str:
    tok = TOKENS_SQL.format(c="text")
    h = MD5INT_SQL.format(c="para")
    p = PARA_TOKENS
    return f"""
WITH tokd AS (SELECT doc_id, source, {tok} AS tok FROM documents),
paras AS (
  SELECT source, unnest(
    list_transform(range(1, cast(ceil(len(tok) / {p}.0) AS INT) + 1),
                   i -> array_to_string(tok[(i-1)*{p}+1 : i*{p}], ' ')))
    AS para
  FROM tokd WHERE len(tok) > 0
),
ph AS (SELECT DISTINCT source, ({h} % {MOD}) AS h FROM paras),
sz AS (SELECT source, count(*) AS n_paras FROM ph GROUP BY source),
df AS (SELECT h, count(*) AS c FROM ph GROUP BY h),
ok AS (SELECT ph.source, ph.h FROM ph JOIN df USING (h)
       WHERE c BETWEEN 2 AND {df_cap}),
pairs AS (
  SELECT a.source AS host_a, b.source AS host_b, count(*) AS shared_paras
  FROM ok a JOIN ok b ON a.h = b.h AND a.source < b.source
  GROUP BY 1, 2
)
SELECT p.host_a, p.host_b, p.shared_paras,
       x.n_paras AS n_a, y.n_paras AS n_b,
       round(p.shared_paras * 1.0 / least(x.n_paras, y.n_paras), 6)
         AS overlap,
       p.shared_paras * 100 >= least(x.n_paras, y.n_paras) * {MIRROR_FLAG_PCT}
         AS mirror
FROM pairs p
JOIN sz x ON p.host_a = x.source
JOIN sz y ON p.host_b = y.source
ORDER BY p.host_a, p.host_b
"""


# ---------------------------------------------------------------------------
# source distributional similarity (term-frequency cosine matrix)
# ---------------------------------------------------------------------------

SRCSIM_SCALE = 10_000  # cosine -> int grid (the bitext_mining grid)


def source_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise DISTRIBUTIONAL similarity between sources: cosine of
    each source pair's term-frequency vectors. The vocabulary-profile
    complement of :func:`mirror_hosts` — mirrors share literal content
    (paragraph hashes); this matrix finds sources drawing on the same
    *distribution* (scraped from the same upstream, same template
    family, same genre) even when no paragraph is shared. It is the
    standard corpus-composition diagnostic before mixture weighting:
    near-identical sources shouldn't each get independent mixture mass.

    Scale shape: ONE map-side-combined (source, term) count aggregate,
    row-local squared-norms per source (a \\|sources\\|-row frame), and a
    term-keyed equi-join for the dots — a term present in d sources
    contributes d(d-1)/2 pair rows, so the join is bounded by
    \\|vocab\\|·\\|sources\\|² and never touches documents twice; with very
    many sources the mirror_hosts posting-list collapse (collect per
    term, row-local pair-gen, df-cap) is the drop-in swap. All dots
    and norms are exact integer sums of counts; cosine is the
    floor-to-1e4-grid of int64-derived doubles (the bitext_mining
    discipline), so the matrix is partition-invariant and
    bit-identical cross-engine."""
    d = load(spark, "documents", sf_dir)
    tf = (
        d.select("source", F.explode(tokens(F.col("text"))).alias("t"))
        .groupBy("source", "t")
        .agg(F.count(F.lit(1)).alias("c"))
        # feeds the norm agg AND both sides of the dot join
        .localCheckpoint(eager=True)
    )
    norms = tf.groupBy("source").agg(F.sum(F.col("c") * F.col("c")).alias("n2"))
    a = tf.select(F.col("source").alias("src_a"), "t", F.col("c").alias("ca"))
    b = tf.select(F.col("source").alias("src_b"), "t", F.col("c").alias("cb"))
    dots = (
        a.join(b, "t")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("idot"))
    )
    icos = F.floor(
        F.col("idot").cast("double")
        / F.sqrt(F.col("na").cast("double"))
        / F.sqrt(F.col("nb").cast("double"))
        * F.lit(float(SRCSIM_SCALE))
    ).cast("long")
    return (
        dots.join(
            F.broadcast(norms.select(F.col("source").alias("src_a"), F.col("n2").alias("na"))),
            "src_a",
        )
        .join(
            F.broadcast(norms.select(F.col("source").alias("src_b"), F.col("n2").alias("nb"))),
            "src_b",
        )
        .select(
            "src_a",
            "src_b",
            icos.alias("icos"),
            (icos / F.lit(float(SRCSIM_SCALE))).alias("cos"),
        )
        .orderBy("src_a", "src_b")
    )


def source_similarity_sql() -> str:
    tok = TOKENS_SQL.format(c="text")
    s = SRCSIM_SCALE
    return f"""
WITH tf AS (
  SELECT source, t, count(*) AS c FROM (
    SELECT source, unnest({tok}) AS t FROM documents) GROUP BY 1, 2
),
norms AS (SELECT source, sum(c * c) AS n2 FROM tf GROUP BY 1),
dots AS (
  SELECT a.source AS src_a, b.source AS src_b, sum(a.c * b.c) AS idot
  FROM tf a JOIN tf b ON a.t = b.t AND a.source < b.source
  GROUP BY 1, 2
),
g AS (
  SELECT d.src_a, d.src_b,
         floor(d.idot::DOUBLE / sqrt(na.n2::DOUBLE)
               / sqrt(nb.n2::DOUBLE) * {s})::BIGINT AS icos
  FROM dots d JOIN norms na ON na.source = d.src_a
              JOIN norms nb ON nb.source = d.src_b
)
SELECT src_a, src_b, icos, icos / {float(s)} AS cos
FROM g ORDER BY src_a, src_b
"""


# ---------------------------------------------------------------------------
# per-source boilerplate line removal
# ---------------------------------------------------------------------------

# line unit in tokens — finer than PARA_TOKENS because site boilerplate
# (nav bars, footers, cookie banners) is short; same splitter-agnostic
# note as paragraph_dedup: the shipped corpus has no newline structure,
# a real web corpus swaps the block slice for split(text, '\n')
BP_TOKENS = 5
# a line is boilerplate within its source when >= this many DISTINCT
# docs of the source contain it (CCNet dedups lines seen twice per
# shard; RefinedWeb strips repeated lines per site)
BP_MIN_DF = 2
BP_ENC = 1_000_000  # lines-per-doc bound for the int64 (doc, lidx) key


def boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-SOURCE repeated-line removal — the site-template boilerplate
    pass every web-corpus pipeline runs before document-level dedup
    (CCNet, Wenzek et al. 2020 — line-level dedup against shard
    frequency; RefinedWeb, Penedo et al. 2023 — repeated-line strip per
    site). Unlike :func:`paragraph_dedup` (corpus-wide keep-FIRST, one
    survivor per hash), this drops EVERY occurrence of a line that
    appears in >= BP_MIN_DF distinct documents of the SAME source —
    navigation chrome should survive zero times, not once.

    Scale shape (mirrors the other `_first_occurrence_rollup` plans):
      1. line split is ROW-LOCAL (slice over the token array);
      2. the per-(source, line-hash) document frequency is ONE
         map-side-combined distinct-aggregate — no window, so a
         boilerplate line on d docs costs d state rows, never a d-row
         sort partition; because the key embeds the source, a mega-host
         never concentrates on one reducer beyond its own line variety;
      3. one (source, h) equi-join back to occurrences, then one
         per-doc agg bounded by lines/doc.
    Shuffles = 1 distinct-agg + 1 equi-join + 1 per-doc agg."""
    docs = load(spark, "documents", sf_dir)
    # _token_arrays discipline (dedup.py:79) but keeping the source
    # column the per-host df scope needs
    d = (
        docs.repartition(SCAN_FANOUT)
        .select("doc_id", "source", tokens(F.col("text")).alias("tok"))
        .localCheckpoint(eager=True)
    )
    p = F.lit(BP_TOKENS)
    blocks = F.transform(
        F.sequence(F.lit(1), F.ceil(F.size("tok") / p).cast("int")),
        lambda i: F.concat_ws(" ", F.slice("tok", (i - 1) * p + 1, p)),
    )
    occ = (
        d.filter(F.size("tok") > 0)
        .select("doc_id", "source", F.posexplode(blocks).alias("l0", "line"))
        .select(
            "doc_id",
            "source",
            (F.col("l0") + 1).alias("lidx"),
            "line",
            (md5int(F.col("line")) % MOD).alias("h"),
        )
        # barrier: occ feeds BOTH the df agg and the join probe side
        .localCheckpoint(eager=True)
    )
    dfreq = occ.groupBy("source", "h").agg(
        F.count_distinct("doc_id").alias("df")
    )
    kept = F.col("df") < BP_MIN_DF
    g = (
        occ.join(dfreq, ["source", "h"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(kept.cast("int")).alias("n_kept"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(kept, F.struct(F.col("lidx"), F.col("line")))
                        )
                    ),
                    lambda x: x["line"],
                ),
            ).alias("kept_text"),
        )
    )
    return g.select(
        "doc_id",
        "n_lines",
        "n_kept",
        F.round(F.col("n_kept") / F.col("n_lines"), 6).alias("kept_frac"),
        F.md5("kept_text").alias("kept_md5"),
    ).orderBy("doc_id")


def boilerplate_strip_sql() -> str:
    tok = TOKENS_SQL.format(c="text")
    h = MD5INT_SQL.format(c="line")
    p = BP_TOKENS
    return f"""
WITH tokd AS (SELECT doc_id, source, {tok} AS tok FROM documents),
lines AS (
  SELECT doc_id, source, generate_subscripts(ls, 1) AS lidx, unnest(ls) AS line
  FROM (SELECT doc_id, source,
          list_transform(range(1, cast(ceil(len(tok) / {p}.0) AS INT) + 1),
                         i -> array_to_string(tok[(i-1)*{p}+1 : i*{p}], ' '))
            AS ls
        FROM tokd WHERE len(tok) > 0)
),
occ AS (SELECT doc_id, source, lidx, line, ({h} % {MOD}) AS h FROM lines),
dfreq AS (SELECT source, h, count(DISTINCT doc_id) AS df
          FROM occ GROUP BY source, h)
SELECT doc_id,
       count(*) AS n_lines,
       sum((df < {BP_MIN_DF})::INT)::BIGINT AS n_kept,
       round(sum((df < {BP_MIN_DF})::INT) * 1.0 / count(*), 6) AS kept_frac,
       md5(coalesce(
         string_agg(CASE WHEN df < {BP_MIN_DF} THEN line END,
                    ' ' ORDER BY lidx),
         '')) AS kept_md5
FROM occ JOIN dfreq USING (source, h)
GROUP BY doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Snapshot drift monitor — per-source total-variation distance
# ---------------------------------------------------------------------------


def token_dist_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, tok_a, tok_b, n_terms, tvd_pm): distributional DRIFT of
    each source's unigram distribution between two crawl snapshots —
    the monitor a continuously-recrawling pipeline runs per wave: a
    source whose token distribution jumps (template rewrite, spam
    takeover, language flip, parser regression) needs re-curation
    before its new pages enter training mixes. ``crawl_snapshot_diff``
    tells which PAGES changed; this tells whether the source still
    *reads* the same.

    Snapshots are stood in by the deterministic md5 doc split
    (half A = md5('dr:'+doc_id) even, half B = odd) — in production
    the two sides are consecutive date partitions and the operator is
    unchanged. Drift = total-variation distance on the exact integer
    grid: TVD = ½·Σ_t |c_a(t)/N_a − c_b(t)/N_b|, emitted per-mille as
    (500·Σ_t |c_a·N_b − c_b·N_a|) div (N_a·N_b) — exact int64 while
    N_a·N_b ≤ ~9·10¹⁵ (≈10⁸ tokens per half at worst-case drift —
    round-6 ADVICE: the old comment claimed 3·10⁹, but the ·500
    numerator wraps 30× earlier). Past that product the division
    switches to the rank_correlation overflow branch — one
    correctly-rounded IEEE divide + floor, engine-identical — which
    holds until Σ|…| itself wraps at ~2·10⁹ tokens per half; beyond
    THAT, feed per-source downsampled counts (the audit is
    per-source, so the bound is per-SOURCE volume, not corpus
    volume).

    Scale shape: ONE map-side-combined (source, term) aggregate with
    two conditional sums (the halves never materialize separately),
    a broadcast join of the |sources|-row totals, and ONE per-source
    sum — no joins keyed by term, no pair stage. TVD ∈ [0, 1000] with
    0 = identical distributions; the md5 split makes shipped-data
    drift pure sampling noise (small, nonzero — both pinned in
    tests), while a real template change saturates toward 1000."""
    docs = load(spark, "documents", sf_dir)
    half = F.pmod(
        md5int(F.concat(F.lit("dr:"), F.col("doc_id").cast("string"))),
        F.lit(2),
    )
    terms = docs.select(
        "source",
        half.alias("h"),
        F.explode(tokens(F.col("text"))).alias("t"),
    )
    counts = terms.groupBy("source", "t").agg(
        F.sum((F.col("h") == 0).cast("long")).alias("ca"),
        F.sum((F.col("h") == 1).cast("long")).alias("cb"),
    )
    totals = counts.groupBy("source").agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb")
    )
    return (
        counts.join(F.broadcast(totals), "source")
        .groupBy("source")
        .agg(
            F.max("na").alias("tok_a"),
            F.max("nb").alias("tok_b"),
            F.count(F.lit(1)).alias("n_terms"),
            F.sum(
                F.abs(F.col("ca") * F.col("nb") - F.col("cb") * F.col("na"))
            ).alias("isum"),
        )
        .withColumn(
            "tvd_pm",
            F.when(
                (F.col("tok_a") == 0) | (F.col("tok_b") == 0),
                F.lit(None).cast("long"),
            )
            .when(
                # overflow guard (round-6 ADVICE): isum·500 wraps int64
                # once tok_a·tok_b > ~9.2e15; compare on doubles (wrap-
                # free, conservative margin) and take the IEEE floor
                # path there — TVD ∈ [0,1000], one divide, identical in
                # both engines. Tested scales always take the exact div.
                F.col("tok_a").cast("double") * F.col("tok_b").cast("double")
                <= F.lit(9.0e15),
                F.expr("(isum * 500) div (tok_a * tok_b)"),
            )
            .otherwise(
                F.floor(
                    F.col("isum").cast("double")
                    * F.lit(500.0)
                    / (
                        F.col("tok_a").cast("double")
                        * F.col("tok_b").cast("double")
                    )
                ).cast("long")
            ),
        )
        .select("source", "tok_a", "tok_b", "n_terms", "tvd_pm")
        .orderBy("source")
    )


def token_dist_drift_sql() -> str:
    tok = TOKENS_SQL.format(c="text")
    h = MD5INT_SQL.format(c="'dr:' || CAST(doc_id AS VARCHAR)")
    return f"""
WITH terms AS (
  SELECT source, {h} % 2 AS h, unnest({tok}) AS t FROM documents
),
counts AS (
  SELECT source, t,
         sum(CASE WHEN h = 0 THEN 1 ELSE 0 END)::BIGINT AS ca,
         sum(CASE WHEN h = 1 THEN 1 ELSE 0 END)::BIGINT AS cb
  FROM terms GROUP BY source, t
),
totals AS (
  SELECT source, sum(ca)::BIGINT AS na, sum(cb)::BIGINT AS nb
  FROM counts GROUP BY source
),
g AS (
  SELECT c.source, max(t.na) AS tok_a, max(t.nb) AS tok_b,
         count(*) AS n_terms,
         sum(abs(c.ca * t.nb - c.cb * t.na))::BIGINT AS isum
  FROM counts c JOIN totals t USING (source)
  GROUP BY c.source
)
SELECT source, tok_a, tok_b, n_terms,
       CASE WHEN tok_a = 0 OR tok_b = 0 THEN NULL
            ELSE ((isum * 500) // (tok_a * tok_b))::BIGINT END AS tvd_pm
FROM g ORDER BY source
"""
