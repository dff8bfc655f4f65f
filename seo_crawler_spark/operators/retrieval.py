"""Sparse retrieval over the crawled corpus — BM25 ranking.

The search-serving counterpart of :func:`~.textstats.inverted_index`,
and the tool a training-data pipeline reaches for when it needs
retrieval-based decontamination or retrieval-mined hard negatives:
score documents against a query with Okapi BM25 (Robertson &
Spärck Jones; the Lucene `(N - df + 0.5)/(df + 0.5) + 1` idf variant
so idf is never negative) and keep the top-k per query.

Plan shape (one corpus-scale shuffle, two bounded windows):

* tokenize + explode → per-(doc, term) tf aggregate — the SAME
  map-side-combined collapse the index build uses; doc lengths and
  per-term df both derive from it (no second pass over text);
* the query set is a literal broadcast dimension (queries × terms
  rows), so scoring is a broadcast equi-join on term — candidates per
  query are exactly the union of its terms' postings, never the
  corpus;
* top-k is TWO-PHASE: rank within (query, salt=doc_id % BM25_SALTS)
  buckets first (parallel, each bucket sees ~1/SALTS of the
  candidates), keep ≤ k per bucket, then a final rank over the
  ≤ queries × SALTS × k survivors — no single-reducer sort over a
  query's full posting union at 10^10 docs.

Cross-engine determinism: each (query, doc, term) BM25 contribution is
floored onto a BM25_SCALE fixed-point grid BEFORE the per-doc sum, so
ranking compares integer sums (order-independent across partitionings,
identical in DuckDB). `ln` is the one transcendental — same
`lm_perplexity_buckets` log2 risk class: a libm ulp difference can only
flip a floor within ~1e-12 of a grid point, and idf inputs are small
integer ratios. Ties break on doc_id in both phases and both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import TOKENS_SQL, tokens
from ..sources.tables import load

# Okapi BM25 constants (the values every major engine defaults to)
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 10
BM25_SALTS = 32          # phase-1 parallelism of the top-k
BM25_SCALE = 1_000_000   # fixed-point grid for per-term contributions

# literal query workload (terms drawn from the synthetic corpus
# vocabulary; a production run would read these from a queries table —
# the plan is identical, the dimension just stops being a literal)
BM25_QUERIES: dict[int, list[str]] = {
    0: ["hash", "join"],
    1: ["window", "sort"],
    2: ["fast", "scan", "filter"],
    3: ["customer", "order"],
    4: ["stream", "batch", "spark"],
}


def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k documents per query under BM25 (see module docstring for
    the plan-shape and determinism arguments)."""
    docs = load(spark, "documents", sf_dir)
    ex = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    per_doc = ex.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = per_doc.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    df_t = per_doc.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    # two scalar corpus constants (documented driver-constant pattern —
    # same class as lm_perplexity's total/vocab)
    tot = dl.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("sum_dl")
    ).collect()[0]
    n_docs = int(tot["n"])
    avgdl = float(tot["sum_dl"]) / float(n_docs)

    q = spark.createDataFrame(
        [(qid, t) for qid, ts in BM25_QUERIES.items() for t in ts],
        "query_id int, term string",
    )
    idf = F.log(
        (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    tfn = (F.col("tf") * F.lit(BM25_K1 + 1.0)) / (
        F.col("tf")
        + F.lit(BM25_K1)
        * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * F.col("dl") / F.lit(avgdl))
    )
    contrib = (
        per_doc.join(F.broadcast(q), "term")
        .join(df_t, "term")
        .join(dl, "doc_id")
        .select(
            "query_id",
            "doc_id",
            F.floor(idf * tfn * BM25_SCALE).cast("long").alias("ic"),
        )
    )
    scored = contrib.groupBy("query_id", "doc_id").agg(
        F.sum("ic").alias("iscore")
    )

    # two-phase top-k: salted local rank, then global rank over survivors
    w1 = Window.partitionBy("query_id", "salt").orderBy(
        F.col("iscore").desc(), F.col("doc_id")
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("iscore").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("salt", F.pmod(F.col("doc_id"), F.lit(BM25_SALTS)))
        .withColumn("lr", F.row_number().over(w1))
        .filter(F.col("lr") <= BM25_TOPK)
        .withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= BM25_TOPK)
        .select(
            "query_id",
            "rank",
            "doc_id",
            "iscore",
            # same-int ÷ same-constant is the same double in both engines
            (F.col("iscore") / F.lit(float(BM25_SCALE))).alias("score"),
        )
        .orderBy("query_id", "rank")
    )


def bm25_topk_sql() -> str:
    tok = TOKENS_SQL.format(c="text")
    qvals = ", ".join(
        f"({qid}, '{t}')" for qid, ts in BM25_QUERIES.items() for t in ts
    )
    return f"""
WITH ex AS MATERIALIZED (
  SELECT doc_id, unnest({tok}) AS term FROM documents
),
per_doc AS (SELECT doc_id, term, count(*) AS tf FROM ex GROUP BY doc_id, term),
dl AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM per_doc GROUP BY doc_id),
df_t AS (SELECT term, count(*) AS df FROM per_doc GROUP BY term),
tot AS (SELECT count(*) AS n, sum(dl)::DOUBLE / count(*) AS avgdl FROM dl),
q(query_id, term) AS (VALUES {qvals}),
contrib AS (
  SELECT q.query_id, p.doc_id,
         floor(
           ln((tot.n::DOUBLE - df_t.df + 0.5) / (df_t.df + 0.5) + 1.0)
           * ((p.tf * {BM25_K1 + 1.0})
              / (p.tf + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B} * dl.dl / tot.avgdl)))
           * {BM25_SCALE}
         )::BIGINT AS ic
  FROM per_doc p
  JOIN q USING (term)
  JOIN df_t USING (term)
  JOIN dl ON dl.doc_id = p.doc_id
  CROSS JOIN tot
),
scored AS (
  SELECT query_id, doc_id, sum(ic)::BIGINT AS iscore
  FROM contrib GROUP BY query_id, doc_id
),
phase1 AS (
  SELECT query_id, doc_id, iscore,
         row_number() OVER (
           PARTITION BY query_id, doc_id % {BM25_SALTS}
           ORDER BY iscore DESC, doc_id) AS lr
  FROM scored
),
phase2 AS (
  SELECT query_id, doc_id, iscore,
         row_number() OVER (
           PARTITION BY query_id ORDER BY iscore DESC, doc_id) AS rank
  FROM phase1 WHERE lr <= {BM25_TOPK}
)
SELECT query_id, rank, doc_id, iscore, iscore / {BM25_SCALE}.0 AS score
FROM phase2 WHERE rank <= {BM25_TOPK}
ORDER BY query_id, rank
"""


# ---------------------------------------------------------------------------
# retrieval-based (fuzzy) decontamination
# ---------------------------------------------------------------------------

DECON_BM25_TERMS = 8       # top-idf query terms per benchmark doc
DECON_BM25_MIN_I = 5 * BM25_SCALE  # flag threshold on the integer score


def decontaminate_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-based decontamination — the fuzzy complement of
    dedup.decontaminate's exact 8-gram guard: score every training
    document against every benchmark document with BM25 and flag high
    scorers. Catches paraphrased/reformatted benchmark leakage that
    verbatim n-gram overlap misses (the two-detector combination is
    the standard published practice: verbatim n-grams + a
    similarity/retrieval pass).

    Benchmark = the first DECON_BENCH_DOCS documents (the same
    deterministic stand-in decontaminate uses); each benchmark doc
    becomes a query of its DECON_BM25_TERMS most distinctive terms
    (lowest training-side df — query generation from the eval sample;
    terms absent from the training corpus can never match and are
    dropped before the cap, identically in both engines).

    Plan shape: the bm25_topk tf/df/dl statistics computed over the
    TRAINING side only; the capped query set is benchmark-sized and
    broadcast (a real eval suite is a few MB — driver-small at any
    corpus scale), so candidate pairs stream through one broadcast
    equi-join on term; per-(doc, bench) scores are integer sums on the
    BM25_SCALE grid; the best-benchmark pick is a per-doc window over
    ≤ DECON_BENCH_DOCS rows. Every training doc keeps a row
    (iscore 0, bench_id null when no query term matches)."""
    docs = load(spark, "documents", sf_dir)
    from .dedup import DECON_BENCH_DOCS

    ex = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    )
    per_doc = ex.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    train = per_doc.filter(F.col("doc_id") >= DECON_BENCH_DOCS)
    dl = train.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    df_t = train.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    tot = dl.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("sum_dl")
    ).collect()[0]
    n_docs = int(tot["n"])
    avgdl = float(tot["sum_dl"]) / float(n_docs)

    from pyspark.sql import Window

    wq = Window.partitionBy("bench_id").orderBy("df", "term")
    q = (
        per_doc.filter(F.col("doc_id") < DECON_BENCH_DOCS)
        .select(F.col("doc_id").alias("bench_id"), "term")
        .join(df_t, "term")
        .withColumn("qr", F.row_number().over(wq))
        .filter(F.col("qr") <= DECON_BM25_TERMS)
        .select("bench_id", "term")
    )
    idf = F.log(
        (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    tfn = (F.col("tf") * F.lit(BM25_K1 + 1.0)) / (
        F.col("tf")
        + F.lit(BM25_K1)
        * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * F.col("dl") / F.lit(avgdl))
    )
    pair = (
        train.join(F.broadcast(q), "term")
        .join(df_t, "term")
        .join(dl, "doc_id")
        .select(
            "doc_id",
            "bench_id",
            F.floor(idf * tfn * BM25_SCALE).cast("long").alias("ic"),
        )
        .groupBy("doc_id", "bench_id")
        .agg(F.sum("ic").alias("iscore"))
    )
    wb = Window.partitionBy("doc_id").orderBy(
        F.col("iscore").desc(), F.col("bench_id")
    )
    best = (
        pair.withColumn("br", F.row_number().over(wb))
        .filter(F.col("br") == 1)
        .select("doc_id", "bench_id", "iscore")
    )
    return (
        docs.select("doc_id")
        .filter(F.col("doc_id") >= DECON_BENCH_DOCS)
        .join(best, "doc_id", "left")
        .select(
            "doc_id",
            "bench_id",
            F.coalesce("iscore", F.lit(0)).alias("iscore"),
            (
                F.coalesce("iscore", F.lit(0)) / F.lit(float(BM25_SCALE))
            ).alias("score"),
            (F.coalesce("iscore", F.lit(0)) >= DECON_BM25_MIN_I).alias(
                "contaminated"
            ),
        )
        .orderBy("doc_id")
    )


def decontaminate_bm25_sql() -> str:
    from .dedup import DECON_BENCH_DOCS

    tok = TOKENS_SQL.format(c="text")
    return f"""
WITH ex AS MATERIALIZED (
  SELECT doc_id, unnest({tok}) AS term FROM documents
),
per_doc AS (SELECT doc_id, term, count(*) AS tf FROM ex GROUP BY doc_id, term),
train AS (SELECT * FROM per_doc WHERE doc_id >= {DECON_BENCH_DOCS}),
dl AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM train GROUP BY doc_id),
df_t AS (SELECT term, count(*) AS df FROM train GROUP BY term),
tot AS (SELECT count(*) AS n, sum(dl)::DOUBLE / count(*) AS avgdl FROM dl),
q AS (
  SELECT bench_id, term FROM (
    SELECT p.doc_id AS bench_id, p.term,
           row_number() OVER (
             PARTITION BY p.doc_id ORDER BY d.df, p.term) AS qr
    FROM per_doc p JOIN df_t d USING (term)
    WHERE p.doc_id < {DECON_BENCH_DOCS})
  WHERE qr <= {DECON_BM25_TERMS}),
pair AS (
  SELECT t.doc_id, q.bench_id,
         sum(floor(
           ln((tot.n::DOUBLE - df_t.df + 0.5) / (df_t.df + 0.5) + 1.0)
           * ((t.tf * {BM25_K1 + 1.0})
              / (t.tf + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B} * dl.dl / tot.avgdl)))
           * {BM25_SCALE}
         )::BIGINT)::BIGINT AS iscore
  FROM train t
  JOIN q USING (term)
  JOIN df_t USING (term)
  JOIN dl ON dl.doc_id = t.doc_id
  CROSS JOIN tot
  GROUP BY t.doc_id, q.bench_id),
best AS (
  SELECT doc_id, bench_id, iscore FROM (
    SELECT doc_id, bench_id, iscore,
           row_number() OVER (
             PARTITION BY doc_id ORDER BY iscore DESC, bench_id) AS br
    FROM pair)
  WHERE br = 1)
SELECT d.doc_id, b.bench_id,
       coalesce(b.iscore, 0) AS iscore,
       coalesce(b.iscore, 0) / {BM25_SCALE}.0 AS score,
       coalesce(b.iscore, 0) >= {DECON_BM25_MIN_I} AS contaminated
FROM documents d LEFT JOIN best b USING (doc_id)
WHERE d.doc_id >= {DECON_BENCH_DOCS}
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# exact phrase search over a positional index
# ---------------------------------------------------------------------------

# literal phrase workload (word sequences that occur in the synthetic
# corpus; a production run reads phrases from a queries table — the
# plan is identical, the dimension stops being a literal)
PHRASE_QUERIES: dict[int, str] = {
    0: "order fast",
    1: "window join",
    2: "big order scan",
    3: "group slow spark",
    4: "stream column",
}


def phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase matching over a POSITIONAL posting list — the
    index-time capability BM25's bag-of-words scoring cannot express
    (reference counterpart: the links-table substring search,
    seo-crawler web/static/js/app.js search box, which scans text; a
    100 TB engine answers phrases from the index instead).

    Plan shape — ONE corpus-scale shuffle, no per-term join chain:
      1. postings (doc_id, pos, term) are ROW-LOCAL (posexplode of the
         token array);
      2. the phrase set unrolls to a literal (query_id, term, off,
         plen) dimension — broadcast, so the only equi-join tags each
         posting with the phrases that could use it and the candidate
         START position (pos - off). Postings for terms in no phrase
         are dropped by the join (at the scan end after pushdown of
         the broadcast hash table — never shuffled);
      3. a phrase matches at a start iff ALL plen offsets are present:
         one map-side-combined agg on (query_id, doc_id, start)
         counting distinct off (bounded by plen, so partial-agg state
         per key is tiny), then a per-(query, doc) rollup.
    The naive alternative — a (plen-1)-deep self-join of the posting
    list on (doc_id, pos+1) — shuffles the postings once PER TERM;
    this shape pays one broadcast probe + one agg regardless of
    phrase length.

    Integer-exact (positions and counts), so the DuckDB twin is
    bit-identical."""
    docs = load(spark, "documents", sf_dir)
    postings = docs.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "term")
    )
    dim_rows = [
        (qid, t, off, len(phrase.split()))
        for qid, phrase in PHRASE_QUERIES.items()
        for off, t in enumerate(phrase.split())
    ]
    dim = spark.createDataFrame(
        dim_rows, "query_id int, term string, off int, plen int"
    )
    starts = (
        postings.join(F.broadcast(dim), "term")
        .groupBy("query_id", "doc_id", (F.col("pos") - F.col("off")).alias("start"))
        .agg(
            F.count_distinct("off").alias("hit"),
            F.first("plen").alias("plen"),
        )
        .filter((F.col("hit") == F.col("plen")) & (F.col("start") >= 0))
    )
    return (
        starts.groupBy("query_id", "doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.min("start").alias("first_pos"),
        )
        .orderBy("query_id", "doc_id")
    )


def phrase_search_sql() -> str:
    tok = TOKENS_SQL.format(c="text")
    dim_vals = ", ".join(
        f"({qid}, '{t}', {off}, {len(phrase.split())})"
        for qid, phrase in PHRASE_QUERIES.items()
        for off, t in enumerate(phrase.split())
    )
    return f"""
WITH tokd AS (SELECT doc_id, {tok} AS tok FROM documents),
postings AS (
  SELECT doc_id, generate_subscripts(tok, 1) - 1 AS pos, unnest(tok) AS term
  FROM tokd
),
dim(query_id, term, off, plen) AS (VALUES {dim_vals}),
starts AS (
  SELECT d.query_id, p.doc_id, p.pos - d.off AS start,
         count(DISTINCT d.off) AS hit, first(d.plen) AS plen
  FROM postings p JOIN dim d USING (term)
  GROUP BY d.query_id, p.doc_id, p.pos - d.off
)
SELECT query_id, doc_id,
       count(*) AS n_matches, min(start) AS first_pos
FROM starts WHERE hit = plen AND start >= 0
GROUP BY query_id, doc_id
ORDER BY query_id, doc_id
"""
