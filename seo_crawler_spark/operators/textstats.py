"""Text analysis operators for a training-data pipeline.

language-ID (stopword-hit heuristic), quality scoring (length / punct /
stopword ratios), token counting (whitespace + BPE-ish regex), and
document fingerprinting (order-sensitive rolling hash). All pure column
expressions (codegen, no Python) with DuckDB oracle twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import MD5INT_SQL, MOD, TOKENS_SQL, md5int, tokens
from ..sources.tables import load

# tiny per-language stopword lists (public common words)
STOPWORDS = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it", "for", "on"),
    "de": ("der", "die", "das", "und", "ist", "ein", "zu", "mit", "von", "auf"),
    "fr": ("le", "la", "et", "les", "des", "un", "une", "est", "pour", "que"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es", "por", "con"),
}


def _hit_ratio(tok, words: tuple) -> F.Column:
    hits = F.size(F.filter(tok, lambda t: t.isin(*words)))
    return hits / F.greatest(F.size(tok), F.lit(1))


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax of per-language stopword hit ratio; 'und' when all zero.
    Ties break by language code order (deterministic)."""
    docs = load(spark, "documents", sf_dir)
    tok = tokens(F.col("text"))
    d = docs.select("doc_id", tok.alias("tok"))
    for lang, words in STOPWORDS.items():
        d = d.withColumn(f"r_{lang}", F.round(_hit_ratio(F.col("tok"), words), 6))
    best = F.greatest(*[F.col(f"r_{l}") for l in STOPWORDS])
    pred = F.when(best <= 0, F.lit("und"))
    for lang in sorted(STOPWORDS):
        pred = pred.when(F.col(f"r_{lang}") == best, F.lit(lang))
    return d.select(
        "doc_id",
        pred.alias("pred_lang"),
        best.alias("best_ratio"),
    ).orderBy("doc_id")


def lang_id_sql() -> str:
    tok = TOKENS_SQL.format(c="text")
    ratio_cols = []
    for lang, words in STOPWORDS.items():
        lst = ", ".join(f"'{w}'" for w in words)
        ratio_cols.append(
            f"round(len(list_filter(tok, t -> t IN ({lst}))) * 1.0 / "
            f"greatest(len(tok), 1), 6) AS r_{lang}"
        )
    best = "greatest(" + ", ".join(f"r_{l}" for l in STOPWORDS) + ")"
    whens = " ".join(
        f"WHEN r_{l} = {best} THEN '{l}'" for l in sorted(STOPWORDS)
    )
    return f"""
WITH tokd AS (SELECT doc_id, {tok} AS tok FROM documents),
rat AS (SELECT doc_id, {', '.join(ratio_cols)} FROM tokd)
SELECT doc_id,
       CASE WHEN {best} <= 0 THEN 'und' {whens} END AS pred_lang,
       {best} AS best_ratio
FROM rat ORDER BY doc_id
"""


def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length / punctuation / stopword / mean-word-length heuristics →
    a 0-100 composite quality score."""
    docs = load(spark, "documents", sf_dir)
    tok = tokens(F.col("text"))
    n_tok = F.size(tok)
    n_chars = F.length("text")
    n_punct = F.length("text") - F.length(
        F.regexp_replace(F.col("text"), r"[^\w\s]", "")
    )
    en_hits = F.size(F.filter(tok, lambda t: t.isin(*STOPWORDS["en"])))
    mean_wl = F.round(
        F.aggregate(
            tok, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
        )
        / F.greatest(n_tok, F.lit(1)),
        4,
    )
    punct_ratio = F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6)
    stop_ratio = F.round(en_hits / F.greatest(n_tok, F.lit(1)), 6)
    score = (
        F.when(n_tok >= 100, 40).when(n_tok >= 30, 20).otherwise(0)
        + F.when((mean_wl >= 3) & (mean_wl <= 10), 20).otherwise(0)
        + F.when(punct_ratio <= 0.1, 20).otherwise(0)
        + F.when(stop_ratio > 0, 20).otherwise(0)
    )
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        mean_wl.alias("mean_word_len"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        score.cast("int").alias("quality_score"),
    ).orderBy("doc_id")


def quality_scores_sql() -> str:
    tok = TOKENS_SQL.format(c="text")
    lst = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    return f"""
WITH tokd AS (SELECT doc_id, text, {tok} AS tok FROM documents),
m AS (
  SELECT doc_id,
         len(tok) AS n_tokens,
         round(list_sum(list_transform(tok, t -> length(t))) * 1.0 /
               greatest(len(tok), 1), 4) AS mean_word_len,
         round((length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
               * 1.0 / greatest(length(text), 1), 6) AS punct_ratio,
         round(len(list_filter(tok, t -> t IN ({lst}))) * 1.0 /
               greatest(len(tok), 1), 6) AS stopword_ratio
  FROM tokd
)
SELECT doc_id, n_tokens, mean_word_len, punct_ratio, stopword_ratio,
       (CASE WHEN n_tokens >= 100 THEN 40 WHEN n_tokens >= 30 THEN 20 ELSE 0 END
        + CASE WHEN mean_word_len BETWEEN 3 AND 10 THEN 20 ELSE 0 END
        + CASE WHEN punct_ratio <= 0.1 THEN 20 ELSE 0 END
        + CASE WHEN stopword_ratio > 0 THEN 20 ELSE 0 END)::INTEGER AS quality_score
FROM m ORDER BY doc_id
"""


def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    r"""Whitespace tokens + BPE-ish tokens (\w+ runs and single
    non-space punctuation, the usual pre-tokenizer shape)."""
    docs = load(spark, "documents", sf_dir)
    ws = F.size(F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != ""))
    bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"\w+|[^\w\s]"), 0))
    return docs.select(
        "doc_id",
        ws.alias("ws_tokens"),
        bpe.alias("bpe_tokens"),
        (F.length("text") / F.greatest(bpe, F.lit(1))).cast("double").alias(
            "chars_per_token"
        ),
    ).withColumn("chars_per_token", F.round("chars_per_token", 4)).orderBy("doc_id")


TOKEN_COUNTS_SQL = r"""
WITH m AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(text, '\s+'), t -> t <> '')) AS ws_tokens,
         len(regexp_extract_all(text, '\w+|[^\w\s]')) AS bpe_tokens,
         length(text) AS n_chars
  FROM documents
)
SELECT doc_id, ws_tokens, bpe_tokens,
       round(n_chars * 1.0 / greatest(bpe_tokens, 1), 4) AS chars_per_token
FROM m ORDER BY doc_id
"""


TOP_TERMS_K = 5


def tfidf_top_terms(
    spark: SparkSession, sf_dir: str, k: int = TOP_TERMS_K
) -> DataFrame:
    """Top-k terms per document by tf·(N/df) — the rational-idf variant:
    score = tf * N / df is ONE IEEE division over exact integers, so it
    is bit-identical across Spark and DuckDB (a log-based idf depends on
    libm rounding, which the JVM and C runtimes do not guarantee to
    agree on). Ties break (score desc, term asc). The df side is a tiny
    aggregate — broadcastable; the tf side is a map-side-combined count."""
    docs = load(spark, "documents", sf_dir)
    ex = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    n_docs = docs.count()
    tf = ex.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = (
        ex.dropDuplicates(["doc_id", "term"])
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    from pyspark.sql import Window

    scored = tf.join(df_, "term").withColumn(
        "score", F.col("tf") * F.lit(n_docs) / F.col("df")
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "doc_id", "term", "tf", "df",
            F.round("score", 4).alias("score"), "rnk",
        )
        .orderBy("doc_id", "rnk")
    )


def tfidf_top_terms_sql(k: int = TOP_TERMS_K) -> str:
    tok = TOKENS_SQL.format(c="text")
    return f"""
WITH ex AS (SELECT doc_id, unnest({tok}) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM ex GROUP BY doc_id, term),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM ex GROUP BY term),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         tf.tf * (SELECT n_docs FROM n) / df.df AS score
  FROM tf JOIN df USING (term)
),
ranked AS (
  SELECT doc_id, term, tf, df, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, term ASC) AS rnk
  FROM scored
)
SELECT doc_id, term, tf::BIGINT AS tf, df::BIGINT AS df,
       round(score, 4) AS score, rnk
FROM ranked WHERE rnk <= {k}
ORDER BY doc_id, rnk
"""


def fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive rolling document fingerprint:
    sum((md5int(token) mod M) * position) mod M — permuting tokens
    changes the value, unlike a bag-of-words hash."""
    docs = load(spark, "documents", sf_dir)
    tok = tokens(F.col("text"))
    ex = docs.select("doc_id", F.posexplode(tok).alias("pos", "t"))
    # per-row mod BEFORE the sum: each term is < MOD (~1e9), so the
    # int64 partial sums stay exact up to ~9.2e9 tokens/doc — the
    # unmodded product sum would wrap int64 at ~135k tokens/doc while
    # DuckDB promotes to HUGEINT, diverging on large docs.
    return (
        ex.withColumn("h", md5int(F.col("t")) % MOD)
        .groupBy("doc_id")
        .agg(
            (F.sum((F.col("h") * (F.col("pos") + 1)) % MOD) % MOD).alias(
                "fingerprint"
            ),
            F.count(F.lit(1)).alias("n_tokens"),
        )
        .orderBy("doc_id")
    )


def fingerprints_sql() -> str:
    tok = TOKENS_SQL.format(c="text")
    h = MD5INT_SQL.format(c="t")
    return f"""
WITH ex AS (
  SELECT doc_id,
         generate_subscripts({tok}, 1) AS pos,
         unnest({tok}) AS t
  FROM documents
)
SELECT doc_id,
       (sum((({h} % {MOD}) * pos) % {MOD}) % {MOD})::BIGINT AS fingerprint,
       count(*) AS n_tokens
FROM ex GROUP BY doc_id ORDER BY doc_id
"""
