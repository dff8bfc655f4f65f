"""Text analysis operators for a training-data pipeline.

language-ID (stopword-hit heuristic), quality scoring (length / punct /
stopword ratios), token counting (whitespace + BPE-ish regex), and
document fingerprinting (order-sensitive rolling hash). All pure column
expressions (codegen, no Python) with DuckDB oracle twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import (
    BPE_RE,
    BPE_SQL,
    MD5INT_SQL,
    MOD,
    TOKENS_SQL,
    md5int,
    tokens,
)
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
    bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_RE), 0))
    return docs.select(
        "doc_id",
        ws.alias("ws_tokens"),
        bpe.alias("bpe_tokens"),
        (F.length("text") / F.greatest(bpe, F.lit(1))).cast("double").alias(
            "chars_per_token"
        ),
    ).withColumn("chars_per_token", F.round("chars_per_token", 4)).orderBy("doc_id")


TOKEN_COUNTS_SQL = rf"""
WITH m AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(text, '\s+'), t -> t <> '')) AS ws_tokens,
         len({BPE_SQL.format(c="text")}) AS bpe_tokens,
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


def repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition gates for training-data filtering
    (Rae et al. 2021, "Scaling Language Models", §A1.1): fraction of
    tokens taken by the most common word and by the most common word
    bigram. Highly repetitive documents (boilerplate, keyword stuffing,
    generation loops) are flagged.

    Scale shape: bigrams are built row-locally with ``zip_with`` (no
    shuffle to form grams), then two map-side-combined aggregations —
    (doc, gram) counts and a per-doc max. No windows over the full
    corpus; everything partitions by doc_id.
    """
    docs = load(spark, "documents", sf_dir)
    tok = tokens(F.col("text"))
    d = docs.select("doc_id", tok.alias("tok")).localCheckpoint(eager=True)

    ex = d.select("doc_id", F.explode("tok").alias("t"))
    top_word = (
        ex.groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_word_count"), F.sum("c").alias("n_tokens"))
    )
    # bigram i = tok[i] + ' ' + tok[i+1], formed without leaving the row
    grams = F.zip_with(
        F.slice(F.col("tok"), 1, F.greatest(F.size("tok") - 1, F.lit(0))),
        F.slice(F.col("tok"), 2, F.greatest(F.size("tok") - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    bg = d.select("doc_id", F.explode(grams).alias("g"))
    top_bigram = (
        bg.groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_bigram_count"), F.sum("c").alias("n_bigrams"))
    )
    out = top_word.join(top_bigram, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        "top_word_count",
        F.coalesce("top_bigram_count", F.lit(0)).alias("top_bigram_count"),
        F.round(
            F.col("top_word_count") / F.greatest("n_tokens", F.lit(1)), 6
        ).alias("top_word_frac"),
        F.round(
            F.coalesce("top_bigram_count", F.lit(0))
            / F.greatest(F.coalesce("n_bigrams", F.lit(1)), F.lit(1)),
            6,
        ).alias("top_bigram_frac"),
    )
    return out.withColumn(
        "repetitive",
        (F.col("top_word_frac") > 0.3) | (F.col("top_bigram_frac") > 0.18),
    ).orderBy("doc_id")


def repetition_signals_sql() -> str:
    tok = TOKENS_SQL.format(c="text")
    return f"""
WITH tokd AS (SELECT doc_id, {tok} AS tok FROM documents),
ex AS (SELECT doc_id, unnest(tok) AS t FROM tokd),
tw AS (
  SELECT doc_id, max(c) AS top_word_count, sum(c) AS n_tokens
  FROM (SELECT doc_id, t, count(*) AS c FROM ex GROUP BY doc_id, t)
  GROUP BY doc_id
),
bgx AS (
  SELECT doc_id,
         unnest(list_transform(range(1, greatest(len(tok), 1)),
                               i -> tok[i] || ' ' || tok[i+1])) AS g
  FROM tokd
),
tb AS (
  SELECT doc_id, max(c) AS top_bigram_count, sum(c) AS n_bigrams
  FROM (SELECT doc_id, g, count(*) AS c FROM bgx GROUP BY doc_id, g)
  GROUP BY doc_id
)
SELECT tw.doc_id,
       tw.n_tokens::BIGINT AS n_tokens,
       tw.top_word_count::BIGINT AS top_word_count,
       coalesce(tb.top_bigram_count, 0)::BIGINT AS top_bigram_count,
       round(tw.top_word_count * 1.0 / greatest(tw.n_tokens, 1), 6)
         AS top_word_frac,
       round(coalesce(tb.top_bigram_count, 0) * 1.0 /
             greatest(coalesce(tb.n_bigrams, 1), 1), 6) AS top_bigram_frac,
       (round(tw.top_word_count * 1.0 / greatest(tw.n_tokens, 1), 6) > 0.3
        OR round(coalesce(tb.top_bigram_count, 0) * 1.0 /
                 greatest(coalesce(tb.n_bigrams, 1), 1), 6) > 0.18)
         AS repetitive
FROM tw LEFT JOIN tb ON tw.doc_id = tb.doc_id
ORDER BY tw.doc_id
"""


# fixed-shape patterns: identical match sets under Java's backtracking
# and DuckDB's RE2 leftmost-longest (no ambiguous greediness, no \\b)
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"
PII_PHONE = r"\d{3}-\d{3}-\d{4}|\+\d{10,15}"


def _pii_augment() -> F.Column:
    """The synthetic corpus carries no PII; inject deterministic
    doc_id-keyed PII so the scrub path is non-vacuous — the SQL twin
    builds the exact same string."""
    tail = (
        F.when(
            F.pmod("doc_id", F.lit(4)) == 0,
            F.concat(
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.org now"),
            ),
        )
        .when(F.pmod("doc_id", F.lit(4)) == 1, F.lit(" ip 203.0.113.42 logged"))
        .when(
            F.pmod("doc_id", F.lit(4)) == 2,
            F.lit(" call 555-867-5309 or +15550001111"),
        )
        .otherwise(F.lit(""))
    )
    return F.concat(F.col("text"), tail)


def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction — a training-data pipeline must count
    and strip emails / IPs / phone numbers before the corpus ships.
    Pure codegen regex expressions; redaction order (email → ip →
    phone) is fixed so replacements cannot create new matches."""
    docs = load(spark, "documents", sf_dir)
    aug = _pii_augment()
    d = docs.select("doc_id", aug.alias("aug"))
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("aug"), PII_EMAIL, "<EMAIL>"),
            PII_IPV4,
            "<IP>",
        ),
        PII_PHONE,
        "<PHONE>",
    )
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("aug", F.lit(PII_EMAIL), 0)).alias("email_cnt"),
        F.size(F.regexp_extract_all("aug", F.lit(PII_IPV4), 0)).alias("ip_cnt"),
        F.size(F.regexp_extract_all("aug", F.lit(PII_PHONE), 0)).alias("phone_cnt"),
        F.length(scrubbed).alias("scrubbed_len"),
        F.right(scrubbed, F.lit(40)).alias("scrubbed_tail"),
    ).withColumn(
        "has_pii",
        (F.col("email_cnt") + F.col("ip_cnt") + F.col("phone_cnt")) > 0,
    ).orderBy("doc_id")


def pii_scrub_sql() -> str:
    email, ip, phone = PII_EMAIL, PII_IPV4, PII_PHONE
    return f"""
WITH aug AS (
  SELECT doc_id,
         text || CASE doc_id % 4
           WHEN 0 THEN ' contact user' || doc_id || '@example.org now'
           WHEN 1 THEN ' ip 203.0.113.42 logged'
           WHEN 2 THEN ' call 555-867-5309 or +15550001111'
           ELSE '' END AS aug
  FROM documents
),
s AS (
  SELECT doc_id, aug,
         regexp_replace(regexp_replace(regexp_replace(aug,
           '{email}', '<EMAIL>', 'g'), '{ip}', '<IP>', 'g'),
           '{phone}', '<PHONE>', 'g') AS scrubbed
  FROM aug
)
SELECT doc_id,
       len(regexp_extract_all(aug, '{email}'))::INTEGER AS email_cnt,
       len(regexp_extract_all(aug, '{ip}'))::INTEGER AS ip_cnt,
       len(regexp_extract_all(aug, '{phone}'))::INTEGER AS phone_cnt,
       length(scrubbed)::INTEGER AS scrubbed_len,
       right(scrubbed, 40) AS scrubbed_tail,
       (len(regexp_extract_all(aug, '{email}'))
        + len(regexp_extract_all(aug, '{ip}'))
        + len(regexp_extract_all(aug, '{phone}'))) > 0 AS has_pii
FROM s ORDER BY doc_id
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


SPAN_CHUNK = 10   # tokens per text span
SPAN_MEDIA_EVERY = 3  # a media span after every 3rd text chunk


def interleaved_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize the interleaved text+media span sequence for every
    document and emit one row per span in document order — the driver-
    checkable twin of the engine's span-sequence contract (the corpus
    documents table stores exactly this shape:
    spans array<struct<kind,text,media_ref,offset>>).

    Construction is row-local (transform + flatten over the token
    array, no shuffle): text spans cover SPAN_CHUNK-token windows; a
    media span (media_ref 'm/<doc>/<j>') follows every
    SPAN_MEDIA_EVERY-th chunk, carrying the token offset where it sits.
    The DuckDB oracle builds the identical sequence, so the per-span
    hash match pins ordering, offsets, and interleave positions across
    engines."""
    from .dedup import _token_arrays

    d = _token_arrays(load(spark, "documents", sf_dir))
    k = F.ceil(F.size("tok") / SPAN_CHUNK).cast("int")
    tok = F.col("tok")

    def text_span(i):
        return F.struct(
            F.lit("text").alias("kind"),
            F.element_at(tok, i * SPAN_CHUNK + 1).alias("head"),
            (i * SPAN_CHUNK).alias("offset"),
            F.lit(None).cast("string").alias("media_ref"),
        )

    def media_span(i):
        j = ((i + 1) / SPAN_MEDIA_EVERY).cast("int")
        return F.struct(
            F.lit("media").alias("kind"),
            F.lit(None).cast("string").alias("head"),
            ((i + 1) * SPAN_CHUNK).alias("offset"),
            F.concat(
                F.lit("m/"), F.col("doc_id").cast("string"), F.lit("/"),
                j.cast("string"),
            ).alias("media_ref"),
        )

    spans = F.flatten(
        F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.when(
                (i + 1) % SPAN_MEDIA_EVERY == 0,
                F.array(text_span(i), media_span(i)),
            ).otherwise(F.array(text_span(i))),
        )
    )
    return (
        d.filter(F.size("tok") > 0)
        .select("doc_id", F.posexplode(spans).alias("span_idx", "s"))
        .select(
            "doc_id", "span_idx", "s.kind", "s.head", "s.offset", "s.media_ref"
        )
        .orderBy("doc_id", "span_idx")
    )


def interleaved_spans_sql() -> str:
    tok = TOKENS_SQL.format(c="text")
    c, m = SPAN_CHUNK, SPAN_MEDIA_EVERY
    return f"""
WITH tokd AS (
  SELECT doc_id, {tok} AS tok FROM documents
),
built AS (
  SELECT doc_id,
         flatten(list_transform(range(0, cast(ceil(len(tok) / {c}.0) AS INT)),
           i -> CASE WHEN (i + 1) % {m} = 0 THEN [
                  struct_pack(kind := 'text',
                              head := tok[i * {c} + 1],
                              "offset" := i * {c},
                              media_ref := NULL::VARCHAR),
                  struct_pack(kind := 'media',
                              head := NULL::VARCHAR,
                              "offset" := (i + 1) * {c},
                              media_ref := 'm/' || doc_id || '/' ||
                                           ((i + 1) // {m}))
                ] ELSE [
                  struct_pack(kind := 'text',
                              head := tok[i * {c} + 1],
                              "offset" := i * {c},
                              media_ref := NULL::VARCHAR)
                ] END)) AS spans
  FROM tokd WHERE len(tok) > 0
)
SELECT doc_id,
       generate_subscripts(spans, 1) - 1 AS span_idx,
       unnest(spans, recursive := true)
FROM built
ORDER BY doc_id, span_idx
"""


INDEX_POSTINGS_CAP = 20
INDEX_MIN_DF = 2


MEDIA_TOKENS = 64     # context-window cost of ONE media span (the
                      # vision-encoder patch budget an interleaved LM
                      # pays per image — fixed, modality-determined)
IPK_CTX = 1024        # interleaved context length (tokens)
IPK_BUCKETS = 8       # md5-salted packing shards (sequence_packing's)


def interleaved_packing(
    spark: SparkSession,
    sf_dir: str,
    ctx_len: int = IPK_CTX,
    buckets: int = IPK_BUCKETS,
    media_tokens: int = MEDIA_TOKENS,
) -> DataFrame:
    """Modality-aware sequence packing for INTERLEAVED text+media
    documents — the batch builder an interleaved-pretraining pipeline
    needs where :func:`sequence_packing` only counts text.

    Cost model comes from the same span geometry as
    :func:`interleaved_spans` (the corpus contract:
    spans array<struct<kind,text,media_ref,offset>>): a document costs
    its text tokens PLUS ``media_tokens`` for each media span —
    n_media = ⌊⌈n_tok/SPAN_CHUNK⌉ / SPAN_MEDIA_EVERY⌋ — because the
    model pays a fixed patch budget per image regardless of pixel
    count. Packing then greedy-chops each (source, md5-salted bucket)
    stream in doc_id order at ``ctx_len`` total cost (boundary-bleed,
    the pretraining-batch discipline), emitting each doc's bin and
    intra-bin offset.

    Plan shape: cost is row-local arithmetic (no span explode — the
    counts fall out of the geometry in closed form); the only shuffle
    is the per-(source, bucket) prefix-sum window whose partition size
    the salt bounds, exactly sequence_packing's scale argument. At
    10^10 docs each bucket stream is an independent training shard."""
    docs = load(spark, "documents", sf_dir)
    n_tok = F.size(tokens(F.col("text")))
    n_chunks = F.ceil(n_tok / SPAN_CHUNK).cast("long")
    n_media = (
        F.floor(n_chunks / SPAN_MEDIA_EVERY).cast("long")
    )
    bucket = F.pmod(
        md5int(F.concat(F.lit("ipk:"), F.col("doc_id").cast("string"))),
        F.lit(buckets),
    ).cast("int")
    base = docs.select(
        "source",
        "doc_id",
        bucket.alias("bucket"),
        n_tok.cast("long").alias("n_tok"),
        n_media.alias("n_media"),
        (n_tok + n_media * media_tokens).cast("long").alias("cost"),
    )
    w = (
        Window.partitionBy("source", "bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("cost").over(w), F.lit(0).cast("long"))
    return (
        base.withColumn("bin", F.floor(cum_before / ctx_len).cast("int"))
        .withColumn(
            "bin_offset", F.pmod(cum_before, F.lit(ctx_len)).cast("int")
        )
        .orderBy("doc_id")
    )


def interleaved_packing_sql(
    ctx_len: int = IPK_CTX,
    buckets: int = IPK_BUCKETS,
    media_tokens: int = MEDIA_TOKENS,
) -> str:
    tok = TOKENS_SQL.format(c="text")
    h = MD5INT_SQL.format(c="('ipk:' || CAST(doc_id AS VARCHAR))")
    return f"""
WITH base AS (
  SELECT source, doc_id,
         CAST({h} % {buckets} AS INT) AS bucket,
         len({tok})::BIGINT AS n_tok,
         (CAST(ceil(len({tok}) / {SPAN_CHUNK}.0) AS BIGINT)
          // {SPAN_MEDIA_EVERY})::BIGINT AS n_media
  FROM documents
),
costed AS (
  SELECT *, (n_tok + n_media * {media_tokens})::BIGINT AS cost FROM base
),
packed AS (
  SELECT source, doc_id, bucket, n_tok, n_media, cost,
         coalesce(sum(cost) OVER (PARTITION BY source, bucket
                                  ORDER BY doc_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING), 0)::BIGINT AS cum_before
  FROM costed
)
SELECT source, doc_id, bucket, n_tok, n_media, cost,
       CAST(cum_before // {ctx_len} AS INT) AS bin,
       CAST(cum_before % {ctx_len} AS INT) AS bin_offset
FROM packed ORDER BY doc_id
"""


def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the inverted index a search stack consumes from a crawl:
    term → (df, tf_total, first-K posting list sorted by doc_id). The
    canonical 'index build' Spark job — one (doc, term) collapse, one
    per-term merge, both map-side combinable.

    The posting cap is applied INSIDE the aggregate (slice after
    sort_array over collected doc_ids) rather than by a window —
    collect_list here is bounded per term by the df distribution; at
    warehouse scale postings stream to a positional store and the cap
    becomes a top-K-by-rank per term, same plan shape. Terms with
    df < INDEX_MIN_DF are dropped (hapax terms dominate raw vocabulary
    and a real index shards them separately)."""
    docs = load(spark, "documents", sf_dir)
    ex = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    per_doc = ex.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    g = per_doc.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("tf_total"),
        F.slice(
            F.sort_array(F.collect_list("doc_id")), 1, INDEX_POSTINGS_CAP
        ).alias("postings"),
    )
    return (
        g.filter(F.col("df") >= INDEX_MIN_DF)
        .select(
            "term",
            "df",
            "tf_total",
            F.concat_ws(",", F.transform("postings", lambda d: d.cast("string")))
            .alias("postings_head"),
        )
        .orderBy("term")
    )


def inverted_index_sql() -> str:
    tok = TOKENS_SQL.format(c="text")
    return f"""
WITH ex AS (SELECT doc_id, unnest({tok}) AS term FROM documents),
per_doc AS (SELECT term, doc_id, count(*) AS tf FROM ex GROUP BY term, doc_id),
g AS (
  SELECT term,
         count(*) AS df,
         sum(tf)::BIGINT AS tf_total,
         list_sort(list(doc_id))[1:{INDEX_POSTINGS_CAP}] AS postings
  FROM per_doc GROUP BY term
)
SELECT term, df, tf_total,
       array_to_string(postings, ',') AS postings_head
FROM g WHERE df >= {INDEX_MIN_DF}
ORDER BY term
"""


# ---------------------------------------------------------------------------
# CCNet-style LM quality buckets (Wenzek et al. 2020)
# ---------------------------------------------------------------------------

# per-token log-probabilities are quantized to a 1e4 grid BEFORE the
# per-doc sum, so the sum is an integer SUM (order-independent across
# partitionings) instead of a float accumulation — the same fixed-point
# discipline as simsearch.DOT_SCALE. The grid is coarse enough that a
# libm ulp difference between Java's and DuckDB's log2 cannot flip the
# floor except within ~1e-12 of a grid point.
LM_LOG_SCALE = 10_000


def lm_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-shaped LM quality bucketing (Wenzek et al. 2020): score
    every document by its per-token negative log-likelihood under a
    corpus-trained add-one-smoothed unigram LM, then split the corpus
    into head / middle / tail buckets at the 25th and 75th NLL
    percentiles — the standard "keep the head, downsample the tail"
    curation signal.

    Plan shape: ONE map-side-combined token-count aggregate trains the
    LM; per-doc scoring is an equi-join of the token stream against
    the (token, logp) table and a second map-side integer sum — no
    windows, no driver loops. The two scalar corpus totals and the two
    percentile thresholds are dimension-sized driver constants (at
    10^10 docs the exact `percentile` becomes `percentile_approx`;
    everything else is unchanged). NLL sums are fixed-point integers
    (LM_LOG_SCALE grid) so bucketing is deterministic cross-engine.

    Docs with zero tokens keep a row: n_tok 0, null nll, null bucket.
    """
    d = load(spark, "documents", sf_dir)
    tokd = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("t"))
    cnt = tokd.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("v")
    ).collect()[0]
    denom = float(tot["n"] + tot["v"])  # 2-scalar driver constant
    lp = cnt.select(
        "t",
        F.floor(
            F.log2((F.col("c") + 1).cast("double") / F.lit(denom))
            * LM_LOG_SCALE
        )
        .cast("long")
        .alias("ilp"),
    )
    doc = (
        tokd.join(lp, "t")
        .groupBy("doc_id")
        .agg((-F.sum("ilp")).alias("inll"), F.count(F.lit(1)).alias("n_tok"))
        .withColumn("irate", F.expr("inll div n_tok"))
    )
    th = doc.agg(
        F.expr("percentile(irate, array(0.25, 0.75))").alias("th")
    ).collect()[0]["th"]
    t1, t2 = float(th[0]), float(th[1])
    return (
        d.select("doc_id")
        .join(doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tok", F.lit(0).cast("long")).alias("n_tok"),
            # nll derives from the INTEGER irate (truncated fixed-point),
            # not a float round: round(x, 4) half-way cases differ between
            # Spark (BigDecimal HALF_UP on the shortest decimal repr) and
            # DuckDB (raw-double rounding) — same-int ÷ same-constant is
            # the same double in both engines, bit-for-bit
            (F.col("irate") / F.lit(float(LM_LOG_SCALE))).alias("nll"),
            F.when(F.col("irate").isNull(), F.lit(None).cast("string"))
            .when(F.col("irate") <= t1, F.lit("head"))
            .when(F.col("irate") > t2, F.lit("tail"))
            .otherwise(F.lit("middle"))
            .alias("bucket"),
        )
        .orderBy("doc_id")
    )


def lm_perplexity_buckets_sql() -> str:
    tok = TOKENS_SQL.format(c="text")
    s = LM_LOG_SCALE
    return f"""
WITH tokd AS MATERIALIZED (
  SELECT doc_id, unnest({tok}) AS t FROM documents
),
cnt AS (SELECT t, count(*) AS c FROM tokd GROUP BY t),
tot AS (SELECT sum(c) AS n, count(*) AS v FROM cnt),
lp AS (
  SELECT t, floor(log2((c + 1)::DOUBLE / (n + v)) * {s})::BIGINT AS ilp
  FROM cnt, tot
),
doc AS (
  SELECT doc_id, (-sum(ilp))::BIGINT AS inll, count(*) AS n_tok
  FROM tokd JOIN lp USING (t) GROUP BY doc_id
),
rates AS (SELECT doc_id, inll, n_tok, (inll // n_tok)::BIGINT AS irate FROM doc),
th AS (
  SELECT quantile_cont(irate, 0.25) AS t1, quantile_cont(irate, 0.75) AS t2
  FROM rates
)
SELECT d.doc_id,
       coalesce(r.n_tok, 0) AS n_tok,
       r.irate / {s}.0 AS nll,
       CASE WHEN r.irate IS NULL THEN NULL
            WHEN r.irate <= th.t1 THEN 'head'
            WHEN r.irate > th.t2 THEN 'tail'
            ELSE 'middle' END AS bucket
FROM documents d LEFT JOIN rates r USING (doc_id), th
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# media→caption alignment over the interleaved span sequence
# ---------------------------------------------------------------------------


def caption_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-caption pair extraction for interleaved multimodal
    pretraining: for every media span, the nearest text span by token
    offset (ties → the earlier text span) becomes its caption — the
    alignment step that turns an interleaved document into (media,
    caption) training pairs.

    Entirely ROW-LOCAL: the span sequence is built per document (the
    same construction :func:`interleaved_spans` pins cross-engine) and
    the nearest-text search is a higher-order transform over the
    in-row array — zero shuffle for 10^10 documents; the only exchange
    is the final presentation sort."""
    from .dedup import _token_arrays

    d = _token_arrays(load(spark, "documents", sf_dir))
    k = F.ceil(F.size("tok") / SPAN_CHUNK).cast("int")
    tok = F.col("tok")

    # (offset, head) text chunks and (offset, media_ref) media spans —
    # the same grid as interleaved_spans, kept as in-row arrays
    texts = F.transform(
        F.sequence(F.lit(0), k - 1),
        lambda i: F.struct(
            (i * SPAN_CHUNK).alias("offset"),
            F.element_at(tok, i * SPAN_CHUNK + 1).alias("head"),
        ),
    )
    medias = F.filter(
        F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.struct(
                ((i + 1) * SPAN_CHUNK).alias("offset"),
                F.when(
                    (i + 1) % SPAN_MEDIA_EVERY == 0,
                    F.concat(
                        F.lit("m/"),
                        F.col("doc_id").cast("string"),
                        F.lit("/"),
                        ((i + 1) / SPAN_MEDIA_EVERY).cast("int").cast("string"),
                    ),
                ).alias("media_ref"),
            ),
        ),
        lambda s: s["media_ref"].isNotNull(),
    )
    paired = F.transform(
        medias,
        lambda ms: F.struct(
            ms["media_ref"].alias("media_ref"),
            ms["offset"].alias("media_offset"),
            F.element_at(
                F.array_sort(
                    F.transform(
                        texts,
                        lambda t: F.struct(
                            F.abs(t["offset"] - ms["offset"]).alias("dist"),
                            t["offset"].alias("cap_offset"),
                            t["head"].alias("cap_head"),
                        ),
                    )
                ),
                1,
            ).alias("best"),
        ),
    )
    return (
        d.filter(F.size("tok") > 0)
        .select("doc_id", F.explode(paired).alias("p"))
        .select(
            "doc_id",
            F.col("p.media_ref").alias("media_ref"),
            F.col("p.media_offset").alias("media_offset"),
            F.col("p.best.dist").alias("dist"),
            F.col("p.best.cap_offset").alias("cap_offset"),
            F.col("p.best.cap_head").alias("cap_head"),
        )
        .orderBy("doc_id", "media_offset")
    )


def caption_pairs_sql() -> str:
    tok = TOKENS_SQL.format(c="text")
    c, m = SPAN_CHUNK, SPAN_MEDIA_EVERY
    return f"""
WITH tokd AS (
  SELECT doc_id, {tok} AS tok FROM documents
),
built AS (
  SELECT doc_id,
         list_transform(range(0, cast(ceil(len(tok) / {c}.0) AS INT)),
           i -> struct_pack("offset" := i * {c}, head := tok[i * {c} + 1])
         ) AS texts,
         list_filter(
           list_transform(range(0, cast(ceil(len(tok) / {c}.0) AS INT)),
             i -> struct_pack(
                    "offset" := (i + 1) * {c},
                    media_ref := CASE WHEN (i + 1) % {m} = 0
                      THEN 'm/' || doc_id || '/' || ((i + 1) // {m})
                      ELSE NULL END)),
           s -> s.media_ref IS NOT NULL
         ) AS medias
  FROM tokd WHERE len(tok) > 0
),
pairs AS (
  SELECT doc_id,
         unnest(list_transform(medias, ms -> struct_pack(
           media_ref := ms.media_ref,
           media_offset := ms."offset",
           best := list_sort(list_transform(texts,
             t -> struct_pack(dist := abs(t."offset" - ms."offset"),
                              cap_offset := t."offset",
                              cap_head := t.head)))[1]
         ))) AS p
  FROM built
)
SELECT doc_id,
       p.media_ref AS media_ref,
       p.media_offset AS media_offset,
       p.best.dist AS dist,
       p.best.cap_offset AS cap_offset,
       p.best.cap_head AS cap_head
FROM pairs
ORDER BY doc_id, media_offset
"""


# ---------------------------------------------------------------------------
# Bigram LM with stupid backoff — held-out perplexity (Brants et al. 2007)
# ---------------------------------------------------------------------------

SB_ALPHA = 0.4      # stupid-backoff weight (Brants et al.'s constant)
SB_TRAIN_MOD = 10   # md5 % 10 < 8 → train split (80/20)


def bigram_lm_heldout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out bigram perplexity under STUPID BACKOFF (Brants, Popat,
    Xu, Och & Dean, EMNLP 2007) — the LM scoring variant chosen here
    for exactly the reason Google chose it at web scale: Kneser-Ney's
    continuation counts need a second global pass and careful
    normalization, while stupid backoff is two count tables and a
    constant, "inexpensive to calculate in a distributed environment
    while approaching the quality of Kneser-Ney smoothing as the
    amount of training data increases" (their abstract). This is the
    bigram upgrade of lm_perplexity_buckets' unigram score, with the
    missing methodological piece added: the LM trains on an md5-split
    80% and scores the HELD-OUT 20% (scoring training text flatters
    the model; the held-out number is the one a data-quality gate can
    act on — leakage_safe_split's argument applied to the LM itself).

    Score per held-out token: first token → add-one unigram
    (c1+1)/(T+V); seen bigram → c2(w1,t)/c1(w1); else → α·(c1+1)/(T+V)
    with α = 0.4 (backoff also covers prev-token-unseen; both engines
    take the identical branch because the counts are identical
    integers, and each branch's probability is the same two-integer
    division in both engines → the log2 grid floor can differ only in
    the lm_perplexity_buckets ulp class). Unseen bigrams are RARE on
    the shared-vocab corpus (2-3 per shipped scale) but nonzero —
    pinned in tests, not assumed.

    Plan shape: ONE train-token count agg (c1: |vocab| rows) + ONE
    train-bigram count agg (c2: ≤|vocab|² rows) — both broadcast
    dimensions; the held-out stream takes the per-doc lag window
    (bounded partitions) and three broadcast joins; per-doc NLL is a
    map-side integer sum. T,V are the 2-scalar driver constant the
    unigram op already uses."""
    d = load(spark, "documents", sf_dir)
    tokd = d.select(
        "doc_id",
        F.posexplode(tokens(F.col("text"))).alias("pos", "t"),
    ).withColumn(
        "train",
        md5int(F.concat(F.lit("split:"), F.col("doc_id").cast("string")))
        % SB_TRAIN_MOD
        < 8,
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    seq = tokd.withColumn("w1", F.lag("t").over(w))
    c1 = (
        seq.filter("train")
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c1"))
        .localCheckpoint(eager=True)
    )
    tot = c1.agg(F.sum("c1").alias("n"), F.count(F.lit(1)).alias("v")).collect()[0]
    denom = float(tot["n"] + tot["v"])  # 2-scalar driver constant
    c2 = (
        seq.filter(F.col("train") & F.col("w1").isNotNull())
        .groupBy("w1", "t")
        .agg(F.count(F.lit(1)).alias("c2"))
        .localCheckpoint(eager=True)
    )
    held = (
        seq.filter(~F.col("train"))
        .join(F.broadcast(c1), "t", "left")
        .join(
            F.broadcast(c1.select(F.col("t").alias("w1"), F.col("c1").alias("c1p"))),
            "w1",
            "left",
        )
        .join(F.broadcast(c2), ["w1", "t"], "left")
    )
    uni = (F.coalesce("c1", F.lit(0)) + 1).cast("double") / F.lit(denom)
    p = (
        F.when(F.col("w1").isNull(), uni)
        .when(
            F.col("c2").isNotNull(),
            F.col("c2").cast("double") / F.col("c1p").cast("double"),
        )
        .otherwise(F.lit(SB_ALPHA) * uni)
    )
    is_backoff = (
        F.col("w1").isNotNull() & F.col("c2").isNull()
    ).cast("long")
    scored = held.select(
        "doc_id",
        F.floor(F.log2(p) * LM_LOG_SCALE).cast("long").alias("ilp"),
        is_backoff.alias("bk"),
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            (-F.sum("ilp")).alias("inll"),
            F.sum("bk").alias("backoff_hits"),
        )
        .withColumn("irate", F.expr("inll div n_tok"))
        .select("doc_id", "n_tok", "inll", "irate", "backoff_hits")
        .orderBy("doc_id")
    )


def bigram_lm_sql() -> str:
    tok = TOKENS_SQL.format(c="text")
    h = MD5INT_SQL.format(c="'split:' || CAST(doc_id AS VARCHAR)")
    s = LM_LOG_SCALE
    return f"""
WITH tokd AS MATERIALIZED (
  SELECT doc_id,
         ({h}) % {SB_TRAIN_MOD} < 8 AS train,
         unnest({tok}) AS t,
         generate_subscripts({tok}, 1) AS pos
  FROM documents),
seq AS MATERIALIZED (
  SELECT doc_id, train, t, pos,
         lag(t) OVER (PARTITION BY doc_id ORDER BY pos) AS w1
  FROM tokd),
c1 AS (SELECT t, count(*) AS c1 FROM seq WHERE train GROUP BY t),
tot AS (SELECT sum(c1) AS n, count(*) AS v FROM c1),
c2 AS (SELECT w1, t, count(*) AS c2 FROM seq
       WHERE train AND w1 IS NOT NULL GROUP BY w1, t),
held AS (
  SELECT q.doc_id, q.w1, a.c1, b.c1 AS c1p, x.c2
  FROM seq q
  LEFT JOIN c1 a ON q.t = a.t
  LEFT JOIN c1 b ON q.w1 = b.t
  LEFT JOIN c2 x ON q.w1 = x.w1 AND q.t = x.t
  WHERE NOT q.train),
scored AS (
  SELECT doc_id,
         floor(log2(
           CASE WHEN w1 IS NULL
                THEN (coalesce(c1, 0) + 1)::DOUBLE / (SELECT n + v FROM tot)
                WHEN c2 IS NOT NULL
                THEN c2::DOUBLE / c1p::DOUBLE
                ELSE {SB_ALPHA} * ((coalesce(c1, 0) + 1)::DOUBLE
                                   / (SELECT n + v FROM tot)) END
         ) * {s})::BIGINT AS ilp,
         (w1 IS NOT NULL AND c2 IS NULL)::BIGINT AS bk
  FROM held)
SELECT doc_id, count(*) AS n_tok, (-sum(ilp))::BIGINT AS inll,
       ((-sum(ilp))::BIGINT // count(*))::BIGINT AS irate,
       sum(bk)::BIGINT AS backoff_hits
FROM scored GROUP BY doc_id ORDER BY doc_id
"""
