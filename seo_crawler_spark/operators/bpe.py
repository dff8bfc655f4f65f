"""Distributed BPE tokenizer training (Sennrich et al. 2016).

The tokenizer-training step of a pretraining pipeline: iteratively
find the most frequent adjacent token pair across the corpus and merge
it, emitting the ordered merge table a tokenizer ships with.

Spark shape per iteration (k iterations total):

* pair counting — one row-local bigram explode + ONE map-side-combined
  (left, right) count aggregate; the winning pair is a 1-row driver
  collect (the same per-iteration driver constant every distributed
  tokenizer trainer ends an iteration with);
* merge application — a row-local string ``replace`` on a two-space
  separated token string (see below); zero shuffle;
* lineage — pending merges accumulate as nested row-local replace
  expressions; the corpus re-checkpoints through ``ckpt.local_ckpt``
  (the stats-safe barrier the PageRank/HITS/connected-components loops
  use) every ``ckpt_every`` merges to bound recompute depth.

At 10^10 documents, tokenizer training runs on a corpus SAMPLE by
standard practice (a hash-mod filter slots in front of this operator —
sampling.stratified_sample is the shipped mechanism); the per-iteration
cost is one map-side agg over the sample either way.

Greedy-merge encoding trick (what makes the merge step one `replace`):
tokens are joined with TWO spaces and the string is wrapped in single
spaces, so the pattern ``' l  r '`` of an adjacent pair consumes the
last space of the left gap and the first space of the right gap — and
therefore two ADJACENT matches never share a character. Plain
substring replace in both Spark and DuckDB scans left-to-right
non-overlapping, which under this framing IS exactly BPE's greedy
leftmost-first merge order: ``a a a a`` merges to ``aa aa``, never
``a aa a``. Tokens are ``\\w+`` so a space separator can't collide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ckpt import local_ckpt
from ..functions.text import TOKENS_SQL, tokens
from ..sources.tables import load

BPE_MERGES = 8


def _pair_counts(corpus: DataFrame) -> DataFrame:
    """(l, r, cnt) over adjacent token pairs of the two-space string.

    Pairs come from ``zip_with(slice(t,1,n-1), slice(t,2,n-1))``, NOT
    ``transform(sequence, i -> element_at(t, i))``: CollapseProject
    inlines the split/filter into every ``element_at`` reference, so
    the sequence form re-splits the string ~2n× per row (measured
    6.7 s/iteration at sf0.1 vs 0.35 s for this form — the same trap
    dedup._token_arrays documents)."""
    t = F.filter(F.split(F.col("s"), " "), lambda x: x != "")
    pairs = F.when(
        F.size(t) >= 2,
        F.zip_with(
            F.slice(t, 1, F.size(t) - 1),
            F.slice(t, 2, F.size(t) - 1),
            lambda a, b: F.struct(a.alias("l"), b.alias("r")),
        ),
    ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
    return (
        corpus.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def bpe_train_merges(
    corpus: DataFrame, merges: int = BPE_MERGES, ckpt_every: int = 16
) -> list[tuple[int, str, str, int]]:
    """Run ``merges`` BPE iterations over a (doc_id, s) corpus where
    ``s`` is the two-space-joined wrapped token string. Returns
    [(step, left, right, pair_count), ...] in merge order. Ties on
    count break to the lexicographically smallest (left, right) —
    binary collation in both engines for ``\\w+`` tokens.

    Pending merges stay as a NESTED replace expression (pure row-local
    codegen — no joins, so plan stats can't blow up) and the corpus
    only re-materializes through ``ckpt.local_ckpt`` every
    ``ckpt_every`` steps: re-applying ≤ckpt_every cheap replaces per
    count pass beats an eager materialization per step (measured
    5.4 s vs 6.5 s for 8 merges at sf0.1), while the periodic barrier
    keeps recompute depth bounded for a real 30k-merge vocabulary."""
    out: list[tuple[int, str, str, int]] = []
    cur = corpus
    for step in range(1, merges + 1):
        top = (
            _pair_counts(cur)
            .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        l, r, cnt = top[0]["l"], top[0]["r"], int(top[0]["cnt"])
        out.append((step, l, r, cnt))
        cur = cur.select(
            "doc_id",
            F.replace(
                F.col("s"), F.lit(f" {l}  {r} "), F.lit(f" {l}{r} ")
            ).alias("s"),
        )
        if step % ckpt_every == 0:
            cur = cur.transform(local_ckpt)
    return out


def bpe_merges_query(
    spark: SparkSession, sf_dir: str, merges: int = BPE_MERGES
) -> DataFrame:
    """Registered query: the ordered merge table learned from the
    documents corpus — (step, left, right, pair_count, new_token)."""
    d = load(spark, "documents", sf_dir)
    corpus = d.select(
        "doc_id",
        F.concat(
            F.lit(" "), F.array_join(tokens(F.col("text")), "  "), F.lit(" ")
        ).alias("s"),
    ).transform(local_ckpt)
    rows = bpe_train_merges(corpus, merges)
    return spark.createDataFrame(
        [(s, l, r, c, l + r) for s, l, r, c in rows],
        "step int, left string, right string, pair_count long, new_token string",
    ).orderBy("step")


def bpe_merges_sql(merges: int = BPE_MERGES) -> str:
    """DuckDB twin: identical wrapped-string encoding, unrolled one CTE
    pair per iteration (count → 1-row top pair → replace), identical
    (cnt DESC, l, r) tie-break."""
    tok = TOKENS_SQL.format(c="text")
    steps = []
    prev = "c0"
    for i in range(1, merges + 1):
        steps.append(
            f"""p{i} AS (
  SELECT pr.l, pr.r, count(*) AS cnt FROM (
    SELECT unnest(list_transform(range(1, len(t)),
                  j -> struct_pack(l := t[j], r := t[j + 1]))) AS pr
    FROM (SELECT list_filter(string_split(s, ' '), x -> x <> '') AS t
          FROM {prev})
    WHERE len(t) >= 2
  ) GROUP BY pr.l, pr.r),
m{i} AS MATERIALIZED (
  SELECT {i} AS step, l, r, cnt FROM p{i}
  ORDER BY cnt DESC, l, r LIMIT 1),
c{i} AS MATERIALIZED (
  SELECT doc_id,
         replace(s, ' ' || m.l || '  ' || m.r || ' ',
                    ' ' || m.l || m.r || ' ') AS s
  FROM {prev}, m{i} m)"""
        )
        prev = f"c{i}"
    merged = " UNION ALL ".join(f"SELECT * FROM m{i}" for i in range(1, merges + 1))
    return f"""
WITH c0 AS MATERIALIZED (
  SELECT doc_id, ' ' || array_to_string({tok}, '  ') || ' ' AS s
  FROM documents
),
{', '.join(steps)}
SELECT step, l AS left, r AS right, cnt::BIGINT AS pair_count,
       l || r AS new_token
FROM ({merged}) ORDER BY step
"""


def bpe_encode(
    spark: SparkSession, sf_dir: str, merges: int = BPE_MERGES
) -> DataFrame:
    """Apply the learned merge table to the corpus — the ENCODE side of
    the tokenizer: every document's token stream re-segmented under
    the merges, reported as (doc_id, n_raw, n_bpe, top BPE token).
    Application is ROW-LOCAL: the k merges become k nested string
    replaces (the training loop's own encoding trick), so encoding
    10^10 documents is a zero-shuffle map — exactly how a trained
    tokenizer deploys. The merge table itself is a k-row driver
    constant (collected once from training)."""
    d = load(spark, "documents", sf_dir)
    corpus = d.select(
        "doc_id",
        F.concat(
            F.lit(" "), F.array_join(tokens(F.col("text")), "  "), F.lit(" ")
        ).alias("s"),
    ).transform(local_ckpt)
    table = bpe_train_merges(corpus, merges)
    s = F.col("s")
    for _, l, r, _ in table:
        s = F.replace(s, F.lit(f" {l}  {r} "), F.lit(f" {l}{r} "))
    t_raw = F.filter(F.split(F.col("s"), " "), lambda x: x != "")
    enc = corpus.select(
        "doc_id", F.size(t_raw).alias("n_raw"), s.alias("es")
    )
    t_bpe = F.filter(F.split(F.col("es"), " "), lambda x: x != "")
    return (
        enc.select(
            "doc_id",
            "n_raw",
            F.size(t_bpe).alias("n_bpe"),
            F.array_max(t_bpe).alias("top_token"),
        )
        .orderBy("doc_id")
    )


def bpe_encode_sql(merges: int = BPE_MERGES) -> str:
    """DuckDB twin: re-runs the unrolled training CTEs to the final
    corpus state c{k} (whose string IS the base string with every merge
    applied, in order) and reports the same per-doc segmentation."""
    base = bpe_merges_sql(merges).strip()
    # reuse the training CTE chain; c{merges} is the fully-merged corpus
    inner = base[base.index("WITH") + 4 : base.rindex("SELECT step")].strip()
    return f"""
WITH {inner},
raw AS (
  SELECT doc_id,
         len(list_filter(string_split(s, ' '), x -> x <> '')) AS n_raw
  FROM c0
),
enc AS (
  SELECT doc_id,
         list_filter(string_split(s, ' '), x -> x <> '') AS t
  FROM c{merges}
)
SELECT raw.doc_id, raw.n_raw,
       len(enc.t) AS n_bpe,
       list_max(enc.t) AS top_token
FROM raw JOIN enc USING (doc_id)
ORDER BY raw.doc_id
"""


def tokenizer_stats(
    spark: SparkSession, sf_dir: str, merges: int = BPE_MERGES
) -> DataFrame:
    """Per-language tokenizer diagnostics over the trained BPE — the
    table a multilingual-tokenizer owner reads before fixing a vocab:
    fertility (BPE tokens per raw word; >1 means words split) and
    compression (chars per BPE token) per language, the standard
    readout for spotting languages a shared vocabulary tokenizes badly
    (the usual motivation for revisiting merges or per-lang vocab).

    Composition + plan shape: REUSES the registered bpe_encode operator
    verbatim (row-local merge application; the merge table is the
    trained k-row driver constant), one corpus-scale equi-join on
    doc_id to recover (lang, n_chars) — co-partitioned by the storage
    key, the join a bucketed documents table executes without a
    shuffle — then ONE map-side-combined per-language aggregate.
    Ratios are single divisions of exact integer sums (the house
    cross-engine rule), reported corpus-weighted (sum/sum, not
    mean-of-ratios — short docs don't dominate)."""
    enc = bpe_encode(spark, sf_dir, merges)
    d = load(spark, "documents", sf_dir).select("doc_id", "lang", "n_chars")
    return (
        enc.join(d, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_raw").alias("raw_tokens"),
            F.sum("n_bpe").alias("bpe_tokens"),
            F.sum("n_chars").alias("chars"),
        )
        .select(
            "lang",
            "n_docs",
            "raw_tokens",
            "bpe_tokens",
            "chars",
            (F.col("bpe_tokens") / F.col("raw_tokens")).alias("fertility"),
            (F.col("chars") / F.col("bpe_tokens")).alias("chars_per_tok"),
        )
        .orderBy("lang")
    )


def tokenizer_stats_sql(merges: int = BPE_MERGES) -> str:
    base = bpe_encode_sql(merges).strip()
    inner = base[base.index("WITH") + 4 : base.rindex("SELECT raw.doc_id")].strip()
    return f"""
WITH {inner},
perdoc AS (
  SELECT raw.doc_id, raw.n_raw, len(enc.t) AS n_bpe
  FROM raw JOIN enc USING (doc_id)
)
SELECT d.lang,
       count(*) AS n_docs,
       sum(p.n_raw)::BIGINT AS raw_tokens,
       sum(p.n_bpe)::BIGINT AS bpe_tokens,
       sum(d.n_chars)::BIGINT AS chars,
       sum(p.n_bpe)::BIGINT / sum(p.n_raw)::BIGINT AS fertility,
       sum(d.n_chars)::BIGINT / sum(p.n_bpe)::BIGINT AS chars_per_tok
FROM perdoc p JOIN documents d USING (doc_id)
GROUP BY d.lang
ORDER BY d.lang
"""


# ---------------------------------------------------------------------------
# vocabulary coverage curve (tokenizer vocab-size planning)
# ---------------------------------------------------------------------------

VOCAB_STEPS = [1, 2, 4, 8, 16, 32]  # candidate vocab sizes; a production
# run passes [1e3 .. 1e6] — the shipped corpus has ~31 types, so the
# steps are scaled to keep every row of the curve discriminative
VOCAB_RANK_BUCKETS = 32  # two-phase top-k salt (bm25_topk discipline)


def vocab_coverage(
    spark: SparkSession, sf_dir: str, steps: list[int] | None = None
) -> DataFrame:
    """Vocabulary coverage curve — for each candidate vocab size N,
    the fraction of corpus TOKEN OCCURRENCES covered by the N most
    frequent types (and the complementary OOV rate). This is the
    tokenizer-vocab-size planning readout: where the curve flattens is
    where growing the vocabulary stops paying for itself (Sennrich et
    al. 2016 size-selection practice; the same curve drives stopword
    cutoffs and feature-hash sizing).

    Scale shape: ONE map-side-combined type-count aggregate, then the
    global frequency rank runs TWO-PHASE (rank within md5-salted
    buckets, keep per-bucket top max(N) ≤ steps' max, then rank the
    ≤ buckets×max(N) survivors) — no single-reducer sort over the
    vocabulary at any corpus size (the bm25_topk discipline). The
    corpus totals are a 2-scalar driver constant. Coverage and OOV are
    single divisions of exact integer sums (same-int ÷ same-int is the
    same double bit-for-bit in both engines — no float accumulation
    anywhere)."""
    from pyspark.sql import Window

    from ..functions.text import md5int

    steps = steps or VOCAB_STEPS
    top = max(steps)
    d = load(spark, "documents", sf_dir)
    cnt = (
        d.select(F.explode(tokens(F.col("text"))).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)  # feeds the rank chain + the totals
    )
    tot = cnt.agg(F.sum("c").alias("n"), F.count(F.lit(1)).alias("v")).collect()[0]
    n_tokens, n_types = int(tot["n"]), int(tot["v"])
    # phase 1: per-bucket rank; only per-bucket top `top` survive
    w1 = Window.partitionBy("bk").orderBy(F.desc("c"), F.asc("t"))
    sur = (
        cnt.withColumn("bk", F.pmod(md5int(F.col("t")), F.lit(VOCAB_RANK_BUCKETS)))
        .withColumn("r1", F.row_number().over(w1))
        .filter(F.col("r1") <= top)
    )
    # phase 2: global rank over <= buckets*top survivors (tiny)
    w2 = Window.orderBy(F.desc("c"), F.asc("t"))
    ranked = sur.withColumn("rnk", F.row_number().over(w2))
    stepc = F.explode(F.array(*[F.lit(n) for n in sorted(steps)])).alias("vocab_n")
    return (
        ranked.select("c", "rnk", stepc)
        .filter(F.col("rnk") <= F.col("vocab_n"))
        .groupBy("vocab_n")
        .agg(F.sum("c").alias("covered_tokens"), F.count(F.lit(1)).alias("types_used"))
        .select(
            "vocab_n",
            "types_used",
            "covered_tokens",
            (F.col("covered_tokens") / F.lit(float(n_tokens))).alias("coverage"),
            (
                (F.lit(n_tokens) - F.col("covered_tokens")) / F.lit(float(n_tokens))
            ).alias("oov_rate"),
        )
        .orderBy("vocab_n")
    )


def vocab_coverage_sql(steps: list[int] | None = None) -> str:
    tok = TOKENS_SQL.format(c="text")
    ns = ", ".join(str(n) for n in sorted(steps or VOCAB_STEPS))
    return f"""
WITH cnt AS (
  SELECT t, count(*) AS c FROM (
    SELECT unnest({tok}) AS t FROM documents) GROUP BY t
),
tot AS (SELECT sum(c) AS n FROM cnt),
ranked AS (
  SELECT c, row_number() OVER (ORDER BY c DESC, t) AS rnk FROM cnt
)
SELECT s.vocab_n,
       count(*) AS types_used,
       sum(ranked.c)::BIGINT AS covered_tokens,
       sum(ranked.c)::BIGINT / (SELECT n::DOUBLE FROM tot) AS coverage,
       ((SELECT n FROM tot) - sum(ranked.c))::BIGINT
         / (SELECT n::DOUBLE FROM tot) AS oov_rate
FROM ranked, (SELECT unnest([{ns}]) AS vocab_n) s
WHERE ranked.rnk <= s.vocab_n
GROUP BY s.vocab_n
ORDER BY s.vocab_n
"""
