"""Deterministic sampling operators for training-data mixing.

A 100 TB corpus is never trained on wholesale: pipelines draw
per-source / per-language mixtures (stratified rates) and fixed-size
uniform subsets. Both operators here are HASH-deterministic — no RNG,
no seed plumbing, identical output on any cluster size or partitioning,
and reproducible by the DuckDB oracle bit-for-bit:

* stratified_sample — keep a row iff md5(doc) mod 1000 < rate(lang).
  Map-only (no shuffle); rates are plan literals. The classic
  hash-mod sampler: adjusting a stratum's rate up strictly grows its
  sample (nested samples), which re-runs love.
* sample_bottomk — the bottom-k-by-hash sketch: the k smallest hash
  values form an exact uniform k-subset. Spark executes orderBy+limit
  as TakeOrdered (per-partition top-k + driver merge) — no global sort
  shuffle, O(k) driver memory at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ckpt import local_ckpt
from ..functions.text import MD5INT_SQL, md5int, shingles, tokens
from ..sources.tables import load

# per-language keep rates, in thousandths (training-mixture weights)
STRATA_RATES = {"en": 800, "de": 500, "fr": 400, "es": 300}
DEFAULT_RATE = 200
BOTTOM_K = 100


def _samp_hash(col):
    """Sampling hash keyed off a salt so it is independent of every
    other md5 use of doc_id in the pipeline."""
    return md5int(F.concat(F.lit("samp:"), col.cast("string"))) % 1000


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    rate = F.lit(DEFAULT_RATE)
    for lang, r in STRATA_RATES.items():
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    return (
        docs.withColumn("bucket_1k", _samp_hash(F.col("doc_id")))
        .filter(F.col("bucket_1k") < rate)
        .select("doc_id", "lang", "bucket_1k")
        .orderBy("doc_id")
    )


def stratified_sample_sql() -> str:
    h = MD5INT_SQL.format(c="('samp:' || doc_id)")
    whens = " ".join(
        f"WHEN lang = '{lang}' THEN {r}" for lang, r in STRATA_RATES.items()
    )
    return f"""
WITH hashed AS (
  SELECT doc_id, lang, ({h} % 1000) AS bucket_1k,
         CASE {whens} ELSE {DEFAULT_RATE} END AS rate
  FROM documents
)
SELECT doc_id, lang, bucket_1k FROM hashed
WHERE bucket_1k < rate ORDER BY doc_id
"""


def sample_bottomk(spark: SparkSession, sf_dir: str, k: int = BOTTOM_K) -> DataFrame:
    docs = load(spark, "documents", sf_dir)
    h = md5int(F.concat(F.lit("bk:"), F.col("doc_id").cast("string")))
    return (
        docs.select("doc_id", h.alias("h"))
        .orderBy("h", "doc_id")  # TakeOrdered — no global sort shuffle
        .limit(k)
        .select("doc_id", "h")
    )


def sample_bottomk_sql(k: int = BOTTOM_K) -> str:
    h = MD5INT_SQL.format(c="('bk:' || doc_id)")
    return f"""
SELECT doc_id, {h} AS h FROM documents
ORDER BY h, doc_id LIMIT {k}
"""


# ---------------------------------------------------------------------------
# deterministic training-order shuffle + sharding
# ---------------------------------------------------------------------------

SHUFFLE_SHARDS = 8
SHUFFLE_SEED = "ep0"


def training_shuffle(
    spark: SparkSession, sf_dir: str, n_shards: int = SHUFFLE_SHARDS,
    seed: str = SHUFFLE_SEED,
) -> DataFrame:
    """The global-shuffle step of a training run: assign every document
    a shard and a position so that reading shards in order yields a
    pseudo-random permutation of the corpus — deterministic in the
    seed (re-runs and engines agree exactly), with NO global sort:
    shard = hash mod n_shards (row-local) and position is a
    row_number window PER SHARD, so the only exchange partitions by
    shard — at 10^10 docs each shard sorts independently (and in a
    real run is written straight out via
    ``df.repartition("shard").sortWithinPartitions(...)``, the same
    plan shape). A new epoch is a new seed string, not a new plan."""
    docs = load(spark, "documents", sf_dir)
    h = md5int(
        F.concat(F.lit(f"shuf:{seed}:"), F.col("doc_id").cast("string"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return (
        docs.select("doc_id", h.alias("h"))
        .withColumn("shard", F.pmod(F.col("h"), F.lit(n_shards)).cast("int"))
        .withColumn("pos", F.row_number().over(w))
        .select("doc_id", "shard", "pos")
        .orderBy("shard", "pos")
    )


def training_shuffle_sql(
    n_shards: int = SHUFFLE_SHARDS, seed: str = SHUFFLE_SEED
) -> str:
    h = MD5INT_SQL.format(c=f"('shuf:{seed}:' || doc_id)")
    return f"""
WITH hashed AS (
  SELECT doc_id, {h} AS h FROM documents
),
sharded AS (
  SELECT doc_id, h, (h % {n_shards})::INT AS shard FROM hashed
)
SELECT doc_id, shard,
       row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS pos
FROM sharded
ORDER BY shard, pos
"""


# ---------------------------------------------------------------------------
# DSIR — data selection via importance resampling (Xie et al. 2023)
# ---------------------------------------------------------------------------

DSIR_BUCKETS = 4096        # hashed n-gram feature space (paper: 10^4)
DSIR_SCALE = 10_000        # fixed-point grid for per-bucket log-probs
DSIR_KEEP = 100            # resampled subset size
DSIR_TARGET_LANG = "en"    # the "target distribution" split
DSIR_SALTS = 32            # phase-1 parallelism of the top-k


def dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): fit two bag-of-hashed-
    n-gram unigram LMs — one on the target split (here lang = 'en', the
    Wikipedia-style target of the paper), one on the raw pool — weight
    every raw document by its log-likelihood ratio, and Gumbel-top-k
    resample DSIR_KEEP docs (sampling WITHOUT replacement with
    probability ∝ importance weight, per the Gumbel-max trick the paper
    uses; the Gumbel noise here is salted-md5-derived, so the draw is
    deterministic and engine-independent).

    Plan shape — three map-side-combined aggregates and one bounded
    equi-join: tokenize + explode (unigrams ∪ bigram shingles) → hashed
    bucket; ONE (bucket)-grouped count yields both LMs (the target flag
    is an aggregate CASE, not a second pass); the per-bucket log-ratio
    table is DSIR_BUCKETS rows (a broadcast dimension at any corpus
    size); per-doc weights are an equi-join on bucket + integer sum;
    the final draw reuses the two-phase salted top-k (no single-reducer
    sort). The two LM denominators are the documented 2-scalar
    driver-constant pattern.

    Determinism: per-bucket log-probs are floored onto the DSIR_SCALE
    grid BEFORE the subtraction, so the ratio table and every doc
    weight are integers; the only doubles are the final key
    lw + gumbel(md5) — one expression over identical integer inputs in
    both engines (`ln` ulp risk class as lm_perplexity, documented
    there). Zero-token docs have no features and drop from the pool, as
    in the reference method."""
    docs = load(spark, "documents", sf_dir).select("doc_id", "lang", "text")
    # materialize the token array as a COLUMN before shingling: inlining
    # tokens(text) into the shingle lambda re-runs the regex per element
    # (no common-subexpression elimination across the transform
    # boundary — measured 14× slower at sf0.1), the same reason the
    # dedup family routes through _token_arrays
    tokd = docs.select("doc_id", "lang", tokens(F.col("text")).alias("tok"))
    g = tokd.select(
        "doc_id",
        "lang",
        F.explode(
            F.concat(F.col("tok"), shingles(F.col("tok"), 2))
        ).alias("gram"),
    )
    b = g.select(
        "doc_id",
        "lang",
        F.pmod(
            md5int(F.concat(F.lit("dsir|"), F.col("gram"))),
            F.lit(DSIR_BUCKETS),
        ).alias("b"),
    )
    # ≤ DSIR_BUCKETS rows — checkpoint so the corpus-scale explode runs
    # once for the LM fit, not once per downstream consumer
    cnt = local_ckpt(
        b.groupBy("b").agg(
            F.sum(
                F.when(F.col("lang") == DSIR_TARGET_LANG, 1).otherwise(0)
            ).alias("ct"),
            F.sum(
                F.when(F.col("lang") != DSIR_TARGET_LANG, 1).otherwise(0)
            ).alias("cr"),
        )
    )
    tot = cnt.agg(F.sum("ct").alias("nt"), F.sum("cr").alias("nr")).collect()[0]
    dt = float(int(tot["nt"]) + DSIR_BUCKETS)
    dr = float(int(tot["nr"]) + DSIR_BUCKETS)
    ilp = lambda c, d: F.floor(
        F.log2((F.col(c) + 1).cast("double") / F.lit(d)) * DSIR_SCALE
    ).cast("long")
    ilr = cnt.select("b", (ilp("ct", dt) - ilp("cr", dr)).alias("ilr"))

    # broadcast the DSIR_BUCKETS-row ratio dim: the gram stream never
    # shuffles — the only corpus-scale exchange is the per-doc sum
    iw = (
        b.filter(F.col("lang") != DSIR_TARGET_LANG)
        .join(F.broadcast(ilr), "b")
        .groupBy("doc_id", "lang")
        .agg(F.sum("ilr").alias("iw"))
    )
    u = (
        md5int(F.concat(F.lit("dsirg|"), F.col("doc_id").cast("string")))
        + F.lit(0.5)
    ) / F.lit(float(2**60))
    key = (F.col("iw") / F.lit(float(DSIR_SCALE))) + -F.log(-F.log(u))

    from pyspark.sql import Window

    w1 = Window.partitionBy("salt").orderBy(F.col("key").desc(), "doc_id")
    w2 = Window.partitionBy().orderBy(F.col("key").desc(), "doc_id")
    return (
        iw.withColumn("key", key)
        .withColumn("salt", F.pmod(F.col("doc_id"), F.lit(DSIR_SALTS)))
        .withColumn("lr", F.row_number().over(w1))
        .filter(F.col("lr") <= DSIR_KEEP)
        .withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= DSIR_KEEP)
        .select(
            "rank",
            "doc_id",
            "lang",
            "iw",
            (F.col("iw") / F.lit(float(DSIR_SCALE))).alias("lw"),
        )
        .orderBy("rank")
    )


def dsir_select_sql() -> str:
    from ..functions.text import TOKENS_SQL, shingles_sql

    tok = TOKENS_SQL.format(c="text")
    h = MD5INT_SQL.format(c="('dsir|' || gram)")
    hg = MD5INT_SQL.format(c="('dsirg|' || doc_id)")
    return f"""
WITH tokd AS (
  SELECT doc_id, lang, {tok} AS tok FROM documents
),
grams AS (
  SELECT doc_id, lang, unnest(tok || {shingles_sql('tok', 2)}) AS gram
  FROM tokd
),
b AS (
  SELECT doc_id, lang, ({h} % {DSIR_BUCKETS}) AS b FROM grams
),
cnt AS (
  SELECT b,
         sum(CASE WHEN lang = '{DSIR_TARGET_LANG}' THEN 1 ELSE 0 END)::BIGINT AS ct,
         sum(CASE WHEN lang <> '{DSIR_TARGET_LANG}' THEN 1 ELSE 0 END)::BIGINT AS cr
  FROM b GROUP BY b
),
tot AS (SELECT sum(ct)::BIGINT + {DSIR_BUCKETS} AS dt,
               sum(cr)::BIGINT + {DSIR_BUCKETS} AS dr FROM cnt),
ilr AS (
  SELECT b,
         (floor(log2((ct + 1)::DOUBLE / dt) * {DSIR_SCALE})::BIGINT
          - floor(log2((cr + 1)::DOUBLE / dr) * {DSIR_SCALE})::BIGINT) AS ilr
  FROM cnt, tot
),
iw AS (
  SELECT doc_id, lang, sum(ilr)::BIGINT AS iw
  FROM b JOIN ilr USING (b)
  WHERE lang <> '{DSIR_TARGET_LANG}'
  GROUP BY doc_id, lang
),
keyed AS (
  SELECT doc_id, lang, iw,
         (iw / {DSIR_SCALE}.0)
           + -ln(-ln(({hg} + 0.5) / {float(2**60)!r})) AS key
  FROM iw
),
phase1 AS (
  SELECT doc_id, lang, iw, key,
         row_number() OVER (
           PARTITION BY doc_id % {DSIR_SALTS}
           ORDER BY key DESC, doc_id) AS lr
  FROM keyed
),
phase2 AS (
  SELECT doc_id, lang, iw,
         row_number() OVER (ORDER BY key DESC, doc_id) AS rank
  FROM phase1 WHERE lr <= {DSIR_KEEP}
)
SELECT rank, doc_id, lang, iw, iw / {DSIR_SCALE}.0 AS lw
FROM phase2 WHERE rank <= {DSIR_KEEP}
ORDER BY rank
"""


# ---------------------------------------------------------------------------
# temperature-scaled mixture sampling
# ---------------------------------------------------------------------------

# alpha = 0.5 exactly (w = sqrt(count)): IEEE-754 sqrt is correctly
# rounded, so both engines compute bit-identical weights; a general
# alpha would route through pow(), whose rounding is NOT pinned by the
# standard. 0.5 is in the published range (XLM-R uses 0.3, mT5 0.3-0.7).
TEMP_TARGET_FRAC_1K = 400  # sample ~40% of the corpus overall


def temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled multilingual mixture sampling (the
    p_i ∝ c_i^alpha rule of XLM-R / mT5): per-language keep rates are
    derived FROM the corpus's own language counts so low-resource
    languages are up-weighted relative to their share, then each doc
    is kept by a deterministic salted-hash draw against its language's
    rate — no RNG, identical output at any parallelism.

    Where :func:`stratified_sample` applies FIXED per-language rates
    and ``mixture_allocation`` reports budgets against external
    targets, this derives the rates from the data and executes the
    draw in one pass.

    Determinism discipline: weights are floor(sqrt(c) * 1e6) int64
    (order-independent partial sums); the only double arithmetic is
    ONE fixed-shape scalar expression per language row over identical
    integer operands — bit-identical across engines and partitionings.
    Scale shape: one map-side-combined count agg, an O(|langs|)
    dimension (the window below spans |langs| rows, not the corpus),
    one broadcast join, a row-local hash filter. Zero corpus-side
    shuffles beyond the count."""
    from pyspark.sql import Window

    docs = load(spark, "documents", sf_dir)
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("c"))
    wcol = F.floor(F.sqrt(F.col("c")) * 1e6).cast("long")
    dim = counts.select("lang", "c", wcol.alias("w"))
    all_rows = Window.partitionBy()  # |langs| rows — a dimension, not data
    target = F.floor(
        F.sum("c").over(all_rows) * TEMP_TARGET_FRAC_1K / 1000
    ).cast("long")
    rate = F.least(
        F.lit(1000),
        F.floor(
            F.lit(1000.0) * target * F.col("w")
            / F.sum("w").over(all_rows) / F.col("c")
        ).cast("long"),
    )
    rates = dim.select("lang", rate.alias("rate_1k"))
    h = md5int(F.concat(F.lit("tmix:"), F.col("doc_id").cast("string"))) % 1000
    return (
        docs.join(F.broadcast(rates), "lang")
        .filter(h < F.col("rate_1k"))
        .select("doc_id", "lang", "rate_1k")
        .orderBy("doc_id")
    )


def temperature_sample_sql() -> str:
    h = MD5INT_SQL.format(c="('tmix:' || doc_id)")
    return f"""
WITH counts AS (SELECT lang, count(*) AS c FROM documents GROUP BY lang),
w AS (SELECT lang, c, cast(floor(sqrt(c) * 1e6) AS BIGINT) AS w FROM counts),
rates AS (
  SELECT lang,
         least(1000, cast(floor(
           1000.0 * cast(floor(sum(c) OVER () * {TEMP_TARGET_FRAC_1K} / 1000)
                         AS BIGINT)
           * w / sum(w) OVER () / c) AS BIGINT)) AS rate_1k
  FROM w
)
SELECT d.doc_id, d.lang, r.rate_1k
FROM documents d JOIN rates r USING (lang)
WHERE ({h} % 1000) < r.rate_1k
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# Poisson bootstrap CI — distributed uncertainty for corpus metrics
# ---------------------------------------------------------------------------

BOOT_B = 200                 # bootstrap replicas
BOOT_U_SCALE = 10_000_000    # uniform-draw grid
# Poisson(1) CDF on the 1e7 grid (cum. probs × 1e7, k = 0..5; ≥6 capped)
BOOT_POIS_CDF = (3678794, 7357589, 9196986, 9810118, 9963402, 9994058)
BOOT_LO_RANK = 5             # 2.5th pct of 200 ranked replica means
BOOT_HI_RANK = 196           # 97.5th pct


def _pois_w(u: str) -> str:
    """Shared CASE-chain: inverse-CDF of Poisson(1) from a 1e7-grid
    uniform — identical text evaluated by both engines."""
    branches = " ".join(
        f"WHEN {u} < {c} THEN {k}" for k, c in enumerate(BOOT_POIS_CDF)
    )
    return f"(CASE {branches} ELSE 6 END)"


def bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap (the distributed bootstrap — Chamandy et al.,
    Google 2012) over mean document length: classical resampling needs
    a global sample-with-replacement per replica (a corpus shuffle per
    replica); the Poisson trick replaces it with an independent
    per-(row, replica) Poisson(1) weight, so ALL B replicas compute in
    one pass — a bounded ×B row-local explode feeding ONE
    map-side-combined aggregate to B rows. This is how a 100 TB
    pipeline attaches error bars to its corpus-health metrics (mean
    doc length, dedup rate, quality-score drift) without B passes.

    Determinism: the Poisson draw is inverse-CDF over an md5 uniform
    on a 1e7 grid (table literal in both engines — the sketches
    ln-table discipline applied to e^{-1}); replica means are integer
    per-mille divisions; the CI bounds are the rank-5 / rank-196
    order statistics of the 200 replica means (ranked by
    (mean, replica) so ties are deterministic). Output: all 200
    ranked replica means with lo/hi markers — the full bootstrap
    distribution, not just its endpoints."""
    docs = load(spark, "documents", sf_dir).select("doc_id", "n_chars")
    reps = docs.select(
        "doc_id",
        "n_chars",
        F.explode(F.sequence(F.lit(0), F.lit(BOOT_B - 1))).alias("rep"),
    )
    u = (
        md5int(
            F.concat(
                F.lit("bs:"),
                F.col("doc_id").cast("string"),
                F.lit(":"),
                F.col("rep").cast("string"),
            )
        )
        % BOOT_U_SCALE
    )
    w = reps.withColumn("u", u).select(
        "rep", "n_chars", F.expr(_pois_w("u")).alias("w")
    )
    g = w.groupBy("rep").agg(
        F.sum("w").alias("sw"),
        F.sum(F.col("w") * F.col("n_chars")).alias("swx"),
    )
    means = g.select(
        "rep",
        F.when(
            F.col("sw") > 0, F.expr("(swx * 1000) div sw")
        ).alias("mean_x1000"),
    )
    from pyspark.sql import Window

    # NULLS pinned LAST on both engines: Spark's asc default is NULLS
    # FIRST while DuckDB's is NULLS LAST — a sw=0 replica (NULL mean)
    # would shift every rank cross-engine (round-4 ADVICE, latent)
    wr = Window.orderBy(F.asc_nulls_last("mean_x1000"), "rep")  # 200-row frame
    return (
        means.withColumn("rnk", F.row_number().over(wr))
        .withColumn(
            "marker",
            F.when(F.col("rnk") == BOOT_LO_RANK, "lo")
            .when(F.col("rnk") == BOOT_HI_RANK, "hi"),
        )
        .select("rep", "mean_x1000", "rnk", "marker")
        .orderBy("rnk")
    )


def bootstrap_ci_sql() -> str:
    h = MD5INT_SQL.format(
        c="'bs:' || CAST(doc_id AS VARCHAR) || ':' || CAST(rep AS VARCHAR)"
    )
    return f"""
WITH reps AS (
  SELECT doc_id, n_chars, unnest(range({BOOT_B})) AS rep FROM documents),
w AS (
  SELECT rep, n_chars, {_pois_w(f'(({h}) % {BOOT_U_SCALE})')} AS w
  FROM reps),
g AS (
  SELECT rep, sum(w)::BIGINT AS sw,
         sum(w * n_chars)::BIGINT AS swx
  FROM w GROUP BY rep),
means AS (
  SELECT rep,
         CASE WHEN sw > 0 THEN (swx * 1000) // sw END AS mean_x1000
  FROM g),
ranked AS (
  SELECT rep, mean_x1000,
         row_number() OVER (ORDER BY mean_x1000 NULLS LAST, rep) AS rnk
  FROM means)
SELECT rep, mean_x1000, rnk,
       CASE WHEN rnk = {BOOT_LO_RANK} THEN 'lo'
            WHEN rnk = {BOOT_HI_RANK} THEN 'hi' END AS marker
FROM ranked ORDER BY rnk
"""
