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

from ..functions.text import MD5INT_SQL, md5int
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
