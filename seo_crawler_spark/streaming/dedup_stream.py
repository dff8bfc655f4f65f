"""Streaming incremental dedup: crawl deltas as a Structured Streaming
source, deduped per micro-batch against the standing base corpus AND
every earlier arrival.

The continuous twin of ``operators.dedup.dedup_incremental`` (same
banding, same exact-Jaccard verify, same keep-first semantics): the
base corpus's band index and shingle sets are persisted once as state
tables; each micro-batch of newly crawled docs is banded row-locally,
joined stream-static against the state index, self-joined within the
batch (earlier doc_id claims later), verified exactly, and then the
batch's OWN bands/sets are appended to the state so every later batch
dedups against it. At warehouse scale the state tables are the stored
band index the batch path already assumes — the stream just grows it.

Exactly-once: every per-batch write lands in a ``batch=<id>``
subdirectory with mode("overwrite"), so a retried micro-batch
overwrites its own partial output instead of duplicating it, and state
reads filter ``batch < current`` so a retry never sees its failed
attempt's partial state. Arrival order IS the semantics (keep-first):
the earliest arrival of a near-dup group is the one kept, matching the
batch operator when arrivals are doc_id-ordered.

Parity is pinned two ways: tests/test_streaming_dedup.py asserts
streamed verdicts ≡ ``dedup_incremental`` row-for-row, and the
registered query ``dedup_incremental_stream`` runs the full pipeline
(base prep → 3 availableNow micro-batches → verdict read-back) against
the SAME DuckDB oracle SQL as the batch operator.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import DELTA_MOD, _hashed_shingles, _minhash_bands
from ..functions.text import md5int
from ..sources.tables import load


def prepare_dedup_base(base_docs: DataFrame, state_dir: str) -> None:
    """One-time: band the standing base corpus and persist its band
    index + shingle sets as the stream's state tables."""
    hashed = _hashed_shingles(base_docs).localCheckpoint(eager=False)
    _minhash_bands(hashed).write.mode("overwrite").parquet(
        f"{state_dir}/base_bands"
    )
    hashed.select("doc_id", "sh").write.mode("overwrite").parquet(
        f"{state_dir}/base_sets"
    )


def _read_state(
    spark: SparkSession, state_dir: str, kind: str, before_batch: int
) -> DataFrame:
    """base_<kind> ∪ delta_<kind> from batches strictly before
    ``before_batch`` (a retried batch must not see its own failed
    attempt's partial appends)."""
    state = spark.read.parquet(f"{state_dir}/base_{kind}")
    ddir = f"{state_dir}/delta_{kind}"
    if os.path.isdir(ddir) and any(
        n.startswith("batch=") for n in os.listdir(ddir)
    ):
        delta = (
            spark.read.parquet(ddir)
            .filter(F.col("batch") < before_batch)
            .drop("batch")
        )
        state = state.unionByName(delta)
    return state


def _process_batch(spark: SparkSession, state_dir: str, threshold: float):
    def process(batch_docs: DataFrame, batch_id: int) -> None:
        # reused by banding, both verify legs, and the state append
        hashed = _hashed_shingles(
            batch_docs.select("doc_id", "text")
        ).localCheckpoint(eager=False)
        bands = _minhash_bands(hashed)
        state_bands = _read_state(spark, state_dir, "bands", batch_id)
        da = bands.select(F.col("doc_id").alias("a"), "band", "sig")
        # dup-of-state: base corpus + every earlier arrival, no
        # ordering predicate (all state docs precede this batch)
        cand_state = da.join(
            state_bands.select(F.col("doc_id").alias("b"), "band", "sig"),
            ["band", "sig"],
        ).select("a", "b")
        # dup-within-batch: keep-first by doc_id, as the batch operator
        cand_batch = (
            da.join(
                bands.select(F.col("doc_id").alias("b"), "band", "sig"),
                ["band", "sig"],
            )
            .filter(F.col("b") < F.col("a"))
            .select("a", "b")
        )
        cand = cand_state.unionByName(cand_batch).distinct()
        sets_ = _read_state(spark, state_dir, "sets", batch_id).unionByName(
            hashed.select("doc_id", "sh")
        )
        pairs = cand.join(
            hashed.select(F.col("doc_id").alias("a"), F.col("sh").alias("sha")),
            "a",
        ).join(
            sets_.select(F.col("doc_id").alias("b"), F.col("sh").alias("shb")),
            "b",
        )
        inter = F.size(F.array_intersect("sha", "shb"))
        na, nb = F.size("sha"), F.size("shb")
        matches = (
            pairs.withColumn("jaccard", F.round(inter / (na + nb - inter), 4))
            .filter(F.col("jaccard") >= threshold)
            .groupBy("a")
            .agg(F.min("b").alias("dup_of"))
        )
        verdicts = (
            batch_docs.select("doc_id")
            .join(matches.withColumnRenamed("a", "doc_id"), "doc_id", "left")
            .select(
                "doc_id", "dup_of", F.col("dup_of").isNull().alias("is_kept")
            )
        )
        # verdicts FIRST (they must not see this batch's state append),
        # then the state append that later batches dedup against
        verdicts.write.mode("overwrite").parquet(
            f"{state_dir}/verdicts/batch={batch_id}"
        )
        bands.write.mode("overwrite").parquet(
            f"{state_dir}/delta_bands/batch={batch_id}"
        )
        hashed.select("doc_id", "sh").write.mode("overwrite").parquet(
            f"{state_dir}/delta_sets/batch={batch_id}"
        )

    return process


def stream_dedup_incremental(
    spark: SparkSession,
    input_dir: str,
    schema,
    state_dir: str,
    threshold: float = 0.5,
    max_files_per_trigger: int | None = 1,
) -> None:
    """Drive the stream to completion (Trigger.AvailableNow): every
    parquet file in ``input_dir`` becomes (up to) one micro-batch,
    processed in file modification-time order."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    q = (
        reader.parquet(input_dir)
        .writeStream.foreachBatch(_process_batch(spark, state_dir, threshold))
        .option("checkpointLocation", f"{state_dir}/_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_verdicts(spark: SparkSession, state_dir: str) -> DataFrame:
    return (
        spark.read.parquet(f"{state_dir}/verdicts")
        .drop("batch")
        .orderBy("doc_id")
    )


def _stage_delta_files(
    spark: SparkSession, delta: DataFrame, input_dir: str, n_files: int
) -> None:
    """Write the delta docs as ``n_files`` single-file parquets in
    ascending doc_id ranges with ascending mtimes — deterministic
    arrival order for the file source (it orders by modification
    time). Contiguous ranges make arrival order ≡ doc_id order, the
    condition under which stream ≡ batch exactly."""
    import glob
    import shutil

    # driver-side staging helper (test/driver harness, not a production
    # path): the id list is the delta batch, bounded by definition
    rows = delta.select("doc_id").orderBy("doc_id").collect()
    ids = [r["doc_id"] for r in rows]
    os.makedirs(input_dir, exist_ok=True)
    per = max(1, -(-len(ids) // n_files))
    for i in range(n_files):
        chunk = ids[i * per : (i + 1) * per]
        if not chunk:
            break
        stage = f"{input_dir}/_stage{i}"
        delta.filter(
            (F.col("doc_id") >= chunk[0]) & (F.col("doc_id") <= chunk[-1])
        ).coalesce(1).write.mode("overwrite").parquet(stage)
        part = glob.glob(f"{stage}/part-*.parquet")[0]
        dst = f"{input_dir}/{i:03d}.parquet"
        shutil.move(part, dst)
        shutil.rmtree(stage)
        os.utime(dst, (1_000_000 + i, 1_000_000 + i))


def dedup_incremental_stream(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.5,
    delta_mod: int = DELTA_MOD,
    n_batches: int = 3,
) -> DataFrame:
    """Registered query: the full streaming pipeline end-to-end over
    the driver's documents table — base prep, delta staged as
    ``n_batches`` arrival files, availableNow stream, verdict
    read-back. Same deterministic base/delta split as the batch
    operator, so the batch operator's DuckDB oracle
    (``dedup_incremental_sql``) is this query's oracle too: a
    Structured Streaming operator with a full SQL hash-match gate."""
    import tempfile

    docs = load(spark, "documents", sf_dir).select("doc_id", "text")
    is_delta = (md5int(F.col("doc_id").cast("string")) % delta_mod) == 0
    work = tempfile.mkdtemp(prefix="dedup_stream_")
    state_dir, input_dir = f"{work}/state", f"{work}/in"
    prepare_dedup_base(docs.filter(~is_delta), state_dir)
    delta = docs.filter(is_delta)
    _stage_delta_files(spark, delta, input_dir, n_batches)
    stream_dedup_incremental(
        spark, input_dir, delta.schema, state_dir, threshold
    )
    return read_verdicts(spark, state_dir)
