"""Live crawl dashboard as Structured Streaming over the snapshot store.

The reference serves its dashboard by re-slicing in-memory arrays on
every poll (main.py:768-811 + incremental_poller.js). Here the same
feed is a streaming query over the engine's OWN wave-atomic snapshot
layout: each committed wave drops new parquet files under
``pages/wave=N``, the file source discovers them per micro-batch, and
the complete-mode aggregate is the dashboard state. No second write
path — the crawl's durable state IS the stream source, and a wave
becomes visible to the dashboard exactly when its manifest commit
makes it visible to resume (same atomicity boundary).

At scale this is the standard lakehouse pattern (streaming ingest of a
table's appends); per-micro-batch cost is the new files only.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _pages_glob(state_root: str) -> str:
    return os.path.join(state_root, "pages", "wave=*")


def stream_crawl_metrics(spark: SparkSession, state_root: str) -> DataFrame:
    """Streaming DataFrame of dashboard counters: per-status page counts
    plus progress columns (pages, max depth, latest wave) — the
    crawl_status payload (main.py:768-811) as one complete-mode agg."""
    glob = _pages_glob(state_root)
    schema = spark.read.parquet(glob).schema  # schema from committed waves
    src = spark.readStream.schema(schema).parquet(glob)
    return src.groupBy("status_code").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.max("depth").alias("max_depth"),
        F.max("wave").alias("latest_wave"),
        F.sum("word_count").alias("total_words"),
    )


def batch_crawl_metrics(spark: SparkSession, state_root: str) -> DataFrame:
    """Batch twin of :func:`stream_crawl_metrics` (parity oracle)."""
    src = spark.read.parquet(_pages_glob(state_root))
    return src.groupBy("status_code").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.max("depth").alias("max_depth"),
        F.max("wave").alias("latest_wave"),
        F.sum("word_count").alias("total_words"),
    )
