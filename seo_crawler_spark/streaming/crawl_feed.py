"""Live crawl dashboard as Structured Streaming over the snapshot store.

The reference serves its dashboard by re-slicing in-memory arrays on
every poll (main.py:768-811 + incremental_poller.js). Here the same
feed is a streaming query over the engine's OWN wave-atomic snapshot
layout: each committed wave's ``pages/wave=N`` dir appears via an atomic
staged rename (state/snapshots._write_wave_atomic), the file source
discovers its files per micro-batch, and the complete-mode aggregate
is the dashboard state. No second write path — the crawl's durable
state IS the stream source, and the rename is what makes wave dirs
all-or-nothing to this directory-listing reader (a manifest check
alone would not bind a streaming glob).

At scale this is the standard lakehouse pattern (streaming ingest of a
table's appends); per-micro-batch cost is the new files only.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _pages_glob(state_root: str) -> str:
    # staging dirs are dot-prefixed (".staging-wave=N") — the glob
    # matches only renamed (committed) wave dirs
    return os.path.join(state_root, "pages", "wave=*")


def _pages_schema(spark: SparkSession, state_root: str):
    """Schema from the latest committed wave dir (ONE footer read, not
    an inference over every wave), or the canonical PAGE_SCHEMA when no
    wave has committed yet — so the dashboard can attach to a brand-new
    crawl before wave 0 lands."""
    from ..schema import PAGE_SCHEMA
    from ..state.snapshots import SnapshotStore

    store = SnapshotStore(state_root)
    latest = store.latest_wave()
    if latest is not None:
        return spark.read.parquet(store._wave_dir("pages", latest)).schema
    return PAGE_SCHEMA


def stream_crawl_metrics(spark: SparkSession, state_root: str) -> DataFrame:
    """Streaming DataFrame of dashboard counters: per-status page counts
    plus progress columns (pages, max depth, latest wave) — the
    crawl_status payload (main.py:768-811) as one complete-mode agg."""
    os.makedirs(os.path.join(state_root, "pages"), exist_ok=True)
    glob = _pages_glob(state_root)
    src = spark.readStream.schema(_pages_schema(spark, state_root)).parquet(glob)
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
