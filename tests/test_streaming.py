"""Structured Streaming semantics: availableNow micro-batches must
reproduce batch results; custom state accumulates across micro-batches."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from seo_crawler_spark.streaming.events import (
    run_stream_to_memory,
    sessionize,
    sliding_counts,
    stream_running_user_totals,
    stream_sliding_counts,
    stream_tumbling_counts,
    tumbling_counts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """events.parquet split into 3 files in a stream-input directory."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    ev = spark.read.parquet(f"{SF}/events.parquet")
    ev.repartition(3).write.mode("overwrite").parquet(d)
    return d


def test_stream_tumbling_equals_batch(spark, events_dir):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    schema = ev.schema
    sdf = stream_tumbling_counts(spark, events_dir, schema)
    run_stream_to_memory(sdf, "tumb", output_mode="complete")
    got = {
        (r["hour_bucket"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM tumb").collect()
    }
    want = {
        (r["hour_bucket"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in tumbling_counts(spark, SF).collect()
    }
    assert got == want
    assert len(want) > 10


def test_stream_sliding_equals_batch(spark, events_dir):
    """Native F.window(1h, 30m) sliding agg ≡ the batch arithmetic form
    (each event in exactly two windows)."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    sdf = stream_sliding_counts(spark, events_dir, ev.schema)
    run_stream_to_memory(sdf, "slide", output_mode="complete")
    got = {
        (r["win_start"], r["event_type"]): r["n_events"]
        for r in spark.sql("SELECT * FROM slide").collect()
    }
    want = {
        (r["win_start"], r["event_type"]): r["n_events"]
        for r in sliding_counts(spark, SF).collect()
    }
    assert got == want
    assert len(want) > 10
    # sliding invariant: every event counted exactly twice overall
    assert sum(want.values()) == 2 * ev.count()


def test_stateful_running_totals(spark, events_dir):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    schema = ev.schema
    sdf = stream_running_user_totals(spark, events_dir, schema, max_files_per_trigger=1)
    run_stream_to_memory(sdf, "running", output_mode="update")
    upd = spark.sql("SELECT * FROM running")
    # state is cumulative → final value per user = max n_events row
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    final = (
        upd.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    )
    got = {
        r["user_id"]: (r["n_events"], r["total_value"]) for r in final.collect()
    }
    want = {
        r["user_id"]: (r["n"], r["tv"])
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("tv"))
        .collect()
    }
    assert got == want


def test_sessionize_sane(spark):
    s = sessionize(spark, SF).collect()
    assert len(s) > 0
    by_user = {}
    for r in s:
        by_user.setdefault(r["user_id"], []).append(r)
    ev = spark.read.parquet(f"{SF}/events.parquet")
    n_events = ev.count()
    assert sum(r["n_events"] for r in s) == n_events
    for rows in by_user.values():
        sids = [r["session_id"] for r in sorted(rows, key=lambda x: x["session_id"])]
        assert sids == list(range(1, len(sids) + 1))  # dense per-user ids


def test_stream_crawl_feed_matches_batch(spark, tmp_path):
    """The snapshot store's wave dirs double as a streaming source: the
    dashboard aggregate over readStream equals the batch twin, and
    waves appended AFTER the first pass (a refresh crawl) are picked up
    incrementally by the next trigger."""
    from seo_crawler_spark.operators.frontier import CrawlConfig, CrawlEngine
    from seo_crawler_spark.sources.corpus import (
        generate_corpus,
        generate_robots,
        seed_urls,
    )
    from seo_crawler_spark.streaming.crawl_feed import (
        batch_crawl_metrics,
        stream_crawl_metrics,
    )
    from seo_crawler_spark.streaming.events import run_stream_to_memory

    corpus = generate_corpus(spark, n_docs=200, n_hosts=4, seed=17)
    robots = generate_robots(spark, n_hosts=4, seed=17)
    state = str(tmp_path / "feedstate")
    cfg = lambda: CrawlConfig(max_depth=2, max_urls=10_000)
    CrawlEngine(spark, corpus, robots, cfg(), state_dir=state).run(seed_urls(4))

    run_stream_to_memory(stream_crawl_metrics(spark, state), "crawl_feed")
    got = sorted(tuple(r) for r in spark.table("crawl_feed").collect())
    want = sorted(tuple(r) for r in batch_crawl_metrics(spark, state).collect())
    assert got == want and len(got) > 0

    # append more waves (refresh crawl), re-trigger, feed catches up
    CrawlEngine(
        spark, corpus, robots, cfg(), state_dir=state
    ).resume(recrawl_before_wave=1)
    run_stream_to_memory(stream_crawl_metrics(spark, state), "crawl_feed2")
    got2 = sorted(tuple(r) for r in spark.table("crawl_feed2").collect())
    want2 = sorted(tuple(r) for r in batch_crawl_metrics(spark, state).collect())
    assert got2 == want2
    assert sum(r[1] for r in got2) > sum(r[1] for r in got)


def test_stream_sessionize_equals_batch(spark, events_dir):
    """Native session_window (30-min gap) streaming agg ≡ the batch
    lag+running-sum sessionize on (user, session-start, n_events)."""
    from seo_crawler_spark.streaming.events import stream_sessionize

    ev = spark.read.parquet(f"{SF}/events.parquet")
    sdf = stream_sessionize(spark, events_dir, ev.schema)
    run_stream_to_memory(sdf, "sess", output_mode="complete")
    got = {
        (r["user_id"], r["start_s"]): r["n_events"]
        for r in spark.sql("SELECT * FROM sess").collect()
    }
    want = {
        (r["user_id"], r["start_s"]): r["n_events"]
        for r in sessionize(spark, SF).collect()
    }
    assert got == want
    assert len(want) > 50  # non-vacuous: real multi-session users
