"""Cuckoo-filter seen state: zero false negatives, exact-path
equivalence, deletion (the capability bloom lacks), same-m merge
semantics, and end-to-end engine parity with seen_filter="cuckoo".

Replaces the reference's in-memory seen sets (link_manager.py:12-14)
with deletable probabilistic state; correctness contract mirrors
tests/test_properties.py's bloom suite.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from seo_crawler_spark.operators.cuckoo import (
    cuckoo_build,
    cuckoo_delete,
    cuckoo_merge,
    cuckoo_probe,
    dedupe_against_seen_cuckoo,
    size_for,
)
from seo_crawler_spark.sources.corpus import (
    generate_corpus,
    generate_robots,
    seed_urls,
)
from seo_crawler_spark.operators.frontier import CrawlConfig, CrawlEngine

N_BUCKETS = 8


def _seen_df(spark, hashes):
    return spark.createDataFrame(
        [(int(h), f"https://h{h}.example.com/") for h in hashes],
        "url_hash long, url string",
    )


def _rand_hashes(seed, n):
    rng = np.random.default_rng(seed)
    # full signed-64 spread, including negatives (xxhash64 is signed in Spark)
    return rng.integers(-(2**62), 2**62, size=n, dtype=np.int64)


def _probe_map(spark, state, hashes):
    cand = spark.createDataFrame([(int(h),) for h in hashes], "url_hash long")
    rows = cuckoo_probe(cand, state, N_BUCKETS).collect()
    return {r["url_hash"]: r["maybe_seen"] for r in rows}


def test_no_false_negatives_and_low_fpp(spark):
    inserted = _rand_hashes(1, 4000)
    state = cuckoo_build(_seen_df(spark, inserted), N_BUCKETS)
    got = _probe_map(spark, state, inserted)
    assert all(got[int(h)] for h in inserted)  # zero false negatives

    fresh = _rand_hashes(2, 4000)
    fresh = np.setdiff1d(fresh, inserted)
    got = _probe_map(spark, state, fresh)
    fpp = sum(got[int(h)] for h in fresh) / len(fresh)
    # 16-bit fingerprints, 2 cells × 4 slots → theoretical fpp ≈ 8/2^16
    assert fpp < 0.005


def test_dedupe_equivalence_with_exact(spark):
    seen_h = _rand_hashes(3, 3000)
    seen = _seen_df(spark, seen_h)
    cand_h = np.concatenate([seen_h[:1500], _rand_hashes(4, 1500)])
    cand = _seen_df(spark, cand_h).withColumn("depth", F.lit(1))
    state = cuckoo_build(seen, N_BUCKETS)
    got = dedupe_against_seen_cuckoo(cand, seen, state, N_BUCKETS)
    exact = cand.join(seen.select(F.col("url").alias("u")), cand.url == F.col("u"), "left_anti")
    assert sorted(r["url"] for r in got.collect()) == sorted(
        r["url"] for r in exact.collect()
    )


def test_delete_reopens_urls_without_harming_others(spark):
    inserted = _rand_hashes(5, 2000)
    state = cuckoo_build(_seen_df(spark, inserted), N_BUCKETS)
    victims, kept = inserted[:500], inserted[500:]
    state2 = cuckoo_delete(state, _seen_df(spark, victims), N_BUCKETS)
    got = _probe_map(spark, state2, inserted)
    # kept items NEVER flip to not-seen (each insert stores its own copy)
    assert all(got[int(h)] for h in kept)
    # deleted items are re-admittable modulo fp-collision survivors
    reopened = sum(not got[int(h)] for h in victims)
    assert reopened >= 0.99 * len(victims)


def test_merge_equals_build_from_union(spark):
    a_h, b_h = _rand_hashes(6, 1500), _rand_hashes(7, 1500)
    m = size_for(3000)  # shared fixed size, as the engine uses
    a = cuckoo_build(_seen_df(spark, a_h), N_BUCKETS, m=m)
    b = cuckoo_build(_seen_df(spark, b_h), N_BUCKETS, m=m)
    merged = cuckoo_merge(a, b)
    both = np.concatenate([a_h, b_h])
    got = _probe_map(spark, merged, both)
    assert all(got[int(h)] for h in both)
    # merged table sizes stay fixed (no silent growth)
    assert {r["m"] for r in merged.select("m").collect()} == {m}


def test_merge_rejects_mixed_sizes(spark):
    a = cuckoo_build(_seen_df(spark, _rand_hashes(8, 100)), N_BUCKETS, m=64)
    b = cuckoo_build(_seen_df(spark, _rand_hashes(9, 100)), N_BUCKETS, m=128)
    with pytest.raises(Exception, match="mixes table sizes"):
        cuckoo_merge(a, b).collect()


def test_engine_cuckoo_same_result_as_exact(spark):
    """seen_filter='cuckoo' is a prune, never a semantics change —
    mirrors test_no_bloom_same_result."""
    corpus = generate_corpus(spark, n_docs=300, n_hosts=5, seed=42)
    robots = generate_robots(spark, n_hosts=5, seed=42)
    seeds = seed_urls(5)
    cfg_c = CrawlConfig(
        max_depth=2, max_urls=150, use_bloom=True, bloom_min_seen=0,
        seen_filter="cuckoo", cuckoo_m=1 << 10,
    )
    cfg_n = CrawlConfig(max_depth=2, max_urls=150, use_bloom=False)
    r_c = CrawlEngine(spark, corpus, robots, cfg_c).run(seeds)
    r_n = CrawlEngine(spark, corpus, robots, cfg_n).run(seeds)
    assert [r["url"] for r in r_c.order.collect()] == [
        r["url"] for r in r_n.order.collect()
    ]
    assert {r["url"] for r in r_c.seen.collect()} == {
        r["url"] for r in r_n.seen.collect()
    }
