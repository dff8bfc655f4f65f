#!/usr/bin/env python
"""10× input-scale evidence for the round-4 session-4 operators.

Runs each new query at sf0.01 (500 docs / 500 vectors) and sf0.1
(5,000 of each — 10× rows) on local[32], steady-state (median of 3
after a warm-up run), and prints the time ratio. A ~linear operator
should land well under 10×; sublinear constants (driver-side
codebooks, merge tables, percentile collects) usually put it under ~3×
at this scale.

Usage: python scripts/bench_newops_scale.py [--reps 3]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

QUERIES = [
    "ann_ivfpq_topk",
    "lm_perplexity_buckets",
    "caption_pairs",
    "bpe_merges",
    "bpe_encode",
    "quality_classifier_train",
    "quality_classifier_filter",
    # session 7
    "bm25_topk",
    "dsir_select",
    "classifier_pr_auc",
    "crawl_budget_allocation",
    "contrastive_triplets_hard",
    "tokenizer_stats",
    "decontaminate_bm25",
    # session 8
    "paragraph_dedup",
    "winnowing_candidates",
    "temperature_sample",
    "trustrank_scores",
    "ngram_novelty",
    # session 9
    "cdc_chunk_dedup",
    "mirror_hosts",
    "spam_mass",
    # session 10
    "bitext_mining",
    "vocab_coverage",
    "source_similarity",
    # session 11
    "seed_distance_bfs",
    "opic_priority",
    "centroid_outliers",
    "hll_distinct",
    "cms_frequency",
    "length_quantile_sketch",
    "cocitation_similarity",
    # session 12
    "dust_param_rules",
    "host_rank",
    "focused_crawl_priority",
    # session 13
    "phrase_search",
    "boilerplate_strip",
    "hyperball_centrality",
    "triangle_count",
    "label_propagation",
    "kcore_decomposition",
    "pca_power_projection",
    "random_projection",
    "scalar_quantization",
    "heavy_hitters",
    "bm25f_topk",
    "snippet_extraction",
    "rank_correlation",
    "effective_diameter",
    "pagerank_warm_start",
    "search_serve",
    "ndcg_eval",
    "dust_apply",
    "salsa_scores",
    "shard_balance_audit",
    "linkpred_resource_alloc",
    "bowtie_structure",
    "filter_agreement",
    "storage_layout_audit",
    "hll_source_overlap",
    "random_walks",
    "walk_skipgram_pairs",
    "funnel_analysis",
    "cohort_retention",
    "event_transitions",
    "scd2_history",
    "bootstrap_ci",
    "error_rate_control",
    "topk_paths",
    "pruning_audit",
    "error_rate_control_stream",
    "bigram_lm_heldout",
    # round 5
    "interleaved_packing",
    "media_phash_neardup",
    "shard_rebalance_audit",
    "bloom_fpr_audit",
    "token_dist_drift",
]


def main() -> int:
    reps = 3
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    only = None
    if "--only" in sys.argv:
        only = sys.argv[sys.argv.index("--only") + 1].split(",")

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    qs = m.queries()

    from seo_crawler_spark.session import get_spark

    spark = get_spark(
        "newops-scale", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str, sf_dir: str) -> float:
        times = []
        for i in range(reps + 1):
            t0 = time.monotonic()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            if i:  # skip warm-up
                times.append(time.monotonic() - t0)
            # drop checkpoint blocks between reps (bench.py rationale)
            for rdd in list(
                spark.sparkContext._jsc.getPersistentRDDs().values()
            ):
                rdd.unpersist(False)
        times.sort()
        return times[len(times) // 2]

    print(f"{'query':26s} {'sf0.01 s':>9s} {'sf0.1 s':>9s} {'ratio':>6s}")
    for name in only if only else QUERIES:
        a = run(name, "/root/testdata/sf0.01")
        b = run(name, "/root/testdata/sf0.1")
        print(f"{name:26s} {a:9.2f} {b:9.2f} {b / a:5.1f}x")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
