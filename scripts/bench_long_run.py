#!/usr/bin/env python
"""Long-run planning-cost evidence (VERDICT r2 #6): a politeness-throttled
crawl forced through ~150-200 waves, with the in-memory seen folding ON
(cfg.seen_fold_every=16) vs OFF (huge threshold). Without folding the
per-wave anti-join scans a lazy union of O(waves) delta parts, so late
waves pay ever-growing planning/scheduling time; with folding the plan
stays <=16 parts deep and per-wave time is flat.

Prints one JSON line: waves run and early/late per-wave seconds for both
modes (early = waves 5-15 mean, late = last-10 mean)."""

from __future__ import annotations

import json
import statistics
import sys

sys.path.insert(0, "/root/repo")  # script lives in scripts/


def main() -> int:
    from seo_crawler_spark.operators.frontier import CrawlConfig, CrawlEngine
    from seo_crawler_spark.session import get_spark
    from seo_crawler_spark.sources.corpus import (
        generate_corpus,
        seed_urls,
    )

    spark = get_spark("long-run", master="local[32]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    corpus = generate_corpus(spark, n_docs=900, n_hosts=3, seed=11).localCheckpoint(
        eager=True
    )

    def run(fold_every: int):
        # robots=None so the politeness default_budget is what throttles
        # (a robots crawl_delay would override it with a far larger
        # per-wave budget and the run would drain in ~a dozen waves)
        res = CrawlEngine(
            spark,
            corpus,
            None,
            CrawlConfig(
                max_depth=6,
                max_urls=900,
                crawl_external=True,
                politeness_budget=3,
                max_waves=250,
                use_bloom=False,  # exact anti-join: the union IS the cost
                seen_fold_every=fold_every,
            ),
        ).run(seed_urls(3))
        secs = [m["seconds"] for m in res.metrics]
        crawled = res.metrics[-1]["crawled_total"]
        return secs, crawled

    out = {}
    for label, fold in (("fold16", 16), ("nofold", 1 << 30)):
        secs, crawled = run(fold)
        early = statistics.mean(secs[5:15]) if len(secs) > 15 else None
        late = statistics.mean(secs[-10:])
        out[label] = {
            "waves": len(secs),
            "crawled": crawled,
            "early_wave_sec": round(early, 3) if early else None,
            "late_wave_sec": round(late, 3),
            "late_over_early": round(late / early, 2) if early else None,
        }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
