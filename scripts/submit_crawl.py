#!/usr/bin/env python
"""spark-submit entry point — the cluster deployment path of the engine.

Usage (the north-rule deployment shape):

    python -c "from seo_crawler_spark.session import _package_zip; print(_package_zip())"
    spark-submit --master <cluster> --py-files /tmp/seo_crawler_spark_pyfiles.zip \
        scripts/submit_crawl.py [n_docs] [max_urls] [state_dir]

Runs a politeness-gated multi-host crawl over the deterministic corpus
and prints per-wave metrics + the status histogram as JSON lines.
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    max_urls = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    state_dir = sys.argv[3] if len(sys.argv) > 3 else None

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    # under spark-submit the master/conf come from the submit command
    spark = SparkSession.builder.appName("seo-crawler-spark-submit").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from seo_crawler_spark.operators.frontier import CrawlConfig, CrawlEngine
    from seo_crawler_spark.sources.corpus import (
        generate_corpus,
        generate_robots,
        generate_sitemaps,
        seed_urls,
    )

    corpus = generate_corpus(spark, n_docs=n_docs, n_hosts=8).localCheckpoint(eager=True)
    robots = generate_robots(spark, n_hosts=8)
    sitemaps = generate_sitemaps(spark, n_docs=n_docs, n_hosts=8)
    engine = CrawlEngine(
        spark,
        corpus,
        robots,
        CrawlConfig(
            max_depth=3,
            max_urls=max_urls,
            crawl_external=True,
            politeness_budget=50,
            salt_buckets=4,
            discover_sitemaps=True,
        ),
        state_dir=state_dir,
        sitemaps=sitemaps,
    )
    result = engine.run(seed_urls(8))
    for m in result.metrics:
        print("WAVE " + json.dumps({k: v for k, v in m.items() if k != "partitions"}))
    hist = (
        result.pages.groupBy("status_code")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("status_code")
        .collect()
    )
    print("HISTOGRAM " + json.dumps({str(r["status_code"]): r["cnt"] for r in hist}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
