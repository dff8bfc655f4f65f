#!/usr/bin/env python
"""Co-located fetch join via bucketed corpus storage.

At 10^10 scale the "fetch" join (frontier ⋈ corpus on canonical URL)
must not shuffle the corpus. Storing the corpus bucketed by doc_id
means only the frontier side shuffles into the corpus's bucketing —
this script proves it from the physical plan: the bucketed-scan side
joins with NO Exchange.

Run: python scripts/demo_bucketed_join.py
"""

from __future__ import annotations

import io
import contextlib
import json
import sys
import tempfile

sys.path.insert(0, "/root/repo")


def main() -> int:
    from pyspark.sql import functions as F

    from seo_crawler_spark.session import get_spark
    from seo_crawler_spark.sources.corpus import generate_corpus

    wh = tempfile.mkdtemp(prefix="warehouse_")
    spark = get_spark(
        "bucketed-demo",
        master="local[8]",
        shuffle_partitions=16,
        extra_conf={"spark.sql.warehouse.dir": wh,
                    # disable auto-broadcast so the plan shows the
                    # bucket-vs-shuffle structure, not a broadcast
                    "spark.sql.autoBroadcastJoinThreshold": "-1"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    corpus = generate_corpus(spark, n_docs=5000, n_hosts=10)
    (
        corpus.write.bucketBy(16, "doc_id")
        .sortBy("doc_id")
        .mode("overwrite")
        .saveAsTable("corpus_bucketed")
    )
    bucketed = spark.table("corpus_bucketed")

    frontier = spark.range(0, 50_000).select(
        F.concat(
            F.lit("https://host"), (F.col("id") % 10).cast("string"),
            F.lit(".example.com/page/"), F.col("id").cast("string"), F.lit(".html"),
        ).alias("url")
    )
    joined = frontier.join(bucketed, frontier.url == bucketed.doc_id).select(
        "url", "status_code"
    )

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        joined.explain("formatted")
    plan = buf.getvalue()

    # count Exchange operators and locate which side they feed
    n_exchanges = plan.count("Exchange (") + plan.count("+- Exchange")
    has_bucket_scan = "Bucketed: true" in plan or "SelectedBucketsCount" in plan
    n_rows = joined.count()
    print(json.dumps({
        "bucketed_scan": has_bucket_scan,
        "exchanges_in_plan": plan.count("Exchange"),
        "joined_rows": n_rows,
    }))
    # show the join subtree for the record
    for line in plan.splitlines():
        if any(k in line for k in ("SortMergeJoin", "Exchange", "Scan", "Bucketed")):
            print(line.rstrip()[:120])
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
