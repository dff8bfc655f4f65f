#!/usr/bin/env python
"""Mega-host skew demonstration (SURVEY.md M5): politeness ranking over
a frontier where ONE host owns 60% of the URLs, with and without host
salting. Unsalted, the mega-host's window rank runs in a single task;
salted, it splits into k parallel sub-queues with budget ceil(B/k).

Prints one JSON line with both timings; appends findings to PLANS.md by
hand (numbers are environment-dependent)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")  # script lives in scripts/

N = int(os.environ.get("SKEW_FRONTIER_N", 6_000_000))


def main() -> int:
    from pyspark.sql import functions as F

    from seo_crawler_spark.operators.politeness import politeness_tag
    from seo_crawler_spark.session import get_spark

    spark = get_spark("skew", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    ids = spark.range(0, N, numPartitions=128)
    h = F.xxhash64("id")
    host = (
        F.when(F.pmod(h, F.lit(10)) < 6, F.lit("megahost"))
        .otherwise(F.concat(F.lit("host"), F.pmod(h, F.lit(500)).cast("string")))
    )
    frontier = ids.select(
        F.col("id").alias("seq"),
        F.concat(F.lit("https://"), host, F.lit("/p/"), F.col("id").cast("string")).alias("url"),
        host.alias("host"),
        h.alias("url_hash"),
    ).localCheckpoint(eager=True)

    def run(salt: int) -> float:
        t0 = time.monotonic()
        tagged = politeness_tag(frontier, default_budget=200_000, salt_buckets=salt)
        counts = {
            bool(r["admitted"]): r["n"]
            for r in tagged.groupBy("admitted").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        dt = time.monotonic() - t0
        return dt, counts

    # warmup
    run(1)
    t1, c1 = run(1)
    tk, ck = run(16)

    # trap-template skew: ONE (host, template) owns the mega-host's 60%
    # (every URL folds to /p/N) — the template_cap_tag window's hot
    # partition. Salted it splits into k parallel sub-queues.
    from seo_crawler_spark.operators.politeness import template_cap_tag

    def run_trap(salt: int):
        t0 = time.monotonic()
        tagged = template_cap_tag(frontier, cap=200_000, salt_buckets=salt)
        counts = {
            bool(r["trap_admitted"]): r["n"]
            for r in tagged.groupBy("trap_admitted")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        return time.monotonic() - t0, counts

    run_trap(1)
    tt1, tc1 = run_trap(1)
    ttk, tck = run_trap(16)

    out = {
        "frontier_n": N,
        "mega_share": 0.6,
        "unsalted_sec": round(t1, 2),
        "salted16_sec": round(tk, 2),
        "speedup": round(t1 / tk, 2),
        "unsalted_admitted": c1.get(True, 0),
        "salted_admitted": ck.get(True, 0),
        "trap_unsalted_sec": round(tt1, 2),
        "trap_salted16_sec": round(ttk, 2),
        "trap_speedup": round(tt1 / ttk, 2),
        "trap_unsalted_admitted": tc1.get(True, 0),
        "trap_salted_admitted": tck.get(True, 0),
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
