#!/usr/bin/env python
"""Scale evidence for the round-4 iterative operators.

1. connected_components (large-star/small-star): the claim is O(log n)
   ROUNDS on any topology with per-round cost linear in the edge set.
   Measured on worst-case-diameter inputs — a single path of n nodes
   (diameter n-1, the topology that breaks label propagation) unioned
   with hash-random edges — at 100k / 1M / 10M nodes: report rounds
   and wall seconds. Rounds growing ~log10(n) (+~2-3 per decade) while
   sec/round grows ~linearly = the plan scales; label propagation
   would need n-1 rounds on the same input.

2. kmeans_train: one Lloyd iteration is a row-local assignment matmul
   + one (cell, dim) map-side agg, so time should track N (vectors) ~
   linearly with k ∝ √N cells (the SemDeDup sizing). Measured at
   50k / 500k synthetic 64-dim vectors.

Prints one JSON line and a markdown row block for BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

CC_SIZES = [100_000, 1_000_000, 10_000_000]
KM_SIZES = [50_000, 500_000]
DIM = 64


def cc_input(spark, n: int, shortcuts: bool):
    """Pure path 0-1-2-...-n-1 = TRUE diameter n-1 (the adversarial
    topology: label propagation needs n-1 rounds). With shortcuts=True,
    n/2 hash-random extra edges model a web-like graph whose effective
    diameter is small."""
    from pyspark.sql import functions as F

    path = spark.range(n - 1).select(
        F.col("id").alias("u"), (F.col("id") + 1).alias("v")
    )
    if not shortcuts:
        return path
    rnd = spark.range(n // 2).select(
        F.pmod(F.xxhash64(F.col("id")), F.lit(n)).alias("u"),
        F.pmod(F.xxhash64(F.col("id") + 7_777_777), F.lit(n)).alias("v"),
    )
    return path.unionByName(rnd)


def run_cc(spark, n: int, shortcuts: bool) -> dict:
    from pyspark.sql import functions as F

    from seo_crawler_spark.operators.graph import connected_components

    edges = cc_input(spark, n, shortcuts)
    stats: dict = {}
    t0 = time.monotonic()
    labels = connected_components(edges, stats=stats)
    row = labels.agg(
        F.count("node").alias("nodes"),
        F.countDistinct("label").alias("components"),
    ).collect()[0]
    sec = round(time.monotonic() - t0, 2)
    return {
        "n": n,
        "graph": "path+random" if shortcuts else "pure path",
        "sec": sec,
        "rounds": stats.get("rounds"),
        "nodes": row["nodes"],
        "components": row["components"],
    }


def run_kmeans(spark, n: int) -> dict:
    import math

    from pyspark.sql import functions as F

    from seo_crawler_spark.operators.simsearch import kmeans_train

    k = int(math.isqrt(n))
    vecs = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(DIM)),
            lambda d: (
                F.pmod(
                    F.xxhash64(F.concat(F.col("id"), F.lit(":"), d)),
                    F.lit(2_000_001),
                )
                - 1_000_000
            ).cast("double")
            / 1_000_000.0,
        ).alias("embedding"),
    )
    t0 = time.monotonic()
    cents = kmeans_train(vecs, k=min(k, 256), iters=2)
    sec = round(time.monotonic() - t0, 2)
    return {"n": n, "k": min(k, 256), "iters": 2, "sec": sec,
            "cells_trained": len(cents)}


def main() -> int:
    from seo_crawler_spark.session import get_spark

    spark = get_spark("graph_scale", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    cc_rows = [run_cc(spark, n, False) for n in CC_SIZES]
    cc_rows.append(run_cc(spark, CC_SIZES[-1], True))
    km_rows = [run_kmeans(spark, n) for n in KM_SIZES]
    print(json.dumps({"cc": cc_rows, "kmeans": km_rows}))

    print("\n| op | input | sec | note |")
    print("|---|---|---|---|")
    for r in cc_rows:
        print(
            f"| connected_components | {r['graph']}, {r['n']:,} nodes | "
            f"{r['sec']} | {r['rounds']} rounds, "
            f"{r['components']:,} components |"
        )
    for r in km_rows:
        print(
            f"| kmeans_train | {r['n']:,} × {DIM}d vectors, k={r['k']}, "
            f"2 iters | {r['sec']} | exact fixed-point |"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
