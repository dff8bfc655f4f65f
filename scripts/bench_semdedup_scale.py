#!/usr/bin/env python
"""SemDeDup scale linearity (VERDICT r3 #1): time the registered
semdedup path on synthetic embeddings at 1× (20k vectors) and 10×
(200k vectors) with the cell count scaled ∝ N (140 vectors/cell held
constant). With cells scaling, expected intra-cell pairs N²/k grow
LINEARLY in N; the old fixed-16-cell default would grow them ~100×
(quadratic), and the old F.lit-literal quantizer could not even build
the 1,420-cell plan (1,420 × 64 = 90,880 literals in one expression
tree). So this bench is evidence for BOTH halves of the fix: the
Arrow-batched matmul quantizer handles thousand-cell codebooks, and
cell scaling keeps the pair stage linear.

Corpus: deterministic hash-derived vectors in [-1,1]^64; every 10th
vector is a near-duplicate of the vector 5 ids earlier (one dimension
perturbed by 0.001) so true near-dup density per vector is
scale-invariant and the drop stage has real positives at both sizes.

Prints one JSON line: per-size seconds + dropped counts + the 10×/1×
time ratio (ideal 10 at perfect linearity)."""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")  # script lives in scripts/

SIZES = {"1x": 20_000, "10x": 200_000}
VECS_PER_CELL = 140
DIM = 64
OUT_ROOT = "/tmp/semdedup_scale"


def synth_embeddings(spark, n_vecs: int, out_dir: str) -> None:
    from pyspark.sql import functions as F

    ids = spark.range(0, n_vecs, numPartitions=32)
    is_dup = F.pmod("id", F.lit(10)) == 9
    src = F.when(is_dup, F.col("id") - 5).otherwise(F.col("id"))
    comp = lambda d: (
        (
            F.pmod(
                F.xxhash64(F.concat(src.cast("string"), F.lit(":"), d.cast("string"))),
                F.lit(2001),
            )
            - 1000
        )
        / 1000.0
    )
    vec = F.transform(F.sequence(F.lit(0), F.lit(DIM - 1)), comp)
    # near-dup: one src-dependent dimension nudged by +0.001
    mut_d = F.pmod(F.xxhash64(F.col("id")), F.lit(DIM)).cast("int")
    vec = F.when(
        is_dup,
        F.transform(vec, lambda v, i: F.when(i == mut_d, v + 0.001).otherwise(v)),
    ).otherwise(vec)
    emb = ids.select(
        F.col("id").cast("long").alias("vec_id"),
        vec.cast("array<float>").alias("embedding"),
    )
    emb.write.mode("overwrite").parquet(os.path.join(out_dir, "embeddings.parquet"))


def main() -> int:
    from seo_crawler_spark.operators.curation import semdedup
    from seo_crawler_spark.session import get_spark

    spark = get_spark("semdedup-scale", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    out = {}
    for label, n in SIZES.items():
        sf_dir = os.path.join(OUT_ROOT, label)
        synth_embeddings(spark, n, sf_dir)
        n_cells = n // VECS_PER_CELL
        runs, dropped = [], None
        for _ in range(2):  # best-of-2 steady state (bench.py policy)
            t0 = time.monotonic()
            res = semdedup(spark, sf_dir, n_cells=n_cells, threshold=0.9)
            dropped = res.filter(~res.is_kept).count()
            runs.append(time.monotonic() - t0)
            spark.catalog.clearCache()
        out[label] = {
            "n_vecs": n,
            "n_cells": n_cells,
            "sec": round(min(runs), 3),
            "dropped": dropped,
        }
    out["time_ratio_10x"] = round(out["10x"]["sec"] / out["1x"]["sec"], 2)
    print(json.dumps(out))
    spark.stop()
    shutil.rmtree(OUT_ROOT, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
