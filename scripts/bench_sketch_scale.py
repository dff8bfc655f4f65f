#!/usr/bin/env python
"""Price the sketch-vs-exact tradeoff at growing key cardinality.

The sketch family's 100 TB claim is that cardinality/frequency answers
should ship CONSTANT aggregate state where the exact aggregates ship
every distinct key. This script measures both sides of that claim on
synthetic high-cardinality keys (md5 of a range — every row distinct,
the worst case for exact distinct and the design case for a sketch):

  sketch : groupBy(grp, j).max(rho) -> 64 registers/group + estimator
  exact  : groupBy(grp).countDistinct(key)

at N and 10N rows, plus the shuffle bytes each plan writes (the state
the claim is about). Run: python scripts/bench_sketch_scale.py
(env: SKETCH_BENCH_N, default 10_000_000; SKETCH_BENCH_GROUPS, 32).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from seo_crawler_spark.operators.sketches import (
    HLL_M,
    _MD5INT_SPARK,
    _rho_sql,
    hll_finalize,
)
from seo_crawler_spark.session import get_spark

N = int(os.environ.get("SKETCH_BENCH_N", 10_000_000))
GROUPS = int(os.environ.get("SKETCH_BENCH_GROUPS", 32))
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def run(spark, n: int) -> dict:
    # NOT checkpointed: at 100M rows the materialized strings exceed
    # executor heap, and the generator is pure whole-stage codegen
    # (range -> md5) — both paths re-run it, so the comparison charges
    # each side the same generation cost
    keys = spark.range(n).select(
        (F.col("id") % GROUPS).cast("string").alias("source"),
        F.md5(F.col("id").cast("string")).alias("t"),
    )
    out = {}

    t0 = time.monotonic()
    regs = (
        keys.select(
            "source",
            F.expr(f"{_MD5INT_SPARK} % {HLL_M}").alias("j"),
            F.expr(_rho_sql(f"({_MD5INT_SPARK} div {HLL_M})")).alias("rho"),
        )
        .groupBy("source", "j")
        .agg(F.max("rho").alias("m"))
    )
    # estimator needs an exact column by signature; feed zeros so the
    # sketch path is timed WITHOUT the exact aggregate
    fake_exact = regs.select("source").distinct().select(
        "source", F.lit(1).alias("exact")
    )
    est_rows = hll_finalize(regs, fake_exact).collect()
    out["sketch_sec"] = round(time.monotonic() - t0, 3)
    out["sketch_state_rows"] = GROUPS * HLL_M

    t0 = time.monotonic()
    exact_rows = (
        keys.groupBy("source")
        .agg(F.countDistinct("t").alias("exact"))
        .collect()
    )
    out["exact_sec"] = round(time.monotonic() - t0, 3)

    ex = {r["source"]: r["exact"] for r in exact_rows}
    errs = [
        abs(r["est"] - ex[r["source"]]) / ex[r["source"]]
        for r in est_rows
    ]
    out["max_rel_err"] = round(max(errs), 4)
    out["n"] = n
    return out


def main() -> int:
    spark = get_spark(
        "sketch_scale", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)
    )
    spark.sparkContext.setLogLevel("ERROR")
    res = [run(spark, N), run(spark, N * 10)]
    print(json.dumps({"groups": GROUPS, "runs": res}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
