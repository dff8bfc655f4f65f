#!/usr/bin/env python
"""Source-count scaling probe for hll_source_overlap's pair stage.

The overlap operator's only non-dimension-sized stage is the
|sources|²/2 × m register join — QUADRATIC in source count by design
(every pair gets an estimate). This probe measures that term directly:
synthetic register tables (md5-derived ranks, the real distribution
shape) at S = 100 / 400 / 1600 sources, timing the densified pair-union
+ integer-estimator aggregate. At S sources the join emits S·(S−1)/2·64
rows; 1600 sources ≈ 82M — the probe shows whether local[32] absorbs
that and how the time tracks S².

Beyond ~10^4 sources the right move is the LSH discipline the dedup
family uses everywhere: shortlist candidate pairs by register-signature
bands (sources sharing high-rank registers) before estimating — same
two-phase shape, the estimator is unchanged. This probe documents where
that switch becomes necessary instead of asserting it.

Run: python scripts/bench_overlap_scale.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from seo_crawler_spark.operators.sketches import (
    HLL_ALPHA,
    HLL_CAP,
    HLL_LC_LIMIT,
    HLL_M,
    _lc_case_sql,
)
from seo_crawler_spark.session import get_spark

SIZES = (100, 400, 1600)


def main() -> int:
    spark = get_spark(
        "overlap-scale", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    an, ad = HLL_ALPHA
    print(f"{'sources':>8s} {'pair_rows':>12s} {'sec':>7s}")
    for s_count in SIZES:
        # md5-derived register ranks: the rank distribution of a real
        # ~5k-element sketch (geometric, capped)
        dense = (
            spark.range(s_count)
            .select(F.col("id").alias("source"))
            .select(
                "source",
                F.explode(
                    F.sequence(F.lit(0), F.lit(HLL_M - 1))
                ).alias("j"),
            )
            .select(
                "source",
                "j",
                F.expr(
                    "cast(conv(substr(md5(concat('r:', source, ':', j)), 1, 4), 16, 10)"
                    " as bigint)"
                ).alias("h"),
            )
            .select(
                "source",
                "j",
                # geometric rank from a 16-bit hash slice (probe-only;
                # no cross-engine parity needed here)
                F.expr(
                    "1 + cast(floor(log2(65536.0 / greatest(h % 65536, 1))) as int)"
                ).alias("m"),
            )
            .select(
                "source", "j", F.least(F.col("m"), F.lit(HLL_CAP)).alias("m")
            )
            .localCheckpoint(eager=True)
        )
        a = dense.select(
            F.col("source").alias("src_a"), "j", F.col("m").alias("ma")
        )
        b = dense.select(
            F.col("source").alias("src_b"), "j", F.col("m").alias("mb")
        )
        t0 = time.monotonic()
        pair_regs = (
            a.join(b, "j")
            .filter(F.col("src_a") < F.col("src_b"))
            .select(
                "src_a", "src_b", F.greatest("ma", "mb").alias("m")
            )
        )
        per = pair_regs.groupBy("src_a", "src_b").agg(
            F.sum(F.when(F.col("m") == 0, 1).otherwise(0)).alias("zeros"),
            F.expr(f"sum(cast(1 as bigint) << ({HLL_CAP} - m))").alias(
                "isum"
            ),
        )
        est = per.withColumn(
            "raw",
            F.expr(
                f"(cast({an} as bigint) * {HLL_M * HLL_M}"
                f" * {1 << HLL_CAP}) div ({ad} * isum)"
            ),
        ).select(
            F.when(
                (F.col("raw") <= HLL_LC_LIMIT) & (F.col("zeros") > 0),
                F.expr(_lc_case_sql("zeros")),
            )
            .otherwise(F.col("raw"))
            .alias("est")
        )
        n = est.count()
        dt = time.monotonic() - t0
        rows = s_count * (s_count - 1) // 2 * HLL_M
        print(f"{s_count:8d} {rows:12,d} {dt:7.2f}")
        assert n == s_count * (s_count - 1) // 2
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
