"""Stats-safe checkpoint (ckpt.local_ckpt): plain localCheckpoint
inherits the source plan's size estimate, so iterative join loops square
it per iteration (BigInteger blowup in join estimation — measured
doubling per-wave engine cost from wave ~16). local_ckpt must keep the
estimate bounded while preserving data and partitioning."""

from __future__ import annotations

from pyspark.sql import functions as F

from seo_crawler_spark.ckpt import local_ckpt


def _bits(df) -> int:
    return int(
        df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    ).bit_length()


def test_local_ckpt_preserves_rows_and_partitions(spark):
    df = spark.range(0, 1000, numPartitions=7).select(
        "id", F.concat(F.lit("u"), F.col("id").cast("string")).alias("s")
    )
    out = local_ckpt(df)
    assert out.count() == 1000
    assert out.rdd.getNumPartitions() == 7
    assert sorted(r["s"] for r in out.collect()) == sorted(
        r["s"] for r in df.collect()
    )


def test_local_ckpt_bounds_stats_in_join_loop(spark):
    """5 iterations of join-then-checkpoint: plain localCheckpoint
    compounds the size estimate every round; local_ckpt stays flat."""
    base = spark.range(100).select(
        F.col("id").alias("k"), F.lit("x").alias("s")
    )

    plain = base.localCheckpoint(eager=True)
    safe = local_ckpt(base)
    plain_bits, safe_bits = [], []
    for _ in range(5):
        plain = plain.select("k", "s").join(plain.select("k"), "k").localCheckpoint(
            eager=True
        )
        safe = local_ckpt(safe.select("k", "s").join(safe.select("k"), "k"))
        plain_bits.append(_bits(plain))
        safe_bits.append(_bits(safe))
    # the compounding localCheckpoint keeps growing ...
    assert plain_bits[-1] > plain_bits[0]
    # ... local_ckpt is a fixed-point (conservative default, never grows)
    assert len(set(safe_bits)) == 1
    assert safe_bits[-1] <= 64
    assert safe.count() == 100
