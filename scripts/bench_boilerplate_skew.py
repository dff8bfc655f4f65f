#!/usr/bin/env python
"""Boilerplate-skew A/B for LSH dedup (dedup.py exact-collapse).

A web corpus always contains byte-identical boilerplate served from
thousands of URLs (error pages, cookie banners, parked domains). Those
docs share EVERY band signature, so banding all docs puts k rows in
the same band bucket and the band equi-join generates k² candidates
per band — the one quadratic a banded-LSH plan can hide. The fix
(dedup_minhash_lsh/dedup_simhash): collapse docs with identical
shingle arrays / fingerprints to one representative before banding,
expand members back into the output (provably output-identical —
the metric is a pure function of the collapse key).

This bench builds 50k unique background docs + K copies of one
boilerplate text (+ a near-dup family), then measures:
  * collapsed (shipped) vs uncollapsed (pre-fix, inlined here) wall
    time for the full minhash pipeline, K = 2_000 and 5_000;
  * asserts both paths produce the SAME pair multiset (count +
    order-insensitive hash) at K = 2_000.

Prints one JSON line + markdown rows for BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

N_BG = 50_000


def synth(spark, k_copies: int):
    """50k unique ~60-token docs + k_copies of one boilerplate text +
    a 40-doc near-dup family (half the tokens shared)."""
    from pyspark.sql import functions as F

    word = lambda key, j: F.concat(
        F.lit("w"),
        F.xxhash64(
            F.concat(key.cast("string"), F.lit(":"), j.cast("string"))
        ).cast("string"),
    )
    bg = spark.range(0, N_BG).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(F.sequence(F.lit(1), F.lit(60)), lambda j: word(F.col("id"), j)),
        ).alias("text"),
    )
    boiler = spark.range(N_BG, N_BG + k_copies).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(F.sequence(F.lit(1), F.lit(60)), lambda j: word(F.lit(-1), j)),
        ).alias("text"),
    )
    lo = N_BG + k_copies
    near = spark.range(lo, lo + 40).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.concat(
                F.transform(F.sequence(F.lit(1), F.lit(30)), lambda j: word(F.lit(-2), j)),
                F.transform(
                    F.sequence(F.lit(1), F.lit(30)), lambda j: word(F.col("id"), j)
                ),
            ),
        ).alias("text"),
    )
    return bg.unionByName(boiler).unionByName(near)


def uncollapsed_minhash(spark, sf_dir: str, threshold: float = 0.5):
    """The pre-fix pipeline, verbatim: band EVERY doc, join, verify."""
    from pyspark.sql import functions as F

    from seo_crawler_spark.functions.text import md5int
    from seo_crawler_spark.operators.dedup import (
        MOD,
        _minhash_bands,
        _token_arrays,
        shingles,
    )
    from seo_crawler_spark.sources.tables import load

    arrays = (
        _token_arrays(load(spark, "documents", sf_dir))
        .select("doc_id", F.array_distinct(shingles(F.col("tok"))).alias("sh"))
        .filter(F.size("sh") > 0)
    )
    hashed = arrays.select(
        "doc_id",
        "sh",
        F.transform("sh", lambda s: md5int(s) % MOD).alias("hh"),
    ).localCheckpoint(eager=True)
    bands = _minhash_bands(hashed)
    pa = bands.select(F.col("doc_id").alias("a"), "band", "sig")
    pb = bands.select(F.col("doc_id").alias("b"), "band", "sig")
    cand = (
        pa.join(pb, ["band", "sig"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    sets_ = hashed.select("doc_id", "sh")
    pairs = cand.join(
        sets_.select(F.col("doc_id").alias("a"), F.col("sh").alias("sha")), "a"
    ).join(sets_.select(F.col("doc_id").alias("b"), F.col("sh").alias("shb")), "b")
    inter = F.size(F.array_intersect("sha", "shb"))
    na, nb = F.size("sha"), F.size("shb")
    return (
        pairs.withColumn("jaccard", F.round(inter / (na + nb - inter), 4))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def fingerprint(df):
    """Order-insensitive (count, xor-hash) over the pair rows."""
    from pyspark.sql import functions as F

    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(xxhash64(a, b, cast(jaccard as string)))").alias("h"),
    ).collect()[0]
    return row["n"], row["h"]


def main() -> int:
    import shutil

    from seo_crawler_spark.operators.dedup import dedup_minhash_lsh
    from seo_crawler_spark.session import get_spark

    spark = get_spark(
        "boilerplate_skew", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    results = []
    parity = None
    for k in (2_000, 5_000):
        sf_dir = f"/tmp/bench_boiler_{k}"
        shutil.rmtree(sf_dir, ignore_errors=True)
        synth(spark, k).write.mode("overwrite").parquet(
            f"{sf_dir}/documents.parquet"
        )
        t0 = time.monotonic()
        fp_new = fingerprint(dedup_minhash_lsh(spark, sf_dir))
        t_new = round(time.monotonic() - t0, 2)
        t0 = time.monotonic()
        fp_old = fingerprint(uncollapsed_minhash(spark, sf_dir))
        t_old = round(time.monotonic() - t0, 2)
        if k == 2_000:
            assert fp_new == fp_old, (fp_new, fp_old)
            parity = {"pairs": fp_new[0], "hash_equal": True}
        results.append(
            {
                "k_copies": k,
                "docs": N_BG + k + 40,
                "pairs_out": fp_new[0],
                "sec_collapsed": t_new,
                "sec_uncollapsed": t_old,
                "speedup": round(t_old / t_new, 2),
            }
        )
    print(json.dumps({"results": results, "parity_at_2000": parity}))
    print("\n| boiler copies | docs | output pairs | collapsed s | uncollapsed s | speedup |")
    print("|---|---|---|---|---|---|")
    for r in results:
        print(
            f"| {r['k_copies']:,} | {r['docs']:,} | {r['pairs_out']:,} "
            f"| {r['sec_collapsed']} | {r['sec_uncollapsed']} | {r['speedup']}x |"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
