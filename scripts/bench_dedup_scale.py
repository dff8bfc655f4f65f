#!/usr/bin/env python
"""Text-dedup scale linearity (VERDICT r2 #5): the dedup family
(minhash LSH, n-gram Jaccard, simhash) timed on a synthetic documents
corpus at 1× (5k docs — sf0.1 size) and 10× (50k docs), same generator,
same registered query paths. Near-linear wall-time growth = no hidden
quadratic (a pair-explosion in banding or posting lists would cliff at
10×).

Corpus: deterministic token streams from hashed (src_id, position);
every 10th doc is a near-duplicate of a doc 5 ids earlier with one
token mutated — so dup-cluster density per doc is scale-invariant and
the verify stages have real positives at both sizes. All column exprs
(no driver-side text generation).

Prints one JSON line with per-op seconds at both sizes and the
time ratio (ideal = 10 at perfect linearity; sublinear constants make
<10 common)."""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")  # script lives in scripts/

SIZES = {"1x": 5_000, "10x": 50_000}
# --full adds the 100x step (500k docs ≈ 60M tokens) — the two-decade
# linearity table; kept behind a flag so the default run stays cheap
FULL_SIZES = {"1x": 5_000, "10x": 50_000, "100x": 500_000}
OUT_ROOT = "/tmp/dedup_scale"


def synth_documents(spark, n_docs: int, out_dir: str) -> None:
    from pyspark.sql import functions as F

    ids = spark.range(0, n_docs, numPartitions=32)
    is_dup = F.pmod("id", F.lit(10)) == 9
    src = F.when(is_dup, F.col("id") - 5).otherwise(F.col("id"))
    n_tok = (F.pmod(F.xxhash64(src), F.lit(80)) + 80).cast("int")
    tok = lambda j: F.concat(
        F.lit("w"),
        F.pmod(
            F.xxhash64(F.concat(src.cast("string"), F.lit(":"), j.cast("string"))),
            F.lit(30_000),
        ).cast("string"),
    )
    toks = F.transform(F.sequence(F.lit(1), n_tok), tok)
    # near-dup mutation: one token swapped at a src-dependent position
    mut_pos = F.pmod(F.xxhash64(F.col("id")), n_tok.cast("long")).cast("int") + 1
    toks = F.when(
        is_dup,
        F.transform(
            toks,
            lambda t, i: F.when(i + 1 == mut_pos, F.lit("wMUT")).otherwise(t),
        ),
    ).otherwise(toks)
    text = F.concat_ws(" ", toks)
    docs = ids.select(
        F.col("id").alias("doc_id"),
        text.alias("text"),
        F.lit("en").alias("lang"),
        F.lit("synth").alias("source"),
        F.length(text).alias("n_chars"),
    )
    docs.write.mode("overwrite").parquet(os.path.join(out_dir, "documents.parquet"))


def main() -> int:
    from seo_crawler_spark.operators.corpus_stats import (
        ngram_novelty,
        paragraph_dedup,
    )
    from seo_crawler_spark.operators.dedup import (
        dedup_minhash_lsh,
        dedup_ngram_jaccard,
        dedup_simhash,
        winnowing_candidates,
    )
    from seo_crawler_spark.session import get_spark

    spark = get_spark("dedup-scale", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    ops = {
        "minhash_lsh": dedup_minhash_lsh,
        "ngram_jaccard": dedup_ngram_jaccard,
        "simhash": dedup_simhash,
        "paragraph_dedup": paragraph_dedup,
        "winnowing": winnowing_candidates,
        "ngram_novelty": ngram_novelty,
    }
    sizes = FULL_SIZES if "--full" in sys.argv else SIZES
    out = {}
    for label, n in sizes.items():
        sf_dir = os.path.join(OUT_ROOT, label)
        synth_documents(spark, n, sf_dir)
        res = {"n_docs": n}
        for op_name, op in ops.items():
            runs, rows = [], None
            for _ in range(2):  # best-of-2 steady state (bench.py policy)
                t0 = time.monotonic()
                df = op(spark, sf_dir)
                rows = df.count()
                runs.append(time.monotonic() - t0)
                spark.catalog.clearCache()
            res[op_name + "_sec"] = round(min(runs), 3)
            res[op_name + "_pairs"] = rows
        out[label] = res
    labels = list(sizes)
    for op_name in ops:
        for prev, cur in zip(labels, labels[1:]):
            out[f"{op_name}_time_ratio_{cur}"] = round(
                out[cur][op_name + "_sec"] / out[prev][op_name + "_sec"], 2
            )
    print(json.dumps(out))
    spark.stop()
    shutil.rmtree(OUT_ROOT, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
