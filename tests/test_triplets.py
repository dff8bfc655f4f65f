"""contrastive_triplets (operators/curation.py): positives align with
the registered minhash pair set, negatives are valid deterministic
draws, and the whole output is partition-invariant."""

from __future__ import annotations

from seo_crawler_spark.operators.curation import contrastive_triplets
from seo_crawler_spark.operators.dedup import dedup_minhash_lsh
from seo_crawler_spark.sources.tables import load

SF = "/root/testdata/sf0.01"


def test_triplets_align_with_pairs_and_negatives_valid(spark):
    trips = contrastive_triplets(spark, SF).collect()
    pairs = {
        (r["a"], r["b"]): r["jaccard"]
        for r in dedup_minhash_lsh(spark, SF).collect()
    }
    ids = {r["doc_id"] for r in load(spark, "documents", SF).collect()}
    assert {(t["anchor"], t["positive"]) for t in trips} == set(pairs)
    for t in trips:
        assert t["jaccard"] == pairs[(t["anchor"], t["positive"])]
        assert t["negative"] in ids
        assert t["negative"] not in (t["anchor"], t["positive"])


def test_triplets_partition_invariant(spark):
    a = [tuple(r) for r in contrastive_triplets(spark, SF).collect()]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "5")
    try:
        b = [tuple(r) for r in contrastive_triplets(spark, SF).collect()]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b
