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


def test_hard_negatives_fire_at_sf01_and_are_band_collided(spark):
    from seo_crawler_spark.operators.curation import (
        TRI_POS_T,
        contrastive_triplets_hard,
    )

    sf = "/root/testdata/sf0.1"  # sf0.01 has no hard-candidate overlap
    trips = contrastive_triplets_hard(spark, sf).collect()
    allc = {
        (r["a"], r["b"]): r["jaccard"]
        for r in dedup_minhash_lsh(spark, sf, threshold=0.0).collect()
    }
    hard_rows = [t for t in trips if t["neg_kind"] == "hard"]
    assert hard_rows, "sf0.1 must exercise the hard-negative path"
    for t in hard_rows:
        key = (
            min(t["anchor"], t["negative"]),
            max(t["anchor"], t["negative"]),
        )
        # the hard negative band-collided with the anchor and verified
        # below the near-dup threshold
        assert key in allc and allc[key] < TRI_POS_T
    # fallback rows match the uniform draw exactly
    uniform = {
        (t["anchor"], t["positive"]): t["negative"]
        for t in contrastive_triplets(spark, sf).collect()
    }
    for t in trips:
        if t["neg_kind"] == "random":
            assert t["negative"] == uniform[(t["anchor"], t["positive"])]
