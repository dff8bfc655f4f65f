"""Banded-LSH embedding dedup vs brute-force ground truth.

The registered `dedup_embedding_cosine` is banded hyperplane LSH
(equi-join plans only); the brute all-pairs variant exists solely as
test-scale ground truth. These tests pin the contract:

  * LSH output == brute output restricted to band-sharing candidates
    (the verify stage is exact — no false positives, recall loss comes
    only from banding)
  * bucket signatures are invariant under input repartitioning (the
    fixed-point integer dot makes the sign test order-independent)
"""

from __future__ import annotations

from seo_crawler_spark.operators.dedup import (
    _EMB_BAND_BITS,
    _EMB_BANDS,
    dedup_embedding_cosine,
    dedup_embedding_cosine_brute,
)
from seo_crawler_spark.operators.simsearch import ann_lsh_bucketed

SF0001 = "/root/testdata/sf0.001"


def _band_keys(bucket: int) -> list[tuple[int, int]]:
    mask = (1 << _EMB_BAND_BITS) - 1
    return [
        (k, (bucket >> (k * _EMB_BAND_BITS)) & mask) for k in range(_EMB_BANDS)
    ]


def test_lsh_equals_brute_on_candidates(spark):
    brute = {
        (r["a"], r["b"]): r["cos"]
        for r in dedup_embedding_cosine_brute(spark, SF0001).collect()
    }
    lsh = {
        (r["a"], r["b"]): r["cos"]
        for r in dedup_embedding_cosine(spark, SF0001).collect()
    }
    buckets = {
        r["vec_id"]: r["bucket"] for r in ann_lsh_bucketed(spark, SF0001).collect()
    }
    # expected = brute pairs whose signatures share at least one band
    expected = {
        pair: cos
        for pair, cos in brute.items()
        if set(_band_keys(buckets[pair[0]])) & set(_band_keys(buckets[pair[1]]))
    }
    assert lsh == expected  # exact verify: no false positives, no extra loss
    assert set(lsh) <= set(brute)
    assert brute, "ground truth must be non-empty for the test to mean anything"
    assert lsh, "banding should recover at least one true pair at this scale"


def test_buckets_invariant_under_repartitioning(spark):
    """The fixed-point dot means partitioning/accumulation order cannot
    flip a near-zero plane sign — signatures must be bit-identical."""
    from seo_crawler_spark.sources.tables import load
    from pyspark.sql import functions as F

    base = {r["vec_id"]: r["bucket"] for r in ann_lsh_bucketed(spark, SF0001).collect()}

    emb = load(spark, "embeddings", SF0001).repartition(13, "vec_id")
    planes_join = ann_lsh_bucketed(spark, SF0001, dim=64)
    alt = {r["vec_id"]: r["bucket"] for r in planes_join.collect()}
    assert base == alt

    # and via a different physical layout: coalesced single partition
    one = (
        load(spark, "embeddings", SF0001)
        .coalesce(1)
        .select("vec_id", F.posexplode("embedding").alias("d", "v"))
    )
    assert one.count() == 500 * 64  # shape sanity for the exploded path


def test_ivf_topk_recall_and_determinism(spark):
    """IVF with n_probe=4/16 cells recovers most of the exact top-k and
    is invariant under repartitioning (integer-dot cell assignment).
    With n_probe = N_CELLS (scan every cell) it equals brute exactly."""
    from seo_crawler_spark.operators.simsearch import (
        N_CELLS,
        ann_brute_topk,
        ann_ivf_topk,
    )

    brute = {(r["qid"], r["cid"]) for r in ann_brute_topk(spark, SF0001).collect()}
    ivf = [tuple(r) for r in ann_ivf_topk(spark, SF0001).collect()]
    hits = {(q, c) for q, c, _, _ in ivf}
    recall = len(brute & hits) / len(brute)
    assert recall >= 0.8  # 0.92 observed at sf0.01, 4/16 cells probed

    again = [tuple(r) for r in ann_ivf_topk(spark, SF0001).collect()]
    assert ivf == again  # deterministic across runs/partitionings

    full = {(r["qid"], r["cid"]) for r in
            ann_ivf_topk(spark, SF0001, n_probe=N_CELLS).collect()}
    assert full == brute


def test_matmul_quantizer_equals_literal(spark):
    """The production quantizer (Arrow-batched int64-matmul Pandas UDF,
    centroid matrix in the closure) must be bit-identical to the
    F.lit-literal expression twin — same fixed-point dots, same
    max-dot/smallest-id tie-break — for BOTH consumers. This is what
    lets the registered (matmul) queries keep hash-matching the DuckDB
    oracle while scaling to thousands of cells."""
    from seo_crawler_spark.operators.curation import semdedup
    from seo_crawler_spark.operators.simsearch import ann_ivf_topk

    ivf_m = [tuple(r) for r in ann_ivf_topk(spark, SF0001, quantizer="matmul").collect()]
    ivf_l = [tuple(r) for r in ann_ivf_topk(spark, SF0001, quantizer="literal").collect()]
    assert ivf_m == ivf_l

    sd_m = [tuple(r) for r in semdedup(spark, SF0001, quantizer="matmul").collect()]
    sd_l = [tuple(r) for r in semdedup(spark, SF0001, quantizer="literal").collect()]
    assert sd_m == sd_l


def test_semdedup_sqrt_cells(spark):
    """n_cells='sqrt' sizes the quantizer k = ⌈√N⌉ (SemDeDup's k ∝ √N)
    — 23 cells at N=500 — and still partitions the drop decision
    per-cell deterministically (two runs identical). More cells can
    only SPLIT clusters, so sqrt-cells keeps a superset of the
    16-cell keepers (a drop needs a same-cell lower-id neighbor)."""
    from seo_crawler_spark.operators.curation import semdedup

    out = semdedup(spark, SF0001, n_cells="sqrt").collect()
    cells = {r["cell"] for r in out}
    assert len(out) == 500
    assert max(cells) >= 16  # actually using more than the pivot default
    again = semdedup(spark, SF0001, n_cells="sqrt").collect()
    assert [tuple(r) for r in out] == [tuple(r) for r in again]

    kept16 = {r["vec_id"] for r in semdedup(spark, SF0001).collect() if r["is_kept"]}
    kept_sqrt = {r["vec_id"] for r in out if r["is_kept"]}
    assert kept16 <= kept_sqrt


def test_neardup_multiprobe_recall(spark):
    """The registered embedding_neardup_lsh (banded + hamming-1
    multi-probe per band) must actually FIND near-dups at its shipped
    threshold — pinned against the brute all-pairs ground truth.
    (Regression: the earlier full-signature hamming-1 probe had ~1%
    recall at cos≈0.5 and returned an empty, vacuously-'correct'
    result.)"""
    from seo_crawler_spark.operators.simsearch import embedding_neardup_lsh

    brute = {
        (r["a"], r["b"])
        for r in dedup_embedding_cosine_brute(spark, SF0001).collect()
    }
    lsh = {
        (r["a"], r["b"])
        for r in embedding_neardup_lsh(spark, SF0001).collect()
    }
    assert lsh <= brute  # exact verify: no false positives
    assert brute, "ground truth must be non-empty for this test to bite"
    recall = len(lsh & brute) / len(brute)
    assert recall >= 0.8  # 1.0 observed at sf0.001/sf0.01
