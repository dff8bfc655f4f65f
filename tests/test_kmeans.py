"""Distributed k-means quantizer training (simsearch.kmeans_train) —
exact fixed-point Lloyd's, the trained-centroid source for
ann_ivf_topk / semdedup's ``centroids=`` interface.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from seo_crawler_spark.operators.simsearch import (
    DOT_SCALE,
    KM_ITERS,
    KM_K,
    N_CELLS,
    ann_brute_topk,
    ann_ivf_topk,
    kmeans_centroids_float,
    kmeans_quantizer,
    kmeans_train,
)
from seo_crawler_spark.sources.tables import load

SF = "/root/testdata/sf0.001"


def _numpy_lloyd(vectors: np.ndarray, k: int, iters: int):
    """Reference implementation: same quantization, same tie-break
    (min dist, then min cell id), same floor-mean, same empty-cell
    keep-old."""
    q = np.floor(vectors.astype(np.float64) * DOT_SCALE).astype(np.int64)
    cents = {cid: q[cid].copy() for cid in range(k)}
    for _ in range(iters):
        C = np.stack([cents[c] for c in sorted(cents)])
        d = ((q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)  # first min = smallest cell id
        new = {}
        for cid in sorted(cents):
            members = q[a == cid]
            if len(members):
                new[cid] = np.array(
                    [int(s) // len(members) for s in members.sum(axis=0)],
                    dtype=np.int64,
                )
            else:
                new[cid] = cents[cid]
        cents = new
    return {c: v.tolist() for c, v in cents.items()}


def test_train_matches_numpy_reference(spark):
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(60, 8)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))],
        "vec_id long, embedding array<float>",
    )
    got = {c: v for c, v in kmeans_train(df, k=4, iters=3)}
    want = _numpy_lloyd(vecs, k=4, iters=3)
    assert got == want


def test_empty_cell_keeps_previous_centroid(spark):
    # all points sit at +1 except seed 0 at -1e3: after one update every
    # point assigns away from cell 0, whose centroid must then persist
    vals = [[-1000.0] * 4] + [[1.0] * 4] * 9
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)],
        "vec_id long, embedding array<float>",
    )
    cents = dict(kmeans_train(df, k=2, iters=2))
    assert cents[0] == [int(-1000.0 * DOT_SCALE)] * 4
    want = _numpy_lloyd(np.array(vals, dtype=np.float32), k=2, iters=2)
    assert cents == want


def test_centroids_float_roundtrip():
    # the centroids= interface re-quantizes via floor(v * DOT_SCALE);
    # the adapter must floor back to exactly the trained integer
    import math

    for cval in (-1234567, -1, 0, 1, 999999, 31764, -92071):
        f = (cval + 0.5) / DOT_SCALE
        assert math.floor(f * DOT_SCALE) == cval


def test_trained_quantizer_full_probe_equals_brute(spark):
    """IVF with the TRAINED quantizer and n_probe = n_cells scans every
    cell, so it must reproduce the exact brute-force top-k — the same
    invariant the pivot quantizer is pinned by."""
    emb = load(spark, "embeddings", SF)
    cents = kmeans_centroids_float(kmeans_train(emb, k=KM_K, iters=KM_ITERS))
    ivf = ann_ivf_topk(
        spark, SF, n_probe=KM_K, centroids=cents, n_cells=KM_K
    ).collect()
    brute = ann_brute_topk(spark, SF).collect()
    assert [tuple(r) for r in ivf] == [tuple(r) for r in brute]


def test_quantizer_query_deterministic_and_balanced(spark):
    a = kmeans_quantizer(spark, SF).collect()
    b = kmeans_quantizer(spark, SF).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    pops = {r["cell"]: r["n_vecs"] for r in a}
    n = load(spark, "embeddings", SF).count()
    assert sum(pops.values()) == n
    assert len(pops) == KM_K
    # trained cells should all be populated on this data
    assert min(pops.values()) > 0


def test_semdedup_accepts_trained_centroids(spark):
    from seo_crawler_spark.operators.curation import semdedup

    emb = load(spark, "embeddings", SF)
    cents = kmeans_centroids_float(kmeans_train(emb, k=KM_K, iters=KM_ITERS))
    out = semdedup(spark, SF, centroids=cents).collect()
    assert len(out) == emb.count()
    # keepers + dropped partition the corpus; at least one of each
    kept = [r for r in out if r["is_kept"]]
    assert 0 < len(kept) <= len(out)


def test_cluster_balanced_sample_quota_and_coverage(spark):
    from seo_crawler_spark.operators.simsearch import (
        CBS_QUOTA,
        cluster_balanced_sample,
        kmeans_quantizer,
    )

    out = cluster_balanced_sample(spark, SF).collect()
    n = load(spark, "embeddings", SF).count()
    # every vector appears exactly once, with a verdict
    assert sorted(r["vec_id"] for r in out) == list(range(n))
    pops = {r["cell"]: r["n_vecs"] for r in kmeans_quantizer(spark, SF).collect()}
    kept_by_cell: dict[int, int] = {}
    size_by_cell: dict[int, int] = {}
    for r in out:
        size_by_cell[r["cell"]] = size_by_cell.get(r["cell"], 0) + 1
        if r["kept"]:
            kept_by_cell[r["cell"]] = kept_by_cell.get(r["cell"], 0) + 1
        # pos is a 1..|cell| ranking and kept is exactly pos <= quota
        assert r["kept"] == (1 if r["pos"] <= CBS_QUOTA else 0)
    # cell populations agree with the quantizer query (same assignment)
    assert size_by_cell == pops
    # per-cell keeps = min(quota, |cell|): balanced selection
    for cell, size in size_by_cell.items():
        assert kept_by_cell.get(cell, 0) == min(CBS_QUOTA, size)


def test_cluster_balanced_sample_partition_invariant(spark):
    from seo_crawler_spark.operators.simsearch import cluster_balanced_sample

    a = cluster_balanced_sample(spark, SF).collect()
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try:
        b = cluster_balanced_sample(spark, SF).collect()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
