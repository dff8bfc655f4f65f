"""Connected components (alternating large-star/small-star, Kiveris et
al. 2014) — the O(log n)-round scale path behind dedup_clusters' fixed
5-round label propagation.

Ground truth here is union-find (exact, any topology). The key
NON-VACUOUSNESS test: a diameter-49 chain that 5-round min-label
propagation provably cannot resolve (it reaches only 5 hops), while the
star algorithm collapses it in O(log n) rounds.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from seo_crawler_spark.operators.graph import (
    CC_ITERS,
    connected_components,
    dedup_clusters,
)

SF = "/root/testdata/sf0.001"


def _union_find(edges, nodes):
    p = {n: n for n in nodes}

    def find(x):
        while p[x] != x:
            p[x] = p[p[x]]
            x = p[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            p[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


def _cc(spark, edges):
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "u long, v long"
    )
    return {
        r["node"]: r["label"] for r in connected_components(df).collect()
    }


def test_long_chain_beyond_label_prop_depth(spark):
    """A 50-node path (diameter 49): min-label propagation at the
    dedup_clusters depth (CC_ITERS=5) only carries the min label 5
    hops, so node 49 provably keeps a wrong label; the star algorithm
    resolves the whole chain to component 0."""
    chain = [(i, i + 1) for i in range(49)]
    got = _cc(spark, chain)
    assert got == {i: 0 for i in range(50)}
    # the property that makes the new operator necessary:
    assert CC_ITERS < 49


def test_random_graphs_match_union_find(spark):
    rng = random.Random(4)
    for _ in range(3):
        n = rng.randint(10, 40)
        edges = {
            (rng.randrange(n), rng.randrange(n)) for _ in range(rng.randint(5, 60))
        }
        edges = {e for e in edges if e[0] != e[1]}
        if not edges:
            continue
        nodes = {x for e in edges for x in e}
        assert _cc(spark, edges) == _union_find(edges, nodes)


def test_star_and_selfloop_and_duplicate_edges(spark):
    edges = [(5, 1), (5, 2), (5, 3), (3, 3), (1, 5), (9, 8), (8, 9)]
    got = _cc(spark, edges)
    assert got == {1: 1, 2: 1, 3: 1, 5: 1, 8: 8, 9: 8}


def test_agrees_with_dedup_clusters_on_jaccard_pairs(spark):
    """On the near-dup pair graph (tiny components, diameter < 5) the
    two algorithms must produce the identical clustering — label prop
    is sufficient there; cc is the superset-topology path."""
    from seo_crawler_spark.operators.dedup import dedup_ngram_jaccard

    pairs = dedup_ngram_jaccard(spark, SF).select("a", "b")
    lp = {
        (r["doc_id"], r["cluster_id"], r["is_keeper"])
        for r in dedup_clusters(spark, SF).collect()
    }
    cc = connected_components(
        pairs.select(F.col("a").alias("u"), F.col("b").alias("v"))
    )
    cc_rows = {
        (r["node"], r["label"], r["node"] == r["label"])
        for r in cc.collect()
    }
    assert cc_rows == lp


def test_convergence_bound_raises(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(20)], "u long, v long")
    with pytest.raises(RuntimeError, match="no fixed point"):
        connected_components(df, max_rounds=1)
