"""Round-4 session-11 operators: BFS seed distance (crawl-depth
audit), OPIC crawl-priority scoring, and embedding centroid outliers.

Oracle parity (value hash vs DuckDB) runs in test_oracle_parity.py;
these pin the SEMANTICS the hash can't see — each pipeline against an
independent pure-python reference, plus structural invariants (BFS
monotonicity, OPIC mass conservation bound, exactly-k outliers per
label).
"""

from __future__ import annotations

import math
from collections import defaultdict

import pyarrow.parquet as pq
import pytest

from seo_crawler_spark.operators.curation import (
    CENT_ICOS,
    CENT_SCALE,
    OUT_K,
    centroid_outliers,
)
from seo_crawler_spark.operators.graph import (
    BFS_HOPS,
    OPIC_ITERS,
    SCALE,
    TRUST_SEEDS,
    opic_priority,
    seed_distance_bfs,
)

SF0001 = "/root/testdata/sf0.001"


def _doc_ids(sf_dir: str) -> list[int]:
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return [r["doc_id"] for r in t.to_pylist()]


def _edges_py(ids: list[int]) -> list[tuple[int, int]]:
    # mirror of graph._GEN_EXPRS over the documents table
    n = len(ids)
    out = []
    for d in ids:
        for dst in ((d * d + 1) % n, d % 37, (d * 13 + 3) % n):
            if dst != d:
                out.append((d, dst))
    return out


# ---------------------------------------------------------------------------
# seed_distance_bfs
# ---------------------------------------------------------------------------


def _bfs_reference(ids: list[int]) -> dict[int, int]:
    adj = defaultdict(list)
    for s, t in _edges_py(ids):
        adj[s].append(t)
    dist = {d: 0 for d in ids if d < TRUST_SEEDS}
    frontier = list(dist)
    for hop in range(1, BFS_HOPS + 1):
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if v not in dist:
                    dist[v] = hop
                    nxt.append(v)
        frontier = nxt
    return {d: dist.get(d, -1) for d in ids}


def test_seed_distance_matches_python_bfs(spark):
    got = {
        r.doc_id: r.dist
        for r in seed_distance_bfs(spark, SF0001).collect()
    }
    assert got == _bfs_reference(_doc_ids(SF0001))


def test_seed_distance_structure(spark):
    rows = seed_distance_bfs(spark, SF0001).collect()
    by_id = {r.doc_id: r.dist for r in rows}
    # seeds are at distance 0; everything else is 1..max_hops or -1
    for d, dist in by_id.items():
        if d < TRUST_SEEDS:
            assert dist == 0
        else:
            assert dist == -1 or 1 <= dist <= BFS_HOPS
    # BFS edge relaxation: a reached node's distance is at most
    # 1 + min distance over reached in-neighbors (minimality), and the
    # hub generator (d % 37) makes dist-1 nodes exist
    assert any(v == 1 for v in by_id.values())


# ---------------------------------------------------------------------------
# opic_priority
# ---------------------------------------------------------------------------


def _opic_reference(ids: list[int]) -> dict[int, tuple[int, int]]:
    edges = _edges_py(ids)
    outdeg: dict[int, int] = defaultdict(int)
    for s, _ in edges:
        outdeg[s] += 1
    cash = {d: SCALE for d in ids}
    hist = {d: 0 for d in ids}
    for _ in range(OPIC_ITERS):
        inflow: dict[int, int] = defaultdict(int)
        for s, t in edges:
            inflow[t] += cash[s] // outdeg[s]
        for d in ids:
            hist[d] += cash[d]
            cash[d] = inflow.get(d, 0)
    return {d: (cash[d], hist[d]) for d in ids}


def test_opic_matches_python_reference(spark):
    ref = _opic_reference(_doc_ids(SF0001))
    rows = opic_priority(spark, SF0001).collect()
    got = {r.doc_id: (r.cash, r.hist) for r in rows}
    assert got == ref
    for r in rows:
        assert r.priority == r.cash + r.hist


def test_opic_mass_conservation_bound(spark):
    # cash only evaporates (floor division + dangling pages): total
    # cash is non-increasing per round, so hist+cash ≤ (iters+1)·n·SCALE
    rows = opic_priority(spark, SF0001).collect()
    n = len(rows)
    assert sum(r.cash + r.hist for r in rows) <= (OPIC_ITERS + 1) * n * SCALE
    # ranks are a permutation ordered by priority desc, doc_id asc
    ranked = sorted(rows, key=lambda r: (-r.priority, r.doc_id))
    assert [r.rnk for r in ranked] == list(range(1, n + 1))


# ---------------------------------------------------------------------------
# centroid_outliers
# ---------------------------------------------------------------------------


def _centroid_reference(sf_dir: str) -> dict[int, tuple[int, int, bool]]:
    emb = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pylist()
    q = {
        r["vec_id"]: [
            math.floor(float(v) * CENT_SCALE) for v in r["embedding"]
        ]
        for r in emb
    }
    label = {r["vec_id"]: r["label"] for r in emb}
    by_label = defaultdict(list)
    for vid in q:
        by_label[label[vid]].append(vid)
    icos = {}
    for lab, vids in by_label.items():
        dim = len(q[vids[0]])
        cd = [
            (sum(q[v][d] for v in vids) * CENT_SCALE) // len(vids)
            for d in range(dim)
        ]
        nc = sum(c * c for c in cd)
        for v in vids:
            idot = sum(q[v][d] * cd[d] for d in range(dim))
            nx = sum(x * x for x in q[v])
            icos[v] = math.floor(
                idot / math.sqrt(nx) / math.sqrt(nc) * CENT_ICOS
            )
    out = {}
    for lab, vids in by_label.items():
        order = sorted(vids, key=lambda v: (icos[v], v))
        for rnk, v in enumerate(order, 1):
            out[v] = (icos[v], rnk, rnk <= OUT_K)
    return out


def test_centroid_outliers_match_python_reference(spark):
    ref = _centroid_reference(SF0001)
    rows = centroid_outliers(spark, SF0001).collect()
    got = {r.vec_id: (r.icos, r.out_rnk, r.is_outlier) for r in rows}
    assert got == ref


def test_centroid_outliers_exactly_k_per_label(spark):
    rows = centroid_outliers(spark, SF0001).collect()
    per = defaultdict(int)
    seen_labels = set()
    for r in rows:
        seen_labels.add(r.label)
        if r.is_outlier:
            per[r.label] += 1
        # cosine to own centroid lives on the 1e4 grid in [-1e4, 1e4]
        assert -CENT_ICOS <= r.icos <= CENT_ICOS
    assert all(per[lab] == OUT_K for lab in seen_labels)


# ---------------------------------------------------------------------------
# cocitation_similarity
# ---------------------------------------------------------------------------


def _cocite_reference(ids: list[int]):
    from seo_crawler_spark.operators.graph import COCITE_MIN, COCITE_OUT_CAP

    edges = set(_edges_py(ids))
    outs = defaultdict(set)
    indeg = defaultdict(int)
    for s, t in edges:
        outs[s].add(t)
        indeg[t] += 1
    cc = defaultdict(int)
    for s, ds in outs.items():
        if not (2 <= len(ds) <= COCITE_OUT_CAP):
            continue
        ds = sorted(ds)
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                cc[(ds[i], ds[j])] += 1
    return {
        (a, b): (
            c,
            indeg[a],
            indeg[b],
            (100 * c) // min(indeg[a], indeg[b]),
            c >= COCITE_MIN,
        )
        for (a, b), c in cc.items()
    }


def test_cocitation_matches_python_reference(spark):
    from seo_crawler_spark.operators.graph import cocitation_similarity

    ref = _cocite_reference(_doc_ids(SF0001))
    rows = cocitation_similarity(spark, SF0001).collect()
    got = {
        (r.a, r.b): (r.cocite, r.indeg_a, r.indeg_b, r.score_pct, r.related)
        for r in rows
    }
    assert got == ref
    # pair canonicalization + non-vacuous verdicts both ways
    assert all(r.a < r.b for r in rows)
    assert any(r.related for r in rows) and not all(r.related for r in rows)
