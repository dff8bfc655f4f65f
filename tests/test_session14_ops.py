"""Round-4 session-14 operators: SALSA hub/authority scoring (and the
rest of the session as it lands).

Oracle parity (value hash vs DuckDB) runs in driver_sim; these pin the
semantics the hash can't see — pure-python reference equality over the
same generator graph plus each operator's structural invariants.
"""

from __future__ import annotations

from collections import defaultdict

import pyarrow.parquet as pq

from seo_crawler_spark.operators.graph import (
    SALSA_ITERS,
    SCALE,
    salsa_scores,
)

SF0001 = "/root/testdata/sf0.001"


def _doc_ids(sf_dir: str) -> list[int]:
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return [r["doc_id"] for r in t.to_pylist()]


def _gen_edges(ids: list[int]) -> list[tuple[int, int]]:
    n = len(ids)
    edges = []
    for d in ids:
        for dst in ((d * d + 1) % n, d % 37, (d * 13 + 3) % n):
            if dst != d:
                edges.append((d, dst))
    return edges


def _salsa_reference(ids: list[int], iters: int):
    """Exact integer fixed-point SALSA — Python // mirrors Spark div on
    the all-positive scores."""
    edges = _gen_edges(ids)
    outdeg = defaultdict(int)
    indeg = defaultdict(int)
    for s, d in edges:
        outdeg[s] += 1
        indeg[d] += 1
    hub = {i: SCALE for i in ids}
    auth = {}
    for _ in range(iters):
        auth = {i: 0 for i in ids}
        for s, d in edges:
            auth[d] += hub[s] // outdeg[s]
        hub = {i: 0 for i in ids}
        for s, d in edges:
            hub[s] += auth[d] // indeg[d]
    return hub, auth


def test_salsa_matches_python_reference(spark):
    ids = _doc_ids(SF0001)
    ref_hub, ref_auth = _salsa_reference(ids, SALSA_ITERS)
    rows = salsa_scores(spark, SF0001).collect()
    assert len(rows) == len(ids)
    for r in rows:
        assert r["hub"] == ref_hub[r["doc_id"]]
        assert r["auth"] == ref_auth[r["doc_id"]]
    # rnk is dense 1..n ordered by (auth desc, doc_id asc)
    ordered = sorted(rows, key=lambda r: (-r["auth"], r["doc_id"]))
    assert [r["rnk"] for r in ordered] == list(range(1, len(ids) + 1))


def test_salsa_mass_conserved_and_degree_proportional(spark):
    ids = _doc_ids(SF0001)
    n = len(ids)
    rows = {r["doc_id"]: r for r in salsa_scores(spark, SF0001).collect()}
    # stochastic propagation: total mass never grows; floor division
    # only leaks (bounded by one unit per edge per half-step)
    total_auth = sum(r["auth"] for r in rows.values())
    assert 0 < total_auth <= n * SCALE
    # SALSA's fixed point is indegree-proportional per component — the
    # %37 hub nodes (huge indegree) must dominate the authority top-10,
    # the property that distinguishes it from uniform/vacuous output
    edges = _gen_edges(ids)
    indeg = defaultdict(int)
    for _, d in edges:
        indeg[d] += 1
    top10 = sorted(rows.values(), key=lambda r: r["rnk"])[:10]
    med_indeg = sorted(indeg.get(i, 0) for i in ids)[n // 2]
    assert all(indeg[r["doc_id"]] > 3 * med_indeg for r in top10)
