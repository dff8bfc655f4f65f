"""Round-4 session-12 operators: DUST parameter-rule mining, host-graph
weighted PageRank, and focused-crawl frontier prioritization.

Oracle parity (value hash vs DuckDB) runs in test_oracle_parity.py /
driver_sim; these pin the SEMANTICS the hash can't see — pure-python
reference equality plus the structural invariants each operator's
verdict rests on (rule-soundness of DUST, mass/weighting of host_rank,
parent-inheritance of focused crawl).
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

import pyarrow.parquet as pq

from seo_crawler_spark.operators.dust import (
    DUST_MIN_SUPPORT,
    DUST_VARIANTS,
    dust_param_rules,
)
from seo_crawler_spark.operators.graph import (
    BASE,
    DAMP_DEN,
    DAMP_NUM,
    HOST_ITERS,
    SCALE,
    host_rank,
)

SF0001 = "/root/testdata/sf0.001"


def _docs(sf_dir: str):
    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    return t.to_pylist()


def _edges_py(ids: list[int]) -> list[tuple[int, int]]:
    n = len(ids)
    out = []
    for d in ids:
        for dst in ((d * d + 1) % n, d % 37, (d * 13 + 3) % n):
            if dst != d:
                out.append((d, dst))
    return out


# ---------------------------------------------------------------------------
# dust_param_rules
# ---------------------------------------------------------------------------


def _dust_reference(docs):
    params = ("id", "page", "ref", "sess")
    rows = []  # (url, content, dict of param values, base)
    for d in docs:
        b = d["doc_id"] // 2
        content = hashlib.md5(d["text"].encode()).hexdigest()
        for v in range(DUST_VARIANTS):
            pv = {
                "id": str(d["doc_id"] % 2),
                "page": str(b % 7),
                "ref": str(1 if v == 2 else 0),
                "sess": str((b * 31 + (17 if v == 1 else 0)) % 101),
            }
            url = f"/p/{b}?" + "&".join(f"{p}={pv[p]}" for p in params)
            rows.append((url, content, pv, f"/p/{b}"))
    out = {}
    for p in params:
        groups = defaultdict(lambda: (set(), set()))
        for url, content, pv, base in rows:
            key = base + "?" + "&".join(pv[q] for q in params if q != p)
            g = groups[key]
            g[0].add(url)
            g[1].add(content)
        n_groups = len(groups)
        merged = sum(1 for u, _ in groups.values() if len(u) >= 2)
        support = sum(len(u) - 1 for u, _ in groups.values())
        violations = sum(len(c) - 1 for _, c in groups.values())
        out[p] = (
            n_groups,
            merged,
            support,
            violations,
            violations == 0 and support >= DUST_MIN_SUPPORT,
        )
    return out


def test_dust_matches_python_reference(spark):
    ref = _dust_reference(_docs(SF0001))
    rows = dust_param_rules(spark, SF0001).collect()
    got = {
        r.param: (r.n_groups, r.merged_groups, r.support, r.violations, r.safe)
        for r in rows
    }
    assert got == ref
    # the three outcomes the miner must discriminate are all present:
    # session-style params are learnable rewrites...
    assert got["sess"][4] and got["ref"][4]
    # ...the content-selecting param has counterexamples, never "safe"...
    assert got["id"][3] > 0 and not got["id"][4]
    # ...and a no-evidence param is not flagged safe on zero support
    assert got["page"][2] == 0 and not got["page"][4]


# ---------------------------------------------------------------------------
# host_rank
# ---------------------------------------------------------------------------


def _host_rank_reference(docs):
    ids = [d["doc_id"] for d in docs]
    host = {d["doc_id"]: d["source"] for d in docs}
    w = defaultdict(int)
    for s, t in _edges_py(ids):
        if host[s] != host[t]:
            w[(host[s], host[t])] += 1
    ow = defaultdict(int)
    for (hs, _), ww in w.items():
        ow[hs] += ww
    hosts = sorted(set(host.values()))
    score = {h: SCALE for h in hosts}
    for _ in range(HOST_ITERS):
        m = defaultdict(int)
        for (hs, hd), ww in w.items():
            m[hd] += (score[hs] * DAMP_NUM * ww) // (DAMP_DEN * ow[hs])
        score = {h: BASE + m.get(h, 0) for h in hosts}
    indeg = defaultdict(int)
    for (_, hd) in w:
        indeg[hd] += 1
    ranked = sorted(hosts, key=lambda h: (-score[h], h))
    return {
        h: (score[h], indeg.get(h, 0), i + 1) for i, h in enumerate(ranked)
    }


def test_host_rank_matches_python_reference(spark):
    docs = _docs(SF0001)
    ref = _host_rank_reference(docs)
    rows = host_rank(spark, SF0001).collect()
    got = {r.host: (r.score, r.in_hosts, r.rnk) for r in rows}
    assert got == ref
    # contraction sanity: one row per host, ranks are a permutation
    assert len(rows) == len({d["source"] for d in docs})
    assert sorted(r.rnk for r in rows) == list(range(1, len(rows) + 1))
    # non-degenerate: centrality differs across hosts
    assert len({r.score for r in rows}) > 1


# ---------------------------------------------------------------------------
# focused_crawl_priority
# ---------------------------------------------------------------------------


def test_focused_crawl_parent_inheritance(spark):
    from seo_crawler_spark.operators.textstats import quality_scores
    from seo_crawler_spark.plans.crawl_queries import focused_crawl_priority

    docs = _docs(SF0001)
    ids = [d["doc_id"] for d in docs]
    q = {
        r.doc_id: r.quality_score
        for r in quality_scores(spark, SF0001).collect()
    }
    par = defaultdict(list)
    for s, t in set(_edges_py(ids)):
        par[t].append(q[s])
    rows = focused_crawl_priority(spark, SF0001).collect()
    got = {r.doc_id: (r.n_parents, r.sum_parent_q, r.max_parent_q) for r in rows}
    ref = {
        d: (len(par[d]), sum(par[d]), max(par[d]) if par[d] else 0)
        for d in ids
    }
    assert got == ref
    # every frontier candidate is ranked (the dense edge generators
    # leave no orphans at this sf; the left-join zero path is still
    # pinned by the reference dict, which defaults missing parents to 0)
    assert len(rows) == len(ids)
    assert len({r.n_parents for r in rows}) > 1
    # rank follows priority: sum_parent_q non-increasing down the ranks
    by_rnk = sorted(rows, key=lambda r: r.rnk)
    assert all(
        a.sum_parent_q >= b.sum_parent_q for a, b in zip(by_rnk, by_rnk[1:])
    )
