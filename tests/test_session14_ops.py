"""Round-4 session-14 operators: SALSA hub/authority scoring (and the
rest of the session as it lands).

Oracle parity (value hash vs DuckDB) runs in driver_sim; these pin the
semantics the hash can't see — pure-python reference equality over the
same generator graph plus each operator's structural invariants.
"""

from __future__ import annotations

import re
from collections import defaultdict

import pyarrow.parquet as pq

from seo_crawler_spark.operators.graph import (
    SALSA_ITERS,
    SCALE,
    salsa_scores,
)

SF0001 = "/root/testdata/sf0.001"


def _toks(text):
    return re.findall(r"\w+", text.lower())


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


# ---------------------------------------------------------------------------
# shard_balance_audit
# ---------------------------------------------------------------------------


def _md5int(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_shard_balance_matches_python_reference(spark):
    from seo_crawler_spark.operators.sharding import (
        N_SHARDS,
        SHARD_SALT,
        shard_balance_audit,
    )

    t = pq.read_table(
        f"{SF0001}/documents.parquet",
        columns=["doc_id", "source", "n_chars"],
    ).to_pylist()
    agg = defaultdict(lambda: [0, 0, set()])
    for d in t:
        hd = _md5int(f"shard:{d['doc_id']}")
        keys = {
            "doc_hash": hd % N_SHARDS,
            "host": _md5int(f"shard:{d['source']}") % N_SHARDS,
            "host_salted": _md5int(
                f"shard:{d['source']}:{hd % SHARD_SALT}"
            )
            % N_SHARDS,
        }
        for strat, sh in keys.items():
            a = agg[(strat, sh)]
            a[0] += 1
            a[1] += d["n_chars"]
            a[2].add(d["source"])
    rows = shard_balance_audit(spark, SF0001).collect()
    assert len(rows) == len(agg)
    tot_docs = len(t)
    for r in rows:
        nd, nb, hosts = agg[(r["strategy"], r["shard"])]
        assert (r["n_docs"], r["n_bytes"], r["n_hosts"]) == (
            nd,
            nb,
            len(hosts),
        )
        assert r["load_pm"] == nd * N_SHARDS * 1000 // tot_docs


def test_shard_balance_tradeoff_is_visible(spark):
    from seo_crawler_spark.operators.sharding import (
        SHARD_SALT,
        shard_balance_audit,
    )

    rows = shard_balance_audit(spark, SF0001).collect()
    by = defaultdict(list)
    for r in rows:
        by[r["strategy"]].append(r)
    max_load = {s: max(r["load_pm"] for r in v) for s, v in by.items()}
    # host placement runs hot; salting recovers most of the gap
    assert max_load["host"] >= 1500
    assert max_load["doc_hash"] <= 1300
    assert max_load["host_salted"] < max_load["host"]
    # locality: host keeps each shard to a few hosts, doc_hash scatters
    # all 20 hosts to every shard, salted sits between
    max_hosts = {s: max(r["n_hosts"] for r in v) for s, v in by.items()}
    assert max_hosts["doc_hash"] == 20
    assert max_hosts["host"] <= 6
    # each host touches at most SHARD_SALT shards under salting: total
    # (shard, host) incidences across salted rows is bounded
    salted_incidence = sum(r["n_hosts"] for r in by["host_salted"])
    assert salted_incidence <= 20 * SHARD_SALT


# ---------------------------------------------------------------------------
# linkpred_resource_alloc
# ---------------------------------------------------------------------------


def _und_graph(ids):
    und = defaultdict(set)
    for s, d in _gen_edges(ids):
        und[s].add(d)
        und[d].add(s)
    return und


def _ra_reference(ids, cap, k):
    und = _und_graph(ids)
    deg = {z: len(nb) for z, nb in und.items()}
    score = defaultdict(int)
    common = defaultdict(int)
    for z, nb in und.items():
        if deg[z] > cap:
            continue
        nb = sorted(nb)
        for i, u in enumerate(nb):
            for v in nb[i + 1 :]:
                score[(u, v)] += SCALE // deg[z]
                common[(u, v)] += 1
    rows = [
        (u, v, s, common[(u, v)])
        for (u, v), s in score.items()
        if v not in und[u]
    ]
    rows.sort(key=lambda r: (-r[2], r[0], r[1]))
    return rows[:k]


def test_linkpred_matches_python_reference(spark):
    from seo_crawler_spark.operators.graph import (
        RA_MAX_DEG,
        RA_TOPK,
        linkpred_resource_alloc,
    )

    ids = _doc_ids(SF0001)
    # the cap is INACTIVE at this scale — tests pin exact RA
    und = _und_graph(ids)
    assert max(len(nb) for nb in und.values()) <= RA_MAX_DEG
    ref = _ra_reference(ids, RA_MAX_DEG, RA_TOPK)
    rows = linkpred_resource_alloc(spark, SF0001).collect()
    got = [(r["u"], r["v"], r["ra_score"], r["n_common"]) for r in rows]
    assert got == ref
    # every prediction is a genuine non-edge with ≥1 common neighbor
    for u, v, s, c in got:
        assert v not in und[u] and c >= 1 and s > 0
    assert [r["rnk"] for r in rows] == list(range(1, len(rows) + 1))


# ---------------------------------------------------------------------------
# bowtie_structure
# ---------------------------------------------------------------------------


def _bowtie_reference(ids, max_hops):
    from collections import deque

    n = len(ids)
    dead = {
        i for i in ids if _md5int(f"dead:{i}") % 10 == 7
    }
    fwd, bwd, indeg = defaultdict(list), defaultdict(list), defaultdict(int)
    for s in ids:
        if s in dead:
            continue
        for d in ((s * s + 1) % n, s % 37, (s * 13 + 3) % n):
            if d != s:
                fwd[s].append(d)
                bwd[d].append(s)
                indeg[d] += 1
    pivot = min(ids, key=lambda i: (-indeg.get(i, 0), i))

    def bfs(adj):
        dist = {pivot: 0}
        q = deque([pivot])
        while q:
            u = q.popleft()
            if dist[u] >= max_hops:
                continue
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        return dist

    fd, bd = bfs(fwd), bfs(bwd)
    out = {}
    for i in ids:
        f, b = fd.get(i, -1), bd.get(i, -1)
        cls = (
            "CORE"
            if f >= 0 and b >= 0
            else "OUT"
            if f >= 0
            else "IN"
            if b >= 0
            else "TENDRIL"
        )
        out[i] = (f, b, cls)
    return out


def test_bowtie_matches_python_reference(spark):
    from seo_crawler_spark.operators.graph import BT_HOPS, bowtie_structure

    ids = _doc_ids(SF0001)
    ref = _bowtie_reference(ids, BT_HOPS)
    rows = bowtie_structure(spark, SF0001).collect()
    assert len(rows) == len(ids)
    for r in rows:
        assert (r["fwd_dist"], r["bwd_dist"], r["cls"]) == ref[r["doc_id"]]
    # all four macro-components are populated — the discriminative
    # property the dead-end edge model exists to produce
    classes = {r["cls"] for r in rows}
    assert classes == {"CORE", "IN", "OUT", "TENDRIL"}
    # dead-end pages can never sit in CORE or IN-only-via-out-links:
    # a page with no out-links cannot reach the pivot
    for r in rows:
        if _md5int(f"dead:{r['doc_id']}") % 10 == 7:
            assert r["cls"] in ("OUT", "TENDRIL")


# ---------------------------------------------------------------------------
# filter_agreement
# ---------------------------------------------------------------------------


def test_filter_agreement_kappa_arithmetic_and_composition(spark):
    from seo_crawler_spark.operators.curation import (
        KAPPA_SCALE,
        filter_agreement,
        quality_filter_verdicts,
    )
    from seo_crawler_spark.operators.textstats import lm_perplexity_buckets

    rows = filter_agreement(spark, SF0001).collect()
    assert len(rows) == 20
    # kappa is exactly the closed form of the confusion counts
    for r in rows:
        n, n11, n10, n01, n00 = (
            r["n"], r["n11"], r["n10"], r["n01"], r["n00"],
        )
        assert n == n11 + n10 + n01 + n00
        num = (n11 + n00) * n - (n11 + n10) * (n11 + n01) - (
            n00 + n01
        ) * (n00 + n10)
        den = n * n - (n11 + n10) * (n11 + n01) - (n00 + n01) * (
            n00 + n10
        )
        if den == 0:
            assert r["kappa_ppm"] is None
        else:
            sign = -1 if num < 0 else 1
            assert r["kappa_ppm"] == sign * (
                abs(num * KAPPA_SCALE) // den
            )
    # the confusion marginals recompose the member filters exactly
    keep_a = defaultdict(int)
    va = {
        r["doc_id"]: r["keep"]
        for r in quality_filter_verdicts(spark, SF0001).collect()
    }
    vb = {
        r["doc_id"]: r["bucket"]
        for r in lm_perplexity_buckets(spark, SF0001).collect()
        if r["bucket"] is not None
    }
    src = {
        d["doc_id"]: d["source"] for d in pq.read_table(
            f"{SF0001}/documents.parquet", columns=["doc_id", "source"]
        ).to_pylist()
    }
    for i, s in src.items():
        if i in vb and va[i]:
            keep_a[s] += 1
    for r in rows:
        assert r["n11"] + r["n10"] == keep_a[r["source"]]
    # discriminative on shipped data: strong-agreement sources AND a
    # worse-than-chance source both exist (the negative branch of the
    # sign idiom is exercised, not just compiled)
    kappas = [r["kappa_ppm"] for r in rows if r["kappa_ppm"] is not None]
    assert any(k > 300_000 for k in kappas)
    assert any(k < 0 for k in kappas)


# ---------------------------------------------------------------------------
# storage_layout_audit
# ---------------------------------------------------------------------------


def _runs(vals):
    r = 0
    prev = object()
    for v in vals:
        if v != prev:
            r += 1
        prev = v
    return r



def _zcode(lang, source):
    lc = {"de": 0, "en": 1, "es": 2, "fr": 3, "zh": 4}[lang]
    sc = int(source[3:])
    return (
        (lc % 2) * 2 + (sc % 2)
        + ((lc // 2) % 2) * 8 + ((sc // 2) % 2) * 4
        + ((lc // 4) % 2) * 32 + ((sc // 4) % 2) * 16
        + ((sc // 8) % 2) * 64 + ((sc // 16) % 2) * 256
    )

def test_storage_layout_matches_python_reference(spark):
    from seo_crawler_spark.operators.storage import (
        ARRIVAL_BLOCK,
        storage_layout_audit,
    )

    docs = pq.read_table(
        f"{SF0001}/documents.parquet",
        columns=["doc_id", "lang", "source", "n_chars"],
    ).to_pylist()
    keyfns = {
        "arrival": lambda d: (
            f"{d['doc_id'] // ARRIVAL_BLOCK:012d}",
            d["doc_id"],
        ),
        "by_lang": lambda d: (d["lang"], d["doc_id"]),
        "by_source": lambda d: (d["source"], d["doc_id"]),
        "by_lang_source": lambda d: (
            f"{d['lang']}|{d['source']}",
            d["doc_id"],
        ),
        "zorder_ls": lambda d: (
            f"{_zcode(d['lang'], d['source']):04d}",
            d["doc_id"],
        ),
    }
    n = len(docs)
    ref = {}
    for layout, kf in keyfns.items():
        ordered = sorted(docs, key=kf)
        for col in ("lang", "source", "n_chars"):
            r = _runs([str(d[col]) for d in ordered])
            ref[(layout, col)] = (r, r * 1000 // n)
    rows = storage_layout_audit(spark, SF0001).collect()
    assert len(rows) == len(ref)
    for r in rows:
        assert (r["n_runs"], r["runs_pm"]) == ref[
            (r["layout"], r["column_name"])
        ]
    # the audit is decision-grade on shipped data: sorting by a column
    # collapses it to its cardinality, correlated prefixes help, and
    # the high-cardinality control never compresses under any layout
    m = {(r["layout"], r["column_name"]): r["n_runs"] for r in rows}
    assert m[("by_lang", "lang")] == 5
    assert m[("by_source", "source")] == 20
    assert m[("by_lang_source", "lang")] == 5
    assert m[("arrival", "lang")] > 50 * m[("by_lang", "lang")]
    for layout in ("arrival", "by_lang", "by_source", "by_lang_source"):
        assert m[(layout, "n_chars")] > n * 9 // 10


# ---------------------------------------------------------------------------
# hll_source_overlap
# ---------------------------------------------------------------------------


def test_hll_overlap_matches_python_reference(spark):
    from seo_crawler_spark.operators.sketches import (
        HLL_ALPHA,
        HLL_CAP,
        HLL_LC_LIMIT,
        HLL_M,
        _hll_lc_table,
        hll_source_overlap,
    )

    docs = pq.read_table(
        f"{SF0001}/documents.parquet", columns=["source", "text"]
    ).to_pylist()
    grams = defaultdict(set)
    for d in docs:
        tok = _toks(d["text"])
        for i in range(len(tok) - 2):
            grams[d["source"]].add(" ".join(tok[i : i + 3]))

    def regs_of(shingle_set):
        regs = [0] * HLL_M
        for t in shingle_set:
            h = _md5int(t)
            j = h % HLL_M
            w = h // HLL_M
            # leading-zero rank over the 54-bit remainder (_rho_sql):
            # smallest r with w >= 2^(54-r), else the CAP
            rho = HLL_CAP
            for r in range(1, HLL_CAP):
                if w >= 1 << (54 - r):
                    rho = r
                    break
            regs[j] = max(regs[j], rho)
        return regs

    lc = _hll_lc_table()
    an, ad = HLL_ALPHA

    def estimate(regs):
        zeros = sum(1 for m in regs if m == 0)
        isum = sum(1 << (HLL_CAP - m) for m in regs)
        raw = (an * HLL_M * HLL_M * (1 << HLL_CAP)) // (ad * isum)
        if raw <= HLL_LC_LIMIT and zeros > 0:
            return lc[zeros]
        return raw

    regs = {s: regs_of(g) for s, g in grams.items()}
    rows = hll_source_overlap(spark, SF0001).collect()
    assert len(rows) == 190
    for r in rows:
        sa, sb = r["src_a"], r["src_b"]
        ra, rb = regs[sa], regs[sb]
        ru = [max(x, y) for x, y in zip(ra, rb)]
        ea, eb, eu = estimate(ra), estimate(rb), estimate(ru)
        assert (r["est_a"], r["est_b"], r["est_union"]) == (ea, eb, eu)
        assert r["est_intersect"] == ea + eb - eu
        assert r["exact_intersect"] == len(grams[sa] & grams[sb])
    # sketch accuracy is STATISTICAL (~13% σ at 64 registers; single
    # pairs land 3σ+ out): median relative union error stays inside
    # two sigma across the 190 pairs
    errs = []
    for r in rows:
        ru = [max(x, y) for x, y in zip(regs[r["src_a"]], regs[r["src_b"]])]
        exact_u = len(grams[r["src_a"]] | grams[r["src_b"]])
        errs.append(abs(estimate(ru) - exact_u) / exact_u)
    errs.sort()
    assert errs[len(errs) // 2] <= 0.26


# ---------------------------------------------------------------------------
# random_walks
# ---------------------------------------------------------------------------


def test_random_walks_match_python_reference(spark):
    from seo_crawler_spark.operators.graph import WALK_LEN, random_walks

    ids = _doc_ids(SF0001)
    nbrs = defaultdict(set)
    for s, d in _gen_edges(ids):
        nbrs[s].add(d)
    adj = {s: sorted(v) for s, v in nbrs.items()}

    def walk(start):
        cur = start
        path = [start]
        for t in range(1, WALK_LEN + 1):
            out = adj.get(cur, [])
            if out:
                cur = out[_md5int(f"walk:{start}:{t}:{cur}") % len(out)]
            path.append(cur)
        return path

    rows = random_walks(spark, SF0001).collect()
    assert len(rows) == len(ids)
    n_moved = 0
    for r in rows:
        ref = walk(r["start"])
        assert r["path"] == "->".join(str(x) for x in ref)
        assert r["end_node"] == ref[-1]
        if len(set(ref)) > 1:
            n_moved += 1
    # the walk corpus is non-degenerate: virtually every walk moves,
    # and different starts produce different trajectories
    assert n_moved >= len(ids) - 5
    assert len({r["path"] for r in rows}) == len(ids)


# ---------------------------------------------------------------------------
# walk_skipgram_pairs
# ---------------------------------------------------------------------------


def test_skipgram_pairs_match_python_reference(spark):
    from seo_crawler_spark.operators.graph import (
        SKIPGRAM_WINDOW,
        WALK_LEN,
        walk_skipgram_pairs,
    )

    ids = _doc_ids(SF0001)
    nbrs = defaultdict(set)
    for s, d in _gen_edges(ids):
        nbrs[s].add(d)
    adj = {s: sorted(v) for s, v in nbrs.items()}
    ref = defaultdict(int)
    for start in ids:
        cur = start
        path = [start]
        for t in range(1, WALK_LEN + 1):
            out = adj.get(cur, [])
            if out:
                cur = out[_md5int(f"walk:{start}:{t}:{cur}") % len(out)]
            path.append(cur)
        for i, c in enumerate(path):
            for j in range(
                max(0, i - SKIPGRAM_WINDOW),
                min(len(path), i + SKIPGRAM_WINDOW + 1),
            ):
                if j != i:
                    ref[(c, path[j])] += 1
    rows = walk_skipgram_pairs(spark, SF0001).collect()
    got = {(r["center"], r["context"]): r["n_pairs"] for r in rows}
    assert got == dict(ref)
    # pair table is symmetric (both directions counted) and total mass
    # equals walks · Σ window sizes
    assert all(got.get((b, a)) == n for (a, b), n in got.items())
    per_walk = sum(
        min(len(range(WALK_LEN + 1)) - 1, i + SKIPGRAM_WINDOW)
        - max(0, i - SKIPGRAM_WINDOW)
        for i in range(WALK_LEN + 1)
    )
    assert sum(got.values()) == len(ids) * per_walk


# ---------------------------------------------------------------------------
# pruning_audit
# ---------------------------------------------------------------------------


def test_pruning_audit_matches_python_reference(spark):
    from seo_crawler_spark.operators.storage import (
        PRUNE_BLOCK,
        pruning_audit,
    )

    docs = pq.read_table(
        f"{SF0001}/documents.parquet",
        columns=["doc_id", "lang", "source", "n_chars"],
    ).to_pylist()
    keyfns = {
        "arrival": lambda d: (f"{d['doc_id'] // 64:012d}", d["doc_id"]),
        "by_lang": lambda d: (d["lang"], d["doc_id"]),
        "by_source": lambda d: (d["source"], d["doc_id"]),
        "by_lang_source": lambda d: (
            f"{d['lang']}|{d['source']}",
            d["doc_id"],
        ),
        "zorder_ls": lambda d: (
            f"{_zcode(d['lang'], d['source']):04d}",
            d["doc_id"],
        ),
    }
    preds = {
        "lang_eq_zh": ("lang", lambda lo, hi: lo <= "zh" <= hi),
        "source_eq_src7": ("source", lambda lo, hi: lo <= "src7" <= hi),
        "nchars_gt_490": ("n_chars", lambda lo, hi: int(hi) > 490),
    }
    ref = {}
    for layout, kf in keyfns.items():
        ordered = sorted(docs, key=kf)
        for label, (col, fn) in preds.items():
            vals = [
                f"{d[col]:06d}" if col == "n_chars" else d[col]
                for d in ordered
            ]
            blocks = [
                vals[i : i + PRUNE_BLOCK]
                for i in range(0, len(vals), PRUNE_BLOCK)
            ]
            scanned = sum(1 for b in blocks if fn(min(b), max(b)))
            ref[(layout, label)] = (len(blocks), scanned)
    rows = pruning_audit(spark, SF0001).collect()
    assert len(rows) == len(ref)
    for r in rows:
        nb, sc = ref[(r["layout"], r["predicate"])]
        assert (r["n_blocks"], r["scanned"], r["skipped"]) == (
            nb, sc, nb - sc,
        )
        assert r["skip_pm"] == (nb - sc) * 1000 // nb
    m = {(r["layout"], r["predicate"]): r for r in rows}
    # decision-grade: sort key prunes its own column, arrival prunes
    # nothing, the scattered range predicate prunes nowhere
    assert m[("by_lang", "lang_eq_zh")]["skip_pm"] >= 500
    assert m[("arrival", "lang_eq_zh")]["skip_pm"] == 0
    assert m[("by_source", "source_eq_src7")]["skip_pm"] >= 500
    for lay in keyfns:
        assert m[(lay, "nchars_gt_490")]["skip_pm"] == 0
    # z-order's whole point: BOTH predicates prune (each 1-D sort
    # prunes only its own column)
    assert m[("zorder_ls", "lang_eq_zh")]["skipped"] > 0
    assert m[("zorder_ls", "source_eq_src7")]["skipped"] > 0
    assert m[("by_lang", "source_eq_src7")]["skipped"] == 0
    assert m[("by_source", "lang_eq_zh")]["skipped"] == 0
