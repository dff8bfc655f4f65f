"""Round-4 session-13 operators: positional phrase search, per-source
boilerplate line removal, and HyperBall harmonic centrality.

Oracle parity (value hash vs DuckDB) runs in test_oracle_parity.py /
driver_sim; these pin the SEMANTICS the hash can't see — pure-python
reference equality (naive string-scan phrase matching, naive per-source
line-frequency strip, exact-set HyperBall simulation) plus each
operator's structural invariants.
"""

from __future__ import annotations

import hashlib
import re
from collections import defaultdict

import pyarrow.parquet as pq

from seo_crawler_spark.operators.corpus_stats import (
    BP_MIN_DF,
    BP_TOKENS,
    boilerplate_strip,
)
from seo_crawler_spark.operators.graph import (
    HB_ITERS,
    HB_SCALE,
    hyperball_centrality,
)
from seo_crawler_spark.operators.retrieval import (
    PHRASE_QUERIES,
    phrase_search,
)

SF0001 = "/root/testdata/sf0.001"


def _docs(sf_dir: str):
    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    return t.to_pylist()


def _toks(text: str) -> list[str]:
    return re.findall(r"\w+", text.lower())


# ---------------------------------------------------------------------------
# phrase_search
# ---------------------------------------------------------------------------


def _phrase_reference(docs):
    """Naive scan: every token-aligned occurrence of each phrase."""
    out = {}
    for qid, phrase in PHRASE_QUERIES.items():
        terms = phrase.split()
        k = len(terms)
        for d in docs:
            tok = _toks(d["text"])
            starts = [
                i
                for i in range(len(tok) - k + 1)
                if tok[i : i + k] == terms
            ]
            if starts:
                out[(qid, d["doc_id"])] = (len(starts), min(starts))
    return out


def test_phrase_search_matches_naive_scan(spark):
    docs = _docs(SF0001)
    ref = _phrase_reference(docs)
    rows = phrase_search(spark, SF0001).collect()
    got = {
        (r["query_id"], r["doc_id"]): (r["n_matches"], r["first_pos"])
        for r in rows
    }
    assert got == ref
    # non-vacuous: every phrase matches at least one document
    assert {q for q, _ in got} == set(PHRASE_QUERIES)


def test_phrase_search_respects_order(spark):
    # "order fast" matches must NOT count "fast order" — cross-check by
    # asserting the reference scan found no reversed-only doc that the
    # operator also reports (the naive scan is order-aware; equality in
    # the previous test implies this, so here we just pin that at least
    # one doc contains the reversed bigram but not the phrase, i.e. the
    # test corpus actually exercises order sensitivity)
    docs = _docs(SF0001)
    ref = _phrase_reference(docs)
    reversed_only = [
        d["doc_id"]
        for d in docs
        if " fast order " in " " + " ".join(_toks(d["text"])) + " "
        and (0, d["doc_id"]) not in ref
    ]
    assert reversed_only, "corpus lost its order-sensitivity witness"


# ---------------------------------------------------------------------------
# boilerplate_strip
# ---------------------------------------------------------------------------


def _boilerplate_reference(docs):
    lines_by_doc = {}
    df = defaultdict(set)  # (source, line) -> set of doc_ids
    for d in docs:
        tok = _toks(d["text"])
        lines = [
            " ".join(tok[i : i + BP_TOKENS])
            for i in range(0, len(tok), BP_TOKENS)
        ]
        if lines:
            lines_by_doc[d["doc_id"]] = (d["source"], lines)
            for ln in lines:
                df[(d["source"], ln)].add(d["doc_id"])
    out = {}
    for doc_id, (source, lines) in lines_by_doc.items():
        kept = [ln for ln in lines if len(df[(source, ln)]) < BP_MIN_DF]
        out[doc_id] = (
            len(lines),
            len(kept),
            hashlib.md5(" ".join(kept).encode()).hexdigest(),
        )
    return out


def test_boilerplate_strip_matches_python_reference(spark):
    docs = _docs(SF0001)
    ref = _boilerplate_reference(docs)
    rows = boilerplate_strip(spark, SF0001).collect()
    got = {
        r["doc_id"]: (r["n_lines"], r["n_kept"], r["kept_md5"]) for r in rows
    }
    assert got == ref
    # non-vacuous both ways: some doc lost a line (the strip fires) and
    # most docs kept everything (it doesn't over-fire). Intra-source
    # exact-duplicate docs correctly lose ALL lines (every line has
    # df >= 2), so k == 0 rows are legitimate.
    assert any(k < n for n, k, _ in got.values())
    assert sum(1 for n, k, _ in got.values() if k == n) > len(got) * 0.9


def test_boilerplate_keeps_unique_lines_intact(spark):
    # a doc whose every line is unique within its source must be
    # untouched (kept_frac == 1 and kept_md5 == md5 of all lines)
    docs = _docs(SF0001)
    ref = _boilerplate_reference(docs)
    untouched = [d for d, (n, k, _) in ref.items() if n == k]
    assert untouched  # the corpus mostly consists of these
    rows = {
        r["doc_id"]: r
        for r in boilerplate_strip(spark, SF0001).collect()
    }
    for doc_id in untouched[:20]:
        assert rows[doc_id]["kept_frac"] == 1.0


# ---------------------------------------------------------------------------
# hyperball_centrality
# ---------------------------------------------------------------------------


def _hb_hash(doc_id: int) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)


def _rho(w: int) -> int:
    # leading zeros of the 54-bit remainder + 1, capped at 30
    for r in range(1, 30):
        if w >= 1 << (54 - r):
            return r
    return 30


def _hb_reference(docs):
    """Exact register simulation of HyperBall: same hash, same
    registers, same integer estimator path decisions are NOT re-derived
    here — instead we simulate the REGISTER state exactly and check the
    monotone structural facts; exact estimate parity is the DuckDB
    oracle's job."""
    ids = [d["doc_id"] for d in docs]
    n = len(ids)
    redges = defaultdict(set)  # v -> in-neighbors u (u -> v edge)
    for d in ids:
        for dst in ((d * d + 1) % n, d % 37, (d * 13 + 3) % n):
            if dst != d:
                redges[dst].add(d)
    regs = {}
    for v in ids:
        h = _hb_hash(v)
        regs[v] = {h % 64: _rho(h // 64)}
    states = [dict(regs)]
    for _ in range(HB_ITERS):
        nxt = {}
        for v in ids:
            merged = dict(states[-1][v])
            for u in redges[v]:
                for j, m in states[-1][u].items():
                    if merged.get(j, 0) < m:
                        merged[j] = m
            nxt[v] = merged
        states.append(nxt)
    return states


def test_hyperball_registers_match_exact_simulation(spark):
    docs = _docs(SF0001)
    states = _hb_reference(docs)
    # the register tables are internal; check the OBSERVABLE nf columns
    # are consistent with the exact simulation's ball structure:
    # register-count(present) grows monotonically, and a node whose
    # simulated final register set equals its initial one has nf4 == nf0
    rows = {
        r["doc_id"]: r
        for r in hyperball_centrality(spark, SF0001).collect()
    }
    for d in list(rows)[:100]:
        r = rows[d]
        nfs = [r[f"nf{t}"] for t in range(HB_ITERS + 1)]
        # ball estimates never shrink in the registered output
        # (registers only grow; LC estimator is monotone in present)
        assert all(b >= a for a, b in zip(nfs, nfs[1:])), (d, nfs)
        if states[-1][d] == states[0][d]:
            assert r["nf4"] == r["nf0"]
    # iharm consistency: recompute from the published nf columns
    for d, r in rows.items():
        harm = sum(
            max(r[f"nf{t}"] - r[f"nf{t-1}"], 0) * HB_SCALE // t
            for t in range(1, HB_ITERS + 1)
        )
        assert harm == r["iharm"]


def test_hyperball_hubs_rank_highest(spark):
    # the mod-37 generator makes doc_ids 0..36 in-degree hubs: their
    # mean harmonic centrality must dominate the non-hub mean by a wide
    # margin, and the single most-central node must be a hub
    rows = hyperball_centrality(spark, SF0001).collect()
    hub = [r["iharm"] for r in rows if r["doc_id"] < 37]
    rest = [r["iharm"] for r in rows if r["doc_id"] >= 37]
    assert sum(hub) / len(hub) > 3 * sum(rest) / len(rest)
    assert max(rows, key=lambda r: r["iharm"])["doc_id"] < 37


# ---------------------------------------------------------------------------
# triangle_count
# ---------------------------------------------------------------------------


def _triangle_reference(docs):
    ids = [d["doc_id"] for d in docs]
    n = len(ids)
    adj = defaultdict(set)
    for d in ids:
        for dst in ((d * d + 1) % n, d % 37, (d * 13 + 3) % n):
            if dst != d:
                adj[d].add(dst)
                adj[dst].add(d)
    tri = defaultdict(int)
    for v in ids:
        for a in adj[v]:
            if a <= v:
                continue
            for b in adj[v]:
                if b <= a:
                    continue
                if b in adj[a]:
                    tri[v] += 1
                    tri[a] += 1
                    tri[b] += 1
    return adj, tri


def test_triangle_count_matches_brute_force(spark):
    from seo_crawler_spark.operators.graph import TRI_SCALE, triangle_count

    docs = _docs(SF0001)
    adj, tri = _triangle_reference(docs)
    rows = {r["doc_id"]: r for r in triangle_count(spark, SF0001).collect()}
    assert set(rows) == {v for v in adj if adj[v]}
    for v, r in rows.items():
        assert r["degree"] == len(adj[v])
        assert r["n_tri"] == tri.get(v, 0)
        d = len(adj[v])
        want = (
            (2 * tri.get(v, 0) * TRI_SCALE) // (d * (d - 1)) if d >= 2 else 0
        )
        assert r["icc"] == want
    # non-vacuous: the generator graph actually closes triangles
    assert sum(tri.values()) > 0


# ---------------------------------------------------------------------------
# label_propagation
# ---------------------------------------------------------------------------


def _lpa_reference(docs, iters):
    ids = [d["doc_id"] for d in docs]
    n = len(ids)
    adj = defaultdict(set)
    for d in ids:
        for dst in ((d * d + 1) % n, d % 37, (d * 13 + 3) % n):
            if dst != d:
                adj[d].add(dst)
                adj[dst].add(d)
    lbl = {v: v for v in ids}
    for _ in range(iters):
        nxt = {}
        for v in ids:
            votes = defaultdict(int)
            for u in adj[v]:
                votes[lbl[u]] += 1
            if votes:
                best = max(votes.items(), key=lambda kv: (kv[1], -kv[0]))
                nxt[v] = best[0]
            else:
                nxt[v] = v
        lbl = nxt
    return lbl


def test_label_propagation_matches_python_reference(spark):
    from seo_crawler_spark.operators.graph import LPA_ITERS, label_propagation

    docs = _docs(SF0001)
    ref = _lpa_reference(docs, LPA_ITERS)
    sizes = defaultdict(int)
    for v in ref.values():
        sizes[v] += 1
    rows = label_propagation(spark, SF0001).collect()
    got = {r["doc_id"]: (r["label"], r["csize"]) for r in rows}
    assert got == {v: (l, sizes[l]) for v, l in ref.items()}
    # non-vacuous: real communities formed (more than 1, fewer than n)
    n_comm = len(set(ref.values()))
    assert 1 < n_comm < len(ref)


# ---------------------------------------------------------------------------
# kcore_decomposition
# ---------------------------------------------------------------------------


def _kcore_reference(docs, k, rounds):
    ids = [d["doc_id"] for d in docs]
    n = len(ids)
    adj = defaultdict(set)
    for d in ids:
        for dst in ((d * d + 1) % n, d % 37, (d * 13 + 3) % n):
            if dst != d:
                adj[d].add(dst)
                adj[dst].add(d)
    alive = set(ids)
    peel = {}
    for r in range(1, rounds + 1):
        deg = {v: sum(1 for u in adj[v] if u in alive) for v in alive}
        drop = {v for v in alive if deg.get(v, 0) < k}
        for v in drop:
            peel[v] = r
        alive -= drop
    fdeg = {v: sum(1 for u in adj[v] if u in alive) for v in alive}
    return peel, alive, fdeg


def test_kcore_matches_python_reference(spark):
    from seo_crawler_spark.operators.graph import (
        KCORE_K,
        KCORE_ROUNDS,
        kcore_decomposition,
    )

    docs = _docs(SF0001)
    peel, alive, fdeg = _kcore_reference(docs, KCORE_K, KCORE_ROUNDS)
    rows = kcore_decomposition(spark, SF0001).collect()
    for r in rows:
        d = r["doc_id"]
        assert r["in_core"] == (d in alive)
        assert r["peel_round"] == peel.get(d, -1)
        assert r["final_deg"] == fdeg.get(d, 0)
    # non-vacuous both ways + true fixed point within the bound at this
    # scale: peeling stopped before the final round
    assert alive and peel
    assert max(peel.values()) < KCORE_ROUNDS


# ---------------------------------------------------------------------------
# pca_power_projection / random_projection
# ---------------------------------------------------------------------------


def _emb(sf_dir: str):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    return t.to_pylist()


def _pca_reference(rows, iters):
    import math

    from seo_crawler_spark.operators.linalg import (
        DIM,
        PCA_Q,
        PCA_VSCALE,
        _power_iterate,
    )

    qs = {
        r["vec_id"]: [math.floor(float(x) * PCA_Q) for x in r["embedding"]]
        for r in rows
    }
    n = len(qs)
    a = [[0] * DIM for _ in range(DIM)]
    b = [0] * DIM
    for q in qs.values():
        for i in range(DIM):
            b[i] += q[i]
            for j in range(DIM):
                a[i][j] += q[i] * q[j]
    m = [[n * a[i][j] - b[i] * b[j] for j in range(DIM)] for i in range(DIM)]
    d = max(1, max(abs(x) for row in m for x in row) // PCA_VSCALE)
    ms = [
        [(1 if x >= 0 else -1) * (abs(x) // d) for x in row] for row in m
    ]
    v = _power_iterate(ms, iters)
    bv = sum(b[i] * v[i] for i in range(DIM))
    out = {}
    for vid, q in qs.items():
        ip = sum(q[i] * v[i] for i in range(DIM))
        out[vid] = (ip, n * ip - bv)
    return out, v, m


def test_pca_projection_matches_python_reference(spark):
    from seo_crawler_spark.operators.linalg import (
        PCA_ITERS,
        pca_power_projection,
    )

    rows = _emb(SF0001)
    ref, v, m = _pca_reference(rows, PCA_ITERS)
    got = {
        r["vec_id"]: (r["ip"], r["icp"])
        for r in pca_power_projection(spark, SF0001).collect()
    }
    assert got == ref
    # exact invariant: centered projections sum to zero
    assert sum(icp for _, icp in got.values()) == 0


def test_pca_vector_tracks_numpy_eigenvector():
    import numpy as np

    from seo_crawler_spark.operators.linalg import PCA_ITERS

    rows = _emb(SF0001)
    _, v, m = _pca_reference(rows, PCA_ITERS)
    vi = np.array(v, dtype=float)
    evals, evecs = np.linalg.eigh(np.array(m, dtype=float))
    cos = abs(vi @ evecs[:, -1]) / np.linalg.norm(vi)
    # the synthetic space is near-isotropic (gap ~1.07) so 50 integer
    # power rounds reach ~0.997 here; pin a margin below that
    assert cos > 0.98
    # and the eigenvalue bracket: Rayleigh quotient of v within 5% of
    # the top eigenvalue
    rq = (vi @ np.array(m, dtype=float) @ vi) / (vi @ vi)
    assert rq > 0.95 * evals[-1]


def test_random_projection_matches_python_reference(spark):
    import math

    from seo_crawler_spark.operators.linalg import (
        DIM,
        PCA_Q,
        RP_K,
        _jl_sign,
        random_projection,
    )

    rows = _emb(SF0001)
    signs = [[_jl_sign(k, d) for d in range(DIM)] for k in range(RP_K)]
    ref = {}
    for r in rows:
        q = [math.floor(float(x) * PCA_Q) for x in r["embedding"]]
        ref[r["vec_id"]] = tuple(
            sum(q[d] * signs[k][d] for d in range(DIM)) for k in range(RP_K)
        )
    got = {
        r["vec_id"]: tuple(r[f"y{k}"] for k in range(RP_K))
        for r in random_projection(spark, SF0001).collect()
    }
    assert got == ref


def test_random_projection_preserves_distances():
    # JL property on the shipped data: with a ±1 sign matrix,
    # E[||y||^2] = RP_K · ||q||^2 (cross terms vanish), so the
    # K-normalized reduced squared distance stays within a broad factor
    # of the original — the property the 16-dim LSH pre-pass relies on
    import math

    from seo_crawler_spark.operators.linalg import DIM, PCA_Q, RP_K, _jl_sign

    rows = _emb(SF0001)[:60]
    signs = [[_jl_sign(k, d) for d in range(DIM)] for k in range(RP_K)]
    qs = [
        [math.floor(float(x) * PCA_Q) for x in r["embedding"]] for r in rows
    ]
    ys = [
        [sum(q[d] * signs[k][d] for d in range(DIM)) for k in range(RP_K)]
        for q in qs
    ]
    ratios = []
    for i in range(0, 50, 5):
        for j in range(i + 1, 50, 7):
            d2 = sum((a - b) ** 2 for a, b in zip(qs[i], qs[j]))
            r2 = sum((a - b) ** 2 for a, b in zip(ys[i], ys[j]))
            ratios.append(r2 / (RP_K * d2))
    mean = sum(ratios) / len(ratios)
    assert 0.6 < mean < 1.6
    assert all(0.1 < r < 4.0 for r in ratios)


# ---------------------------------------------------------------------------
# scalar_quantization
# ---------------------------------------------------------------------------


def test_scalar_quantization_matches_python_reference(spark):
    import math

    from seo_crawler_spark.operators.linalg import (
        DIM,
        PCA_Q,
        SQ_LEVELS,
        scalar_quantization,
    )

    rows = _emb(SF0001)
    qs = {
        r["vec_id"]: [math.floor(float(x) * PCA_Q) for x in r["embedding"]]
        for r in rows
    }
    mn = [min(q[d] for q in qs.values()) for d in range(DIM)]
    mx = [max(q[d] for q in qs.values()) for d in range(DIM)]
    ref = {}
    for vid, q in qs.items():
        errs = []
        for d in range(DIM):
            w = max(1, mx[d] - mn[d])
            s = q[d] - mn[d]
            c = (s * SQ_LEVELS) // w
            r = (c * w) // SQ_LEVELS
            errs.append(abs(s - r))
        ref[vid] = (sum(errs), max(errs))
    got = {
        r["vec_id"]: (r["ierr_l1"], r["ierr_max"])
        for r in scalar_quantization(spark, SF0001).collect()
    }
    assert got == ref
    # the 8-bit grid must actually be coarse enough to produce error on
    # this data (non-vacuous), and per-dim error is bounded by the cell
    # width w/255
    assert any(l1 > 0 for l1, _ in got.values())
    max_cell = max(max(1, mx[d] - mn[d]) // SQ_LEVELS for d in range(DIM))
    assert all(m <= max_cell + 1 for _, m in got.values())


# ---------------------------------------------------------------------------
# heavy_hitters
# ---------------------------------------------------------------------------


def test_heavy_hitters_exact_vs_python_counts(spark):
    from collections import Counter

    from seo_crawler_spark.operators.sketches import HH_K, heavy_hitters

    docs = _docs(SF0001)
    counts = Counter()
    for d in docs:
        counts.update(_toks(d["text"]))
    n = sum(counts.values())
    ref = {
        t: (c, (c * 10000) // n)
        for t, c in counts.items()
        if c * (HH_K + 1) > n
    }
    got = {
        r["term"]: (r["freq"], r["share_bp"])
        for r in heavy_hitters(spark, SF0001).collect()
    }
    assert got == ref
    # discriminative: a strict, non-empty subset of the vocabulary
    assert 0 < len(got) < len(counts)


def test_mg_batch_shrink_keeps_local_heavies():
    # unit check of the pass-1 invariant on an adversarial stream:
    # after batched MG with k counters, every item with count >
    # n/(k+1) must survive — regardless of batch boundaries
    import pandas as pd

    k = 5
    stream = (
        ["heavy"] * 40 + ["semi"] * 12
        + [f"noise{i}" for i in range(40)]
        + ["heavy"] * 10
    )
    n = len(stream)

    counters = {}
    for lo in range(0, n, 7):  # awkward batch size on purpose
        batch = pd.Series(stream[lo : lo + 7])
        for t, c in batch.value_counts().items():
            counters[t] = counters.get(t, 0) + int(c)
        while len(counters) > k:
            m = min(counters.values())
            counters = {t: c - m for t, c in counters.items() if c > m}
    from collections import Counter

    true = Counter(stream)
    for t, c in true.items():
        if c * (k + 1) > n:
            assert t in counters, (t, c, n, counters)


# ---------------------------------------------------------------------------
# bm25f_topk
# ---------------------------------------------------------------------------


def _bm25f_reference(docs):
    import math
    from collections import Counter

    from seo_crawler_spark.operators.retrieval import (
        BM25_K1,
        BM25_SCALE,
        BM25F_BA,
        BM25F_BB,
        BM25F_QUERIES,
        BM25F_WA,
        BM25F_WB,
    )
    from seo_crawler_spark.operators.graph import _ANCHOR_VOCAB

    n = len(docs)
    tfb = {d["doc_id"]: Counter(_toks(d["text"])) for d in docs}
    tfa = defaultdict(Counter)
    v = len(_ANCHOR_VOCAB)
    for d in range(n):
        for dst in ((d * d + 1) % n, d % 37, (d * 13 + 3) % n):
            if dst != d:
                for t in _ANCHOR_VOCAB[(d + dst) % v].split(" "):
                    tfa[dst][t] += 1
    dlb = {i: sum(c.values()) for i, c in tfb.items()}
    dla = {i: sum(c.values()) for i, c in tfa.items()}
    avgb = sum(dlb.values()) / n
    avga = max(sum(dla.values()) / n, 1e-9)
    df = Counter()
    for i in range(n):
        for t in set(tfb.get(i, ())) | set(tfa.get(i, ())):
            df[t] += 1
    out = {}
    for qid, terms in BM25F_QUERIES.items():
        scores = {}
        for i in range(n):
            s = 0
            for t in terms:
                b = tfb.get(i, {}).get(t, 0)
                a = tfa.get(i, {}).get(t, 0)
                if not b and not a:
                    continue
                bb = (1 - BM25F_BB) + BM25F_BB * dlb.get(i, 0) / avgb
                ba = (1 - BM25F_BA) + BM25F_BA * dla.get(i, 0) / avga
                wtf = BM25F_WB * b / bb + BM25F_WA * a / ba
                idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
                s += math.floor(idf * wtf / (BM25_K1 + wtf) * BM25_SCALE)
            if s:
                scores[i] = s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        out[qid] = [(r + 1, d, s) for r, (d, s) in enumerate(ranked)]
    return out


def test_bm25f_matches_python_reference(spark):
    from seo_crawler_spark.operators.retrieval import bm25f_topk

    docs = _docs(SF0001)
    ref = _bm25f_reference(docs)
    rows = bm25f_topk(spark, SF0001).collect()
    got = defaultdict(list)
    for r in rows:
        got[r["query_id"]].append((r["rank"], r["doc_id"], r["iscore"]))
    assert dict(got) == ref


def test_bm25f_anchor_field_moves_rankings(spark):
    # query 1 ("next page") is pure anchor vocabulary — absent from
    # every body — so its result set exists ONLY because of the anchor
    # field; a body-only BM25 would return nothing for it
    from seo_crawler_spark.operators.retrieval import bm25f_topk

    rows = [r for r in bm25f_topk(spark, SF0001).collect() if r["query_id"] == 1]
    assert len(rows) == 10
    assert all(r["iscore"] > 0 for r in rows)


# ---------------------------------------------------------------------------
# snippet_extraction / rank_correlation
# ---------------------------------------------------------------------------


def test_snippet_extraction_windows(spark):
    from seo_crawler_spark.operators.retrieval import (
        SNIP_CTX,
        snippet_extraction,
    )

    docs = {d["doc_id"]: _toks(d["text"]) for d in _docs(SF0001)}
    ref_matches = _phrase_reference(_docs(SF0001))
    rows = snippet_extraction(spark, SF0001).collect()
    assert {(r["query_id"], r["doc_id"]) for r in rows} == set(ref_matches)
    for r in rows:
        tok = docs[r["doc_id"]]
        plen = len(PHRASE_QUERIES[r["query_id"]].split())
        fp = r["first_pos"]
        lo = max(0, fp - SNIP_CTX)
        hi = min(len(tok), fp + plen + SNIP_CTX)
        assert r["snippet"] == " ".join(tok[lo:hi])
        # the snippet embeds the matched phrase itself
        assert PHRASE_QUERIES[r["query_id"]] in r["snippet"]


def test_rank_correlation_matches_python_reference(spark):
    from seo_crawler_spark.operators.graph import rank_correlation

    rows = rank_correlation(spark, SF0001).collect()
    # python reference: recompute Spearman from the two registered
    # rankers' own outputs (their correctness is pinned elsewhere)
    from seo_crawler_spark.operators.graph import opic_priority, pagerank

    pr = {r["doc_id"]: r["score"] for r in pagerank(spark, SF0001).collect()}
    op = {
        r["doc_id"]: r["priority"]
        for r in opic_priority(spark, SF0001).collect()
    }
    src = {d["doc_id"]: d["source"] for d in _docs(SF0001)}
    by_src = defaultdict(list)
    for d in pr:
        by_src[src[d]].append(d)
    ref = {}
    for s, ids in by_src.items():
        rp = {
            d: i + 1
            for i, d in enumerate(sorted(ids, key=lambda d: (-pr[d], d)))
        }
        ro = {
            d: i + 1
            for i, d in enumerate(sorted(ids, key=lambda d: (-op[d], d)))
        }
        n = len(ids)
        sd2 = sum((rp[d] - ro[d]) ** 2 for d in ids)
        den = n * (n * n - 1)
        num = den - 6 * sd2
        ppm = None if den == 0 else (
            (1 if num >= 0 else -1) * (abs(num * 1_000_000) // den)
        )
        ref[s] = (n, sd2, ppm)
    got = {r["source"]: (r["n"], r["isum_d2"], r["rho_ppm"]) for r in rows}
    assert got == ref
    # non-vacuous: the two rankers agree strongly but not perfectly
    assert any(sd2 > 0 for _, sd2, _ in got.values())
    assert all(ppm > 500_000 for _, _, ppm in got.values())


def test_effective_diameter_curve(spark):
    from seo_crawler_spark.operators.graph import (
        HB_ITERS,
        effective_diameter,
        hyperball_centrality,
    )

    rows = effective_diameter(spark, SF0001).collect()
    assert [r["t"] for r in rows] == list(range(HB_ITERS + 1))
    totals = [r["inf_total"] for r in rows]
    # N(t) is monotone non-decreasing and equals the per-node sums of
    # the registered hyperball operator
    assert all(b >= a for a, b in zip(totals, totals[1:]))
    hb = hyperball_centrality(spark, SF0001).collect()
    for t in range(HB_ITERS + 1):
        assert totals[t] == sum(r[f"nf{t}"] for r in hb)
    # coverage hits 100% at the horizon by construction, and the curve
    # is non-trivial (not already covered at t=0)
    assert rows[-1]["covers"] and rows[-1]["coverage_bp"] == 10000
    assert not rows[0]["covers"]


def test_pagerank_warm_start_converges_faster(spark):
    from seo_crawler_spark.operators.graph import (
        BASE,
        DAMP_DEN,
        DAMP_NUM,
        ITERS,
        SCALE,
        WARM_ITERS,
        pagerank_warm_start,
    )

    n = len(_docs(SF0001))

    def pr(e, iters, seed=None):
        out = defaultdict(int)
        for s, _ in e:
            out[s] += 1
        score = list(seed) if seed else [SCALE] * n
        for _ in range(iters):
            contrib = [0] * n
            for s, d in e:
                contrib[d] += (score[s] * DAMP_NUM) // (DAMP_DEN * out[s])
            score = [BASE + c for c in contrib]
        return score

    base = [
        (d, g)
        for d in range(n)
        for g in ((d * d + 1) % n, d % 37, (d * 13 + 3) % n)
        if g != d
    ]
    delta = [
        (d, (d * 7 + 11) % n)
        for d in range(n)
        if d % 10 == 0 and (d * 7 + 11) % n != d
    ]
    full = pr(base + delta, ITERS)
    old = pr(base, ITERS)
    warm = pr(base + delta, WARM_ITERS, seed=old)
    cold = pr(base + delta, WARM_ITERS)

    rows = {r["doc_id"]: r for r in pagerank_warm_start(spark, SF0001).collect()}
    for d in range(n):
        r = rows[d]
        assert (r["full"], r["warm"], r["cold"]) == (full[d], warm[d], cold[d])
    # the operator's claim, measured: total warm gap well under half
    # the cold gap, and warm closer on a large majority of pages
    gw = sum(r["warm_gap"] for r in rows.values())
    gc = sum(r["cold_gap"] for r in rows.values())
    assert gw * 2 < gc
    assert sum(r["warm_closer"] for r in rows.values()) > 0.8 * n


def test_search_serve_end_to_end(spark):
    from seo_crawler_spark.operators.retrieval import (
        BM25F_QUERIES,
        SERVE_K,
        SNIP_CTX,
        bm25f_topk,
        search_serve,
    )

    rows = search_serve(spark, SF0001).collect()
    top = {
        (r["query_id"], r["doc_id"]): r["rank"]
        for r in bm25f_topk(spark, SF0001).collect()
        if r["rank"] <= SERVE_K
    }
    assert {(r["query_id"], r["doc_id"]) for r in rows} == set(top)
    docs = {d["doc_id"]: _toks(d["text"]) for d in _docs(SF0001)}
    hit = 0
    for r in rows:
        tok = docs[r["doc_id"]]
        terms = set(BM25F_QUERIES[r["query_id"]])
        if r["anchor_only"]:
            # anchor-only result: no body term anywhere, lead shown
            assert not terms & set(tok)
            assert r["snippet"] == " ".join(tok[: 2 * SNIP_CTX + 1])
        else:
            hit += 1
            fp = next(i for i, t in enumerate(tok) if t in terms)
            lo = max(0, fp - SNIP_CTX)
            assert r["snippet"] == " ".join(tok[lo : fp + 1 + SNIP_CTX])
            assert terms & set(r["snippet"].split())
    # both serving paths exercised on shipped data
    assert hit and hit < len(rows)


def test_ndcg_eval_matches_python_reference(spark):
    from seo_crawler_spark.operators.retrieval import (
        BM25F_QUERIES,
        NDCG_K,
        NDCG_W,
        ndcg_eval,
    )
    from seo_crawler_spark.operators.graph import _ANCHOR_VOCAB

    docs = _docs(SF0001)
    n = len(docs)
    pres = defaultdict(set)  # doc -> terms (body ∪ inbound anchors)
    for d in docs:
        pres[d["doc_id"]].update(_toks(d["text"]))
    v = len(_ANCHOR_VOCAB)
    for d in range(n):
        for dst in ((d * d + 1) % n, d % 37, (d * 13 + 3) % n):
            if dst != d:
                pres[dst].update(_ANCHOR_VOCAB[(d + dst) % v].split(" "))
    ref_rel = {}
    for qid, terms in BM25F_QUERIES.items():
        for doc, ts in pres.items():
            m = len(set(terms) & ts)
            if m:
                ref_rel[(qid, doc)] = 2 if m == len(terms) else 1
    # dcg from the (independently python-verified) bm25f reference
    ranked = _bm25f_reference(docs)
    rows = {r["query_id"]: r for r in ndcg_eval(spark, SF0001).collect()}
    pref = [0]
    for w in NDCG_W:
        pref.append(pref[-1] + w)
    for qid in BM25F_QUERIES:
        n2 = sum(
            1 for (q, _), r in ref_rel.items() if q == qid and r == 2
        )
        n1 = sum(
            1 for (q, _), r in ref_rel.items() if q == qid and r == 1
        )
        dcg = sum(
            ref_rel.get((qid, d), 0) * NDCG_W[rank - 1]
            for rank, d, _ in ranked[qid]
        )
        tf = min(n2, NDCG_K)
        of = min(n1, NDCG_K - tf)
        idcg = 2 * pref[tf] + (pref[tf + of] - pref[tf])
        r = rows[qid]
        assert (r["n2"], r["n1"], r["dcg_x"], r["idcg_x"]) == (
            n2,
            n1,
            dcg,
            idcg,
        )
        assert r["ndcg_ppm"] == (
            None if idcg == 0 else (dcg * 1_000_000) // idcg
        )
    # discriminative on shipped data: not every query is perfect, and
    # nothing collapses
    vals = [r["ndcg_ppm"] for r in rows.values()]
    assert any(x < 1_000_000 for x in vals) and all(x > 900_000 for x in vals)


def test_dust_apply_collapses_safe_aliases_cleanly(spark):
    from seo_crawler_spark.operators.dust import (
        DUST_VARIANTS,
        dust_apply,
        dust_param_rules,
    )

    rules = {r["param"]: r for r in dust_param_rules(spark, SF0001).collect()}
    safe = {p for p, r in rules.items() if r["safe"]}
    assert safe == {"ref", "sess"}  # the synthesized alias scheme
    rows = dust_apply(spark, SF0001).collect()
    n_docs = len(_docs(SF0001))
    # every canonical group is content-clean (the safety re-check), the
    # variants collapse fully (3 aliases -> 1 canonical per doc), and
    # the unsafe id param kept docs separate
    assert all(r["clean"] for r in rows)
    assert len(rows) == n_docs
    assert all(r["n_aliases"] == DUST_VARIANTS for r in rows)
    assert sum(r["saved_fetches"] for r in rows) == n_docs * (
        DUST_VARIANTS - 1
    )
