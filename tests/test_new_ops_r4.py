"""Round-4 session-4 operators: IVF-PQ ANN, CCNet-style LM quality
buckets, media→caption alignment, BPE tokenizer train/encode,
training-order shuffle.

The DuckDB oracle gate (scripts/driver_sim.py) pins cross-engine
equality; these tests pin the SEMANTICS the oracle can't see —
PQ recall vs the exact baseline, encoder determinism under
repartitioning, LM bucket proportions and empty-doc handling, and the
nearest-text alignment rule against a hand model.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from seo_crawler_spark.operators.simsearch import (
    DOT_SCALE,
    PQ_KS,
    PQ_M,
    TOP_K,
    ann_brute_topk,
    ann_ivfpq_topk,
    pq_codebooks,
    pq_encode_udf,
)
from seo_crawler_spark.operators.textstats import (
    SPAN_CHUNK,
    SPAN_MEDIA_EVERY,
    caption_pairs,
    lm_perplexity_buckets,
)
from seo_crawler_spark.sources.tables import load

SF0001 = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- IVF-PQ


def test_ivfpq_recall_vs_brute(spark):
    """PQ is lossy by design; what must hold is that the approximate
    top-k still recovers most of the exact top-k at bench scale with
    the default (4 subspaces × 16 codes, 4-probe IVF) config."""
    brute = {
        (r["qid"], r["cid"]) for r in ann_brute_topk(spark, SF0001).collect()
    }
    pq = {
        (r["qid"], r["cid"]) for r in ann_ivfpq_topk(spark, SF0001).collect()
    }
    assert brute and pq
    recall = len(brute & pq) / len(brute)
    assert recall >= 0.7, f"IVF-PQ recall collapsed: {recall:.2f}"


def test_ivfpq_topk_shape(spark):
    rows = ann_ivfpq_topk(spark, SF0001).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append(r)
    for qid, rs in by_q.items():
        assert [r["rnk"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= TOP_K
        # ranking is by exact re-rank cosine desc, cid asc
        keys = [(r["cos"], -r["cid"]) for r in rs]
        assert keys == sorted(keys, reverse=True)
        assert all(qid != r["cid"] for r in rs)


def test_ivfpq_unpruned_equals_ivf_flat(spark):
    """With the ADC shortlist wider than any probed cell population,
    the PQ stage prunes nothing and the exact re-rank must reproduce
    IVF-Flat verbatim — pins that PQ is a pure shortlist heuristic on
    top of an unchanged IVF + exact-cosine pipeline."""
    from seo_crawler_spark.operators.simsearch import ann_ivf_topk

    flat = [
        (r["qid"], r["cid"], r["cos"], r["rnk"])
        for r in ann_ivf_topk(spark, SF0001).collect()
    ]
    pq = [
        (r["qid"], r["cid"], r["cos"], r["rnk"])
        for r in ann_ivfpq_topk(spark, SF0001, shortlist=10**9).collect()
    ]
    assert pq == flat


def test_pq_codes_deterministic_and_in_range(spark):
    """Encoder output is a pure row function: repartitioning the input
    must not change a single code, and codes index the codebook."""
    emb = load(spark, "embeddings", SF0001)
    dim = len(emb.select("embedding").first()["embedding"])
    cbs = pq_codebooks(emb, dim)
    enc = pq_encode_udf(cbs)
    a = {
        r["vec_id"]: list(r["codes"])
        for r in emb.select("vec_id", enc("embedding").alias("codes")).collect()
    }
    b = {
        r["vec_id"]: list(r["codes"])
        for r in emb.repartition(7, "label")
        .select("vec_id", enc("embedding").alias("codes"))
        .collect()
    }
    assert a == b
    assert all(
        len(codes) == PQ_M and all(0 <= c < PQ_KS for c in codes)
        for codes in a.values()
    )
    # a codebook pivot's own subvectors are distance-0 to themselves:
    # vector j < PQ_KS must encode to [j] * PQ_M
    for j in range(PQ_KS):
        assert a[j] == [j] * PQ_M


def test_pq_encode_matches_python_argmin(spark):
    """The encoder's code choice is the exact fixed-point argmin of
    squared distance to the codebook entries (ties → smallest id) —
    checked against a pure-python model, including the ADC identity
    that reconstructing from codes gives back codebook rows."""
    import math

    emb = load(spark, "embeddings", SF0001)
    dim = len(emb.select("embedding").first()["embedding"])
    sub = dim // PQ_M
    cbs = pq_codebooks(emb, dim)
    enc = pq_encode_udf(cbs)
    got = {
        r["vec_id"]: list(r["codes"])
        for r in emb.filter(F.col("vec_id") < 60)
        .select("vec_id", enc("embedding").alias("codes"))
        .collect()
    }
    vecs = {
        r["vec_id"]: [
            math.floor(float(x) * DOT_SCALE) for x in r["embedding"]
        ]
        for r in emb.filter(F.col("vec_id") < 60).collect()
    }
    for vid, qv in vecs.items():
        for m in range(PQ_M):
            seg = qv[m * sub : (m + 1) * sub]
            dists = [
                (sum((a - b) ** 2 for a, b in zip(seg, cv)), j)
                for j, cv in cbs[m]
            ]
            assert got[vid][m] == min(dists)[1], (vid, m)


# ------------------------------------------------- LM perplexity buckets


def test_lm_buckets_proportions_and_nulls(spark):
    rows = lm_perplexity_buckets(spark, SF0001).collect()
    docs = load(spark, "documents", SF0001).count()
    assert len(rows) == docs  # every doc keeps a row
    scored = [r for r in rows if r["bucket"] is not None]
    empty = [r for r in rows if r["bucket"] is None]
    for r in empty:
        assert r["n_tok"] == 0 and r["nll"] is None
    n = len(scored)
    heads = sum(1 for r in scored if r["bucket"] == "head")
    tails = sum(1 for r in scored if r["bucket"] == "tail")
    mids = n - heads - tails
    # quartile split: head ≈ 25%, tail < 25% (strict >), middle the rest
    assert 0.15 * n <= heads <= 0.35 * n
    assert 0.10 * n <= tails <= 0.35 * n
    assert mids >= 0.3 * n
    # bucket ordering is by NLL: max(head) <= min over... monotone check
    hmax = max(r["nll"] for r in scored if r["bucket"] == "head")
    mmin = min(r["nll"] for r in scored if r["bucket"] == "middle")
    mmax = max(r["nll"] for r in scored if r["bucket"] == "middle")
    tmin = min(r["nll"] for r in scored if r["bucket"] == "tail")
    assert hmax <= mmin and mmax <= tmin
    assert all(r["nll"] > 0 for r in scored)  # NLL of a unigram LM is positive


def test_lm_nll_matches_python_reference(spark):
    """Exact twin of the fixed-point model on a pure-python unigram LM
    over the same corpus slice."""
    import math
    from collections import Counter
    import re

    docs = {
        r["doc_id"]: re.findall(r"\w+", r["text"].lower())
        for r in load(spark, "documents", SF0001)
        .filter(F.col("doc_id") < 40)
        .select("doc_id", "text")
        .collect()
    }
    # LM trained on the FULL table — pull all tokens
    all_toks = [
        t
        for r in load(spark, "documents", SF0001).select("text").collect()
        for t in re.findall(r"\w+", r["text"].lower())
    ]
    cnt = Counter(all_toks)
    denom = sum(cnt.values()) + len(cnt)
    got = {
        r["doc_id"]: (r["n_tok"], r["nll"])
        for r in lm_perplexity_buckets(spark, SF0001)
        .filter(F.col("doc_id") < 40)
        .collect()
    }
    for doc_id, toks in docs.items():
        if not toks:
            assert got[doc_id] == (0, None)
            continue
        inll = -sum(
            math.floor(math.log2((cnt[t] + 1) / denom) * 10_000) for t in toks
        )
        irate = inll // len(toks)
        assert got[doc_id] == (len(toks), irate / 10_000.0), doc_id


# --------------------------------------------------------- caption pairs


def test_caption_pairs_hand_model(spark):
    """Nearest-text rule against a python rebuild of the span grid:
    text chunk offsets i*C; media at offsets (i+1)*C wherever
    (i+1) % M == 0; nearest by |Δoffset|, ties → earlier text chunk."""
    import re

    C, M = SPAN_CHUNK, SPAN_MEDIA_EVERY
    docs = {
        r["doc_id"]: re.findall(r"\w+", r["text"].lower())
        for r in load(spark, "documents", SF0001)
        .select("doc_id", "text")
        .collect()
    }
    expect = []
    for doc_id, toks in sorted(docs.items()):
        if not toks:
            continue
        k = -(-len(toks) // C)
        texts = [(i * C, toks[i * C]) for i in range(k)]
        for i in range(k):
            if (i + 1) % M:
                continue
            moff = (i + 1) * C
            dist, coff, head = min(
                (abs(t - moff), t, h) for t, h in texts
            )
            expect.append(
                (doc_id, f"m/{doc_id}/{(i + 1) // M}", moff, dist, coff, head)
            )
    got = [
        (
            r["doc_id"],
            r["media_ref"],
            r["media_offset"],
            r["dist"],
            r["cap_offset"],
            r["cap_head"],
        )
        for r in caption_pairs(spark, SF0001).collect()
    ]
    assert got == expect
    assert expect, "corpus must contain media spans for the test to bite"
    # the boundary media span always has a dist-0 caption when a text
    # chunk starts exactly at its offset — sanity that ties resolve
    assert any(d == 0 for (_, _, _, d, _, _) in expect)


# ------------------------------------------------------------ BPE training


def _py_bpe(docs: list[list[str]], merges: int):
    """Reference BPE: count adjacent pairs, merge the (count desc,
    lexicographic) winner greedily left-to-right, repeat."""
    from collections import Counter

    seqs = [list(d) for d in docs]
    out = []
    for step in range(1, merges + 1):
        cnt = Counter()
        for s in seqs:
            for a, b in zip(s, s[1:]):
                cnt[(a, b)] += 1
        if not cnt:
            break
        (l, r), c = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((step, l, r, c))
        for i, s in enumerate(seqs):
            new, j = [], 0
            while j < len(s):
                if j + 1 < len(s) and s[j] == l and s[j + 1] == r:
                    new.append(l + r)
                    j += 2
                else:
                    new.append(s[j])
                    j += 1
            seqs[i] = new
    return out, seqs


def _wrap(toks: list[str]) -> str:
    return " " + "  ".join(toks) + " "


def test_bpe_matches_python_reference_on_corpus(spark):
    """The registered query's merge table equals the reference BPE run
    on the same tokenization of the real documents table."""
    import re

    from seo_crawler_spark.operators.bpe import BPE_MERGES, bpe_merges_query

    docs = [
        re.findall(r"\w+", r["text"].lower())
        for r in load(spark, "documents", SF0001).select("text").collect()
    ]
    expect, _ = _py_bpe(docs, BPE_MERGES)
    got = [
        (r["step"], r["left"], r["right"], r["pair_count"])
        for r in bpe_merges_query(spark, SF0001).collect()
    ]
    assert got == expect
    assert len(got) == BPE_MERGES


def test_bpe_greedy_overlap_semantics(spark):
    """`a a a a` must merge to `aa aa` (leftmost-first non-overlapping),
    and merged tokens must participate in later merges — the two
    places a string-replace BPE implementation can silently diverge."""
    from seo_crawler_spark.operators.bpe import bpe_train_merges

    corpus = spark.createDataFrame(
        [(0, _wrap("a a a a".split())), (1, _wrap("a a b".split()))],
        "doc_id long, s string",
    )
    got = bpe_train_merges(corpus, 3)
    docs = [["a", "a", "a", "a"], ["a", "a", "b"]]
    expect, seqs = _py_bpe(docs, 3)
    assert got == expect
    # step 1 merges (a, a): doc0 → [aa, aa] (NOT [a, aa, a]); then the
    # merged `aa` pairs must feed step 2
    assert expect[0][1:3] == ("a", "a")
    assert seqs[0] == ["aaaa"] or ("aa", "aa") in [
        (e[1], e[2]) for e in expect
    ]


def test_bpe_encode_matches_python_segmentation(spark):
    """n_raw/n_bpe per doc equal the reference BPE's final segmentation
    lengths, and encoding strictly compresses wherever a merge fired."""
    import re

    from seo_crawler_spark.operators.bpe import BPE_MERGES, bpe_encode

    rows = load(spark, "documents", SF0001).select("doc_id", "text").collect()
    ids = [r["doc_id"] for r in rows]
    docs = [re.findall(r"\w+", r["text"].lower()) for r in rows]
    _, seqs = _py_bpe(docs, BPE_MERGES)
    expect = {i: (len(d), len(s)) for i, d, s in zip(ids, docs, seqs)}
    got = {
        r["doc_id"]: (r["n_raw"], r["n_bpe"])
        for r in bpe_encode(spark, SF0001).collect()
    }
    assert got == expect
    assert any(b < r for r, b in got.values())  # merges actually fired


# ------------------------------------------------------ training shuffle


def test_training_shuffle_is_a_balanced_permutation(spark):
    """Every doc appears exactly once; positions are contiguous per
    shard; shards are hash-balanced; a different epoch seed yields a
    different order over the same membership universe."""
    from seo_crawler_spark.operators.sampling import (
        SHUFFLE_SHARDS,
        training_shuffle,
    )

    rows = training_shuffle(spark, SF0001).collect()
    n = load(spark, "documents", SF0001).count()
    assert len(rows) == n
    assert len({r["doc_id"] for r in rows}) == n  # a permutation
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) <= set(range(SHUFFLE_SHARDS))
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    sizes = [len(v) for v in by_shard.values()]
    assert max(sizes) <= 2 * (n // SHUFFLE_SHARDS)  # hash balance
    ep1 = [
        (r["doc_id"], r["shard"], r["pos"])
        for r in training_shuffle(spark, SF0001, seed="ep1").collect()
    ]
    assert {d for d, _, _ in ep1} == {r["doc_id"] for r in rows}
    assert ep1 != [(r["doc_id"], r["shard"], r["pos"]) for r in rows]


# ---------------------------------------------------- leakage-safe split


def test_leakage_safe_split_no_neardup_straddles(spark):
    """The defining property: no near-dup pair crosses the split, every
    doc is assigned exactly once, both splits are non-trivial, and
    cluster members share one split."""
    from seo_crawler_spark.operators.curation import leakage_safe_split
    from seo_crawler_spark.operators.dedup import dedup_ngram_jaccard

    rows = leakage_safe_split(spark, SF0001).collect()
    n = load(spark, "documents", SF0001).count()
    assert len(rows) == n
    split = {r["doc_id"]: r["split"] for r in rows}
    by_cluster: dict[int, set[str]] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_cluster.values())
    pairs = dedup_ngram_jaccard(spark, SF0001).select("a", "b").collect()
    assert pairs, "need near-dup pairs for the property to bite"
    for p in pairs:
        assert split[p["a"]] == split[p["b"]], (p["a"], p["b"])
    vals = sum(1 for s in split.values() if s == "val")
    assert 0 < vals < n
    assert 0.03 * n <= vals <= 0.25 * n  # ~10% of clusters by hash


# --------------------------------------------------------- curation funnel


def test_curation_funnel_is_monotone_and_consistent(spark):
    """The funnel must be monotone non-increasing, agree with the
    per-stage operators it composes, and end with a non-trivial train
    set carrying tokens."""
    from seo_crawler_spark.operators.curation import (
        curation_funnel,
        quality_filter_verdicts,
    )

    r = curation_funnel(spark, SF0001).collect()[0]
    seq = [r["n_total"], r["n_quality"], r["n_canonical"], r["n_not_tail"], r["n_train"]]
    assert seq == sorted(seq, reverse=True)
    assert r["n_total"] == load(spark, "documents", SF0001).count()
    q = quality_filter_verdicts(spark, SF0001).filter(F.col("keep")).count()
    assert r["n_quality"] == q
    assert 0 < r["n_train"] < r["n_total"]
    assert r["train_tokens"] > 0


def test_bpe_random_corpus_stress_matches_reference(spark):
    """Seeded random stress over a tiny alphabet: short docs dense in
    repeated-token runs (`a a a ...`), empty docs, and single-token
    docs — the shapes where a string-replace BPE can silently diverge
    from reference greedy merging. Exact merge-table AND final
    segmentation equality against the pure-python model."""
    import random

    from seo_crawler_spark.operators.bpe import bpe_train_merges

    rng = random.Random(1234)
    docs = [
        [rng.choice("ab c".split() + ["a"]) for _ in range(rng.randint(0, 12))]
        for _ in range(40)
    ]
    merges = 6
    expect, seqs = _py_bpe([list(d) for d in docs], merges)
    corpus = spark.createDataFrame(
        [(i, _wrap(d) if d else "  ") for i, d in enumerate(docs)],
        "doc_id long, s string",
    )
    got = bpe_train_merges(corpus, merges)
    assert got == expect
    # repeated-run density check: the generator must actually produce
    # adjacent repeats for the test to exercise the overlap rule
    assert any(
        x == y for d in docs for x, y in zip(d, d[1:])
    ), "seed produced no adjacent repeats"
