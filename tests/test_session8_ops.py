"""Round-4 session-8 operators: paragraph-granularity dedup,
winnowing fingerprints (MOSS), temperature-scaled mixture sampling.

Oracle parity (value hash vs DuckDB) runs in test_oracle_parity.py;
these pin the SEMANTICS the hash can't see — the first-occurrence
keep rule on a hand-built corpus, winnowing's guaranteed-detection
property for shared runs >= w+k-1 tokens, and the up-weighting of
low-resource languages relative to their corpus share.
"""

from __future__ import annotations

import pytest

from seo_crawler_spark.operators.corpus_stats import (
    PARA_TOKENS,
    paragraph_dedup,
)
from seo_crawler_spark.operators.dedup import (
    WIN_K,
    WIN_W,
    winnowing_candidates,
)
from seo_crawler_spark.operators.sampling import temperature_sample

SF0001 = "/root/testdata/sf0.001"


def _block(tag: str) -> str:
    """One full paragraph block of PARA_TOKENS distinct tokens."""
    return " ".join(f"{tag}w{i}" for i in range(PARA_TOKENS))


# ---------------------------------------------------------- paragraph dedup


@pytest.fixture(scope="module")
def para_dir(spark, tmp_path_factory):
    p1, p2, p3, p4 = (_block(t) for t in ("pa", "pb", "pc", "pd"))
    rows = [
        # doc 0: canonical copy of p1 and p2
        (0, f"{p1} {p2}"),
        # doc 1: repeats p2 (loses it), owns p3
        (1, f"{p2} {p3}"),
        # doc 2: within-doc repeat — second p4 goes
        (2, f"{p4} {p4}"),
        # doc 3: short tail block (not a multiple of PARA_TOKENS)
        (3, f"{p3} short tail"),
    ]
    path = str(tmp_path_factory.mktemp("para") / "sf")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        path + "/documents.parquet"
    )
    return path


def test_paragraph_first_occurrence_rule(spark, para_dir):
    out = {r["doc_id"]: r for r in paragraph_dedup(spark, para_dir).collect()}
    assert len(out) == 4

    # doc 0 is the first occurrence of both its paragraphs
    assert (out[0]["n_paras"], out[0]["n_kept"]) == (2, 2)
    assert out[0]["kept_frac"] == 1.0

    # doc 1 loses p2 (doc 0 owns it), keeps p3 (first occurrence)
    assert (out[1]["n_paras"], out[1]["n_kept"]) == (2, 1)

    # within-doc repeat: first copy kept, second dropped
    assert (out[2]["n_paras"], out[2]["n_kept"]) == (2, 1)

    # doc 3's p3 is a repeat of doc 1's; its short tail block survives
    assert (out[3]["n_paras"], out[3]["n_kept"]) == (2, 1)


def test_paragraph_kept_md5_tracks_recomposition(spark, para_dir):
    """Identical kept text must hash identically; the all-kept doc's
    hash equals md5 of its lowercased token text."""
    import hashlib

    out = {r["doc_id"]: r for r in paragraph_dedup(spark, para_dir).collect()}
    p1, p2 = _block("pa"), _block("pb")
    assert out[0]["kept_md5"] == hashlib.md5(f"{p1} {p2}".encode()).hexdigest()
    # doc 1 keeps only p3
    assert out[1]["kept_md5"] == hashlib.md5(_block("pc").encode()).hexdigest()


def test_paragraph_corpus_invariant(spark):
    """Corpus-wide: the number of kept paragraph occurrences equals the
    number of DISTINCT paragraph hashes (exactly one copy survives)."""
    rows = paragraph_dedup(spark, SF0001).collect()
    assert rows
    kept = sum(r["n_kept"] for r in rows)
    total = sum(r["n_paras"] for r in rows)
    assert 0 < kept <= total
    # distinct-paragraph count via a direct recount
    from pyspark.sql import functions as F

    from seo_crawler_spark.functions.text import tokens
    from seo_crawler_spark.sources.tables import load

    d = load(spark, "documents", SF0001).select(
        tokens(F.col("text")).alias("tok")
    )
    p = F.lit(PARA_TOKENS)
    blocks = F.transform(
        F.sequence(F.lit(1), F.ceil(F.size("tok") / p).cast("int")),
        lambda i: F.concat_ws(" ", F.slice("tok", (i - 1) * p + 1, p)),
    )
    n_distinct = (
        d.filter(F.size("tok") > 0)
        .select(F.explode(blocks).alias("para"))
        .select("para")
        .distinct()
        .count()
    )
    assert kept == n_distinct


# ------------------------------------------------------------- winnowing


def test_winnowing_detects_shared_run(spark, tmp_path_factory):
    """The published guarantee: a shared token run of length
    >= w + k - 1 always yields at least one shared fingerprint."""
    run_len = WIN_W + WIN_K - 1  # minimal guaranteed-detected run
    shared = " ".join(f"sh{i}" for i in range(run_len))
    rows = [
        (0, f"zero0 zero1 zero2 zero3 {shared} zero4 zero5 zero6 zero7"),
        (1, f"one0 one1 one2 one3 {shared} one4 one5 one6 one7"),
        # doc 2 shares nothing with anyone
        (2, " ".join(f"two{i}" for i in range(20))),
    ]
    path = str(tmp_path_factory.mktemp("win") / "sf")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        path + "/documents.parquet"
    )
    pairs = {
        (r["a"], r["b"]): r["n_shared"]
        for r in winnowing_candidates(spark, path, min_shared=1).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] >= 1
    assert not any(2 in p for p in pairs)


def test_winnowing_identical_docs_share_all_fps(spark, tmp_path_factory):
    text = " ".join(f"t{i % 9}x{i % 7}" for i in range(40))
    rows = [(0, text), (1, text)]
    path = str(tmp_path_factory.mktemp("winid") / "sf")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        path + "/documents.parquet"
    )
    out = winnowing_candidates(spark, path, min_shared=1).collect()
    assert len(out) == 1
    # n_shared == the doc's own distinct-fingerprint count: recompute it
    import hashlib

    toks = text.lower().split()
    grams = [" ".join(toks[i : i + WIN_K]) for i in range(len(toks) - WIN_K + 1)]
    MOD = 1_000_000_007
    hv = [
        int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % MOD for g in grams
    ]
    fps = {min(hv[j : j + WIN_W]) for j in range(len(hv) - WIN_W + 1)}
    assert out[0]["n_shared"] == len(fps)


def test_winnowing_real_corpus_nonvacuous(spark):
    out = winnowing_candidates(spark, SF0001).collect()
    assert out, "sf0.001 contains near-dups; winnowing must find pairs"
    assert all(r["a"] < r["b"] and r["n_shared"] >= 2 for r in out)


# ------------------------------------------------- temperature sampling


def test_temperature_upweights_minority_langs(spark):
    """alpha < 1 compresses the mixture: every language's keep RATE is
    anti-monotone in its corpus count (rate_i ∝ c_i^(alpha-1))."""
    from pyspark.sql import functions as F

    from seo_crawler_spark.sources.tables import load

    counts = {
        r["lang"]: r["c"]
        for r in load(spark, "documents", SF0001)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    out = temperature_sample(spark, SF0001).collect()
    assert out
    rates = {}
    for r in out:
        rates[r["lang"]] = r["rate_1k"]
    assert set(rates) <= set(counts)
    for la in rates:
        for lb in rates:
            if counts[la] < counts[lb]:
                assert rates[la] >= rates[lb], (la, lb, rates, counts)


def test_temperature_sample_is_hash_deterministic(spark):
    a = [tuple(r) for r in temperature_sample(spark, SF0001).collect()]
    b = [tuple(r) for r in temperature_sample(spark, SF0001).collect()]
    assert a == b
    # achieved per-lang fraction tracks the published rate
    from collections import Counter

    from seo_crawler_spark.sources.tables import load

    total = Counter(
        r["lang"] for r in load(spark, "documents", SF0001).collect()
    )
    kept = Counter(r[1] for r in a)
    rate = {r[1]: r[2] for r in a}
    for lang, n in kept.items():
        expect = rate[lang] / 1000
        assert abs(n / total[lang] - expect) < 0.2, (lang, n, total[lang])


# --------------------------------------------------------------- trustrank


def test_trustrank_trust_attenuates_from_seeds(spark):
    from seo_crawler_spark.operators.graph import (
        TRUST_SEEDS,
        trustrank_scores,
    )

    rows = trustrank_scores(spark, SF0001).collect()
    seeds = [r for r in rows if r["doc_id"] < TRUST_SEEDS]
    rest = [r for r in rows if r["doc_id"] >= TRUST_SEEDS]
    assert seeds and rest
    # every seed holds its own injected mass
    assert all(r["reachable"] for r in seeds)
    # trust is concentrated near the seeds
    mean_seed = sum(r["tscore"] for r in seeds) / len(seeds)
    mean_rest = sum(r["tscore"] for r in rest) / len(rest)
    assert mean_seed > mean_rest
    # and some pages are NOT endorsed within k hops (the spam signal)
    assert any(not r["reachable"] for r in rest)


def test_trustrank_reachability_is_bfs_from_seeds(spark):
    """score > 0 after k rounds iff the node is within k hops of a
    seed along the generated edges (integer magnitudes here are far
    above the floor-division underflow point)."""
    from seo_crawler_spark.operators.graph import (
        ITERS,
        TRUST_SEEDS,
        trustrank_scores,
    )
    from seo_crawler_spark.sources.tables import load

    n = load(spark, "documents", SF0001).count()
    gens = (lambda d: (d * d + 1) % n, lambda d: d % 37,
            lambda d: (d * 13 + 3) % n)
    adj: dict[int, set[int]] = {}
    for d in range(n):
        adj[d] = {g(d) for g in gens} - {d}
    frontier = set(range(min(TRUST_SEEDS, n)))
    seen = set(frontier)
    for _ in range(ITERS):
        frontier = {t for s in frontier for t in adj[s]} 
        seen |= frontier
    got = {
        r["doc_id"]
        for r in trustrank_scores(spark, SF0001).collect()
        if r["reachable"]
    }
    assert got == seen


# ------------------------------------------------------------ ngram novelty


def test_novelty_order_awareness(spark, tmp_path_factory):
    """First copy keeps full credit; a later full duplicate scores 0;
    a doc mixing one old and one new half scores in between."""
    from seo_crawler_spark.operators.corpus_stats import (
        SUB_NGRAM,
        ngram_novelty,
    )

    base = " ".join(f"orig{i}" for i in range(3 * SUB_NGRAM))
    fresh = " ".join(f"new{i}" for i in range(3 * SUB_NGRAM))
    rows = [(0, base), (1, base), (2, f"{base} {fresh}")]
    path = str(tmp_path_factory.mktemp("nov") / "sf")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        path + "/documents.parquet"
    )
    out = {r["doc_id"]: r for r in ngram_novelty(spark, path).collect()}
    assert out[0]["novelty_frac"] == 1.0 and not out[0]["stale"]
    assert out[1]["novelty_frac"] == 0.0 and out[1]["stale"]
    assert 0.0 < out[2]["novelty_frac"] < 1.0


def test_novelty_corpus_invariant(spark):
    """Sum of novel grams over all docs == number of distinct gram
    hashes (each hash credits exactly one doc), and stale docs exist
    in the shipped near-dup-bearing corpus."""
    from seo_crawler_spark.operators.corpus_stats import ngram_novelty

    rows = ngram_novelty(spark, SF0001).collect()
    assert rows and any(r["stale"] for r in rows)
    novel = sum(r["novel_grams"] for r in rows)
    from pyspark.sql import functions as F

    from seo_crawler_spark.functions.text import MOD, md5int, shingles, tokens
    from seo_crawler_spark.operators.corpus_stats import SUB_NGRAM
    from seo_crawler_spark.sources.tables import load

    d = load(spark, "documents", SF0001).select(
        tokens(F.col("text")).alias("tok")
    )
    n_hashes = (
        d.select(F.explode(shingles(F.col("tok"), SUB_NGRAM)).alias("g"))
        .select((md5int(F.col("g")) % MOD).alias("h"))
        .distinct()
        .count()
    )
    assert novel == n_hashes
