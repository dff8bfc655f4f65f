"""Round-4 session-9 operators: content-defined chunking dedup,
mirror-host detection, spam mass.

Oracle parity (value hash vs DuckDB) runs in test_oracle_parity.py;
these pin the SEMANTICS the hash can't see — CDC's insertion-robust
boundary rule (the reason to prefer it over fixed blocks), the
mirror-pair overlap arithmetic on a hand-built two-host corpus, and
spam mass's internal consistency with its two component scores.
"""

from __future__ import annotations

import hashlib
import re

import pytest

from seo_crawler_spark.operators.corpus_stats import (
    CDC_D,
    CDC_ENC,
    CDC_K,
    MIRROR_FLAG_PCT,
    PARA_TOKENS,
    cdc_chunk_dedup,
    mirror_hosts,
)
from seo_crawler_spark.operators.graph import TRUST_SEEDS, spam_mass

SF0001 = "/root/testdata/sf0.001"
MOD = 1_000_000_007


def _md5i(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % MOD


def _cdc_chunks(text: str, k: int = CDC_K, d: int = CDC_D) -> list[str]:
    """Pure-python reference of the CDC chunker (same tokenizer, same
    md5-derived gram hash, same boundary rule as the Spark operator)."""
    tok = re.findall(r"\w+", text.lower())
    if not tok:
        return []
    hv = (
        [_md5i(" ".join(tok[i : i + k])) for i in range(len(tok) - k + 1)]
        if len(tok) >= k
        else []
    )
    # cut after token e = j+k-1 for 1-based gram j in 1..len(hv)-1
    ends = [j + k - 1 for j in range(1, len(hv)) if hv[j - 1] % d == 0]
    bounds = [0] + ends + [len(tok)]
    return [
        " ".join(tok[bounds[i] : bounds[i + 1]])
        for i in range(len(bounds) - 1)
    ]


def _cdc_rollup(texts: dict[int, str]) -> dict[int, tuple[int, int, str]]:
    """python keep-first rollup: doc_id -> (n_chunks, n_kept, kept_md5)."""
    first: dict[int, int] = {}
    chunks: dict[int, list[str]] = {}
    for doc_id in sorted(texts):
        cs = _cdc_chunks(texts[doc_id])
        chunks[doc_id] = cs
        for i, c in enumerate(cs, start=1):
            h = _md5i(c)
            ek = doc_id * CDC_ENC + i
            if h not in first or ek < first[h]:
                first[h] = min(first.get(h, ek), ek)
    out = {}
    for doc_id, cs in chunks.items():
        kept = [
            c
            for i, c in enumerate(cs, start=1)
            if first[_md5i(c)] == doc_id * CDC_ENC + i
        ]
        out[doc_id] = (
            len(cs),
            len(kept),
            hashlib.md5(" ".join(kept).encode()).hexdigest(),
        )
    return out


# ------------------------------------------------------------- CDC dedup


def test_cdc_matches_python_reference_on_corpus(spark):
    from seo_crawler_spark.sources.tables import load

    texts = {
        r["doc_id"]: r["text"]
        for r in load(spark, "documents", SF0001).collect()
    }
    ref = _cdc_rollup(texts)
    out = {r["doc_id"]: r for r in cdc_chunk_dedup(spark, SF0001).collect()}
    assert set(out) == set(ref)
    for doc_id, (n_chunks, n_kept, kept_md5) in ref.items():
        r = out[doc_id]
        assert (r["n_chunks"], r["n_kept"], r["kept_md5"]) == (
            n_chunks,
            n_kept,
            kept_md5,
        ), doc_id


@pytest.fixture(scope="module")
def cdc_dir(spark, tmp_path_factory):
    # deterministic 40-token body with non-uniform tokens so boundaries
    # actually fire, plus a 10-token prefix variant and a short doc
    body = " ".join(f"t{(i * 7) % 13}x{i % 5}" for i in range(40))
    prefix = " ".join(f"p{i}" for i in range(10))
    rows = [
        (0, body),
        (1, f"{prefix} {body}"),
        (2, "one two"),  # shorter than CDC_K: a single whole-doc chunk
    ]
    path = str(tmp_path_factory.mktemp("cdc") / "sf")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        path + "/documents.parquet"
    )
    return path, {r[0]: r[1] for r in rows}


def test_cdc_insertion_robustness(spark, cdc_dir):
    """Prepending text re-chunks only up to the first surviving
    boundary: every chunk of the original doc except (at most) its
    first appears verbatim in the prefixed doc — so keep-first dedup
    removes the shared tail from the later arrival. Fixed blocks
    (paragraph_dedup) would lose ALL alignment after an insertion."""
    path, texts = cdc_dir
    c0, c1 = _cdc_chunks(texts[0]), _cdc_chunks(texts[1])
    assert len(c0) >= 3, "fixture must produce multiple chunks"
    # the theorem: chunks of doc 0 after its first boundary survive the
    # prefix edit (boundaries are pure functions of their trailing k-gram)
    assert set(c0[1:]) <= set(c1)
    shared = set(c0) & set(c1)
    assert len(shared) >= len(c0) - 1

    ref = _cdc_rollup(texts)
    out = {
        r["doc_id"]: r for r in cdc_chunk_dedup(spark, path).collect()
    }
    for doc_id, (n_chunks, n_kept, kept_md5) in ref.items():
        r = out[doc_id]
        assert (r["n_chunks"], r["n_kept"], r["kept_md5"]) == (
            n_chunks,
            n_kept,
            kept_md5,
        ), doc_id
    # doc 1 arrived second: it loses every chunk doc 0 already owns
    assert out[1]["n_kept"] == out[1]["n_chunks"] - sum(
        1 for c in c1 if c in set(c0)
    )


def test_cdc_short_doc_is_one_chunk(spark, cdc_dir):
    path, _ = cdc_dir
    out = {r["doc_id"]: r for r in cdc_chunk_dedup(spark, path).collect()}
    assert (out[2]["n_chunks"], out[2]["n_kept"]) == (1, 1)


# ------------------------------------------------------------- mirrors


def _host_block(tag: str) -> str:
    return " ".join(f"{tag}w{i}" for i in range(PARA_TOKENS))


@pytest.fixture(scope="module")
def mirror_dir(spark, tmp_path_factory):
    s1, s2, a1, a2, b1, c1 = (
        _host_block(t) for t in ("sh1", "sh2", "ua1", "ua2", "ub1", "uc1")
    )
    rows = [
        # host A: 4 distinct paragraphs, 2 shared with B
        (0, f"{s1} {a1}", "hostA"),
        (1, f"{s2} {a2}", "hostA"),
        # host B: 3 distinct paragraphs, 2 shared with A
        (2, f"{s1} {b1}", "hostB"),
        (3, s2, "hostB"),
        # host C: disjoint
        (4, c1, "hostC"),
    ]
    path = str(tmp_path_factory.mktemp("mirror") / "sf")
    spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).write.parquet(path + "/documents.parquet")
    return path


def test_mirror_pair_arithmetic(spark, mirror_dir):
    out = mirror_hosts(spark, mirror_dir).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["host_a"], r["host_b"]) == ("hostA", "hostB")
    assert (r["shared_paras"], r["n_a"], r["n_b"]) == (2, 4, 3)
    assert r["overlap"] == round(2 / 3, 6)
    # integer-stated verdict: 100·shared >= pct·min
    assert r["mirror"] == (2 * 100 >= 3 * MIRROR_FLAG_PCT)


def test_mirror_nonvacuous_on_corpus(spark):
    rows = mirror_hosts(spark, SF0001).collect()
    assert len(rows) >= 1
    for r in rows:
        assert r["host_a"] < r["host_b"]
        assert 0 < r["overlap"] <= 1
        assert r["shared_paras"] <= min(r["n_a"], r["n_b"])


# ------------------------------------------------------------- spam mass


@pytest.fixture(scope="module")
def spam(spark):
    return {r["doc_id"]: r for r in spam_mass(spark, SF0001).collect()}


def test_spam_mass_internal_consistency(spam):
    for r in spam.values():
        expected_mass = max(r["pr_score"] - r["tr_score"], 0)
        assert r["mass"] == expected_mass
        assert r["rel_mass"] == round(expected_mass / r["pr_score"], 6)
        assert r["spammy"] == (r["tr_score"] * 100 <= r["pr_score"])


def test_spam_mass_separates_trusted_from_unendorsed(spam):
    # pages with zero trust carry 100% spam mass
    unreachable = [r for r in spam.values() if r["tr_score"] == 0]
    assert unreachable, "fixture graph must leave some pages untrusted"
    assert all(r["rel_mass"] == 1.0 and r["spammy"] for r in unreachable)
    # seed pages hold trust mass and are never flagged
    seeds = [r for d, r in spam.items() if d < TRUST_SEEDS]
    assert all(r["tr_score"] > 0 and not r["spammy"] for r in seeds)
    # discriminative on the shipped graph: both verdicts occur
    n_spam = sum(r["spammy"] for r in spam.values())
    assert 0 < n_spam < len(spam)
