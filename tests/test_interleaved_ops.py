"""Round-5 interleaved-payload operators: modality-aware sequence
packing (interleaved_packing) and perceptual-hash media near-dup
(media_phash_neardup) — each checked against a pure-Python reference
model over the shipped sf0.001 tables.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _md5i(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_interleaved_packing_matches_python_model(spark):
    from seo_crawler_spark.operators.textstats import (
        IPK_BUCKETS,
        IPK_CTX,
        MEDIA_TOKENS,
        SPAN_CHUNK,
        SPAN_MEDIA_EVERY,
        interleaved_packing,
    )

    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "source", "text"]
    ).to_pylist()
    # reference model: cost = text tokens + 64/media span; greedy chop
    # per (source, md5-salted bucket) stream in doc_id order
    rows = []
    for d in docs:
        n_tok = len(re.findall(r"\w+|[^\w\s]", d["text"]))
        n_chunks = -(-n_tok // SPAN_CHUNK)
        n_media = n_chunks // SPAN_MEDIA_EVERY
        rows.append(
            {
                "source": d["source"],
                "doc_id": d["doc_id"],
                "bucket": _md5i(f"ipk:{d['doc_id']}") % IPK_BUCKETS,
                "n_tok": n_tok,
                "n_media": n_media,
                "cost": n_tok + n_media * MEDIA_TOKENS,
            }
        )
    streams: dict = {}
    for r in sorted(rows, key=lambda r: r["doc_id"]):
        key = (r["source"], r["bucket"])
        cum = streams.get(key, 0)
        r["bin"] = cum // IPK_CTX
        r["bin_offset"] = cum % IPK_CTX
        streams[key] = cum + r["cost"]
    ref = {
        r["doc_id"]: (
            r["source"], r["bucket"], r["n_tok"], r["n_media"],
            r["cost"], r["bin"], r["bin_offset"],
        )
        for r in rows
    }
    got = {
        r["doc_id"]: (
            r["source"], r["bucket"], r["n_tok"], r["n_media"],
            r["cost"], r["bin"], r["bin_offset"],
        )
        for r in interleaved_packing(spark, SF).collect()
    }
    assert got == ref
    # non-degenerate: media cost actually moves bin boundaries vs a
    # text-only packing (some doc must land in a later bin than its
    # text tokens alone would put it), and docs straddle bins
    assert any(r["n_media"] > 0 for r in rows)
    assert max(r["bin"] for r in rows) >= 1


def test_media_phash_neardup_matches_generative_truth(spark):
    """The banded+verified byte-level clustering must equal the
    content_key groups — and the PYTHON model reproduces the exact
    phash/banding/hamming pipeline to pin each stage, not just the
    final grouping."""
    from seo_crawler_spark.operators.multimodal import (
        PHASH_CONTENTS,
        PHASH_HAM_T,
        _fake_bytes,
        media_phash_neardup,
    )

    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id"]
    ).to_pylist()
    refs = [f"m/{d['doc_id']}" for d in docs if d["doc_id"] % 2 == 0]

    def payload(ref: str) -> bytes:
        k = _md5i(ref) % PHASH_CONTENTS
        base = bytearray(
            _fake_bytes(
                np.uint64((k * 0x9E3779B97F4A7C15 + 1) & 0xFFFFFFFFFFFFFFFF),
                64,
            )
        )
        for i in range(_md5i(f"ns:{ref}") % 3):
            pos = _md5i(f"np:{ref}:{i}") % 64
            base[pos] = 255 if base[pos] < 128 else 0
        return bytes(base) + hashlib.md5(f"exif:{ref}".encode()).digest()[:8]

    def phash(b: bytes) -> int:
        arr = np.frombuffer(b[:64], dtype=np.uint8)
        bits = 0
        for j in np.flatnonzero(arr >= 128):
            bits |= 1 << int(j)
        return bits

    ph = {r: phash(payload(r)) for r in refs}
    # stage pins: same-base pairs within the hamming budget, cross-base
    # pairs far outside it (the margin the banding+verify relies on)
    key = {r: _md5i(r) % PHASH_CONTENTS for r in refs}
    same = cross = 0
    for i, a in enumerate(refs):
        for b in refs[i + 1:]:
            d = bin(ph[a] ^ ph[b]).count("1")
            if key[a] == key[b]:
                assert d <= PHASH_HAM_T, (a, b, d)
                same += 1
            else:
                assert d > PHASH_HAM_T, (a, b, d)
                cross += 1
    assert same and cross
    # final verdicts = generative groups
    groups: dict = {}
    for r in refs:
        groups.setdefault(key[r], []).append(r)
    ref_out = {
        r: (min(g), len(g) - 1) for g in groups.values() for r in g
    }
    got = {
        r["media_ref"]: (r["keeper_ref"], r["n_neighbors"])
        for r in media_phash_neardup(spark, SF).collect()
    }
    assert got == ref_out
    # near-dup is doing more than exact dedup: at least one group
    # contains two refs whose payloads are NOT byte-identical
    assert any(
        len(g) > 1
        and len({payload(r) for r in g}) > 1
        for g in groups.values()
    )


def test_shard_rebalance_matches_python_model(spark):
    """Consistent-hash ring vs mod rehash on resize, vs a pure-python
    ring: per-key ownership at every size AND the four audit rows must
    match; the theory split must show (mod +1 near-total reshuffle,
    ring +1 ~1/(n+1))."""
    from seo_crawler_spark.operators.sharding import (
        RB_SPACE,
        RB_TRANSITIONS,
        RB_VNODES,
        _ring_point,
        shard_rebalance_audit,
    )

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"]).to_pylist()
    # distinct key positions — the operator's unit (md5 collisions
    # place identically under every policy and count once)
    keys = sorted({_md5i(f"rb:{d['doc_id']}") for d in docs})
    sizes = sorted({n for t in RB_TRANSITIONS for n in t})
    rings = {
        n: sorted(
            (_ring_point(s, v), s)
            for s in range(n)
            for v in range(RB_VNODES)
        )
        for n in sizes
    }

    def ring_owner(p: int, n: int) -> int:
        # first point clockwise of p (min (point - p) mod SPACE)
        return min(rings[n], key=lambda sv: (sv[0] - p) % RB_SPACE)[1]

    ref = {}
    for policy in ("mod", "ring"):
        for a, b in RB_TRANSITIONS:
            if policy == "mod":
                moved = sum(1 for p in keys if p % a != p % b)
            else:
                moved = sum(
                    1 for p in keys if ring_owner(p, a) != ring_owner(p, b)
                )
            ref[(policy, f"{a}->{b}")] = (
                len(keys), moved, moved * 1000 // len(keys)
            )
    got = {
        (r["policy"], r["transition"]): (
            r["n_docs"], r["n_moved"], r["moved_pm"]
        )
        for r in shard_rebalance_audit(spark, SF).collect()
    }
    assert got == ref
    # the audit's POINT: ring +1 is cheap, mod +1 is a reshuffle
    n = sizes[0]
    assert got[("mod", f"{n}->{n + 1}")][2] > 700
    assert got[("ring", f"{n}->{n + 1}")][2] < 300


def test_bloom_fpr_audit_matches_python_and_theory(spark):
    """The audit's verdicts must equal a pure-python bloom (same md5
    positions), and the measured FPR must sit in a sane band around
    the (1-e^{-kn/m})^k prediction — the guarantee the frontier's
    seen-filter sizing relies on."""
    import math

    from seo_crawler_spark.operators.sketches import (
        BF_K,
        BF_M,
        bloom_fpr_audit,
    )

    ids = [
        r["doc_id"]
        for r in pq.read_table(
            f"{SF}/documents.parquet", columns=["doc_id"]
        ).to_pylist()
    ]
    bits = set()
    for d in ids:
        if d % 2 == 0:
            for i in range(BF_K):
                bits.add(_md5i(f"bf:{i}:{d}") % BF_M)
    fp = sum(
        1
        for d in ids
        if d % 2 == 1
        and all(_md5i(f"bf:{i}:{d}") % BF_M in bits for i in range(BF_K))
    )
    n_ins = sum(1 for d in ids if d % 2 == 0)
    n_pr = len(ids) - n_ins
    row = bloom_fpr_audit(spark, SF).collect()
    assert len(row) == 1
    r = row[0]
    assert (
        r["m"], r["k"], r["n_inserted"], r["n_probes"], r["false_pos"],
        r["fpr_pm"],
    ) == (BF_M, BF_K, n_ins, n_pr, fp, fp * 1000 // n_pr)
    # non-vacuous: the FP branch actually fires, and the measurement
    # lands within a generous band of the standard approximation
    theory = (1 - math.exp(-BF_K * n_ins / BF_M)) ** BF_K
    assert r["false_pos"] > 0
    assert 0.3 * theory <= r["false_pos"] / n_pr <= 2.0 * theory


def test_token_dist_drift_matches_python_model(spark):
    """TVD drift per source vs a pure-python model over the md5 doc
    split; drift must behave like sampling noise on shipped data
    (nonzero, bounded) and hit 1000 for a simulated full flip."""
    from collections import Counter

    from seo_crawler_spark.operators.corpus_stats import token_dist_drift

    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "source", "text"]
    ).to_pylist()
    per: dict = {}
    for d in docs:
        h = _md5i(f"dr:{d['doc_id']}") % 2
        c = per.setdefault(d["source"], (Counter(), Counter()))[h]
        c.update(re.findall(r"\w+|[^\w\s]", d["text"]))
    ref = {}
    for s, (a, b) in per.items():
        na, nb = sum(a.values()), sum(b.values())
        vocab = set(a) | set(b)
        isum = sum(abs(a[t] * nb - b[t] * na) for t in vocab)
        tvd = None if na == 0 or nb == 0 else (isum * 500) // (na * nb)
        ref[s] = (na, nb, len(vocab), tvd)
    got = {
        r["source"]: (r["tok_a"], r["tok_b"], r["n_terms"], r["tvd_pm"])
        for r in token_dist_drift(spark, SF).collect()
    }
    assert got == ref
    # sampling-noise band on shipped data: nonzero, nowhere near a
    # template flip
    vals = [v[3] for v in got.values() if v[3] is not None]
    assert vals and all(0 < v < 700 for v in vals)
    # analytic endpoint: disjoint vocabularies give TVD exactly 1000
    na, nb = 10, 20
    isum = sum(abs(c * nb - 0 * na) for c in (4, 6)) + sum(
        abs(0 * nb - c * na) for c in (12, 8)
    )
    assert (isum * 500) // (na * nb) == 1000
