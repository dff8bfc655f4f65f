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
