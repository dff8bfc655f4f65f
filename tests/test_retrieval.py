"""bm25_topk (operators/retrieval.py): exact agreement with a pure
Python BM25 (same fixed-point grid), two-phase top-k completeness, and
partition invariance."""

from __future__ import annotations

import math
import re
from collections import Counter

from seo_crawler_spark.operators.retrieval import (
    BM25_B,
    BM25_K1,
    BM25_QUERIES,
    BM25_SCALE,
    BM25_TOPK,
    bm25_topk,
)
from seo_crawler_spark.sources.tables import load

SF = "/root/testdata/sf0.01"


def _python_bm25(rows):
    """Reference BM25 over (doc_id, text) rows — the operator's exact
    integer fixed-point semantics, one doc at a time."""
    toks = {d: re.findall(r"\w+", (t or "").lower()) for d, t in rows}
    tf = {d: Counter(ts) for d, ts in toks.items()}
    dl = {d: len(ts) for d, ts in toks.items()}
    docs_with = Counter()
    for d, c in tf.items():
        for term in c:
            docs_with[term] += 1
    n = len(toks)
    avgdl = float(sum(dl.values())) / float(n)
    out = {}
    for qid, terms in BM25_QUERIES.items():
        scores = Counter()
        hit = set()
        for term in terms:
            df = docs_with.get(term, 0)
            if not df:
                continue
            idf = math.log((float(n) - df + 0.5) / (df + 0.5) + 1.0)
            for d, c in tf.items():
                f = c.get(term, 0)
                if not f:
                    continue
                tfn = (f * (BM25_K1 + 1.0)) / (
                    f + BM25_K1 * ((1.0 - BM25_B) + BM25_B * dl[d] / avgdl)
                )
                scores[d] += math.floor(idf * tfn * BM25_SCALE)
                hit.add(d)
        ranked = sorted(hit, key=lambda d: (-scores[d], d))[:BM25_TOPK]
        out[qid] = [(r + 1, d, scores[d]) for r, d in enumerate(ranked)]
    return out


def test_bm25_matches_python_reference(spark):
    got = {}
    for r in bm25_topk(spark, SF).collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["iscore"])
        )
    rows = [
        (r["doc_id"], r["text"])
        for r in load(spark, "documents", SF).select("doc_id", "text").collect()
    ]
    want = _python_bm25(rows)
    assert set(got) == {q for q, rs in want.items() if rs}
    for qid in got:
        assert got[qid] == want[qid]


def test_bm25_every_query_fills_topk(spark):
    # the literal workload's terms all exist in the corpus, so the
    # two-phase top-k must return exactly BM25_TOPK rows per query
    counts = Counter(r["query_id"] for r in bm25_topk(spark, SF).collect())
    assert counts == {qid: BM25_TOPK for qid in BM25_QUERIES}


def test_bm25_partition_invariant(spark):
    a = [tuple(r) for r in bm25_topk(spark, SF).collect()]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try:
        b = [tuple(r) for r in bm25_topk(spark, SF).collect()]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b
