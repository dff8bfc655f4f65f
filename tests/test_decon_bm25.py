"""decontaminate_bm25 (operators/retrieval.py): exact agreement with a
pure Python reference (same query-term cap, fixed-point grid, and
argmax tie-break), non-vacuous flags, and partition invariance."""

from __future__ import annotations

import math
import re
from collections import Counter

from seo_crawler_spark.operators.dedup import DECON_BENCH_DOCS
from seo_crawler_spark.operators.retrieval import (
    BM25_B,
    BM25_K1,
    BM25_SCALE,
    DECON_BM25_MIN_I,
    DECON_BM25_TERMS,
    decontaminate_bm25,
)
from seo_crawler_spark.sources.tables import load

SF = "/root/testdata/sf0.01"


def _python_decon(rows):
    toks = {d: re.findall(r"\w+", (t or "").lower()) for d, t in rows}
    tf = {d: Counter(ts) for d, ts in toks.items()}
    train = {d: c for d, c in tf.items() if d >= DECON_BENCH_DOCS and c}
    dl = {d: sum(c.values()) for d, c in train.items()}
    df = Counter()
    for c in train.values():
        df.update(c.keys())
    n = len(dl)
    avgdl = float(sum(dl.values())) / float(n)

    # per-bench query: DECON_BM25_TERMS lowest-df terms (tie: term asc)
    queries = {}
    for b, c in tf.items():
        if b >= DECON_BENCH_DOCS or not c:
            continue
        cand = sorted((df[t], t) for t in c if t in df)
        queries[b] = [t for _, t in cand[:DECON_BM25_TERMS]]

    best = {}
    for b, terms in queries.items():
        for term in terms:
            idf = math.log((float(n) - df[term] + 0.5) / (df[term] + 0.5) + 1.0)
            for d, c in train.items():
                f = c.get(term, 0)
                if not f:
                    continue
                tfn = (f * (BM25_K1 + 1.0)) / (
                    f + BM25_K1 * ((1.0 - BM25_B) + BM25_B * dl[d] / avgdl)
                )
                key = (d, b)
                best[key] = best.get(key, 0) + math.floor(
                    idf * tfn * BM25_SCALE
                )
    per_doc = {}
    for (d, b), s in best.items():
        cur = per_doc.get(d)
        if cur is None or (-s, b) < (-cur[1], cur[0]):
            per_doc[d] = (b, s)
    out = []
    for d in sorted(x for x, _ in rows if x >= DECON_BENCH_DOCS):
        b, s = per_doc.get(d, (None, 0))
        out.append(
            (d, b, s, s / float(BM25_SCALE), s >= DECON_BM25_MIN_I)
        )
    return out


def test_decon_bm25_matches_python_reference(spark):
    got = [tuple(r) for r in decontaminate_bm25(spark, SF).collect()]
    rows = [
        (r["doc_id"], r["text"])
        for r in load(spark, "documents", SF).select("doc_id", "text").collect()
    ]
    assert got == _python_decon(rows)


def test_decon_bm25_flags_non_vacuous(spark):
    out = decontaminate_bm25(spark, SF).collect()
    flagged = [r for r in out if r["contaminated"]]
    assert flagged and len(flagged) < len(out)
    assert all(r["doc_id"] >= DECON_BENCH_DOCS for r in out)
    for r in out:
        assert r["contaminated"] == (r["iscore"] >= DECON_BM25_MIN_I)


def test_decon_bm25_partition_invariant(spark):
    a = [tuple(r) for r in decontaminate_bm25(spark, SF).collect()]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try:
        b = [tuple(r) for r in decontaminate_bm25(spark, SF).collect()]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b
