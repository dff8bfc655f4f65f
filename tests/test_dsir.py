"""dsir_select (operators/sampling.py): exact agreement with a pure
Python DSIR (same hashed features, fixed-point LM grid, and
md5-Gumbel draw), pool discipline, and partition invariance."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

from seo_crawler_spark.operators.sampling import (
    DSIR_BUCKETS,
    DSIR_KEEP,
    DSIR_SCALE,
    DSIR_TARGET_LANG,
    dsir_select,
)
from seo_crawler_spark.sources.tables import load

SF = "/root/testdata/sf0.01"


def _md5int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _python_dsir(rows):
    ct, cr = Counter(), Counter()
    doc_buckets = {}
    for doc_id, lang, text in rows:
        toks = re.findall(r"\w+", (text or "").lower())
        grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        bs = [_md5int("dsir|" + g) % DSIR_BUCKETS for g in grams]
        if lang == DSIR_TARGET_LANG:
            ct.update(bs)
        else:
            cr.update(bs)
            if bs:
                doc_buckets[doc_id] = (lang, bs)
    dt = float(sum(ct.values()) + DSIR_BUCKETS)
    dr = float(sum(cr.values()) + DSIR_BUCKETS)
    ilr = {
        b: math.floor(math.log2((ct.get(b, 0) + 1) / dt) * DSIR_SCALE)
        - math.floor(math.log2((cr.get(b, 0) + 1) / dr) * DSIR_SCALE)
        for b in set(ct) | set(cr)
    }
    keyed = []
    for doc_id, (lang, bs) in doc_buckets.items():
        iw = sum(ilr[b] for b in bs)
        u = (_md5int("dsirg|" + str(doc_id)) + 0.5) / float(2**60)
        key = iw / float(DSIR_SCALE) + -math.log(-math.log(u))
        keyed.append((key, doc_id, lang, iw))
    keyed.sort(key=lambda t: (-t[0], t[1]))
    return [
        (r + 1, d, lang, iw, iw / float(DSIR_SCALE))
        for r, (_, d, lang, iw) in enumerate(keyed[:DSIR_KEEP])
    ]


def test_dsir_matches_python_reference(spark):
    got = [tuple(r) for r in dsir_select(spark, SF).collect()]
    rows = [
        (r["doc_id"], r["lang"], r["text"])
        for r in load(spark, "documents", SF)
        .select("doc_id", "lang", "text")
        .collect()
    ]
    assert got == _python_dsir(rows)


def test_dsir_draws_only_from_raw_pool(spark):
    out = dsir_select(spark, SF).collect()
    assert len(out) == DSIR_KEEP
    assert all(r["lang"] != DSIR_TARGET_LANG for r in out)
    assert [r["rank"] for r in out] == list(range(1, DSIR_KEEP + 1))


def test_dsir_partition_invariant(spark):
    a = [tuple(r) for r in dsir_select(spark, SF).collect()]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try:
        b = [tuple(r) for r in dsir_select(spark, SF).collect()]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b
