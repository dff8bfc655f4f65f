"""tokenizer_stats (operators/bpe.py): exact rollup consistency with
the registered bpe_encode operator, ratio sanity, and partition
invariance."""

from __future__ import annotations

from collections import defaultdict

from seo_crawler_spark.operators.bpe import bpe_encode, tokenizer_stats
from seo_crawler_spark.sources.tables import load

SF = "/root/testdata/sf0.001"


def test_stats_are_exact_rollup_of_bpe_encode(spark):
    enc = {
        r["doc_id"]: (r["n_raw"], r["n_bpe"])
        for r in bpe_encode(spark, SF).collect()
    }
    meta = {
        r["doc_id"]: (r["lang"], r["n_chars"])
        for r in load(spark, "documents", SF)
        .select("doc_id", "lang", "n_chars")
        .collect()
    }
    want = defaultdict(lambda: [0, 0, 0, 0])
    for d, (n_raw, n_bpe) in enc.items():
        lang, n_chars = meta[d]
        w = want[lang]
        w[0] += 1
        w[1] += n_raw
        w[2] += n_bpe
        w[3] += n_chars
    got = tokenizer_stats(spark, SF).collect()
    assert {r["lang"] for r in got} == set(want)
    for r in got:
        n_docs, raw, bpe, chars = want[r["lang"]]
        assert (r["n_docs"], r["raw_tokens"], r["bpe_tokens"], r["chars"]) == (
            n_docs,
            raw,
            bpe,
            chars,
        )
        assert r["fertility"] == bpe / raw
        assert r["chars_per_tok"] == chars / bpe
        # merges only ever JOIN adjacent tokens: fertility ≤ 1 by
        # construction for a word-boundary BPE trained this way
        assert 0 < r["fertility"] <= 1
        assert r["chars_per_tok"] > 0


def test_tokenizer_stats_partition_invariant(spark):
    a = [tuple(r) for r in tokenizer_stats(spark, SF).collect()]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try:
        b = [tuple(r) for r in tokenizer_stats(spark, SF).collect()]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b
