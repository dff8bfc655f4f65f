"""Shingle document-frequency cap in the Jaccard blocker.

A boilerplate shingle appearing in d documents makes the posting-list
self-join emit d·(d-1)/2 pairs — quadratic at corpus scale. The cap
treats high-df shingles as stopwords (dropped from intersection AND
union). These tests pin: (a) at the default cap the testdata output is
identical to uncapped, (b) a tight cap kills boilerplate-only pairs and
collapses the candidate explosion."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from seo_crawler_spark.operators.dedup import (
    _shingle_rows,
    dedup_ngram_jaccard,
)

SF001 = "/root/testdata/sf0.01"

BOILER = "all rights reserved contact us for cookie settings and privacy policy"


@pytest.fixture(scope="module")
def boiler_dir(spark, tmp_path_factory):
    """30 docs sharing a boilerplate tail; docs 0/1 also share real body."""
    body = "quick brown fox jumps over the lazy dog again and again today"
    rows = [(0, f"{body} {BOILER}"), (1, f"{body} extra {BOILER}")] + [
        (i, f"unique words number{i} alpha{i} beta{i} gamma{i} delta{i} {BOILER}")
        for i in range(2, 30)
    ]
    d = tmp_path_factory.mktemp("boiler")
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(d / "documents.parquet"))
    return str(d)


def test_default_cap_is_invisible_on_testdata(spark):
    capped = dedup_ngram_jaccard(spark, SF001).collect()
    uncapped = dedup_ngram_jaccard(spark, SF001, df_cap=10**9).collect()
    assert sorted(map(tuple, capped)) == sorted(map(tuple, uncapped))
    assert capped  # non-vacuous


def test_tight_cap_kills_boilerplate_pairs(spark, boiler_dir):
    # uncapped: every doc pair shares the boilerplate shingles
    loose = dedup_ngram_jaccard(spark, boiler_dir, threshold=0.1, df_cap=10**9)
    n_loose = loose.count()
    assert n_loose > 100  # boilerplate made nearly-all-pairs candidates

    # capped at 5: boilerplate (df=30) is a stopword; only the genuine
    # body overlap of docs 0/1 survives
    tight = dedup_ngram_jaccard(spark, boiler_dir, threshold=0.1, df_cap=5)
    pairs = {(r["a"], r["b"]) for r in tight.collect()}
    assert pairs == {(0, 1)}


def test_cap_bounds_candidate_pairs(spark, boiler_dir):
    """The mechanism itself: posting lists longer than the cap never
    reach the join."""
    sh = _shingle_rows(spark.read.parquet(f"{boiler_dir}/documents.parquet"))
    df_counts = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    assert df_counts.agg(F.max("df")).collect()[0][0] == 30  # boilerplate
    # after the cap, max df is bounded by construction
    stop = df_counts.filter(F.col("df") > 5).select("s")
    kept = sh.join(stop, "s", "left_anti")
    kept_max = (
        kept.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
        .agg(F.max("df")).collect()[0][0]
    )
    assert kept_max <= 5


# ---------------------------------------------------------------------------
# exact-collapse in the banded-LSH paths (minhash / simhash)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def skew_dir(spark, tmp_path_factory):
    """60 unique docs + 25 byte-identical boilerplate copies + an
    8-doc near-dup family (half the tokens shared) — the shape where
    collapsed and uncollapsed banding must agree pair-for-pair."""
    rows = [
        (i, " ".join(f"u{i}w{j}" for j in range(40))) for i in range(60)
    ]
    rows += [
        (100 + i, " ".join(f"boiler{j}" for j in range(40))) for i in range(25)
    ]
    rows += [
        (
            200 + i,
            " ".join(f"fam{j}" for j in range(20))
            + " "
            + " ".join(f"n{i}x{j}" for j in range(20)),
        )
        for i in range(8)
    ]
    d = tmp_path_factory.mktemp("skew")
    spark.createDataFrame(rows, ["doc_id", "text"]).write.mode(
        "overwrite"
    ).parquet(f"{d}/documents.parquet")
    return str(d)


def test_minhash_collapse_is_output_identical(spark, skew_dir):
    """Shipped (exact-collapsed) minhash ≡ banding every doc, on a
    corpus where the collapse actually fires (25-copy group → 300
    intra pairs at jaccard 1.0, plus cross near-dup pairs)."""
    from seo_crawler_spark.functions.text import md5int
    from seo_crawler_spark.operators.dedup import (
        MOD,
        _minhash_bands,
        _token_arrays,
        dedup_minhash_lsh,
        shingles,
    )
    from seo_crawler_spark.sources.tables import load

    got = sorted(
        (r["a"], r["b"], r["jaccard"])
        for r in dedup_minhash_lsh(spark, skew_dir).collect()
    )
    # pre-fix pipeline: band EVERY doc
    arrays = (
        _token_arrays(load(spark, "documents", skew_dir))
        .select("doc_id", F.array_distinct(shingles(F.col("tok"))).alias("sh"))
        .filter(F.size("sh") > 0)
    )
    hashed = arrays.select(
        "doc_id", "sh", F.transform("sh", lambda s: md5int(s) % MOD).alias("hh")
    ).localCheckpoint(eager=False)
    bands = _minhash_bands(hashed)
    cand = (
        bands.select(F.col("doc_id").alias("a"), "band", "sig")
        .join(
            bands.select(F.col("doc_id").alias("b"), "band", "sig"),
            ["band", "sig"],
        )
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    sets_ = hashed.select("doc_id", "sh")
    pairs = cand.join(
        sets_.select(F.col("doc_id").alias("a"), F.col("sh").alias("sha")), "a"
    ).join(sets_.select(F.col("doc_id").alias("b"), F.col("sh").alias("shb")), "b")
    inter = F.size(F.array_intersect("sha", "shb"))
    na, nb = F.size("sha"), F.size("shb")
    want = sorted(
        (r["a"], r["b"], r["jaccard"])
        for r in pairs.withColumn(
            "jaccard", F.round(inter / (na + nb - inter), 4)
        )
        .filter(F.col("jaccard") >= 0.5)
        .select("a", "b", "jaccard")
        .collect()
    )
    assert got == want
    # the identical group really is in the output, at jaccard 1.0
    intra = [p for p in got if 100 <= p[0] < 125 and 100 <= p[1] < 125]
    assert len(intra) == 25 * 24 // 2 and all(p[2] == 1.0 for p in intra)


def test_simhash_collapse_is_output_identical(spark, skew_dir):
    from seo_crawler_spark.operators.dedup import (
        _BAND_BITS,
        N_BITS,
        dedup_simhash,
        simhash_signatures,
    )

    got = sorted(
        (r["a"], r["b"], r["hamming"])
        for r in dedup_simhash(spark, skew_dir).collect()
    )
    sig = simhash_signatures(spark, skew_dir)
    bands = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("band"),
                        F.shiftright("simhash", k * _BAND_BITS)
                        .bitwiseAND(F.lit((1 << _BAND_BITS) - 1))
                        .alias("key"),
                    )
                    for k in range(N_BITS // _BAND_BITS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "simhash", "bk.band", "bk.key")
    x = bands.select(
        F.col("doc_id").alias("a"), F.col("simhash").alias("ha"), "band", "key"
    )
    y = bands.select(
        F.col("doc_id").alias("b"), F.col("simhash").alias("hb"), "band", "key"
    )
    want = sorted(
        (r["a"], r["b"], r["hamming"])
        for r in x.join(y, ["band", "key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "ha", "hb")
        .distinct()
        .withColumn(
            "hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
        )
        .filter(F.col("hamming") <= 3)
        .select("a", "b", "hamming")
        .collect()
    )
    assert got == want
    intra = [p for p in got if 100 <= p[0] < 125 and 100 <= p[1] < 125]
    assert len(intra) == 25 * 24 // 2 and all(p[2] == 0 for p in intra)


def test_embedding_collapse_is_output_identical(spark, tmp_path_factory):
    """dedup_embedding_cosine's exact-collapse ≡ banding every vector,
    on a corpus with a 12-copy identical-vector group, plus a
    zero-vector pair whose NaN self-cosine must stay OUT of the output
    (as the uncollapsed path drops it)."""
    import math
    import random

    from seo_crawler_spark.operators.dedup import (
        _EMB_BANDS,
        _EMB_BAND_BITS,
        _cosine,
        dedup_embedding_cosine,
    )
    from seo_crawler_spark.operators.simsearch import ann_lsh_bucketed

    rng = random.Random(7)
    dim = 16
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(dim)], 0) for i in range(40)
    ]
    boiler = [round(rng.uniform(-1, 1), 3) for _ in range(dim)]
    rows += [(100 + i, list(boiler), 1) for i in range(12)]
    rows += [(200, [0.0] * dim, 2), (201, [0.0] * dim, 2)]
    d = tmp_path_factory.mktemp("embskew")
    spark.createDataFrame(rows, ["vec_id", "embedding", "label"]).selectExpr(
        "vec_id", "cast(embedding as array<float>) as embedding", "label"
    ).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    sf_dir = str(d)

    got = sorted(
        (r["a"], r["b"], r["cos"])
        for r in dedup_embedding_cosine(spark, sf_dir).collect()
    )
    # pre-fix pipeline: band EVERY vector
    from seo_crawler_spark.sources.tables import load

    emb = load(spark, "embeddings", sf_dir)
    buckets = ann_lsh_bucketed(spark, sf_dir)
    mask = (1 << _EMB_BAND_BITS) - 1
    bands = buckets.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("band"),
                        F.shiftright(F.col("bucket"), k * _EMB_BAND_BITS)
                        .bitwiseAND(F.lit(mask))
                        .alias("key"),
                    )
                    for k in range(_EMB_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("vec_id", "bk.band", "bk.key")
    cand = (
        bands.alias("x")
        .join(
            bands.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.key") == F.col("y.key"))
            & (F.col("x.vec_id") < F.col("y.vec_id")),
        )
        .select(F.col("x.vec_id").alias("a"), F.col("y.vec_id").alias("b"))
        .dropDuplicates(["a", "b"])
    )
    va = emb.select(F.col("vec_id").alias("a"), F.col("embedding").alias("va"))
    vb = emb.select(F.col("vec_id").alias("b"), F.col("embedding").alias("vb"))
    want = sorted(
        (r["a"], r["b"], r["cos"])
        for r in cand.join(va, "a")
        .join(vb, "b")
        .withColumn("cos", F.round(_cosine(F.col("va"), F.col("vb")), 4))
        .filter(F.col("cos") >= 0.45)
        .select("a", "b", "cos")
        .collect()
    )
    assert got == want
    intra = [p for p in got if 100 <= p[0] < 112 and 100 <= p[1] < 112]
    assert len(intra) == 12 * 11 // 2 and all(p[2] == 1.0 for p in intra)
    assert not any(p[0] == 200 or p[1] == 200 for p in got)  # zero vecs out
