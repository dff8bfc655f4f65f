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
