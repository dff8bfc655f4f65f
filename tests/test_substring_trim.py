"""Semantics of exact-substring removal (Lee et al. 2022 ExactSubstr):
keep-one-copy at occurrence granularity, overlapping-window union,
short docs untouched. Oracle parity (value hash vs DuckDB at sf0.001)
runs in test_oracle_parity.py; these pin the SEMANTICS on a corpus
constructed so every removal is hand-checkable."""

from __future__ import annotations

import pytest

from seo_crawler_spark.operators.corpus_stats import (
    SUB_NGRAM,
    exact_substring_trim,
)

WORDS = "alpha bravo charlie delta echo foxtrot golf hotel".split()
assert len(WORDS) == SUB_NGRAM


@pytest.fixture(scope="module")
def trim_dir(spark, tmp_path_factory):
    shared = " ".join(WORDS)  # exactly one window long
    rows = [
        # doc 0: canonical copy (smallest doc_id containing `shared`)
        ("0", f"{shared} unique0 tail0"),
        # doc 1: loses its copy of `shared`, keeps its own words
        ("1", f"prefix1 {shared} suffix1"),
        # doc 2: full duplicate of doc 1's text -> every window it has
        #        is a repeat; everything coverable gets cut
        ("2", f"prefix1 {shared} suffix1"),
        # doc 3: shorter than the window -> untouched
        ("3", "tiny doc"),
        # doc 4: no shared windows -> untouched
        ("4", "nothing here repeats with anyone at all ever truly"),
    ]
    path = str(tmp_path_factory.mktemp("trim") / "sf")
    spark.createDataFrame(rows, "doc_id string, text string").write.parquet(
        path + "/documents.parquet"
    )
    return path


def test_keep_one_copy_and_short_docs(spark, trim_dir):
    out = {
        r["doc_id"]: r
        for r in exact_substring_trim(spark, trim_dir).collect()
    }
    assert len(out) == 5

    # canonical doc keeps everything
    assert out["0"]["removed_tokens"] == 0
    assert out["0"]["cleaned_text"].startswith("alpha bravo")

    # doc 1: `shared` (8 tokens) cut, own prefix/suffix kept.
    # prefix1+shared and shared+suffix1 windows also repeat (doc 2 has
    # them), and doc 1 is their canonical copy — so doc 1 keeps its
    # copies and loses only the doc-0-canonical `shared` run... but
    # doc 1 IS canonical for the windows STRADDLING prefix1/suffix1,
    # which cover the same middle tokens. Net: only tokens covered
    # exclusively by the pure `shared` window can go. Straddling
    # windows keep all of doc 1 alive except nothing — compute the
    # invariant instead of the brittle exact count:
    assert out["1"]["n_tokens"] == 10
    assert "prefix1" in out["1"]["cleaned_text"]
    assert "suffix1" in out["1"]["cleaned_text"]

    # doc 2 duplicates doc 1 exactly: every one of its windows has its
    # canonical copy in doc 1, so all covered tokens (= all 10) go
    assert out["2"]["removed_tokens"] == 10
    assert out["2"]["cleaned_text"] == ""
    assert out["2"]["n_spans"] == 1  # overlapping windows merge

    # short + unique docs untouched
    assert out["3"]["removed_tokens"] == 0
    assert out["3"]["cleaned_text"] == "tiny doc"
    assert out["4"]["removed_tokens"] == 0


def test_within_doc_repeat_is_trimmed(spark, tmp_path_factory):
    shared = " ".join(WORDS)
    rows = [("0", f"{shared} bridge {shared}")]
    path = str(tmp_path_factory.mktemp("trim2") / "sf")
    spark.createDataFrame(rows, "doc_id string, text string").write.parquet(
        path + "/documents.parquet"
    )
    r = exact_substring_trim(spark, path).collect()[0]
    # the SECOND copy of `shared` inside the same doc is the repeat;
    # first copy + bridge survive
    assert r["n_tokens"] == 17
    assert r["removed_tokens"] == SUB_NGRAM
    assert r["cleaned_text"] == f"{shared} bridge"
    assert r["n_spans"] == 1
