"""Multimodal plumbing: schema, determinism across parallelism levels,
stubbed decode reading synthetic headers, real feature extraction."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from seo_crawler_spark.operators.multimodal import (
    decode_images,
    extract_features,
    resize_plan,
    sample_frames,
    synthesize_media,
)
from seo_crawler_spark.sources.corpus import generate_corpus


@pytest.fixture(scope="module")
def media(spark):
    corpus = generate_corpus(spark, n_docs=200, n_hosts=4, seed=3)
    return synthesize_media(spark, corpus).localCheckpoint(eager=True)


def test_media_schema_and_kinds(spark, media):
    assert set(media.columns) == {"media_ref", "kind", "payload", "meta"}
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds <= {"image", "audio", "video"}
    assert "image" in kinds
    assert media.count() > 10
    # payload is real bytes with the 8-byte dims header
    row = media.filter(F.col("kind") == "image").first()
    assert isinstance(row["payload"], (bytes, bytearray))
    assert len(row["payload"]) == 8 + 128


def test_decode_stub_reads_header(spark, media):
    dec = decode_images(media)
    rows = {r["media_ref"]: r for r in dec.collect()}
    src = {r["media_ref"]: r for r in media.filter(F.col("kind") == "image").collect()}
    assert rows.keys() == src.keys()
    for ref, r in rows.items():
        assert r["decoder"] == "fake-header"
        assert r["width"] == src[ref]["meta"]["width"]
        assert r["height"] == src[ref]["meta"]["height"]


def test_features_deterministic_and_normalized(spark, media):
    f1 = {r["media_ref"]: r["features"] for r in extract_features(media).collect()}
    f2 = {
        r["media_ref"]: r["features"]
        for r in extract_features(media.repartition(7)).collect()
    }
    assert f1 == f2  # partition-layout independent
    for v in f1.values():
        assert abs(math.sqrt(sum(x * x for x in v)) - 1.0) < 1e-5


def test_resize_plan_aspect(spark, media):
    for r in resize_plan(media, max_side=256).collect():
        assert max(r["target_width"], r["target_height"]) <= 256
        if max(r["width"], r["height"]) <= 256:
            assert (r["target_width"], r["target_height"]) == (r["width"], r["height"])


def test_frame_sampling(spark, media):
    frames = sample_frames(media, every_n=24)
    rows = frames.collect()
    vids = media.filter(F.col("kind") == "video").count()
    if vids:
        assert len(rows) >= vids
        assert all(r["frame_idx"] % 24 == 0 for r in rows)
        assert all(r["frame_idx"] < r["n_frames"] for r in rows)


def test_media_dedup_byte_groups(spark):
    """The byte-level grouping is real: payloads are byte-identical
    within a dedup group and differ across groups; bookkeeping columns
    are consistent."""
    from seo_crawler_spark.operators.multimodal import media_dedup

    sf = "/root/testdata/sf0.001"
    out = media_dedup(spark, sf).collect()
    assert len(out) > 1
    total_refs = sum(r["n_copies"] for r in out)
    docs_even = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .filter(F.col("doc_id") % 2 == 0)
        .count()
    )
    assert total_refs == docs_even  # every media object lands in a group
    assert all(r["payload_bytes"] == 136 for r in out)
    assert all(
        r["dup_bytes_saved"] == (r["n_copies"] - 1) * 136 for r in out
    )
    # keepers are distinct refs and each group has >= 1 member
    keepers = [r["keeper_ref"] for r in out]
    assert len(set(keepers)) == len(keepers)
    assert any(r["n_copies"] > 1 for r in out)  # reuse actually happens
