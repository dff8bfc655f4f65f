"""quality_classifier_train/_filter (operators/classifier.py) — exact
trajectory equality with a pure-python GD reference, learning on a
separable corpus, and partition invariance of the integer gradients."""

from __future__ import annotations

import hashlib
import math
import re

from seo_crawler_spark.operators.classifier import (
    ERR_SCALE,
    GD_ITERS,
    HASH_DIM,
    POSITIVE_LANG,
    W_SCALE,
    _train,
    quality_classifier_filter,
)
from seo_crawler_spark.sources.tables import load

SF = "/root/testdata/sf0.001"


def _py_train(rows: list[tuple[int, str, str]], iters: int) -> list[int]:
    """Reference: same hashing, same fixed-point grids, same update —
    sequential python floats where the Spark side uses doubles."""
    feats: dict[int, dict[int, int]] = {}
    meta: dict[int, tuple[int, int]] = {}
    for doc_id, text, lang in rows:
        toks = re.findall(r"\w+", text.lower())
        if not toks:
            continue
        fj: dict[int, int] = {}
        for t in toks:
            j = (
                int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
                % HASH_DIM
            )
            fj[j] = fj.get(j, 0) + 1
        feats[doc_id] = fj
        meta[doc_id] = (len(toks), 1 if lang == POSITIVE_LANG else 0)
    n = len(meta)
    iw = [0] * HASH_DIM
    for _ in range(iters):
        g = [0] * HASH_DIM
        for doc_id, fj in feats.items():
            n_tok, y = meta[doc_id]
            iz = sum(c * iw[j] for j, c in fj.items())
            z = iz / (float(W_SCALE) * n_tok)
            ierr = math.floor(
                (1.0 / (1.0 + math.exp(-z)) - y) * ERR_SCALE
            )
            for j, c in fj.items():
                g[j] += ierr * c
        iw = [iw[j] - math.floor(g[j] / n) for j in range(HASH_DIM)]
    return iw


def _rows(spark):
    return [
        (r["doc_id"], r["text"], r["lang"])
        for r in load(spark, "documents", SF).collect()
    ]


def test_weights_match_python_reference(spark):
    got = _train(spark, load(spark, "documents", SF), iters=GD_ITERS)
    want = _py_train(_rows(spark), iters=GD_ITERS)
    assert got == want
    assert any(w != 0 for w in got)  # training actually moved


def _separable_docs(spark):
    # disjoint vocabularies per class: linearly separable by any
    # positive weight on class-A words
    rows = []
    for i in range(40):
        if i % 2 == 0:
            rows.append((i, "alpha beta gamma alpha delta", "en"))
        else:
            rows.append((i, "omega psi chi omega phi", "fr"))
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )


def test_learns_separable_corpus(spark):
    docs = _separable_docs(spark)
    iw = _train(spark, docs, iters=GD_ITERS)
    for doc_id, text, lang in [
        (r["doc_id"], r["text"], r["lang"]) for r in docs.collect()
    ]:
        iz = sum(
            iw[
                int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
                % HASH_DIM
            ]
            for t in re.findall(r"\w+", text.lower())
        )
        assert (iz >= 0) == (lang == "en")


def test_loss_decreases_on_separable_corpus(spark):
    # trajectory is exactly the python reference's (test above), so
    # assert the learning property on the reference directly
    rows = [
        (r["doc_id"], r["text"], r["lang"])
        for r in _separable_docs(spark).collect()
    ]
    losses = []
    for it in range(0, GD_ITERS + 1):
        iw = _py_train(rows, iters=it)
        loss = 0.0
        for _, text, lang in rows:
            toks = re.findall(r"\w+", text.lower())
            iz = sum(
                iw[
                    int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
                    % HASH_DIM
                ]
                for t in toks
            )
            z = iz / (float(W_SCALE) * len(toks))
            p = 1.0 / (1.0 + math.exp(-z))
            y = 1 if lang == "en" else 0
            p = min(max(p, 1e-12), 1 - 1e-12)
            loss -= y * math.log(p) + (1 - y) * math.log(1 - p)
        losses.append(loss / len(rows))
    assert all(b < a for a, b in zip(losses, losses[1:]))


def test_partition_invariance(spark):
    docs = load(spark, "documents", SF)
    a = _train(spark, docs.repartition(1), iters=2)
    b = _train(spark, docs.repartition(13), iters=2)
    assert a == b


def test_filter_verdict_is_integer_side(spark):
    out = quality_classifier_filter(spark, SF).collect()
    assert len(out) == load(spark, "documents", SF).count()
    for r in out:
        if r["pred"] is not None:
            assert r["pred"] == (1 if r["iz"] >= 0 else 0)
            assert r["n_tok"] > 0
