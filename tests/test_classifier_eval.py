"""classifier_pr_auc (operators/classifier.py): exact agreement with a
pure Python evaluator (same rank/midrank/fixed-point semantics), AUC =
1.0 on a separable corpus, and partition invariance."""

from __future__ import annotations

import hashlib
import math
import re

from seo_crawler_spark.operators.classifier import (
    HASH_DIM,
    PR_KEEP_PCTS,
    POSITIVE_LANG,
    W_SCALE,
    classifier_pr_auc,
)
from seo_crawler_spark.sources.tables import load
from tests.test_classifier import _py_train

SF = "/root/testdata/sf0.001"


def _py_eval(rows, iters=6):
    iw = _py_train(rows, iters)
    scored = []
    for doc_id, text, lang in rows:
        toks = re.findall(r"\w+", text.lower())
        if not toks:
            continue
        fj = {}
        for t in toks:
            j = int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % HASH_DIM
            fj[j] = fj.get(j, 0) + 1
        iz = sum(c * iw[j] for j, c in fj.items())
        y = 1 if lang == POSITIVE_LANG else 0
        scored.append((iz / (float(W_SCALE) * len(toks)), doc_id, y))
    scored.sort()  # (logit, doc_id) asc — rn is 1-based position
    n = len(scored)
    pos = sum(y for _, _, y in scored)
    neg = n - pos

    # ties-aware AUC: 2*midrank = 2*min_rank + cnt - 1 per logit group
    s2 = 0
    i = 0
    while i < n:
        j = i
        while j < n and scored[j][0] == scored[i][0]:
            j += 1
        imid2 = 2 * (i + 1) + (j - i) - 1
        s2 += imid2 * sum(y for _, _, y in scored[i:j])
        i = j
    auc = (s2 - pos * (pos + 1)) / (2.0 * pos * neg)

    out = []
    for pct in PR_KEEP_PCTS:
        n_kept = (n * pct) // 100
        # descending rank rnd = n + 1 - rn keeps the TOP n_kept scores
        # (ties broken doc_id-desc, matching the operator)
        tp = sum(y for _, _, y in scored[n - n_kept :])
        prec = tp / n_kept
        rec = tp / pos
        f1 = 2.0 * prec * rec / (prec + rec) if tp > 0 else 0.0
        out.append((pct, n_kept, tp, prec, rec, f1, auc))
    return out


def test_pr_auc_matches_python_reference(spark):
    got = [tuple(r) for r in classifier_pr_auc(spark, SF).collect()]
    rows = [
        (r["doc_id"], r["text"], r["lang"])
        for r in load(spark, "documents", SF).collect()
    ]
    assert got == _py_eval(rows)


def test_auc_is_one_on_separable_corpus(spark):
    from tests.test_classifier import _separable_docs

    docs = _separable_docs(spark)
    # point the operator's table loader at the in-memory corpus
    import seo_crawler_spark.operators.classifier as CL

    orig = CL.load
    try:
        CL.load = lambda s, name, sf: docs
        out = CL.classifier_pr_auc(spark, SF).collect()
    finally:
        CL.load = orig
    assert all(abs(r["auc"] - 1.0) < 1e-12 for r in out)


def test_pr_auc_partition_invariant(spark):
    a = [tuple(r) for r in classifier_pr_auc(spark, SF).collect()]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try:
        b = [tuple(r) for r in classifier_pr_auc(spark, SF).collect()]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b
