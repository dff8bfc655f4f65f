"""Temporal-join semantics pins: as-of tie-breaks and range-join
bucket-boundary coverage (operators/temporal.py). Oracle parity at
sf0.01 is covered by test_oracle_parity; these pin the hand-crafted
edge cases the synthetic table may not contain."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from seo_crawler_spark.operators import temporal as TP


def _events(spark, rows):
    """rows: (event_id, user_id, epoch_seconds, event_type, value)"""
    data = [
        (eid, dt.datetime.utcfromtimestamp(e), uid, typ, float(val), None)
        for (eid, uid, e, typ, val) in rows
    ]
    return spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )


def _asof(spark, rows):
    df = _events(spark, rows)
    orig = TP.load
    try:
        TP.load = lambda s, name, sf: df
        out = TP.events_asof_join(spark, "unused")
        return {r["purchase_id"]: r.asDict() for r in out.collect()}
    finally:
        TP.load = orig


def _range(spark, rows, window_s=3600.0):
    df = _events(spark, rows)
    orig = TP.load
    try:
        TP.load = lambda s, name, sf: df
        out = TP.events_range_join(spark, "unused", window_s=window_s)
        return {r["purchase_id"]: r["n_views"] for r in out.collect()}
    finally:
        TP.load = orig


def test_asof_picks_latest_prior_view(spark):
    got = _asof(
        spark,
        [
            (1, 7, 100, "view", 1.0),
            (2, 7, 200, "view", 2.0),
            (3, 7, 250, "purchase", 9.0),
            (4, 7, 300, "view", 3.0),  # after the purchase — ignored
        ],
    )
    assert got[3]["view_event_id"] == 2
    assert got[3]["gap_s"] == 50.0


def test_asof_equal_ts_view_counts_and_max_event_id_wins(spark):
    # two views at the exact purchase timestamp: inclusive as-of, and
    # the larger event_id is the tie-break winner
    got = _asof(
        spark,
        [
            (1, 7, 500, "view", 1.0),
            (5, 7, 500, "view", 5.0),
            (9, 7, 500, "purchase", 0.0),
        ],
    )
    assert got[9]["view_event_id"] == 5
    assert got[9]["gap_s"] == 0.0


def test_asof_no_prior_view_is_null_and_other_users_dont_leak(spark):
    got = _asof(
        spark,
        [
            (1, 1, 100, "view", 1.0),
            (2, 2, 200, "purchase", 0.0),  # user 2 never viewed
        ],
    )
    assert got[2]["view_event_id"] is None
    assert got[2]["gap_s"] is None


def test_range_join_counts_across_bucket_boundary(spark):
    # window 3600: purchase at t=3700 must see the view at t=3500
    # (previous bucket) and t=3650 (same bucket), not t=99 (just
    # outside the inclusive lower bound 3700-3600=100) and not t=3700
    # (exclusive upper bound)
    got = _range(
        spark,
        [
            (1, 1, 99, "view", 0.0),
            (2, 2, 3500, "view", 0.0),
            (3, 3, 3650, "view", 0.0),
            (4, 4, 3700, "view", 0.0),
            (9, 9, 3700, "purchase", 0.0),
            (10, 9, 50, "purchase", 0.0),  # zero-hit left kept with 0
        ],
    )
    assert got[9] == 2
    assert got[10] == 0


def test_range_join_plan_is_equi_join(spark):
    """The scale claim: the range predicate rides an equi-join on the
    time bucket — never a BroadcastNestedLoop/cartesian."""
    sf = "/root/testdata/sf0.001"
    plan = TP.events_range_join(spark, sf)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan
