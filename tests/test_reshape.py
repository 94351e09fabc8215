"""Tests for the reshape batch: OHLC ordering invariants, FULL OUTER
exhaustiveness, and ROLLUP frame algebra."""

from __future__ import annotations

from pyspark.sql import functions as F

from procurement_data_pipeline_spark.queries.reshape import (
    q_daily_order_ship_reconciliation,
    q_events_value_ohlc,
    q_orders_priority_rollup,
)
from procurement_data_pipeline_spark.sources.tables import load_table


def test_ohlc_invariants_and_first_last(spark, sf_dir):
    rows = q_events_value_ohlc(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.low <= r.open <= r.high
        assert r.low <= r.close <= r.high
        if r.n_events == 1:
            assert r.open == r.close == r.high == r.low
    # Spot-check one bar against a Python sort.
    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.col("ts").cast("date").alias("day"),
            F.unix_micros("ts").alias("us"),
            "event_id",
            F.col("value").cast("double").alias("v"),
        )
        .collect()
    )
    target = max(rows, key=lambda r: r.n_events)
    stream = sorted(
        (e.us, e.event_id, e.v)
        for e in ev
        if e.event_type == target.event_type and e.day == target.day
    )
    assert target.open == stream[0][2]
    assert target.close == stream[-1][2]
    assert target.n_events == len(stream)


def test_reconciliation_covers_both_sides(spark, sf_dir):
    rows = q_daily_order_ship_reconciliation(spark, sf_dir).collect()
    o_days = {
        r.day
        for r in load_table(spark, sf_dir, "orders")
        .select(F.col("o_orderdate").cast("date").alias("day"))
        .distinct()
        .collect()
    }
    s_days = {
        r.day
        for r in load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_shipdate").cast("date").alias("day"))
        .distinct()
        .collect()
    }
    got_days = {r.day for r in rows}
    assert got_days == o_days | s_days  # full-outer exhaustiveness
    for r in rows:
        assert (r.one_sided == 1) == (
            (r.day not in o_days) or (r.day not in s_days)
        )
        assert (r.n_placed == 0) == (r.day not in o_days)
        assert (r.n_shipped == 0) == (r.day not in s_days)


def test_rollup_frames_reconcile(spark, sf_dir):
    rows = q_orders_priority_rollup(spark, sf_dir).collect()
    detail = [r for r in rows if r.lvl == 0]
    yr_sub = [r for r in rows if r.lvl == 1]
    grand = [r for r in rows if r.lvl == 3]
    assert len(grand) == 1
    assert grand[0].yr is None and grand[0].priority is None
    # Subtotals equal the sum of their detail rows (exact cents).
    for s in yr_sub:
        dets = [d for d in detail if d.yr == s.yr]
        assert s.n_orders == sum(d.n_orders for d in dets)
        assert round(s.revenue * 100) == sum(round(d.revenue * 100) for d in dets)
    assert grand[0].n_orders == sum(d.n_orders for d in detail)
    # ROLLUP (not CUBE): no priority-only subtotal frame (lvl == 2).
    assert not [r for r in rows if r.lvl == 2]
