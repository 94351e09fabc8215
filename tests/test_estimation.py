"""Tests for the estimation/attribution/fiscal queries: AQP scale-up
identity, exact credit conservation, and the 4-4-5 band structure."""

from __future__ import annotations

from pyspark.sql import functions as F

from procurement_data_pipeline_spark.queries.estimation import (
    _LOOKBACK_US,
    q_events_position_attribution,
    q_orders_aqp_revenue,
    q_orders_fiscal_445_rollup,
)
from procurement_data_pipeline_spark.sources.tables import load_table


def test_aqp_estimate_is_sample_times_ten(spark, sf_dir):
    rows = q_orders_aqp_revenue(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_sample <= r.n_total
        # The estimator is exactly 10× the sample sum (integer cents).
        assert round(r.est_revenue * 100) % 10 == 0
        # rel_error is computed in-engine over exact cents; recomputing
        # from the /100 presentation doubles differs in the last ulps.
        recomputed = (r.est_revenue - r.true_revenue) / r.true_revenue
        assert abs(r.rel_error - recomputed) < 1e-9
        # Deterministic hash sample ⇒ the error is reproducible and, at
        # 10%, should be loosely bounded on this data.
        assert abs(r.rel_error) < 0.5


def test_attribution_credit_conserves_exactly(spark, sf_dir):
    rows = q_events_position_attribution(spark, sf_dir).collect()
    total_bp = sum(r.credit_bp for r in rows)
    # Count converting purchases (those with ≥1 click in lookback)
    # independently: total credit must be exactly 10000 bp each.
    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), "user_id", F.unix_micros("ts").alias("pts")
    )
    c = ev.where(F.col("event_type") == "click").select(
        "user_id", F.unix_micros("ts").alias("cts")
    )
    converting = (
        p.join(c, "user_id")
        .where(
            (F.col("cts") < F.col("pts"))
            & (F.col("cts") >= F.col("pts") - F.lit(_LOOKBACK_US))
        )
        .select("pid")
        .distinct()
        .count()
    )
    assert total_bp == 10000 * converting
    for r in rows:
        assert 0 <= r.click_hour <= 23
        assert r.credited_conversions == r.credit_bp / 10000.0


def test_fiscal_445_band_structure(spark, sf_dir):
    rows = q_orders_fiscal_445_rollup(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r.period <= 12
        assert 1992 <= r.fiscal_year <= 2002  # facts span 1995..2001
        assert r.n_orders > 0 and r.revenue > 0
    # Totals reconcile with the raw table exactly (cents).
    o = load_table(spark, sf_dir, "orders")
    n = o.count()
    total_cents = o.select(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("c")
    ).collect()[0].c
    assert sum(r.n_orders for r in rows) == n
    assert sum(round(r.revenue * 100) for r in rows) == total_cents
