"""Forecast backtest invariants."""

from __future__ import annotations

from procurement_data_pipeline_spark.registry import load_all


def test_backtest_scores_both_methods_sanely(spark, sf_dir):
    rows = load_all()["orders_forecast_backtest"].builder(spark, sf_dir).collect()
    by_m = {r["method"]: r for r in rows}
    assert set(by_m) == {"naive_lag7", "ma28"}
    # both methods are scored on the identical eligible-day set
    assert by_m["naive_lag7"]["n_days"] == by_m["ma28"]["n_days"] > 0
    for r in rows:
        assert r["mae"] >= 0.0
        assert 0.0 <= r["wape"]
        assert abs(r["bias"]) <= r["mae"] + 1e-12  # |mean err| ≤ mean |err|


def test_backtest_deterministic(spark, sf_dir):
    b = load_all()["orders_forecast_backtest"].builder
    r1 = sorted(map(tuple, b(spark, sf_dir).collect()))
    r2 = sorted(map(tuple, b(spark, sf_dir).collect()))
    assert r1 == r2
