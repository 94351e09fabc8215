"""Kaplan-Meier estimator invariants."""

from __future__ import annotations

from collections import defaultdict

from procurement_data_pipeline_spark.registry import load_all


def _curves(spark, sf_dir):
    rows = load_all()["orders_kaplan_meier"].builder(spark, sf_dir).collect()
    by_p = defaultdict(list)
    for r in rows:
        by_p[r["priority"]].append(r)
    for p in by_p:
        by_p[p].sort(key=lambda r: r["week"])
    return by_p


def test_km_survival_is_a_valid_curve(spark, sf_dir):
    by_p = _curves(spark, sf_dir)
    assert by_p
    for rows in by_p.values():
        prev_s, prev_n = 1.0 + 1e-12, None
        for r in rows:
            assert 0.0 <= r["survival"] <= 1.0
            assert r["survival"] <= prev_s + 1e-12  # monotone nonincreasing
            prev_s = r["survival"]
            assert r["n_risk"] > 0
            if prev_n is not None:
                assert r["n_risk"] < prev_n  # risk set strictly shrinks
            prev_n = r["n_risk"]
            assert 0.0 <= r["hazard"] <= 1.0


def test_km_first_interval_identity(spark, sf_dir):
    """S(t_0) must equal 1 − d_0/n_0 exactly — the fold's base case."""
    for rows in _curves(spark, sf_dir).values():
        r0 = rows[0]
        assert r0["survival"] == 1.0 - r0["d_events"] / r0["n_risk"]


def test_km_risk_set_conservation(spark, sf_dir):
    """Everyone leaves the study exactly once: n_risk at interval i equals
    the total population minus everyone who completed or censored earlier."""
    for rows in _curves(spark, sf_dir).values():
        total = rows[0]["n_risk"]
        left = 0
        for r in rows:
            assert r["n_risk"] == total - left
            left += r["d_events"] + r["c_censored"]
        assert left == total  # exhaustive


def test_km_deterministic(spark, sf_dir):
    b = load_all()["orders_kaplan_meier"].builder
    r1 = sorted(map(tuple, b(spark, sf_dir).collect()))
    r2 = sorted(map(tuple, b(spark, sf_dir).collect()))
    assert r1 == r2
