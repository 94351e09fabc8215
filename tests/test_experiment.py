"""CUPED A/B readout and Poisson-bootstrap CI contracts."""

from __future__ import annotations

from procurement_data_pipeline_spark.registry import load_all


def test_cuped_preserves_overall_mean(spark, sf_dir):
    """Algebraic identity: with pooled θ and the GLOBAL pre-mean as the
    centering constant, the user-weighted average of the adjusted arm
    means equals the user-weighted average of the raw post means — CUPED
    shifts variance between arms, never the overall level."""
    rows = load_all()["events_ab_cuped"].builder(spark, sf_dir).collect()
    assert {r["arm"] for r in rows} == {"A", "B"}
    n = sum(r["n_users"] for r in rows)
    raw = sum(r["n_users"] * r["mean_post"] for r in rows) / n
    adj = sum(r["n_users"] * r["cuped_mean"] for r in rows) / n
    assert abs(raw - adj) < 1e-9 * max(abs(raw), 1.0)


def test_cuped_deterministic(spark, sf_dir):
    b = load_all()["events_ab_cuped"].builder
    r1 = sorted(map(tuple, b(spark, sf_dir).collect()))
    r2 = sorted(map(tuple, b(spark, sf_dir).collect()))
    assert r1 == r2


def test_bootstrap_ci_shape(spark, sf_dir):
    rows = load_all()["events_value_bootstrap_ci"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_rep"] == 32
        assert r["ci_lo"] <= r["ci_hi"]
        # the interval should bracket the point estimate at this n
        assert r["ci_lo"] <= r["point_mean"] <= r["ci_hi"], r
        # and be meaningfully narrower than the value scale
        assert (r["ci_hi"] - r["ci_lo"]) < abs(r["point_mean"]) + 1.0


def test_bootstrap_deterministic(spark, sf_dir):
    b = load_all()["events_value_bootstrap_ci"].builder
    r1 = sorted(map(tuple, b(spark, sf_dir).collect()))
    r2 = sorted(map(tuple, b(spark, sf_dir).collect()))
    assert r1 == r2


def test_welch_readout_sane_under_null(spark, sf_dir):
    """The arm split is a hash of the same population (no treatment), so
    the t statistic should be unremarkable and the Welch df must sit in
    its algebraic range [min(n)-1, n_a+n_b-2]."""
    rows = load_all()["events_ab_welch"].builder(spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_a"] > 1 and r["n_b"] > 1
    assert abs(r["diff"] - (r["mean_a"] - r["mean_b"])) < 1e-9
    assert abs(r["t_stat"]) < 6.0  # a null split exceeding 6 sigma ≈ broken math
    assert min(r["n_a"], r["n_b"]) - 1 <= r["df_welch"] <= r["n_a"] + r["n_b"] - 2


def test_welch_deterministic(spark, sf_dir):
    b = load_all()["events_ab_welch"].builder
    assert sorted(map(tuple, b(spark, sf_dir).collect())) == sorted(
        map(tuple, b(spark, sf_dir).collect())
    )


def test_drift_chi2_invariants(spark, sf_dir):
    rows = load_all()["events_value_drift_chi2"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["chi2"] >= 0.0
        assert 0 <= r["dof"] <= 9
        assert r["n_a"] > 0 and r["n_b"] > 0
        # the generator is stationary: a drift alarm here means broken math
        assert r["chi2"] < 10 * (r["dof"] + 1)


def test_drift_chi2_deterministic(spark, sf_dir):
    b = load_all()["events_value_drift_chi2"].builder
    assert sorted(map(tuple, b(spark, sf_dir).collect())) == sorted(
        map(tuple, b(spark, sf_dir).collect())
    )
