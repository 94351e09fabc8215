"""Data-observability DAG: report shape, state accumulation, failure rows."""

from __future__ import annotations

from procurement_data_pipeline_spark.plans.monitoring import run_monitoring

SF_DIR = "/root/testdata/sf0.001"


def test_monitoring_report_covers_every_detector(spark, tmp_path):
    report = run_monitoring(spark, SF_DIR, str(tmp_path / "state"))
    rows = report.collect()
    monitors = {r["monitor"] for r in rows}
    assert {"expectations", "drift_chi2", "distinct_users", "heavy_hitter"} <= monitors
    # the synthetic generator is clean and stationary: no alerts expected
    alerts = [r for r in rows if r["alert"]]
    assert alerts == [], alerts
    # every expectation appears with zero violations
    exp_rows = [r for r in rows if r["monitor"] == "expectations"]
    assert len(exp_rows) == 4
    assert all(r["value"] == 0.0 for r in exp_rows)


def test_monitoring_rerun_accumulates_state_not_alerts(spark, tmp_path):
    """Second run over the SAME data merges an identical sketch: the
    distinct estimates must be unchanged (idempotent state) and the
    jump detector must stay quiet."""
    state = str(tmp_path / "state")
    r1 = {
        (r["monitor"], r["subject"]): r["value"]
        for r in run_monitoring(spark, SF_DIR, state).collect()
    }
    r2rows = run_monitoring(spark, SF_DIR, state).collect()
    r2 = {(r["monitor"], r["subject"]): r["value"] for r in r2rows}
    d1 = {k: v for k, v in r1.items() if k[0] == "distinct_users"}
    d2 = {k: v for k, v in r2.items() if k[0] == "distinct_users"}
    assert d1 == d2
    assert not [r for r in r2rows if r["alert"]]


def test_monitoring_failed_detector_becomes_alert_row(spark, tmp_path, monkeypatch):
    """A broken detector must surface as an explicit alert row, never
    silence the report."""
    import procurement_data_pipeline_spark.plans.monitoring as mon

    def boom(*a, **k):
        raise RuntimeError("sketch backend down")

    monkeypatch.setattr(mon, "frequent_items", boom)
    rows = run_monitoring(spark, SF_DIR, str(tmp_path / "state")).collect()
    failed = [r for r in rows if r["monitor"] == "hitters" and r["subject"] == "<failed>"]
    assert len(failed) == 1 and failed[0]["alert"]
    # other detectors still reported
    assert any(r["monitor"] == "drift_chi2" for r in rows)
