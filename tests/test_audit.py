"""Tests for the audit queries: Benford share/chi2 internal consistency,
a synthetic orphan-detection case for the FK audit, dwell-time bounds, and
dispersion flags."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from procurement_data_pipeline_spark.queries.audit import (
    q_events_session_dwell,
    q_orders_benford_first_digit,
    q_part_price_dispersion,
    q_referential_integrity_audit,
)


def test_benford_shares_and_chi2(spark, sf_dir):
    rows = q_orders_benford_first_digit(spark, sf_dir).collect()
    assert {r.digit for r in rows} <= set(range(1, 10))
    n = sum(r.observed for r in rows)
    assert abs(sum(r.observed_share for r in rows) - 1.0) < 1e-12
    for r in rows:
        assert r.expected_share == math.log10(1 + 1 / r.digit)
        exp = n * r.expected_share
        assert abs(r.chi2_term - (r.observed - exp) ** 2 / exp) < 1e-9
        assert r.observed_share == r.observed / n


def test_referential_integrity_clean_on_testdata(spark, sf_dir):
    rows = q_referential_integrity_audit(spark, sf_dir).collect()
    assert len(rows) == 7
    # The generated star schema is referentially clean — every orphan and
    # NULL count must be zero (a nonzero here means the audit works AND
    # the data broke).
    for r in rows:
        assert r.n_rows > 0, r.relation
        assert r.n_null_keys == 0, r.relation
        assert r.n_orphans == 0, r.relation


def test_referential_integrity_detects_planted_orphans(spark, tmp_path):
    # Plant orphans: copy sf0.001 but drop half the parts, then the audit
    # must report exactly the lineitems that referenced them.
    src = "/root/testdata/sf0.001"
    import shutil

    for t in (
        "lineitem orders customer supplier nation region part".split()
    ):
        shutil.copy(f"{src}/{t}.parquet", tmp_path / f"{t}.parquet")
    part = spark.read.parquet(f"{src}/part.parquet")
    li = spark.read.parquet(f"{src}/lineitem.parquet")
    kept = part.where(F.col("p_partkey") % 2 == 0)
    (tmp_path / "part.parquet").unlink()
    kept.toPandas().to_parquet(str(tmp_path / "part.parquet"))
    expected_orphans = li.where(F.col("l_partkey") % 2 == 1).count()
    rows = {
        r.relation: r
        for r in q_referential_integrity_audit(spark, str(tmp_path)).collect()
    }
    assert rows["lineitem.partkey->part"].n_orphans == expected_orphans
    assert rows["lineitem.orderkey->orders"].n_orphans == 0


def test_session_dwell_bounds(spark, sf_dir):
    rows = q_events_session_dwell(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_events >= 1
        assert r.duration_sec >= 0.0
        assert 0.0 <= r.active_sec <= r.duration_sec + 1e-9
        if r.n_events == 1:
            assert r.duration_sec == 0.0 and r.active_sec == 0.0


def test_price_dispersion_flags(spark, sf_dir):
    rows = q_part_price_dispersion(spark, sf_dir).collect()
    for r in rows:
        assert r.spread_ratio > 1.5
        assert r.min_unit_price > 0
        assert r.max_unit_price >= r.min_unit_price
        assert r.n_suppliers <= r.n_lines
