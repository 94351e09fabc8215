"""Operations service-level queries vs independent Python recomputation."""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb

from procurement_data_pipeline_spark.registry import load_all


def _k(n: int, pct: int) -> int:
    return (n * pct + 99) // 100


def test_newsvendor_quantiles_match_python(spark, sf_dir):
    daily = defaultdict(int)
    for brand, day, qty in duckdb.sql(
        f"""SELECT p.p_brand, CAST(l.l_shipdate AS DATE),
                   CAST(FLOOR(l.l_quantity) AS BIGINT)
            FROM '{sf_dir}/lineitem.parquet' l
            JOIN '{sf_dir}/part.parquet' p ON p.p_partkey = l.l_partkey"""
    ).fetchall():
        daily[(brand, day)] += qty
    by_brand = defaultdict(list)
    for (brand, _), q in daily.items():
        by_brand[brand].append(q)
    rows = {
        r["brand"]: r
        for r in load_all()["part_newsvendor_quantiles"].builder(spark, sf_dir).collect()
    }
    assert set(rows) == set(by_brand)
    for brand, qs in by_brand.items():
        qs.sort()
        r = rows[brand]
        n = len(qs)
        assert r["n_days"] == n
        assert r["total_units"] == sum(qs)
        assert r["mean_daily_units"] == float(sum(qs)) / float(n)
        assert r["q50_units"] == qs[_k(n, 50) - 1]
        assert r["q90_units"] == qs[_k(n, 90) - 1]
        assert r["q95_units"] == qs[_k(n, 95) - 1]
        # fractiles are monotone in the service level
        assert r["q50_units"] <= r["q90_units"] <= r["q95_units"]


def test_lead_time_percentiles_match_python(spark, sf_dir):
    by_s = defaultdict(list)
    for sk, days in duckdb.sql(
        f"""SELECT l.l_suppkey,
                   GREATEST(date_diff('day', CAST(o.o_orderdate AS DATE),
                                      CAST(l.l_shipdate AS DATE)), 0)
            FROM '{sf_dir}/lineitem.parquet' l
            JOIN '{sf_dir}/orders.parquet' o ON o.o_orderkey = l.l_orderkey"""
    ).fetchall():
        by_s[sk].append(days)
    rows = {
        r["suppkey"]: r
        for r in load_all()["supplier_lead_time_percentiles"]
        .builder(spark, sf_dir)
        .collect()
    }
    assert set(rows) == set(by_s)
    for sk, ds in by_s.items():
        ds.sort()
        r = rows[sk]
        n = len(ds)
        assert r["n_lines"] == n
        assert r["mean_days"] == float(sum(ds)) / float(n)
        assert r["p50_days"] == ds[_k(n, 50) - 1]
        assert r["p90_days"] == ds[_k(n, 90) - 1]
        assert r["p99_days"] == ds[_k(n, 99) - 1]
        assert r["p50_days"] <= r["p90_days"] <= r["p99_days"]
        # the mean never exceeds the max, p99 never below the median
        assert r["mean_days"] <= ds[-1]


def test_discount_curve_matches_python(spark, sf_dir):
    bands = defaultdict(lambda: [0, 0])
    for qty, disc_bp in duckdb.sql(
        f"SELECT CAST(FLOOR(l_quantity) AS BIGINT), "
        f"CAST(FLOOR(l_discount * 10000) AS BIGINT) "
        f"FROM '{sf_dir}/lineitem.parquet'"
    ).fetchall():
        b = min(qty // 10, 5)
        bands[b][0] += 1
        bands[b][1] += disc_bp
    rows = sorted(
        load_all()["lineitem_volume_discount_curve"].builder(spark, sf_dir).collect(),
        key=lambda r: r["band"],
    )
    assert [r["band"] for r in rows] == sorted(bands)
    prev = None
    for r in rows:
        n, s = bands[r["band"]]
        assert r["n_lines"] == n
        assert r["avg_discount_bp"] == float(s) / float(n)
        if prev is None:
            assert r["discount_inversion"] is False
        else:
            pn, ps = prev
            assert r["discount_inversion"] == (s * pn < ps * n)
        prev = (n, s)


def test_purchase_regularity_matches_python(spark, sf_dir):
    orders = defaultdict(list)
    for ck, d, ok in duckdb.sql(
        f"SELECT o_custkey, CAST(o_orderdate AS DATE), o_orderkey "
        f"FROM '{sf_dir}/orders.parquet'"
    ).fetchall():
        orders[ck].append((d, ok))
    expected = {}
    for ck, os_ in orders.items():
        os_.sort()
        gaps = [(b[0] - a[0]).days for a, b in zip(os_, os_[1:])]
        if len(gaps) >= 2:
            s1, s2, n = sum(gaps), sum(g * g for g in gaps), len(gaps)
            expected[ck] = (n, s1, s2)
    rows = {
        r["custkey"]: r
        for r in load_all()["customer_purchase_regularity"]
        .builder(spark, sf_dir)
        .collect()
    }
    assert set(rows) == set(expected)
    for ck, (n, s1, s2) in expected.items():
        r = rows[ck]
        assert r["n_gaps"] == n
        assert r["mean_gap_days"] == float(s1) / float(n)
        if s1:
            assert r["cv2_gap"] == float(n * s2 - s1 * s1) / float(s1 * s1)
            assert r["cv2_gap"] >= 0.0
        else:
            assert r["cv2_gap"] is None or math.isnan(r["cv2_gap"])
