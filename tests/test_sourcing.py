"""Strategic-sourcing queries vs independent Python recomputation:
purchase price variance, bullwhip ratio, maverick spend, Kraljic matrix."""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb

from procurement_data_pipeline_spark.registry import load_all


def _lineitem(sf_dir):
    return duckdb.sql(
        f"""
        SELECT l_orderkey, l_partkey, l_suppkey,
               CAST(FLOOR(l_quantity) AS BIGINT),
               CAST(FLOOR(l_quantity * 100) AS BIGINT),
               CAST(FLOOR(l_extendedprice * 100) AS BIGINT),
               CAST(l_shipdate AS DATE)
        FROM '{sf_dir}/lineitem.parquet'
        """
    ).fetchall()


def _parts(sf_dir):
    return duckdb.sql(
        f"SELECT p_partkey, p_brand, CAST(FLOOR(p_retailprice * 100) AS BIGINT) "
        f"FROM '{sf_dir}/part.parquet'"
    ).fetchall()


def test_ppv_matches_direct_computation(spark, sf_dir):
    part_info = {pk: (brand, std_c) for pk, brand, std_c in _parts(sf_dir)}
    actual = defaultdict(int)
    standard = defaultdict(int)
    n_lines = defaultdict(int)
    for _, pk, _, _, qty_c, ext_c, _ in _lineitem(sf_dir):
        brand, std_c = part_info[pk]
        actual[brand] += ext_c * 100
        standard[brand] += std_c * qty_c
        n_lines[brand] += 1
    rows = {
        r["brand"]: r
        for r in load_all()["part_purchase_price_variance"]
        .builder(spark, sf_dir)
        .collect()
    }
    assert set(rows) == set(n_lines)
    for brand, r in rows.items():
        assert r["n_lines"] == n_lines[brand]
        assert r["actual_value"] == float(actual[brand]) / 10000.0
        assert r["standard_value"] == float(standard[brand]) / 10000.0
        ppv = actual[brand] - standard[brand]
        assert r["ppv_value"] == float(ppv) / 10000.0
        assert r["ppv_rate"] == float(ppv) / float(standard[brand])
        # identity: actual = standard + ppv (exact at the integer layer)
        assert math.isclose(
            r["actual_value"], r["standard_value"] + r["ppv_value"], rel_tol=1e-12
        )


def test_bullwhip_matches_direct_computation(spark, sf_dir):
    part_brand = {pk: brand for pk, brand, _ in _parts(sf_dir)}
    odate = dict(
        duckdb.sql(
            f"SELECT o_orderkey, CAST(o_orderdate AS DATE) "
            f"FROM '{sf_dir}/orders.parquet'"
        ).fetchall()
    )
    ordered = defaultdict(lambda: defaultdict(int))
    shipped = defaultdict(lambda: defaultdict(int))
    for ok, pk, _, qty, _, _, sd in _lineitem(sf_dir):
        b = part_brand[pk]
        ordered[b][odate[ok]] += qty
        shipped[b][sd] += qty

    def cv2(daily):
        qs = list(daily.values())
        n, s1, s2 = len(qs), sum(qs), sum(q * q for q in qs)
        if s1 == 0:
            return None
        return float(n * s2 - s1 * s1) / float(s1 * s1)

    rows = {
        r["brand"]: r
        for r in load_all()["part_bullwhip_ratio"].builder(spark, sf_dir).collect()
    }
    assert set(rows) == set(ordered)
    for brand, r in rows.items():
        assert r["n_order_days"] == len(ordered[brand])
        assert r["n_ship_days"] == len(shipped[brand])
        co, cs = cv2(ordered[brand]), cv2(shipped[brand])
        assert r["cv2_ordered"] == co
        assert r["cv2_shipped"] == cs
        if co:
            assert r["bullwhip_ratio"] == cs / co
        assert r["cv2_ordered"] >= 0.0 and r["cv2_shipped"] >= 0.0


def test_maverick_spend_matches_direct_computation(spark, sf_dir):
    part_brand = {pk: brand for pk, brand, _ in _parts(sf_dir)}
    ps = defaultdict(int)
    for _, pk, sk, _, _, ext_c, _ in _lineitem(sf_dir):
        ps[(pk, sk)] += ext_c
    by_part = defaultdict(list)
    for (pk, sk), c in ps.items():
        by_part[pk].append((c, sk))
    total = defaultdict(int)
    maverick = defaultdict(int)
    for pk, sup in by_part.items():
        sup.sort(key=lambda p: (-p[0], p[1]))
        b = part_brand[pk]
        total[b] += sum(c for c, _ in sup)
        maverick[b] += sum(c for c, _ in sup[1:])
    rows = {
        r["brand"]: r
        for r in load_all()["brand_maverick_spend"].builder(spark, sf_dir).collect()
    }
    assert set(rows) == set(total)
    for brand, r in rows.items():
        assert r["total_spend"] == float(total[brand]) / 100.0
        assert r["maverick_spend"] == float(maverick[brand]) / 100.0
        assert r["maverick_share"] == float(maverick[brand]) / float(total[brand])
        assert 0.0 <= r["maverick_share"] < 1.0


def test_kraljic_matrix_partitions_all_parts(spark, sf_dir):
    spend = defaultdict(int)
    supps = defaultdict(set)
    for _, pk, sk, _, _, ext_c, _ in _lineitem(sf_dir):
        spend[pk] += ext_c
        supps[pk].add(sk)
    parts = sorted(spend)
    n = len(parts)
    k = (n + 1) // 2
    med_spend = sorted(spend[p] for p in parts)[k - 1]
    med_supp = sorted(len(supps[p]) for p in parts)[k - 1]
    quad = defaultdict(lambda: [0, 0, 0])  # n, spend, supp_sum
    for p in parts:
        hi_impact = spend[p] > med_spend
        hi_risk = len(supps[p]) < med_supp
        q = (
            "strategic"
            if hi_impact and hi_risk
            else "leverage"
            if hi_impact
            else "bottleneck"
            if hi_risk
            else "non_critical"
        )
        quad[q][0] += 1
        quad[q][1] += spend[p]
        quad[q][2] += len(supps[p])
    rows = {
        r["quadrant"]: r
        for r in load_all()["part_kraljic_matrix"].builder(spark, sf_dir).collect()
    }
    assert set(rows) == set(quad)
    # every part lands in exactly one quadrant
    assert sum(r["n_parts"] for r in rows.values()) == n
    for q, (cnt, sp, su) in quad.items():
        r = rows[q]
        assert r["n_parts"] == cnt
        assert r["total_spend"] == float(sp) / 100.0
        assert r["avg_suppliers"] == float(su) / float(cnt)
