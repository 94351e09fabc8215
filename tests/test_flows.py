"""Flow & momentum queries vs independent Python recomputation."""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb

from procurement_data_pipeline_spark.registry import load_all


def test_seasonal_strength_matches_python(spark, sf_dir):
    daily = defaultdict(int)
    for d, m, c in duckdb.sql(
        f"SELECT CAST(date_trunc('day', o_orderdate) AS DATE), "
        f"month(o_orderdate), CAST(FLOOR(o_totalprice * 100) AS BIGINT) "
        f"FROM '{sf_dir}/orders.parquet'"
    ).fetchall():
        daily[(d, m)] += c
    groups = defaultdict(list)
    for (_, m), y in daily.items():
        groups[m].append(y)
    k = len(groups)
    n = sum(len(v) for v in groups.values())
    s = sum(sum(v) for v in groups.values())
    t = sum(y * y for v in groups.values() for y in v)
    pg = 0.0
    for m in sorted(groups):
        v = groups[m]
        pg += float(sum(v)) ** 2 / float(len(v))
    ssb = pg - float(s) ** 2 / float(n)
    ssw = float(t) - pg
    [r] = load_all()["orders_seasonal_strength"].builder(spark, sf_dir).collect()
    assert r["k_months"] == k and r["n_days"] == n
    assert math.isclose(r["eta2"], ssb / (ssb + ssw), rel_tol=1e-12)
    assert 0.0 <= r["eta2"] <= 1.0
    assert math.isclose(r["f_stat"], (ssb * (n - k)) / (ssw * (k - 1)), rel_tol=1e-12)


def test_rate_spikes_match_python(spark, sf_dir):
    hourly = defaultdict(int)
    for et, d, h in duckdb.sql(
        f"SELECT event_type, CAST(date_trunc('day', ts) AS DATE), hour(ts) "
        f"FROM '{sf_dir}/events.parquet'"
    ).fetchall():
        hourly[(et, d, h)] += 1
    series = defaultdict(list)
    for (et, d, h), c in hourly.items():
        series[(et, h)].append((d, c))
    expected = {}
    for (et, h), pts in series.items():
        pts.sort()
        for i, (d, c) in enumerate(pts):
            window = [cc for _, cc in pts[max(0, i - 7) : i]]
            if len(window) == 7:
                med = sorted(window)[3]
                if c > 3 * med:
                    expected[(et, d, h)] = (c, med)
    rows = {
        (r["event_type"], r["day"], r["hr"]): r
        for r in load_all()["events_rate_spikes"].builder(spark, sf_dir).collect()
    }
    assert set(rows) == set(expected)
    for key, (c, med) in expected.items():
        r = rows[key]
        assert r["n_events"] == c
        assert r["baseline_median"] == med
        assert r["spike_ratio"] == float(c) / float(med)
        assert r["spike_ratio"] > 3.0


def test_share_momentum_matches_python(spark, sf_dir):
    odate = dict(
        duckdb.sql(
            f"SELECT o_orderkey, CAST(o_orderdate AS DATE) "
            f"FROM '{sf_dir}/orders.parquet'"
        ).fetchall()
    )
    lo = min(odate.values())
    hi = max(odate.values())
    import datetime as dt

    split = lo + dt.timedelta(days=(hi - lo).days // 2)
    c1 = defaultdict(int)
    c2 = defaultdict(int)
    for ok, sk, ec in duckdb.sql(
        f"SELECT l_orderkey, l_suppkey, CAST(FLOOR(l_extendedprice*100) AS BIGINT) "
        f"FROM '{sf_dir}/lineitem.parquet'"
    ).fetchall():
        (c1 if odate[ok] < split else c2)[sk] += ec
    t1, t2 = sum(c1.values()), sum(c2.values())
    rows = {
        r["suppkey"]: r
        for r in load_all()["supplier_share_momentum"].builder(spark, sf_dir).collect()
    }
    assert set(rows) == set(c1) | set(c2)
    share_sum_1 = share_sum_2 = 0.0
    for sk, r in rows.items():
        assert r["spend_h1"] == float(c1.get(sk, 0)) / 100.0
        assert r["spend_h2"] == float(c2.get(sk, 0)) / 100.0
        assert r["share_h1"] == float(c1.get(sk, 0)) / float(t1)
        assert r["share_h2"] == float(c2.get(sk, 0)) / float(t2)
        assert r["share_delta"] == r["share_h2"] - r["share_h1"]
        share_sum_1 += r["share_h1"]
        share_sum_2 += r["share_h2"]
    assert math.isclose(share_sum_1, 1.0, rel_tol=1e-9)
    assert math.isclose(share_sum_2, 1.0, rel_tol=1e-9)


def test_trade_balance_matches_python(spark, sf_dir):
    sup_nat = dict(
        duckdb.sql(
            f"SELECT s_suppkey, s_nationkey FROM '{sf_dir}/supplier.parquet'"
        ).fetchall()
    )
    cust_nat = dict(
        duckdb.sql(
            f"SELECT c_custkey, c_nationkey FROM '{sf_dir}/customer.parquet'"
        ).fetchall()
    )
    order_cust = dict(
        duckdb.sql(
            f"SELECT o_orderkey, o_custkey FROM '{sf_dir}/orders.parquet'"
        ).fetchall()
    )
    nations = dict(
        duckdb.sql(
            f"SELECT n_nationkey, n_name FROM '{sf_dir}/nation.parquet'"
        ).fetchall()
    )
    exp = defaultdict(int)
    imp = defaultdict(int)
    for ok, sk, ec in duckdb.sql(
        f"SELECT l_orderkey, l_suppkey, CAST(FLOOR(l_extendedprice*100) AS BIGINT) "
        f"FROM '{sf_dir}/lineitem.parquet'"
    ).fetchall():
        exp[sup_nat[sk]] += ec
        imp[cust_nat[order_cust[ok]]] += ec
    rows = {
        r["nation"]: r
        for r in load_all()["nation_trade_balance"].builder(spark, sf_dir).collect()
    }
    assert set(rows) == set(nations.values())
    # global conservation: every export is someone's import
    assert sum(exp.values()) == sum(imp.values())
    for nk, name in nations.items():
        r = rows[name]
        assert r["exports"] == float(exp.get(nk, 0)) / 100.0
        assert r["imports"] == float(imp.get(nk, 0)) / 100.0
        assert r["balance"] == float(exp.get(nk, 0) - imp.get(nk, 0)) / 100.0


def test_seasonal_decompose_matches_python(spark, sf_dir):
    monthly = defaultdict(int)
    for y, m, c in duckdb.sql(
        f"SELECT year(o_orderdate), month(o_orderdate), "
        f"CAST(FLOOR(o_totalprice * 100) AS BIGINT) "
        f"FROM '{sf_dir}/orders.parquet'"
    ).fetchall():
        monthly[y * 12 + m] += c
    mis = sorted(monthly)
    assert mis == list(range(mis[0], mis[-1] + 1)), "month spine has gaps"
    num24 = {}
    for i, mi in enumerate(mis):
        if 6 <= i < len(mis) - 6:
            num24[mi] = (
                monthly[mis[i - 6]]
                + 2 * sum(monthly[mis[j]] for j in range(i - 5, i + 6))
                + monthly[mis[i + 6]]
            )
    d24 = {mi: 24 * monthly[mi] - n for mi, n in num24.items()}
    per_mon = defaultdict(list)
    for mi, d in d24.items():
        per_mon[(mi - 1) % 12 + 1].append(d)
    raw = {
        mon: float(sum(v)) / (24.0 * float(len(v))) for mon, v in per_mon.items()
    }
    mean_raw = 0.0
    for mon in sorted(raw):
        mean_raw += raw[mon]
    mean_raw /= 12.0
    seasonal = {mon: r - mean_raw for mon, r in raw.items()}
    rows = (
        load_all()["orders_seasonal_decompose"].builder(spark, sf_dir).collect()
    )
    assert len(rows) == len(mis)
    for r in rows:
        mi = r["yr"] * 12 + r["mon"]
        assert r["revenue_cents"] == monthly[mi]
        assert r["seasonal_cents"] == seasonal[r["mon"]]
        if mi in num24:
            assert r["trend_cents"] == float(num24[mi]) / 24.0
            assert r["remainder_cents"] == (
                float(d24[mi]) / 24.0 - seasonal[r["mon"]]
            )
            # additive identity up to float rounding of the pinned chains
            assert (
                abs(
                    r["revenue_cents"]
                    - (r["trend_cents"] + r["seasonal_cents"] + r["remainder_cents"])
                )
                < 1e-6
            )
        else:
            assert r["trend_cents"] is None and r["remainder_cents"] is None
    # centered: the 12 indices sum to ~0
    assert abs(sum(seasonal.values())) < 1e-9 * max(abs(v) for v in seasonal.values())
