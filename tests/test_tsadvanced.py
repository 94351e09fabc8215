"""Advanced time-series queries vs independent Python recomputation:
proration conservation, Theil-Sen median-of-slopes, lead-lag Pearson,
one-way ANOVA (ordered-fold sum), and the Holt-Winters recurrence."""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb

from procurement_data_pipeline_spark.registry import load_all


def test_proration_conserves_revenue_exactly(spark, sf_dir):
    """Hamilton proration must conserve: Σ daily pieces == Σ lineitem cents
    (for the 1995 order-year slice), and the piece count equals the total
    interval length in days."""
    truth = duckdb.sql(
        f"""
        SELECT SUM(CAST(FLOOR(l.l_extendedprice * 100) AS BIGINT)),
               SUM(ABS(date_diff('day', CAST(o.o_orderdate AS DATE),
                                 CAST(l.l_shipdate AS DATE))) + 1)
        FROM '{sf_dir}/lineitem.parquet' l
        JOIN '{sf_dir}/orders.parquet' o ON o.o_orderkey = l.l_orderkey
        WHERE CAST(o.o_orderdate AS DATE) >= DATE '1995-01-01'
          AND CAST(o.o_orderdate AS DATE) < DATE '1996-01-01'
        """
    ).fetchone()
    rows = (
        load_all()["orders_prorated_daily_revenue"].builder(spark, sf_dir).collect()
    )
    got_cents = sum(round(r["revenue"] * 100) for r in rows)
    got_pieces = sum(r["n_pieces"] for r in rows)
    assert got_cents == truth[0]
    assert got_pieces == truth[1]


def test_theil_sen_matches_direct_computation(spark, sf_dir):
    daily = duckdb.sql(
        f"""
        SELECT o_orderpriority,
               CAST(date_diff('day', DATE '1990-01-01',
                              CAST(o_orderdate AS DATE)) AS BIGINT),
               COUNT(*)
        FROM '{sf_dir}/orders.parquet' GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    series: dict[str, list[tuple[int, int]]] = defaultdict(list)
    for pr, dn, c in daily:
        series[pr].append((dn, c))
    rows = load_all()["orders_theil_sen"].builder(spark, sf_dir).collect()
    assert len(rows) == len(series)
    for r in rows:
        pts = series[r["priority"]]
        slopes = sorted(
            float(c2 - c1) / float(d2 - d1)
            for i, (d1, c1) in enumerate(pts)
            for (d2, c2) in pts[i + 1 :]
        )
        m = len(slopes)
        lo, hi = slopes[(m + 1) // 2 - 1], slopes[(m + 2) // 2 - 1]
        assert r["n_days"] == len(pts)
        assert r["n_pairs"] == m
        assert r["ts_slope"] == (lo + hi) / 2.0


def test_leadlag_matches_direct_computation(spark, sf_dir):
    xa = dict(
        duckdb.sql(
            f"SELECT CAST(o_orderdate AS DATE), COUNT(*) "
            f"FROM '{sf_dir}/orders.parquet' GROUP BY 1"
        ).fetchall()
    )
    yb = dict(
        duckdb.sql(
            f"SELECT CAST(l_shipdate AS DATE), COUNT(*) "
            f"FROM '{sf_dir}/lineitem.parquet' GROUP BY 1"
        ).fetchall()
    )
    rows = {
        r["lag_days"]: r
        for r in load_all()["orders_ship_leadlag"].builder(spark, sf_dir).collect()
    }
    from datetime import timedelta

    for lag in range(0, 85, 7):
        pairs = [
            (x, yb[d + timedelta(days=lag)])
            for d, x in xa.items()
            if d + timedelta(days=lag) in yb
        ]
        n = len(pairs)
        sx = sum(p[0] for p in pairs)
        sy = sum(p[1] for p in pairs)
        sxy = sum(p[0] * p[1] for p in pairs)
        sxx = sum(p[0] * p[0] for p in pairs)
        syy = sum(p[1] * p[1] for p in pairs)
        vx = float(n) * float(sxx) - float(sx) * float(sx)
        vy = float(n) * float(syy) - float(sy) * float(sy)
        if vx <= 0 or vy <= 0:
            assert lag not in rows
            continue
        want = (float(n) * float(sxy) - float(sx) * float(sy)) / (
            math.sqrt(vx) * math.sqrt(vy)
        )
        assert rows[lag]["n_days"] == n
        assert rows[lag]["xcorr"] == want
        assert -1.0 <= rows[lag]["xcorr"] <= 1.0


def test_anova_matches_direct_computation(spark, sf_dir):
    vals = duckdb.sql(
        f"SELECT event_type, CAST(FLOOR(value * 1000000) AS BIGINT) "
        f"FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    groups: dict[str, list[int]] = defaultdict(list)
    for t, y in vals:
        groups[t].append(y)
    k = len(groups)
    n = sum(len(v) for v in groups.values())
    s = sum(sum(v) for v in groups.values())
    t_sum = sum(y * y for v in groups.values() for y in v)
    pg_sum = 0.0
    for typ in sorted(groups):  # the ordered-fold contract: key order
        sg = sum(groups[typ])
        pg_sum = pg_sum + float(sg * sg) / float(len(groups[typ]))
    ssb_raw = pg_sum - float(s) * float(s) / float(n)
    ssw_raw = float(t_sum) - pg_sum
    [r] = load_all()["events_anova_by_type"].builder(spark, sf_dir).collect()
    assert r["k_groups"] == k
    assert r["n_obs"] == n
    assert r["ss_between"] == ssb_raw / 1e12
    assert r["ss_within"] == ssw_raw / 1e12
    assert r["f_stat"] == (ssb_raw * float(n - k)) / (ssw_raw * float(k - 1))
    assert r["f_stat"] >= 0.0


def test_holt_winters_matches_python_recurrence(spark, sf_dir):
    daily = duckdb.sql(
        f"""
        SELECT o_orderpriority,
               CAST(date_diff('day', DATE '1990-01-01',
                              CAST(o_orderdate AS DATE)) AS BIGINT),
               CAST(COUNT(*) AS DOUBLE)
        FROM '{sf_dir}/orders.parquet' GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    series: dict[str, list[tuple[int, float]]] = defaultdict(list)
    for pr, dn, y in daily:
        series[pr].append((dn, y))
    rows = load_all()["orders_holt_winters"].builder(spark, sf_dir).collect()
    by_key = {(r["priority"], r["h"]): r for r in rows}
    assert len(by_key) == 7 * len(series)
    for pr, pts in series.items():
        lvl, tr = pts[0][1], 0.0
        seas = [0.0] * 7
        for dn, y in pts[1:]:
            j = dn % 7
            new_lvl = (y - seas[j]) * 0.5 + (lvl + tr) * 0.5
            new_tr = (new_lvl - lvl) * 0.25 + tr * 0.75
            seas[j] = (y - new_lvl) * 0.25 + seas[j] * 0.75
            lvl, tr = new_lvl, new_tr
        last_dn = pts[-1][0]
        for h in range(1, 8):
            r = by_key[(pr, h)]
            sj = seas[(last_dn + h) % 7]
            assert r["n_days"] == len(pts)
            assert r["level"] == lvl
            assert r["trend"] == tr
            assert r["seasonal"] == sj
            assert r["forecast"] == lvl + float(h) * tr + sj
