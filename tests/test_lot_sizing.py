"""Wagner-Whitin lot sizing vs an independent Python dynamic program.

The query evaluates the DP as an ordered fold over candidate entries; this
reference implements the textbook recurrence directly — agreement is exact
(all-integer arithmetic on both sides)."""

from __future__ import annotations

from collections import defaultdict

import duckdb

from procurement_data_pipeline_spark.registry import load_all

K = 10_000  # setup, cents
H = 5  # holding, cents per unit per month


def _ww_reference(demands: list[tuple[int, int]]) -> int:
    """f(t) = min_j [f(j-1) + K + h * sum_{k=j..t} (m_k - m_j) * d_k]."""
    t_n = len(demands)
    f = [0] * (t_n + 1)
    for t in range(1, t_n + 1):
        best = None
        for j in range(1, t + 1):
            m_j = demands[j - 1][0]
            hold = sum(H * (m_k - m_j) * d_k for m_k, d_k in demands[j - 1 : t])
            cost = f[j - 1] + K + hold
            best = cost if best is None or cost < best else best
        f[t] = best
    return f[t_n]


def test_ww_matches_reference_dp_and_bounds(spark, sf_dir):
    monthly = duckdb.sql(
        f"""
        SELECT l_partkey,
               (year(CAST(l_shipdate AS DATE)) - 1990) * 12
               + month(CAST(l_shipdate AS DATE)) - 1,
               SUM(CAST(FLOOR(l_quantity) AS BIGINT))
        FROM '{sf_dir}/lineitem.parquet' GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    series: dict[int, list[tuple[int, int]]] = defaultdict(list)
    for pk, m, d in monthly:
        series[pk].append((int(m), int(d)))
    rows = load_all()["part_lot_sizing_ww"].builder(spark, sf_dir).collect()
    assert len(rows) == len(series)
    for r in rows:
        dem = series[r["partkey"]]
        want_cents = _ww_reference(dem)
        assert round(r["ww_cost"] * 100) == want_cents
        assert r["n_periods"] == len(dem)
        assert r["total_qty"] == sum(d for _, d in dem)
        # the optimum can never beat ordering once or ordering every period
        assert r["ww_cost"] <= r["single_order_cost"] + 1e-9
        assert r["ww_cost"] <= r["lot_for_lot_cost"] + 1e-9
        # and must cover at least one setup
        assert r["ww_cost"] >= K / 100.0


def test_ww_single_order_cost_is_the_j1_policy():
    """single_order_cost column equals the reference cost of covering the
    whole horizon from the first demand month."""
    dem = [(1, 10), (3, 5), (4, 7)]
    # one setup at month 1: holding = h*(0*10 + 2*5 + 3*7) = 5*31
    assert K + H * (2 * 5 + 3 * 7) == K + H * sum(
        (m - dem[0][0]) * d for m, d in dem
    )
    assert _ww_reference(dem) <= K + H * 31
