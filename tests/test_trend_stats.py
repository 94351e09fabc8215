"""Mann-Kendall: the S statistic, tie-corrected variance, and z must
match a direct O(n²) Python computation."""

from __future__ import annotations

import math
from collections import Counter

import duckdb

from procurement_data_pipeline_spark.registry import load_all


def test_mann_kendall_matches_direct_computation(spark, sf_dir):
    daily = duckdb.sql(
        f"""
        SELECT o_orderpriority, CAST(o_orderdate AS DATE), COUNT(*)
        FROM '{sf_dir}/orders.parquet' GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    series: dict[str, list[int]] = {}
    for pr, _, c in daily:
        series.setdefault(pr, []).append(c)
    rows = load_all()["orders_mann_kendall"].builder(spark, sf_dir).collect()
    assert len(rows) == len(series)
    for r in rows:
        ys = series[r["priority"]]
        n = len(ys)
        s = sum(
            (1 if ys[j] > ys[i] else -1 if ys[j] < ys[i] else 0)
            for i in range(n)
            for j in range(i + 1, n)
        )
        tie_term = sum(
            t * (t - 1) * (2 * t + 5) for t in Counter(ys).values()
        )
        var = (n * (n - 1) * (2 * n + 5) - tie_term) / 18.0
        if s > 0:
            z = (s - 1) / math.sqrt(var)
        elif s < 0:
            z = (s + 1) / math.sqrt(var)
        else:
            z = 0.0
        assert r["n_days"] == n
        assert r["s_stat"] == s
        assert r["var_s"] == var
        assert r["z"] == z
        want_trend = (
            "increasing" if z > 1.96 else "decreasing" if z < -1.96 else "no_trend"
        )
        assert r["trend"] == want_trend
