"""Replenishment economics: EOQ/newsvendor invariants, the sqrt
cross-engine exactness probe, and Croston vs a reference recurrence."""

from __future__ import annotations

import math

import duckdb

from procurement_data_pipeline_spark.registry import load_all


def test_sqrt_is_correctly_rounded_across_engines(spark):
    """IEEE-754 mandates correctly-rounded sqrt, so Spark (JVM Math.sqrt)
    and DuckDB (libm) agree bit-for-bit on identical double inputs — the
    contract part_eoq's grading rests on. ln/pow carry no such mandate."""
    vals = [2.0, 3.0, 7.0 / 3.0, 0.1, 123456789.123, 1e300, 5e-324]
    duck = [
        duckdb.sql(f"SELECT sqrt(CAST({v!r} AS DOUBLE))").fetchone()[0] for v in vals
    ]
    sparkside = [
        r[0]
        for r in spark.sql(
            "SELECT sqrt(v) FROM VALUES "
            + ", ".join(f"(CAST({v!r} AS DOUBLE))" for v in vals)
            + " AS t(v)"
        ).collect()
    ]
    for v, d, s in zip(vals, duck, sparkside):
        assert d == s == math.sqrt(v), v


def test_eoq_formula_and_newsvendor_percentile(spark, sf_dir):
    rows = load_all()["part_eoq"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows[:200]:
        expect = math.sqrt(r["demand_units"] * 2.0e8 / r["holding_micro"])
        assert r["eoq_units"] == expect
        assert r["orders_per_period"] == r["demand_units"] / expect
        # the newsvendor stock is an observed daily demand ≥ 0
        assert r["newsvendor_stock"] >= 1
        assert r["demand_units"] >= r["newsvendor_stock"]


def test_croston_matches_reference_recurrence(spark, sf_dir):
    """Replay Croston's textbook recurrence (α=0.25, seeded with the first
    observation) in plain Python over the same daily series and demand the
    identical doubles — the ordered fold must BE the recurrence."""
    import duckdb as d

    daily = d.sql(
        f"""
        SELECT l_partkey AS partkey, CAST(l_shipdate AS DATE) AS day,
               SUM(CAST(l_quantity AS BIGINT)) AS qty
        FROM '{sf_dir}/lineitem.parquet' GROUP BY 1, 2 ORDER BY partkey, day
        """
    ).fetchall()
    series: dict[int, list[tuple]] = {}
    for pk, day, qty in daily:
        series.setdefault(pk, []).append((day, qty))
    expected = {}
    for pk, obs in series.items():
        z = p = None
        prev_day = None
        for day, qty in obs:
            gap = 1 if prev_day is None else (day - prev_day).days
            if z is None:
                z, p = float(qty), float(gap)
            else:
                z = z * 0.75 + float(qty) * 0.25
                p = p * 0.75 + float(gap) * 0.25
            prev_day = day
        expected[pk] = (len(obs), z, p, z / p)
    rows = load_all()["part_croston_forecast"].builder(spark, sf_dir).collect()
    assert len(rows) == len(expected)
    for r in rows:
        n, z, p, rate = expected[r["partkey"]]
        assert r["n_demand_days"] == n
        assert r["smoothed_qty"] == z
        assert r["smoothed_gap"] == p
        assert r["croston_rate"] == rate


def test_croston_rate_bounded_by_observed_extremes(spark, sf_dir):
    """The smoothed size is a convex combination of observed sizes, the
    smoothed gap of observed gaps ≥ 1 — so the rate can never exceed the
    largest observed daily demand."""
    rows = load_all()["part_croston_forecast"].builder(spark, sf_dir).collect()
    for r in rows:
        assert r["smoothed_gap"] >= 1.0
        assert 0.0 < r["croston_rate"] <= r["smoothed_qty"]
