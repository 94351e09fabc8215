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


def test_duckdb_struct_fold_hazard():
    """Documents the engine quirk the Holt fold works around: DuckDB's
    list_reduce mis-evaluates struct accumulators whose field expression
    reads ANOTHER field of acc (the read can observe the just-written
    value), while a list accumulator folds correctly. If this ever starts
    returning the sequential-fold answer, the workaround can be dropped."""
    struct_res = duckdb.sql(
        """
        SELECT list_reduce(
          list_transform([1.0, 2.0, 3.0],
                         i -> struct_pack(l := CAST(i AS DOUBLE),
                                          b := CAST(i + 3 AS DOUBLE))),
          (acc, x) -> struct_pack(l := acc.l*10 + x.l,
                                  b := acc.l*100 + acc.b*10 + x.b))
        """
    ).fetchone()[0]
    list_res = duckdb.sql(
        """
        SELECT list_reduce(
          list_transform([1.0, 2.0, 3.0],
                         i -> [CAST(i AS DOUBLE), CAST(i + 3 AS DOUBLE)]),
          (acc, x) -> [acc[1]*10 + x[1], acc[1]*100 + acc[2]*10 + x[2]])
        """
    ).fetchone()[0]
    assert list_res == [123.0, 2656.0]  # the sequential fold
    assert struct_res["l"] == 123.0
    assert struct_res["b"] != 2656.0  # the hazard (currently 13756.0)


def test_holt_matches_reference_recurrence(spark, sf_dir):
    import duckdb as d

    daily = d.sql(
        f"""
        SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS day, COUNT(*) AS c
        FROM '{sf_dir}/orders.parquet' GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    series: dict[str, list[float]] = {}
    for pr, _, c in daily:
        series.setdefault(pr, []).append(float(c))
    rows = load_all()["orders_holt_trend"].builder(spark, sf_dir).collect()
    assert len(rows) == len(series)
    for r in rows:
        ys = series[r["priority"]]
        level, trend = ys[0], 0.0
        for y in ys[1:]:
            nl = y * 0.5 + (level + trend) * 0.5
            trend = (nl - level) * 0.25 + trend * 0.75
            level = nl
        assert r["n_days"] == len(ys)
        assert r["level"] == level
        assert r["trend"] == trend
        assert r["forecast_next"] == level + trend
        assert r["forecast_7d"] == level + 7 * trend


def test_demand_classes_partition_by_thresholds(spark, sf_dir):
    rows = load_all()["part_demand_classes"].builder(spark, sf_dir).collect()
    assert rows
    seen = set()
    for r in rows:
        adi, cv2 = r["adi"], r["cv2"]
        assert adi >= 1.0  # gaps are ≥ 1 day by construction
        assert cv2 >= 0.0
        expect = (
            "smooth"
            if adi < 1.32 and cv2 < 0.49
            else "intermittent"
            if adi >= 1.32 and cv2 < 0.49
            else "erratic"
            if adi < 1.32
            else "lumpy"
        )
        assert r["demand_class"] == expect
        seen.add(expect)
    assert len(seen) >= 2  # the testdata is not degenerate one-class


def test_stockout_projection_matches_replay(spark, sf_dir):
    """Replay the projection in Python per part: opening = total//4 and
    the stockout day is the first day the running total exceeds it."""
    rows = load_all()["part_stockout_projection"].builder(spark, sf_dir).collect()
    daily = duckdb.sql(
        f"""
        SELECT l_partkey, CAST(l_shipdate AS DATE),
               SUM(CAST(l_quantity AS BIGINT))
        FROM '{sf_dir}/lineitem.parquet' GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    series: dict[int, list[tuple]] = {}
    for pk, day, qty in daily:
        series.setdefault(pk, []).append((day, qty))
    assert len(rows) == len(series)
    for r in rows:
        obs = series[r["partkey"]]
        total = sum(q for _, q in obs)
        opening = total // 4
        assert r["opening_units"] == opening
        cum, out_day = 0, None
        for day, q in obs:
            cum += q
            if cum > opening:
                out_day = day
                break
        assert r["stockout_day"] == out_day
        assert r["days_covered"] == (out_day - obs[0][0]).days
