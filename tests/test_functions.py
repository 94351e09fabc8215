"""Unit tests for the engine scalar-function surface (SURVEY.md §2.8)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from procurement_data_pipeline_spark.functions import (
    cents,
    dollars,
    exec_date_for_interval_end,
    iso_date,
    mrp_net_demand,
    shift_date,
    supplier_order_date,
    synth_order_id,
)


def test_date_shift_semantics():
    # procurement_dag.py:348-375 — exec = end+1, supplier order = end+2,
    # across a month boundary.
    assert exec_date_for_interval_end("2026-01-31") == "2026-02-01"
    assert supplier_order_date("2026-01-31") == "2026-02-02"
    assert shift_date("2026-12-31", 1) == "2027-01-01"


def test_synth_order_id_and_iso_format(spark):
    df = spark.createDataFrame(
        [(dt.date(2026, 1, 13), 7), (dt.date(2026, 1, 13), 12345)],
        "d date, i int",
    )
    rows = df.select(
        synth_order_id("d", "i").alias("oid"), iso_date("d").alias("iso")
    ).collect()
    # hdfs_upload_data_dag.py:93 — int(f"{YYYYMMDD}{i:05d}")
    assert [r.oid for r in rows] == [2026011300007, 2026011312345]
    assert rows[0].iso == "2026-01-13"


def test_money_quantization_convention(spark):
    # cents() is FLOOR(x*100) on the IEEE double — 19.99 stores as
    # 19.989999…, so its floor is 1998. What matters for the oracle gate is
    # that DuckDB computes the *same* integers (both engines do IEEE floor),
    # not decimal-exact roundtrips.
    df = spark.createDataFrame([(19.99,), (0.01,), (123456.78,)], "x double")
    rows = df.select(cents("x").alias("c"), dollars(cents("x")).alias("d")).collect()
    import duckdb

    expected = duckdb.sql(
        "SELECT CAST(FLOOR(x*100) AS BIGINT) FROM (VALUES (19.99::DOUBLE),"
        " (0.01::DOUBLE), (123456.78::DOUBLE)) t(x)"
    ).fetchall()
    assert [r.c for r in rows] == [e[0] for e in expected]
    assert all(abs(r.d - r.c / 100.0) < 1e-12 for r in rows)


def test_mrp_net_demand_null_and_clamp_semantics(spark):
    # (demand, safety, fallback, available, reserved) → expected
    cases = [
        (100, 50, 999, 30, 10, 130),  # plain formula
        (None, None, 40, None, None, 40),  # all LEFT-JOIN nulls → fallback
        (5, 10, 999, 1000, 0, 0),  # clamped at zero (GREATEST)
    ]
    df = spark.createDataFrame(
        [c[:5] for c in cases],
        "d int, s int, fb int, av int, rv int",
    )
    got = df.select(
        mrp_net_demand(
            F.col("d"), F.col("s"), F.col("fb"), F.col("av"), F.col("rv")
        ).alias("nd")
    ).collect()
    assert [r.nd for r in got] == [c[5] for c in cases]
