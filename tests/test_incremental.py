"""Incremental rollup maintenance (operators/incremental.py): adding a day
must cost one partition's aggregation, converge to the full recompute, and
be idempotent under retries."""

from __future__ import annotations

from pyspark.sql import functions as F

from procurement_data_pipeline_spark.operators.incremental import (
    incremental_refresh,
    verify_incremental,
)
from procurement_data_pipeline_spark.sources.tables import load_table


def _daily_rollup(orders):
    return orders.groupBy(
        F.col("o_orderdate").cast("date").cast("string").alias("d")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )


def test_incremental_refresh_converges_and_is_idempotent(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "rollup")
    dates = [
        r["d"]
        for r in orders.select(
            F.col("o_orderdate").cast("date").cast("string").alias("d")
        )
        .distinct()
        .orderBy("d")
        .limit(5)
        .collect()
    ]
    backfill, incr = dates[:4], dates[4:]

    # Day-1..4 backfill, then day-5 arrives incrementally.
    incremental_refresh(spark, orders, _daily_rollup, path, "d", backfill, fact_date_col="o_orderdate")
    incremental_refresh(spark, orders, _daily_rollup, path, "d", incr, fact_date_col="o_orderdate")

    # Audit: stored rollup equals a fresh recompute for all loaded dates.
    diff = verify_incremental(spark, orders, _daily_rollup, path, "d", dates)
    assert diff.count() == 0, diff.collect()

    # Retry safety: re-running the last day changes nothing.
    before = sorted(map(tuple, spark.read.parquet(path).collect()))
    incremental_refresh(spark, orders, _daily_rollup, path, "d", incr, fact_date_col="o_orderdate")
    after = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert before == after

    # Isolation: refreshing one day leaves other partitions byte-identical
    # (dynamic overwrite replaces only the partitions present in the write).
    stored_days = {
        r["d"]
        for r in spark.read.parquet(path)
        .select(F.col("d").cast("string"))
        .distinct()
        .collect()
    }
    assert stored_days == set(dates)


def test_verify_incremental_catches_drift(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "rollup")
    dates = [
        r["d"]
        for r in orders.select(
            F.col("o_orderdate").cast("date").cast("string").alias("d")
        )
        .distinct()
        .orderBy("d")
        .limit(2)
        .collect()
    ]
    incremental_refresh(spark, orders, _daily_rollup, path, "d", dates, fact_date_col="o_orderdate")

    # Corrupt the stored rollup by rewriting one partition from a doctored
    # aggregation — the audit must flag exactly that partition.
    def _wrong(orders_df):
        return _daily_rollup(orders_df).withColumn(
            "n_orders", F.col("n_orders") + 1
        )

    incremental_refresh(spark, orders, _wrong, path, "d", dates[:1], fact_date_col="o_orderdate")
    diff = verify_incremental(spark, orders, _daily_rollup, path, "d", dates)
    rows = diff.collect()
    assert rows, "audit missed the corrupted partition"
    assert {r["d"] for r in rows} == {dates[0]}
    assert {r["_side"] for r in rows} == {"missing_from_rollup", "extra_in_rollup"}


def test_refresh_drops_partition_when_facts_vanish(spark, sf_dir, tmp_path):
    """A refreshed date whose facts no longer exist must lose its rollup
    partition (dynamic overwrite alone would silently keep it stale)."""
    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "rollup")
    dates = [
        r["d"]
        for r in orders.select(
            F.col("o_orderdate").cast("date").cast("string").alias("d")
        )
        .distinct()
        .orderBy("d")
        .limit(2)
        .collect()
    ]
    incremental_refresh(
        spark, orders, _daily_rollup, path, "d", dates, fact_date_col="o_orderdate"
    )
    # Roll back day 0: refresh it against a fact table where it is absent.
    remaining = orders.filter(
        F.col("o_orderdate").cast("date").cast("string") != dates[0]
    )
    incremental_refresh(
        spark, remaining, _daily_rollup, path, "d", dates[:1],
        fact_date_col="o_orderdate",
    )
    stored = {
        r["d"]
        for r in spark.read.parquet(path)
        .select(F.col("d").cast("string"))
        .distinct()
        .collect()
    }
    assert stored == {dates[1]}
    assert (
        verify_incremental(
            spark, remaining, _daily_rollup, path, "d", dates,
            fact_date_col="o_orderdate",
        ).count()
        == 0
    )
