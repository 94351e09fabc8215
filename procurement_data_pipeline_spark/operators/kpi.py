"""Dashboard KPI queries (reference parity: metabase_setup_dag.py:237-313).

Five latest-partition KPI shapes over the derived tables: total demand scalar,
demand by product, demand by supplier, order-status breakdown, total
estimated cost. The latest-partition selection is the reference's scalar
subquery ``WHERE d = (SELECT MAX(d) …)`` — expressed the same way here via a
join against the 1-row max-date aggregate (Catalyst executes it as a
broadcast semi-join; no driver round-trip)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _latest(df: DataFrame, date_col: str) -> DataFrame:
    latest = df.agg(F.max(date_col).alias(date_col))
    return df.join(F.broadcast(latest), date_col)


def total_net_demand(net_demand: DataFrame) -> DataFrame:
    """KPI 1 — scalar total demand on the latest calculation_date."""
    return _latest(net_demand, "calculation_date").agg(
        F.sum("net_demand").cast("bigint").alias("total_net_demand")
    )


def demand_by_product(net_demand: DataFrame) -> DataFrame:
    """KPI 2 — per-product demand, highest first."""
    return (
        _latest(net_demand, "calculation_date")
        .groupBy("product_name")
        .agg(F.sum("net_demand").cast("bigint").alias("net_demand"))
        .orderBy(F.col("net_demand").desc(), F.col("product_name").asc())
    )


def demand_by_supplier(net_demand: DataFrame) -> DataFrame:
    """KPI 3 — per-supplier demand, highest first."""
    return (
        _latest(net_demand, "calculation_date")
        .groupBy("supplier_name")
        .agg(F.sum("net_demand").cast("bigint").alias("total_demand"))
        .orderBy(F.col("total_demand").desc(), F.col("supplier_name").asc())
    )


def order_status_breakdown(orders: DataFrame, status_col: str = "status") -> DataFrame:
    """KPI 4 — order count by status on the latest order_date."""
    return (
        _latest(orders, "order_date")
        .groupBy(status_col)
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def total_estimated_cost(net_demand: DataFrame) -> DataFrame:
    """KPI 5 — total procurement cost, pinned to DECIMAL(12,2)

    (reference metabase_setup_dag.py:306)."""
    return _latest(net_demand, "calculation_date").agg(
        F.sum("estimated_cost").cast("decimal(12,2)").alias("total_estimated_cost")
    )
