"""Daily order aggregation (reference parity: docker/dags/sql/aggregate_orders.sql:6-14).

``SUM(quantity)`` + ``COUNT(DISTINCT order_id)`` grouped by product and day.
A single hash-aggregate with map-side partial aggregation; the date predicate
sits directly on the (partition) date column so a date-partitioned layout
prunes at the source.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def aggregate_orders(
    orders: DataFrame,
    date_from: str | None = None,
    date_to: str | None = None,
) -> DataFrame:
    """orders(order_id, product_id, quantity, order_date) → daily demand."""
    df = orders
    if date_from is not None:
        df = df.filter(F.col("order_date") >= F.lit(date_from).cast("date"))
    if date_to is not None:
        df = df.filter(F.col("order_date") < F.lit(date_to).cast("date"))
    return df.groupBy("product_id", "order_date").agg(
        F.sum("quantity").cast("int").alias("total_quantity"),
        F.countDistinct("order_id").cast("int").alias("order_count"),
    )


def demand_window(
    orders: DataFrame,
    date_from: str,
    date_to: str,
    include_order_count: bool = True,
) -> DataFrame:
    """Window-total demand per product (the net-demand chain's first CTE,

    reference docker/dags/sql/net_demand.sql:4-12 with a range instead of a
    single-day equality — same partition-pruning shape).

    ``include_order_count=False`` drops the ``COUNT(DISTINCT order_id)``
    column. The reference CTE declares it (net_demand.sql:8) but nothing
    downstream reads it (only total_ordered is joined, net_demand.sql:50-54).
    Catalyst's column pruning does elide the unused distinct in the chain
    queries today (verified by plan diff — pruning runs before
    RewriteDistinctAggregates); the flag makes that contract explicit in
    the logical plan instead of leaning on optimizer behavior, and protects
    any future consumer that projects the aggregate through an
    optimization barrier. Callers that materialize the daily table keep
    the default.
    """
    df = orders.filter(
        (F.col("order_date") >= F.lit(date_from).cast("date"))
        & (F.col("order_date") < F.lit(date_to).cast("date"))
    )
    aggs = [F.sum("quantity").cast("int").alias("total_demand")]
    if include_order_count:
        aggs.append(F.countDistinct("order_id").cast("int").alias("order_count"))
    return df.groupBy("product_id").agg(*aggs)


def zero_if_null(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c, F.lit(0))
