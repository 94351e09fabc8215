"""Data-quality anti-join checks (reference parity: procurement_dag.py:153-194).

The reference expresses both checks as ``LEFT JOIN … WHERE right IS NULL``;
the Spark-native form is ``left_anti``, which the planner executes as a
broadcast/hash anti-join without materializing the null-padded rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def orphan_products(orders: DataFrame, product_suppliers: DataFrame) -> DataFrame:
    """Ordered products with no supplier mapping → (product_id, order_count).

    Reference procurement_dag.py:161-169 (exception type
    MISSING_SUPPLIER_MAPPING, severity HIGH).
    """
    return (
        orders.join(
            product_suppliers.select("product_id").distinct(), "product_id", "left_anti"
        )
        .groupBy("product_id")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def missing_inventory(
    orders: DataFrame, inventory: DataFrame, snapshot_date: str
) -> DataFrame:
    """Ordered products with no inventory snapshot on the date → distinct ids.

    Reference procurement_dag.py:172-179 (MISSING_INVENTORY, MEDIUM).
    """
    inv = inventory.filter(
        F.col("snapshot_date") == F.lit(snapshot_date).cast("date")
    ).select("product_id")
    return orders.select("product_id").join(inv, "product_id", "left_anti").distinct()


def exceptions_report(
    orders: DataFrame,
    product_suppliers: DataFrame,
    inventory: DataFrame,
    snapshot_date: str,
) -> DataFrame:
    """Severity-tagged exception records, one row per offending product.

    Union of both checks in the reference's record shape
    (procurement_dag.py:169,179).
    """
    orphans = orphan_products(orders, product_suppliers).select(
        F.lit("MISSING_SUPPLIER_MAPPING").alias("type"),
        F.lit("HIGH").alias("severity"),
        "product_id",
    )
    missing = missing_inventory(orders, inventory, snapshot_date).select(
        F.lit("MISSING_INVENTORY").alias("type"),
        F.lit("MEDIUM").alias("severity"),
        "product_id",
    )
    return orphans.unionByName(missing)
