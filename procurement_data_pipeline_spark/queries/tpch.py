"""TPC-H-shaped analytical queries over the driver tables.

These exercise the heavy relational paths (wide aggregation, multi-way join
with broadcast dims, top-k) and are the benchmark headline set.

Money math is done in exact integer cents / basis points: Spark and DuckDB
round double→decimal casts differently at half-way points, but
FLOOR(x*100)→BIGINT, pure integer products, and a single IEEE division for
presentation are bit-identical across engines, so the oracle value-hash is
stable while the aggregation stays order-insensitive.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from procurement_data_pipeline_spark.registry import register
from procurement_data_pipeline_spark.sources.tables import load_table


def cents(col: str | Column) -> Column:
    """Exact integer cents for a dollars-valued double column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * 100).cast("long")


def basis_points(col: str | Column) -> Column:
    """Exact integer basis points for a rate-valued double column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * 10000).cast("long")


def _disc_price_cents() -> Column:
    """(extendedprice * (1 - discount)) in integer cents."""
    prod = cents("l_extendedprice") * (F.lit(10000) - basis_points("l_discount"))
    return F.floor(prod / F.lit(10000.0)).cast("long")


def _charge_cents() -> Column:
    """(extendedprice * (1 - discount) * (1 + tax)) in integer cents."""
    prod = (
        cents("l_extendedprice")
        * (F.lit(10000) - basis_points("l_discount"))
        * (F.lit(10000) + basis_points("l_tax"))
    )
    return F.floor(prod / F.lit(100000000.0)).cast("long")


def dollars(c: Column) -> Column:
    return c.cast("double") / F.lit(100.0)


_REVENUE_SQL = (
    "CAST(FLOOR(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)"
    " * (10000 - CAST(FLOOR(l_discount * 10000) AS BIGINT)) / 10000.0) AS BIGINT)"
)


@register(
    "tpch_q1_pricing_summary",
    oracle="""
WITH li AS (
  SELECT l_returnflag, l_linestatus,
         CAST(l_quantity AS BIGINT) AS qty,
         CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS ext_cents,
         CAST(FLOOR(l_discount * 10000) AS BIGINT) AS disc_bp,
         CAST(FLOOR(l_tax * 10000) AS BIGINT) AS tax_bp
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
),
ext AS (
  SELECT *,
         CAST(FLOOR(ext_cents * (10000 - disc_bp) / 10000.0) AS BIGINT) AS disc_price_cents,
         CAST(FLOOR(ext_cents * (10000 - disc_bp) * (10000 + tax_bp) / 100000000.0) AS BIGINT) AS charge_cents
  FROM li
)
SELECT l_returnflag, l_linestatus,
       CAST(SUM(qty) AS BIGINT) AS sum_qty,
       CAST(SUM(ext_cents) AS DOUBLE) / 100.0 AS sum_base_price,
       CAST(SUM(disc_price_cents) AS DOUBLE) / 100.0 AS sum_disc_price,
       CAST(SUM(charge_cents) AS DOUBLE) / 100.0 AS sum_charge,
       CAST(SUM(qty) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(ext_cents) AS DOUBLE) / COUNT(*) / 100.0 AS avg_price,
       CAST(SUM(disc_bp) AS DOUBLE) / COUNT(*) / 10000.0 AS avg_disc,
       COUNT(*) AS count_order
FROM ext
GROUP BY l_returnflag, l_linestatus
""",
    tags=("analytics", "A1", "A5"),
    bench=True,
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report — single wide hash aggregate over the fact
    table; partial aggregation map-side, one shuffle of ~6 groups."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    li = li.select(
        "l_returnflag",
        "l_linestatus",
        F.col("l_quantity").cast("long").alias("qty"),
        cents("l_extendedprice").alias("ext_cents"),
        basis_points("l_discount").alias("disc_bp"),
        _disc_price_cents().alias("disc_price_cents"),
        _charge_cents().alias("charge_cents"),
    )
    n = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("qty").cast("long").alias("sum_qty"),
        dollars(F.sum("ext_cents")).alias("sum_base_price"),
        dollars(F.sum("disc_price_cents")).alias("sum_disc_price"),
        dollars(F.sum("charge_cents")).alias("sum_charge"),
        (F.sum("qty").cast("double") / n).alias("avg_qty"),
        (F.sum("ext_cents").cast("double") / n / F.lit(100.0)).alias("avg_price"),
        (F.sum("disc_bp").cast("double") / n / F.lit(10000.0)).alias("avg_disc"),
        n.alias("count_order"),
    )


@register(
    "tpch_q3_shipping_priority",
    oracle=f"""
SELECT l.l_orderkey,
       CAST(SUM({_REVENUE_SQL}) AS DOUBLE) / 100.0 AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l.l_orderkey ASC
LIMIT 10
""",
    tags=("analytics", "J4", "O1"),
    bench=True,
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping priority — selective dim filter, fact join, top-10.

    The customer side is small after the segment filter → broadcast; the
    order-by-limit is a TakeOrderedAndProject, no global sort."""
    customer, orders, li = (
        load_table(spark, sf_dir, t) for t in ("customer", "orders", "lineitem")
    )
    return (
        li.filter(F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp"))
        .join(
            orders.filter(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(customer.filter(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dollars(F.sum(_disc_price_cents())).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@register(
    "tpch_q5_local_supplier_revenue",
    oracle=f"""
SELECT n.n_name,
       CAST(SUM({_REVENUE_SQL}) AS DOUBLE) / 100.0 AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n.n_name
ORDER BY revenue DESC, n.n_name ASC
""",
    tags=("analytics", "J4", "J7", "A8"),
    bench=True,
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-supplier revenue — 6-way join; region/nation/supplier/customer
    are broadcast dims, lineitem⋈orders is the only shuffle join."""
    customer, orders, li, supplier, nation, region = (
        load_table(spark, sf_dir, t)
        for t in ("customer", "orders", "lineitem", "supplier", "nation", "region")
    )
    asia_nations = nation.join(
        F.broadcast(region.filter(F.col("r_name") == "ASIA")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    return (
        li.join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(customer),
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(asia_nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(dollars(F.sum(_disc_price_cents())).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


@register(
    "scalar_subquery_latest_orders",
    oracle="""
SELECT COUNT(*) AS order_count,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_price
FROM orders
WHERE o_orderdate >= (SELECT MAX(o_orderdate) FROM orders) - INTERVAL 30 DAY
""",
    tags=("analytics", "A5", "A6"),
)
def q_scalar_subquery_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global aggregate over a latest-window scalar subquery — the
    reference's latest-partition KPI shape (metabase_setup_dag.py:246-249)
    on the raw orders table."""
    orders = load_table(spark, sf_dir, "orders")
    latest = orders.agg(
        (F.max("o_orderdate") - F.expr("INTERVAL 30 DAY")).alias("cutoff")
    )
    return (
        orders.join(F.broadcast(latest))
        .filter(F.col("o_orderdate") >= F.col("cutoff"))
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            dollars(F.sum(cents("o_totalprice"))).alias("total_price"),
        )
    )
