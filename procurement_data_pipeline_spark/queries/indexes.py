"""Declared query: classical price-index numbers per part brand.

part_price_index_brand — Laspeyres (base-period basket), Paasche
(current-period basket), and Fisher (their geometric mean) price indexes
comparing the pre-1998 base period against the post-1999 current period
over parts traded in BOTH — procurement's inflation readout ("are my
suppliers raising prices faster than volumes shift?"), aggregated to the
brand grain.

Exactness contract: per part-period, value is exact cents and quantity
exact units; the unit price quantizes to integer micro-dollars through
one fixed IEEE chain (``FLOOR(v/q · 10⁴)`` — divide, multiply, floor:
identical in both engines). Index numerators/denominators are then sums
of exact integer products (decimal(38,0) / HUGEINT — never a sum of
doubles), finished by one division each; Fisher is one IEEE multiply +
the correctly-rounded sqrt (same class as part_eoq).

Scale shape: one lineitem scan → part×period aggregate → self-pair on
partkey → broadcast part dim → brand-grain brand rollup. No windows, no
driver loops; the pair join is part-grain, not fact-grain.

Registers past the graded first-50 prefix (GRADE_OVERFLOW in
__spark_entry__.py); tools/check_oracle.py hash-checks it at sf0.01.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from procurement_data_pipeline_spark.registry import register
from procurement_data_pipeline_spark.sources.tables import load_table

_BASE_END = "1998-01-01"
_CURR_START = "1999-01-01"


@register(
    "part_price_index_brand",
    oracle=f"""
WITH pp AS (
  SELECT l_partkey AS partkey,
         CASE WHEN l_shipdate < DATE '{_BASE_END}' THEN 0 ELSE 1 END AS period,
         SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS v_cents,
         SUM(CAST(l_quantity AS BIGINT)) AS q
  FROM lineitem
  WHERE l_shipdate < DATE '{_BASE_END}' OR l_shipdate >= DATE '{_CURR_START}'
  GROUP BY 1, 2
),
priced AS (
  SELECT partkey, period, q,
         CAST(FLOOR(CAST(v_cents AS DOUBLE) / CAST(q AS DOUBLE) * 10000.0)
              AS BIGINT) AS p_micro
  FROM pp
),
paired AS (
  SELECT b.partkey, b.q AS q0, c.q AS q1, b.p_micro AS p0, c.p_micro AS p1
  FROM priced b JOIN priced c
    ON c.partkey = b.partkey AND b.period = 0 AND c.period = 1
),
g AS (
  SELECT p.p_brand AS brand, COUNT(*) AS n_parts,
         SUM(CAST(p1 AS HUGEINT) * q0) AS l_num,
         SUM(CAST(p0 AS HUGEINT) * q0) AS l_den,
         SUM(CAST(p1 AS HUGEINT) * q1) AS p_num,
         SUM(CAST(p0 AS HUGEINT) * q1) AS p_den
  FROM paired JOIN part p ON p.p_partkey = paired.partkey
  GROUP BY 1
)
SELECT brand, CAST(n_parts AS BIGINT) AS n_parts,
       CAST(l_num AS DOUBLE) / CAST(l_den AS DOUBLE) AS laspeyres,
       CAST(p_num AS DOUBLE) / CAST(p_den AS DOUBLE) AS paasche,
       sqrt((CAST(l_num AS DOUBLE) / CAST(l_den AS DOUBLE))
            * (CAST(p_num AS DOUBLE) / CAST(p_den AS DOUBLE))) AS fisher
FROM g
""",
    tags=("part", "pricing", "index"),
)
def q_part_price_index_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    ship = F.col("l_shipdate").cast("date")
    pp = (
        li.filter(
            (ship < F.lit(_BASE_END).cast("date"))
            | (ship >= F.lit(_CURR_START).cast("date"))
        )
        .groupBy(
            F.col("l_partkey").alias("partkey"),
            F.when(ship < F.lit(_BASE_END).cast("date"), 0)
            .otherwise(1)
            .alias("period"),
        )
        .agg(
            F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long")).alias(
                "v_cents"
            ),
            F.sum(F.col("l_quantity").cast("long")).alias("q"),
        )
    )
    priced = pp.select(
        "partkey",
        "period",
        "q",
        F.floor(
            F.col("v_cents").cast("double") / F.col("q").cast("double") * 10000.0
        )
        .cast("long")
        .alias("p_micro"),
    )
    b = priced.filter("period = 0").select(
        "partkey", F.col("q").alias("q0"), F.col("p_micro").alias("p0")
    )
    c = priced.filter("period = 1").select(
        "partkey", F.col("q").alias("q1"), F.col("p_micro").alias("p1")
    )
    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    g = (
        b.join(c, "partkey")
        .join(
            F.broadcast(
                part.select(F.col("p_partkey").alias("partkey"), F.col("p_brand"))
            ),
            "partkey",
        )
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum(dec(F.col("p1")) * dec(F.col("q0"))).alias("l_num"),
            F.sum(dec(F.col("p0")) * dec(F.col("q0"))).alias("l_den"),
            F.sum(dec(F.col("p1")) * dec(F.col("q1"))).alias("p_num"),
            F.sum(dec(F.col("p0")) * dec(F.col("q1"))).alias("p_den"),
        )
    )
    lasp = F.col("l_num").cast("double") / F.col("l_den").cast("double")
    paas = F.col("p_num").cast("double") / F.col("p_den").cast("double")
    return g.select(
        "brand",
        "n_parts",
        lasp.alias("laspeyres"),
        paas.alias("paasche"),
        F.sqrt(lasp * paas).alias("fisher"),
    )


@register(
    "orders_ar_aging",
    # Accounts-receivable aging — the finance month-end staple: open
    # (non-'F') orders bucketed by days outstanding at the reference date
    # (the day after the latest order — a deterministic data-derived
    # as-of, like orders_open_backlog_daily's horizon). Exact: day diffs
    # are integers, amounts exact cents, the share one division. The
    # 1-row reference date broadcasts; everything else is one scan + one
    # bucket-grain aggregate.
    oracle="""
WITH ref AS (SELECT MAX(CAST(o_orderdate AS DATE)) + 1 AS as_of FROM orders),
aged AS (
  SELECT CASE WHEN d <= 30 THEN '0-30'
              WHEN d <= 60 THEN '31-60'
              WHEN d <= 90 THEN '61-90'
              ELSE '90+' END AS bucket,
         cents
  FROM (
    SELECT ref.as_of - CAST(o.o_orderdate AS DATE) AS d,
           CAST(FLOOR(o.o_totalprice * 100) AS BIGINT) AS cents
    FROM orders o, ref
    WHERE o.o_orderstatus <> 'F'
  )
),
tot AS (SELECT SUM(cents) AS t FROM aged)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS open_cents,
       CAST(SUM(cents) AS DOUBLE) / CAST(tot.t AS DOUBLE) AS share
FROM aged, tot
GROUP BY bucket, tot.t
""",
    tags=("orders", "finance", "aging"),
)
def q_orders_ar_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    open_o = o.filter(F.col("o_orderstatus") != "F").select(
        F.col("o_orderdate").cast("date").alias("od"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    as_of = o.agg(
        F.date_add(F.max(F.col("o_orderdate").cast("date")), 1).alias("as_of")
    )
    aged = open_o.join(F.broadcast(as_of)).select(
        F.when(F.datediff("as_of", "od") <= 30, "0-30")
        .when(F.datediff("as_of", "od") <= 60, "31-60")
        .when(F.datediff("as_of", "od") <= 90, "61-90")
        .otherwise("90+")
        .alias("bucket"),
        "cents",
    )
    tot = aged.agg(F.sum("cents").alias("t"))
    return (
        aged.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("open_cents"),
        )
        .join(F.broadcast(tot))
        .select(
            "bucket",
            "n_orders",
            "open_cents",
            (F.col("open_cents").cast("double") / F.col("t").cast("double")).alias(
                "share"
            ),
        )
    )
