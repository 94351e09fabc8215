"""Declared queries: survival analysis over order fulfillment.

orders_kaplan_meier — the Kaplan-Meier estimator applied to operational
lifetimes: "how long until an order is fully shipped", by priority class,
with right-censoring at a fixed horizon. This is the correct statistical
treatment of in-flight orders — a plain average of completed lifetimes
systematically UNDERSTATES lead time because slow orders are still open
(survivorship bias); KM counts them in every risk set they survive.

Exactness contract (new primitive: the ORDERED-FOLD product): the
survival curve is a cumulative product Π(1 − dᵢ/nᵢ), and floating-point
multiplication is order-dependent, so both engines fold the SAME factors
in the SAME order — Spark: ``F.aggregate`` over a frame-ordered windowed
``collect_list``; DuckDB: ``list_reduce`` over a frame-ordered windowed
``list`` — making the left-fold sequence, and therefore every IEEE
rounding step, bit-identical. Counts (risk set, events, censored) are
exact integers from one grouped pass + a cumulative window.

Scale shape: one orders⋈lineitem aggregation (the max-shipdate per order
— shuffle on orderkey), one small grouped count per (priority, week),
then window math over ≤ horizon/7 rows per group. The fold runs over
per-group interval lists bounded by the horizon, never over raw orders.

Registers past the graded first-50 prefix (GRADE_OVERFLOW in
__spark_entry__.py); tools/check_oracle.py hash-checks it at sf0.01.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from procurement_data_pipeline_spark.registry import register
from procurement_data_pipeline_spark.sources.tables import load_table

_HORIZON_DAYS = 120  # right-censor beyond this
_WEEK = 7


@register(
    "orders_kaplan_meier",
    oracle=f"""
WITH lt AS (
  SELECT o.o_orderkey, o.o_orderpriority AS priority,
         date_diff('day', CAST(o.o_orderdate AS DATE),
                   CAST(MAX(l.l_shipdate) AS DATE)) AS t_days
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate
),
obs AS (
  -- GREATEST(...,0): the synthetic data has ship dates before order
  -- dates; clamp to "completed immediately". FLOOR, not CAST: DuckDB's
  -- int cast ROUNDS, Spark's truncates.
  SELECT priority,
         CAST(FLOOR(LEAST(GREATEST(t_days, 0), {_HORIZON_DAYS}) / {_WEEK}.0)
              AS BIGINT) AS week,
         CASE WHEN t_days <= {_HORIZON_DAYS} THEN 1 ELSE 0 END AS ev
  FROM lt
),
grp AS (
  SELECT priority, week,
         CAST(SUM(ev) AS BIGINT) AS d_events,
         CAST(SUM(1 - ev) AS BIGINT) AS c_censored
  FROM obs GROUP BY priority, week
),
risk AS (
  SELECT priority, week, d_events, c_censored,
         SUM(d_events + c_censored)
           OVER (PARTITION BY priority)
         - COALESCE(SUM(d_events + c_censored)
           OVER (PARTITION BY priority ORDER BY week
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS n_risk
  FROM grp
),
f AS (
  SELECT *,
         1.0 - CAST(d_events AS DOUBLE) / CAST(n_risk AS DOUBLE) AS factor
  FROM risk
)
SELECT priority, week, CAST(n_risk AS BIGINT) AS n_risk, d_events, c_censored,
       CAST(d_events AS DOUBLE) / CAST(n_risk AS DOUBLE) AS hazard,
       list_reduce(
         list(factor) OVER (PARTITION BY priority ORDER BY week
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         (a, b) -> a * b) AS survival
FROM f
""",
    tags=("orders", "survival", "lifecycle"),
)
def q_orders_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    lt = (
        li.groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("ship_done"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.datediff(
                F.col("ship_done").cast("date"), F.col("o_orderdate").cast("date")
            ).alias("t_days"),
        )
    )
    obs = lt.select(
        "priority",
        F.floor(
            F.least(F.greatest(F.col("t_days"), F.lit(0)), F.lit(_HORIZON_DAYS))
            / float(_WEEK)
        )
        .cast("long")
        .alias("week"),
        F.when(F.col("t_days") <= _HORIZON_DAYS, 1).otherwise(0).alias("ev"),
    )
    grp = obs.groupBy("priority", "week").agg(
        F.sum("ev").cast("long").alias("d_events"),
        F.sum(1 - F.col("ev")).cast("long").alias("c_censored"),
    )
    total_w = Window.partitionBy("priority")
    prior_w = (
        Window.partitionBy("priority")
        .orderBy("week")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    leaving = F.col("d_events") + F.col("c_censored")
    risk = grp.withColumn(
        "n_risk",
        (
            F.sum(leaving).over(total_w)
            - F.coalesce(F.sum(leaving).over(prior_w), F.lit(0))
        ).cast("long"),
    )
    factor = F.lit(1.0) - F.col("d_events").cast("double") / F.col("n_risk").cast(
        "double"
    )
    fold_w = (
        Window.partitionBy("priority")
        .orderBy("week")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return risk.withColumn("factor", factor).select(
        "priority",
        "week",
        "n_risk",
        "d_events",
        "c_censored",
        (F.col("d_events").cast("double") / F.col("n_risk").cast("double")).alias(
            "hazard"
        ),
        F.aggregate(
            F.collect_list("factor").over(fold_w),
            F.lit(1.0),
            lambda acc, x: acc * x,
        ).alias("survival"),
    )


@register(
    "orders_nelson_aalen",
    # Nelson–Aalen cumulative hazard H(t) = Σ dᵢ/nᵢ — the additive twin of
    # Kaplan-Meier's multiplicative survival curve, and the estimator the
    # hazard-modeling path (proportional-hazards fitting) actually
    # consumes. Same exactness contract as orders_kaplan_meier: exact
    # integer risk sets, then the double SUM as an ORDERED FOLD so both
    # engines add the per-interval hazards in the identical sequence. The
    # Breslow variance proxy Σ dᵢ/nᵢ² rides the same fold.
    oracle=f"""
WITH lt AS (
  SELECT o.o_orderkey, o.o_orderpriority AS priority,
         date_diff('day', CAST(o.o_orderdate AS DATE),
                   CAST(MAX(l.l_shipdate) AS DATE)) AS t_days
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate
),
obs AS (
  SELECT priority,
         CAST(FLOOR(LEAST(GREATEST(t_days, 0), {_HORIZON_DAYS}) / {_WEEK}.0)
              AS BIGINT) AS week,
         CASE WHEN t_days <= {_HORIZON_DAYS} THEN 1 ELSE 0 END AS ev
  FROM lt
),
grp AS (
  SELECT priority, week,
         CAST(SUM(ev) AS BIGINT) AS d_events,
         CAST(SUM(1 - ev) AS BIGINT) AS c_censored
  FROM obs GROUP BY priority, week
),
risk AS (
  SELECT priority, week, d_events, c_censored,
         SUM(d_events + c_censored)
           OVER (PARTITION BY priority)
         - COALESCE(SUM(d_events + c_censored)
           OVER (PARTITION BY priority ORDER BY week
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS n_risk
  FROM grp
),
f AS (
  SELECT *,
         CAST(d_events AS DOUBLE) / CAST(n_risk AS DOUBLE) AS hz,
         CAST(d_events AS DOUBLE)
           / (CAST(n_risk AS DOUBLE) * CAST(n_risk AS DOUBLE)) AS hv
  FROM risk
)
SELECT priority, week, CAST(n_risk AS BIGINT) AS n_risk, d_events, c_censored,
       list_reduce(
         list(hz) OVER (PARTITION BY priority ORDER BY week
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         (a, b) -> a + b) AS cum_hazard,
       list_reduce(
         list(hv) OVER (PARTITION BY priority ORDER BY week
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         (a, b) -> a + b) AS var_breslow
FROM f
""",
    tags=("orders", "survival", "lifecycle"),
)
def q_orders_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Identical plan shape to orders_kaplan_meier (one orderkey shuffle,
    one small grouped count, horizon-bounded window math); only the fold's
    operator changes (+ instead of ×), so scale properties carry over."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    lt = (
        li.groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("ship_done"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.datediff(
                F.col("ship_done").cast("date"), F.col("o_orderdate").cast("date")
            ).alias("t_days"),
        )
    )
    obs = lt.select(
        "priority",
        F.floor(
            F.least(F.greatest(F.col("t_days"), F.lit(0)), F.lit(_HORIZON_DAYS))
            / float(_WEEK)
        )
        .cast("long")
        .alias("week"),
        F.when(F.col("t_days") <= _HORIZON_DAYS, 1).otherwise(0).alias("ev"),
    )
    grp = obs.groupBy("priority", "week").agg(
        F.sum("ev").cast("long").alias("d_events"),
        F.sum(1 - F.col("ev")).cast("long").alias("c_censored"),
    )
    total_w = Window.partitionBy("priority")
    prior_w = (
        Window.partitionBy("priority")
        .orderBy("week")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    leaving = F.col("d_events") + F.col("c_censored")
    risk = grp.withColumn(
        "n_risk",
        (
            F.sum(leaving).over(total_w)
            - F.coalesce(F.sum(leaving).over(prior_w), F.lit(0))
        ).cast("long"),
    )
    nd = F.col("n_risk").cast("double")
    hz = F.col("d_events").cast("double") / nd
    hv = F.col("d_events").cast("double") / (nd * nd)
    fold_w = (
        Window.partitionBy("priority")
        .orderBy("week")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return risk.withColumn("hz", hz).withColumn("hv", hv).select(
        "priority",
        "week",
        "n_risk",
        "d_events",
        "c_censored",
        F.aggregate(
            F.collect_list("hz").over(fold_w),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("cum_hazard"),
        F.aggregate(
            F.collect_list("hv").over(fold_w),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("var_breslow"),
    )
