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


_LOGRANK_G1 = "1-URGENT"
_LOGRANK_G2 = "5-LOW"


@register(
    "orders_logrank",
    # Log-rank test between two priority classes' fulfillment curves —
    # the standard "are these two survival curves different" statistic
    # (Mantel-Cox), and the inferential companion to orders_kaplan_meier's
    # descriptive curves. At each event week: observed group-1 events vs
    # the hypergeometric expectation d·n₁/n, variance
    # d·(n₁/n)·(1−n₁/n)·(n−d)/(n−1). Risk sets are exact integers (the KM
    # suffix-sum trick); the three across-week sums are ORDERED FOLDS
    # (week ascending) so both engines accumulate the identical IEEE
    # sequence; z = (O−E)/√V with a correctly-rounded sqrt.
    oracle=f"""
WITH lt AS (
  SELECT o.o_orderkey, o.o_orderpriority AS priority,
         date_diff('day', CAST(o.o_orderdate AS DATE),
                   CAST(MAX(l.l_shipdate) AS DATE)) AS t_days
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderpriority = '{_LOGRANK_G1}'
     OR o.o_orderpriority = '{_LOGRANK_G2}'
  GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate
),
obs AS (
  SELECT CASE WHEN priority = '{_LOGRANK_G1}' THEN 1 ELSE 0 END AS g1,
         CAST(FLOOR(LEAST(GREATEST(t_days, 0), {_HORIZON_DAYS}) / {_WEEK}.0)
              AS BIGINT) AS week,
         CASE WHEN t_days <= {_HORIZON_DAYS} THEN 1 ELSE 0 END AS ev
  FROM lt
),
grp AS (
  SELECT week,
         CAST(SUM(CASE WHEN g1 = 1 THEN ev ELSE 0 END) AS BIGINT) AS d1,
         CAST(SUM(ev) AS BIGINT) AS d,
         CAST(SUM(g1) AS BIGINT) AS l1,
         CAST(COUNT(*) AS BIGINT) AS l
  FROM obs GROUP BY week
),
risk AS (
  SELECT week, d1, d,
         CAST(SUM(l1) OVER () - COALESCE(SUM(l1) OVER (ORDER BY week
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS n1,
         CAST(SUM(l) OVER () - COALESCE(SUM(l) OVER (ORDER BY week
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS n
  FROM grp
),
terms AS (
  SELECT week, d1,
         CAST(d AS DOUBLE) * n1 / n AS e1,
         CASE WHEN n > 1 THEN
           CAST(d AS DOUBLE) * (CAST(n1 AS DOUBLE) / n)
             * (1 - CAST(n1 AS DOUBLE) / n)
             * (CAST(n - d AS DOUBLE) / (n - 1))
         ELSE 0.0 END AS v
  FROM risk WHERE d > 0
)
SELECT CAST(SUM(d1) AS BIGINT) AS o1,
       list_reduce(list(e1 ORDER BY week), (a, b) -> a + b) AS e1,
       list_reduce(list(v ORDER BY week), (a, b) -> a + b) AS var_lr,
       (SUM(d1) - list_reduce(list(e1 ORDER BY week), (a, b) -> a + b))
         / sqrt(list_reduce(list(v ORDER BY week), (a, b) -> a + b)) AS z
FROM terms
""",
    tags=("orders", "survival", "statistics"),
)
def q_orders_logrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same one-shuffle plan as Kaplan-Meier, then horizon-bounded window
    math and a 1-row fold: survival INFERENCE at the cost of the curves."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    lt = (
        li.groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("ship_done"))
        .join(
            o.where(
                (F.col("o_orderpriority") == _LOGRANK_G1)
                | (F.col("o_orderpriority") == _LOGRANK_G2)
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            F.when(F.col("o_orderpriority") == _LOGRANK_G1, 1)
            .otherwise(0)
            .alias("g1"),
            F.datediff(
                F.col("ship_done").cast("date"), F.col("o_orderdate").cast("date")
            ).alias("t_days"),
        )
    )
    obs = lt.select(
        "g1",
        F.floor(
            F.least(F.greatest(F.col("t_days"), F.lit(0)), F.lit(_HORIZON_DAYS))
            / float(_WEEK)
        )
        .cast("long")
        .alias("week"),
        F.when(F.col("t_days") <= _HORIZON_DAYS, 1).otherwise(0).alias("ev"),
    )
    grp = obs.groupBy("week").agg(
        F.sum(F.when(F.col("g1") == 1, F.col("ev")).otherwise(0))
        .cast("long")
        .alias("d1"),
        F.sum("ev").cast("long").alias("d"),
        F.sum("g1").cast("long").alias("l1"),
        F.count(F.lit(1)).cast("long").alias("l"),
    )
    total_w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    prior_w = Window.orderBy("week").rowsBetween(Window.unboundedPreceding, -1)
    risk = grp.select(
        "week",
        "d1",
        "d",
        (
            F.sum("l1").over(total_w)
            - F.coalesce(F.sum("l1").over(prior_w), F.lit(0))
        )
        .cast("long")
        .alias("n1"),
        (
            F.sum("l").over(total_w)
            - F.coalesce(F.sum("l").over(prior_w), F.lit(0))
        )
        .cast("long")
        .alias("n"),
    )
    n1d = F.col("n1").cast("double")
    nd = F.col("n")
    e1 = F.col("d").cast("double") * F.col("n1") / nd
    v = F.when(
        nd > 1,
        F.col("d").cast("double")
        * (n1d / nd)
        * (1 - n1d / nd)
        * ((nd - F.col("d")).cast("double") / (nd - 1)),
    ).otherwise(F.lit(0.0))
    terms = risk.where(F.col("d") > 0).select(
        "week", "d1", e1.alias("e1"), v.alias("v")
    )
    fold = lambda col: F.aggregate(  # noqa: E731
        F.array_sort(F.collect_list(F.struct(F.col("week"), F.col(col).alias("x")))),
        F.lit(0.0),
        lambda acc, s: acc + s["x"],
    )
    agg = terms.agg(
        F.sum("d1").cast("long").alias("o1"),
        fold("e1").alias("e1"),
        fold("v").alias("var_lr"),
    )
    return agg.select(
        "o1",
        "e1",
        "var_lr",
        ((F.col("o1") - F.col("e1")) / F.sqrt(F.col("var_lr"))).alias("z"),
    )


_W_MAX = _HORIZON_DAYS // _WEEK  # last week index on the censoring grid


@register(
    "orders_rmst",
    # Restricted mean survival time per priority class: the single-number
    # summary of the KM curve a planning review actually quotes ("urgent
    # orders take 3.1 weeks on average, capped at the horizon"). On the
    # weekly grid, RMST = Σ_{w=0..W} S(w) = E[#weeks survived within the
    # horizon] — so it needs the DENSE week grid (weeks with no
    # events/censoring contribute their unchanged S too), built here as a
    # bounded priorities × 18-row cross.
    #
    # Exactness: the running survival product AND its running sum are a
    # COUPLED ordered fold, so both engines fold the same [factor]
    # elements in the same week order with a 2-element DOUBLE-LIST
    # accumulator [S, Σ] (list, not struct: DuckDB's list_reduce
    # mis-evaluates struct accumulators whose field reads another field —
    # see tests/test_replenishment.py::test_duckdb_struct_fold_hazard).
    # Counts are exact integers; factors are one division each; weeks
    # with an empty risk set pin factor = 1.0 identically (KM convention:
    # the curve stays flat once nobody is at risk).
    #
    # Scale shape: identical to orders_kaplan_meier (one orderkey
    # shuffle, then a 5×18-row grid) — the fold runs over 18 elements.
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
grid AS (
  SELECT p.priority, t.w AS week
  FROM (SELECT DISTINCT priority FROM obs) p
  CROSS JOIN range(0, {_W_MAX + 1}) t(w)
),
dense AS (
  SELECT g.priority, g.week,
         COALESCE(gr.d_events, 0) AS d_events,
         COALESCE(gr.c_censored, 0) AS c_censored
  FROM grid g LEFT JOIN grp gr
    ON gr.priority = g.priority AND gr.week = g.week
),
risk AS (
  SELECT priority, week, d_events,
         SUM(d_events + c_censored) OVER (PARTITION BY priority)
         - COALESCE(SUM(d_events + c_censored)
             OVER (PARTITION BY priority ORDER BY week
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS n_risk
  FROM dense
),
f AS (
  SELECT priority, n_risk, week,
         CASE WHEN n_risk = 0 THEN 1.0
              ELSE 1.0 - CAST(d_events AS DOUBLE) / CAST(n_risk AS DOUBLE)
         END AS factor
  FROM risk
),
folded AS (
  SELECT priority,
         CAST(MAX(CASE WHEN week = 0 THEN n_risk END) AS BIGINT) AS n_orders,
         list_reduce(
           list_prepend(CAST([1.0, 0.0] AS DOUBLE[]),
                        list([factor] ORDER BY week)),
           (a, x) -> [a[1] * x[1], a[2] + a[1] * x[1]]
         ) AS acc
  FROM f GROUP BY priority
)
SELECT priority, n_orders,
       acc[2] AS rmst_weeks,
       acc[2] * 7.0 AS rmst_days
FROM folded
""",
    tags=("orders", "survival", "lifecycle"),
)
def q_orders_rmst(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    grid = (
        obs.select("priority")
        .distinct()
        .crossJoin(
            spark.range(0, _W_MAX + 1).select(F.col("id").alias("week"))
        )
    )
    dense = (
        grid.join(grp, ["priority", "week"], "left")
        .na.fill({"d_events": 0, "c_censored": 0})
    )
    total_w = Window.partitionBy("priority")
    prior_w = (
        Window.partitionBy("priority")
        .orderBy("week")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    leaving = F.col("d_events") + F.col("c_censored")
    risk = dense.withColumn(
        "n_risk",
        (
            F.sum(leaving).over(total_w)
            - F.coalesce(F.sum(leaving).over(prior_w), F.lit(0))
        ).cast("long"),
    )
    factor = F.when(F.col("n_risk") == 0, F.lit(1.0)).otherwise(
        F.lit(1.0)
        - F.col("d_events").cast("double") / F.col("n_risk").cast("double")
    )
    folded = (
        risk.withColumn("factor", factor)
        .groupBy("priority")
        .agg(
            F.max(F.when(F.col("week") == 0, F.col("n_risk")))
            .cast("long")
            .alias("n_orders"),
            F.aggregate(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("week", F.col("factor").alias("x")))
                    ),
                    lambda s: s["x"],
                ),
                F.array(F.lit(1.0), F.lit(0.0)),
                lambda a, x: F.array(a[0] * x, a[1] + a[0] * x),
            ).alias("acc"),
        )
    )
    return folded.select(
        "priority",
        "n_orders",
        F.col("acc")[1].alias("rmst_weeks"),
        (F.col("acc")[1] * F.lit(7.0)).alias("rmst_days"),
    )


@register(
    "orders_competing_risks",
    # Aalen-Johansen cumulative incidence under COMPETING events: an
    # order's first completion is either a clean fulfillment or a
    # return-tainted one (any line flagged R), and the two risks compete
    # — naive "1 − KM of returns alone" OVERSTATES return incidence
    # because fulfilled orders can never return later. CIF_k(w) =
    # Σ_{j≤w} S(j−1)·d_kj/n_j with S the all-cause KM survival.
    #
    # Exactness: the three running quantities [S, CIF_ret, CIF_ful] are
    # one coupled ordered fold over [factor, h_ret, h_ful] triples
    # (DOUBLE-LIST accumulator, same frame-ordered windowed list on both
    # engines); every hazard is one division of exact integers. The
    # conservation identity S + CIF_ret + CIF_ful = 1 holds exactly in
    # exact arithmetic interval-by-interval and is asserted to 1e-12 in
    # tests.
    #
    # Scale shape: one orderkey shuffle (order-level event typing), a
    # small (priority, week) rollup, windows over ≤18 rows per group.
    oracle=f"""
WITH lt AS (
  SELECT o.o_orderkey, o.o_orderpriority AS priority,
         date_diff('day', CAST(o.o_orderdate AS DATE),
                   CAST(MAX(l.l_shipdate) AS DATE)) AS t_days,
         MAX(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS returned
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate
),
obs AS (
  SELECT priority,
         CAST(FLOOR(LEAST(GREATEST(t_days, 0), {_HORIZON_DAYS}) / {_WEEK}.0)
              AS BIGINT) AS week,
         CASE WHEN t_days <= {_HORIZON_DAYS} THEN returned ELSE 0 END AS ev_ret,
         CASE WHEN t_days <= {_HORIZON_DAYS} THEN 1 - returned ELSE 0 END AS ev_ful,
         CASE WHEN t_days <= {_HORIZON_DAYS} THEN 0 ELSE 1 END AS cens
  FROM lt
),
grp AS (
  SELECT priority, week,
         CAST(SUM(ev_ret) AS BIGINT) AS d_ret,
         CAST(SUM(ev_ful) AS BIGINT) AS d_ful,
         CAST(SUM(cens) AS BIGINT) AS c_censored
  FROM obs GROUP BY priority, week
),
risk AS (
  SELECT priority, week, d_ret, d_ful, c_censored,
         SUM(d_ret + d_ful + c_censored) OVER (PARTITION BY priority)
         - COALESCE(SUM(d_ret + d_ful + c_censored)
             OVER (PARTITION BY priority ORDER BY week
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS n_risk
  FROM grp
),
f AS (
  SELECT priority, week, d_ret, d_ful, c_censored, n_risk,
         1.0 - CAST(d_ret + d_ful AS DOUBLE) / CAST(n_risk AS DOUBLE)
           AS factor,
         CAST(d_ret AS DOUBLE) / CAST(n_risk AS DOUBLE) AS h_ret,
         CAST(d_ful AS DOUBLE) / CAST(n_risk AS DOUBLE) AS h_ful
  FROM risk
),
folded AS (
  SELECT priority, week, CAST(n_risk AS BIGINT) AS n_risk, d_ret, d_ful,
         list_reduce(
           list_prepend(
             CAST([1.0, 0.0, 0.0] AS DOUBLE[]),
             list([factor, h_ret, h_ful])
               OVER (PARTITION BY priority ORDER BY week
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
           (a, x) -> [a[1] * x[1], a[2] + a[1] * x[2], a[3] + a[1] * x[3]]
         ) AS acc
  FROM f
)
SELECT priority, week, n_risk,
       d_ret AS d_returned, d_ful AS d_fulfilled,
       acc[1] AS survival,
       acc[2] AS cif_returned,
       acc[3] AS cif_fulfilled
FROM folded
""",
    tags=("orders", "survival", "competing-risks"),
)
def q_orders_competing_risks(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    lt = (
        li.groupBy("l_orderkey")
        .agg(
            F.max("l_shipdate").alias("ship_done"),
            F.max(
                F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            ).alias("returned"),
        )
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.datediff(
                F.col("ship_done").cast("date"), F.col("o_orderdate").cast("date")
            ).alias("t_days"),
            "returned",
        )
    )
    in_h = F.col("t_days") <= _HORIZON_DAYS
    obs = lt.select(
        "priority",
        F.floor(
            F.least(F.greatest(F.col("t_days"), F.lit(0)), F.lit(_HORIZON_DAYS))
            / float(_WEEK)
        )
        .cast("long")
        .alias("week"),
        F.when(in_h, F.col("returned")).otherwise(0).alias("ev_ret"),
        F.when(in_h, 1 - F.col("returned")).otherwise(0).alias("ev_ful"),
        F.when(in_h, 0).otherwise(1).alias("cens"),
    )
    grp = obs.groupBy("priority", "week").agg(
        F.sum("ev_ret").cast("long").alias("d_ret"),
        F.sum("ev_ful").cast("long").alias("d_ful"),
        F.sum("cens").cast("long").alias("c_censored"),
    )
    total_w = Window.partitionBy("priority")
    prior_w = (
        Window.partitionBy("priority")
        .orderBy("week")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    leaving = F.col("d_ret") + F.col("d_ful") + F.col("c_censored")
    risk = grp.withColumn(
        "n_risk",
        (
            F.sum(leaving).over(total_w)
            - F.coalesce(F.sum(leaving).over(prior_w), F.lit(0))
        ).cast("long"),
    )
    nd = F.col("n_risk").cast("double")
    f = risk.select(
        "priority",
        "week",
        "n_risk",
        "d_ret",
        "d_ful",
        (
            F.lit(1.0) - (F.col("d_ret") + F.col("d_ful")).cast("double") / nd
        ).alias("factor"),
        (F.col("d_ret").cast("double") / nd).alias("h_ret"),
        (F.col("d_ful").cast("double") / nd).alias("h_ful"),
    )
    fold_w = (
        Window.partitionBy("priority")
        .orderBy("week")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    acc = F.aggregate(
        F.collect_list(F.array("factor", "h_ret", "h_ful")).over(fold_w),
        F.array(F.lit(1.0), F.lit(0.0), F.lit(0.0)),
        lambda a, x: F.array(
            a[0] * x[0], a[1] + a[0] * x[1], a[2] + a[0] * x[2]
        ),
    )
    return f.withColumn("acc", acc).select(
        "priority",
        "week",
        "n_risk",
        F.col("d_ret").alias("d_returned"),
        F.col("d_ful").alias("d_fulfilled"),
        F.col("acc")[0].alias("survival"),
        F.col("acc")[1].alias("cif_returned"),
        F.col("acc")[2].alias("cif_fulfilled"),
    )
