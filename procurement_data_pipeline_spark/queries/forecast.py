"""Declared queries: forecast backtesting over daily shipped demand.

orders_forecast_backtest — the evaluation loop behind every demand
forecast: replay simple forecasters over history and score them
out-of-sample. Two standard baselines every planning team compares
against (and that production models must beat):

* ``naive_lag7`` — same weekday last week (seasonal naive);
* ``ma28`` — trailing 28-day mean. Because eligibility requires a FULL
  window (row_number > 28), the mean's denominator is the constant 28 —
  so the error is kept as the exact integer ``28·actual − Σwindow``
  (28× the true error) and descaled once at presentation.

Scored with MAE, bias, and WAPE (weighted absolute percentage error —
Σ|err|/Σactual, the demand-planning standard; unlike MAPE it is a ratio
of two SUMS, so it stays in exact integers). The exactness contract:
every aggregate is a sum of exact integers in decimal(38,0)/HUGEINT —
never a sum of doubles, whose result would depend on partition order —
finished by IEEE divisions both engines perform identically.

Scale shape: ONE aggregation of lineitem to (day, total) — after which
everything operates on a calendar-bounded relation (≤ a few thousand
rows regardless of fact volume); the single-partition window is
explicitly calendar-bounded, never over raw facts. This is the generic
backtest pattern: aggregate once to the forecast grain, evaluate any
number of methods with window functions.

Registers past the graded first-50 prefix (GRADE_OVERFLOW in
__spark_entry__.py); tools/check_oracle.py hash-checks it at sf0.01.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from procurement_data_pipeline_spark.registry import register
from procurement_data_pipeline_spark.sources.tables import load_table

_MA_DAYS = 28
_LAG = 7


@register(
    "orders_forecast_backtest",
    oracle=f"""
WITH daily AS (
  SELECT CAST(l_shipdate AS DATE) AS d,
         SUM(CAST(FLOOR(l_quantity * 1000000) AS BIGINT)) AS qty
  FROM lineitem GROUP BY 1
),
w AS (
  SELECT d, qty,
         LAG(qty, {_LAG}) OVER (ORDER BY d) AS f_lag7,
         SUM(qty) OVER (ORDER BY d ROWS BETWEEN {_MA_DAYS} PRECEDING
                        AND 1 PRECEDING) AS ma_sum,
         ROW_NUMBER() OVER (ORDER BY d) AS rn
  FROM daily
),
elig AS (
  SELECT * FROM w WHERE rn > {_MA_DAYS} AND f_lag7 IS NOT NULL AND qty > 0
),
-- integer error sums; ma28 errors carry the constant ×28 scale
sums AS (
  SELECT
    CAST(COUNT(*) AS BIGINT) AS n_days,
    SUM(CAST(qty AS HUGEINT)) AS sum_a,
    SUM(ABS(CAST(qty AS HUGEINT) - f_lag7)) AS abs7,
    SUM(CAST(f_lag7 AS HUGEINT) - qty) AS err7,
    SUM(ABS(CAST(qty AS HUGEINT) * {_MA_DAYS} - ma_sum)) AS abs28,
    SUM(CAST(ma_sum AS HUGEINT) - CAST(qty AS HUGEINT) * {_MA_DAYS}) AS err28
  FROM elig
)
SELECT 'naive_lag7' AS method, n_days,
       CAST(abs7 AS DOUBLE) / n_days / 1000000.0 AS mae,
       CAST(err7 AS DOUBLE) / n_days / 1000000.0 AS bias,
       CAST(abs7 AS DOUBLE) / CAST(sum_a AS DOUBLE) AS wape
FROM sums
UNION ALL
SELECT 'ma28' AS method, n_days,
       CAST(abs28 AS DOUBLE) / {_MA_DAYS} / n_days / 1000000.0 AS mae,
       CAST(err28 AS DOUBLE) / {_MA_DAYS} / n_days / 1000000.0 AS bias,
       CAST(abs28 AS DOUBLE) / {_MA_DAYS} / CAST(sum_a AS DOUBLE) AS wape
FROM sums
""",
    tags=("forecast", "backtest", "lineitem"),
)
def q_orders_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.col("l_shipdate").cast("date").alias("d")).agg(
        F.sum(F.floor(F.col("l_quantity") * 1000000).cast("long")).alias("qty")
    )
    ow = Window.orderBy("d")
    w = daily.select(
        "d",
        "qty",
        F.lag("qty", _LAG).over(ow).alias("f_lag7"),
        F.sum("qty").over(ow.rowsBetween(-_MA_DAYS, -1)).alias("ma_sum"),
        F.row_number().over(ow).alias("rn"),
    ).filter(
        (F.col("rn") > _MA_DAYS) & F.col("f_lag7").isNotNull() & (F.col("qty") > 0)
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    qty, f7, ms = F.col("qty"), F.col("f_lag7"), F.col("ma_sum")
    sums = w.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum(dec(qty)).alias("sum_a"),
        F.sum(F.abs(dec(qty) - dec(f7))).alias("abs7"),
        F.sum(dec(f7) - dec(qty)).alias("err7"),
        F.sum(F.abs(dec(qty) * _MA_DAYS - dec(ms))).alias("abs28"),
        F.sum(dec(ms) - dec(qty) * _MA_DAYS).alias("err28"),
    )
    n = F.col("n_days")
    # both method rows fan out from the ONE sums row in-codegen (round
    # 12): the former two-branch union replayed the fact aggregate per
    # branch — same two-row relation, one pass over the facts
    return sums.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("naive_lag7").alias("method"),
                    n.alias("n_days"),
                    (F.col("abs7").cast("double") / n / F.lit(1000000.0)).alias(
                        "mae"
                    ),
                    (F.col("err7").cast("double") / n / F.lit(1000000.0)).alias(
                        "bias"
                    ),
                    (
                        F.col("abs7").cast("double")
                        / F.col("sum_a").cast("double")
                    ).alias("wape"),
                ),
                F.struct(
                    F.lit("ma28").alias("method"),
                    n.alias("n_days"),
                    (
                        F.col("abs28").cast("double")
                        / _MA_DAYS
                        / n
                        / F.lit(1000000.0)
                    ).alias("mae"),
                    (
                        F.col("err28").cast("double")
                        / _MA_DAYS
                        / n
                        / F.lit(1000000.0)
                    ).alias("bias"),
                    (
                        F.col("abs28").cast("double")
                        / _MA_DAYS
                        / F.col("sum_a").cast("double")
                    ).alias("wape"),
                ),
            )
        ).alias("_m")
    ).select("_m.method", "_m.n_days", "_m.mae", "_m.bias", "_m.wape")


@register(
    "orders_holt_trend",
    # Holt's two-parameter (level + trend) exponential smoothing per order
    # priority over the daily order-count series — the next step up from
    # the EWMA (no trend) and Croston (intermittent) smoothers. α=0.5,
    # β=0.25 (exact binary). Recurrence, not closed form — evaluated with
    # the ordered-fold contract: both engines fold the SAME day-ordered
    # list with the SAME IEEE ops, seeded by the first element ([y₁, 0]:
    # l₁=y₁, b₁=0, updates from y₂ on; data elements carry b=0, which the
    # lambda never reads).
    #
    # The fold state is a 2-element DOUBLE LIST, deliberately NOT a
    # struct: DuckDB's list_reduce mis-evaluates struct accumulators
    # whose field expressions read ANOTHER field of acc (the read can
    # observe the just-written value — probed in
    # tests/test_replenishment.py::test_duckdb_struct_fold_hazard). The
    # Croston fold's fields are independent, so it is unaffected; Holt's
    # trend reads acc.level, so it must use the list form. new_l appears
    # twice in the lambda (no let-binding in either SQL lambda dialect)
    # — identical expression, identical IEEE result.
    oracle="""
WITH daily AS (
  SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS day,
         COUNT(*) AS cnt
  FROM orders GROUP BY 1, 2
),
folded AS (
  SELECT priority, COUNT(*) AS n_days,
         list_reduce(
           list([CAST(cnt AS DOUBLE), CAST(0 AS DOUBLE)] ORDER BY day),
           (acc, x) -> [
             x[1] * CAST(0.5 AS DOUBLE)
               + (acc[1] + acc[2]) * CAST(0.5 AS DOUBLE),
             (x[1] * CAST(0.5 AS DOUBLE)
               + (acc[1] + acc[2]) * CAST(0.5 AS DOUBLE) - acc[1])
                 * CAST(0.25 AS DOUBLE)
               + acc[2] * CAST(0.75 AS DOUBLE)]
         ) AS s
  FROM daily GROUP BY 1
)
SELECT priority, CAST(n_days AS BIGINT) AS n_days,
       s[1] AS level, s[2] AS trend,
       s[1] + s[2] AS forecast_next,
       s[1] + 7 * s[2] AS forecast_7d
FROM folded
""",
    tags=("orders", "forecast", "smoothing"),
)
def q_orders_holt_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderdate").cast("date").alias("day"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    folded = daily.groupBy("priority").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("day"),
                        F.col("cnt").cast("double").alias("l"),
                    )
                )
            ),
            lambda x: F.array(x["l"], F.lit(0.0)),
        ).alias("lst"),
    )
    new_l = lambda acc, x: x[0] * 0.5 + (acc[0] + acc[1]) * 0.5  # noqa: E731
    fold = F.aggregate(
        F.filter(F.col("lst"), lambda x, i: i >= 1),
        F.element_at(F.col("lst"), 1),
        lambda acc, x: F.array(
            new_l(acc, x),
            (new_l(acc, x) - acc[0]) * 0.25 + acc[1] * 0.75,
        ),
    )
    return folded.select(
        "priority",
        "n_days",
        fold[0].alias("level"),
        fold[1].alias("trend"),
        (fold[0] + fold[1]).alias("forecast_next"),
        (fold[0] + 7 * fold[1]).alias("forecast_7d"),
    )
