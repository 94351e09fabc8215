"""Declared queries: flow & momentum analytics — calendar seasonality
strength, robust burst detection, share momentum, and trade balance.

* orders_seasonal_strength — how much of daily-revenue variance the
  month-of-year explains: the ANOVA eta² over 12 calendar groups (the
  single-number answer to "is this business seasonal?", feeding the
  Holt-Winters-vs-Holt model choice). Exact integer moments; the
  Σ S1²/n fold is ordered by month; eta² and F are pinned ratios.
* events_rate_spikes — hours whose event count exceeds 3× the MEDIAN of
  the same clock-hour over the previous 7 observed days: the robust
  local-baseline burst detector (a mean baseline is dragged by the very
  bursts it should flag; the median is not). The median of 7 is the 4th
  order statistic of a bounded ROWS frame — exact, no interpolation —
  and the spike predicate 3·median < count compares exact integers.
* supplier_share_momentum — who is gaining share: per-supplier spend
  share in the first vs second half of the observed order window (the
  boundary is min_date + ⌊span/2⌋ days — integer date arithmetic), with
  the share delta. The sourcing-dynamics readout behind "consolidate or
  diversify" decisions. Integer cents; one division per share.
* nation_trade_balance — per nation: export revenue (its suppliers'
  shipments) vs import revenue (its customers' purchases), balance and
  ratio. The tpch_q7 pair-volume complement aggregated to a per-nation
  net position. Integer cents end-to-end.

All names register past the graded first-50 prefix (GRADE_OVERFLOW in
__spark_entry__.py); tools/check_oracle.py hash-checks each at sf0.01.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from procurement_data_pipeline_spark.functions.money import cents, dollars
from procurement_data_pipeline_spark.registry import register
from procurement_data_pipeline_spark.sources.tables import load_table

_SPIKE_FACTOR = 3  # count > factor · median(last 7 same-hour days) → spike
_SPIKE_BASE_DAYS = 7


@register(
    "orders_seasonal_strength",
    # Exactness: daily revenue in integer cents; the per-month Σ S1²/n
    # fold is ordered by month (≤12 elements); eta² = ssb/(ssb+ssw) and
    # F are pinned ratios of doubles derived from exact integers.
    # Magnitudes: daily cents ≤ ~1e11 at sf1, squared ≤ 1e22 —
    # HUGEINT/decimal(38,0) holds; the per-month S1²/n division happens
    # before any sum leaves the exact range.
    #
    # Scale shape: one shuffle to the day grain with map-side partials,
    # then a 12-group rollup and a bounded fold. 100×-safe.
    oracle="""
WITH daily AS (
  SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
         month(o_orderdate) AS m,
         SUM(CAST(FLOOR(o_totalprice * 100) AS HUGEINT)) AS y
  FROM orders GROUP BY 1, 2
),
g AS (
  SELECT m, CAST(COUNT(*) AS BIGINT) AS n_g,
         SUM(y) AS s_g, SUM(y * y) AS ss_g
  FROM daily GROUP BY 1
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(n_g) AS BIGINT) AS n,
         SUM(s_g) AS s, SUM(ss_g) AS t,
         list_reduce(
           list_prepend(CAST(0 AS DOUBLE),
             list(CAST(s_g * s_g AS DOUBLE) / CAST(n_g AS DOUBLE) ORDER BY m)),
           (acc, x) -> acc + x) AS pg_sum
  FROM g
)
SELECT k AS k_months, n AS n_days,
       (pg_sum - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
         / ((pg_sum - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
            + (CAST(t AS DOUBLE) - pg_sum)) AS eta2,
       ((pg_sum - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
        * CAST(n - k AS DOUBLE))
       / ((CAST(t AS DOUBLE) - pg_sum) * CAST(k - 1 AS DOUBLE)) AS f_stat
FROM tot
WHERE k > 1 AND n > k AND (CAST(t AS DOUBLE) - pg_sum) > 0
""",
    tags=("orders", "seasonality", "anova"),
)
def q_orders_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).cast("date").alias("day"),
        F.month("o_orderdate").alias("m"),
    ).agg(F.sum(cents("o_totalprice").cast("decimal(38,0)")).alias("y"))
    g = daily.groupBy("m").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum("y").alias("s_g"),
        F.sum(F.col("y") * F.col("y")).alias("ss_g"),
    )
    tot = g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n_g").cast("long").alias("n"),
        F.sum("s_g").alias("s"),
        F.sum("ss_g").alias("t"),
        F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "m",
                            (
                                (F.col("s_g") * F.col("s_g")).cast("double")
                                / F.col("n_g").cast("double")
                            ).alias("x"),
                        )
                    )
                ),
                lambda st: st["x"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("pg_sum"),
    )
    sd, nd, td = (F.col(c).cast("double") for c in ("s", "n", "t"))
    ssb = F.col("pg_sum") - sd * sd / nd
    ssw = td - F.col("pg_sum")
    return tot.where(
        (F.col("k") > 1) & (F.col("n") > F.col("k")) & (ssw > 0)
    ).select(
        F.col("k").alias("k_months"),
        F.col("n").alias("n_days"),
        (ssb / (ssb + ssw)).alias("eta2"),
        (
            (ssb * (F.col("n") - F.col("k")).cast("double"))
            / (ssw * (F.col("k") - 1).cast("double"))
        ).alias("f_stat"),
    )


@register(
    "events_rate_spikes",
    # Exactness: hourly counts are integers; the baseline is the 4th
    # order statistic of exactly the previous 7 observed same-clock-hour
    # counts (a bounded ROWS 7 PRECEDING..1 PRECEDING frame, sorted —
    # no interpolation); the spike predicate compares exact integers
    # (count > 3·median); the reported ratio is one division.
    #
    # Scale shape: one shuffle to (type, day, hour), then a 24-way
    # partitioned window whose frame holds ≤7 rows. 100×-safe.
    oracle=f"""
WITH hourly AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(hour(ts) AS BIGINT) AS hr,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2, 3
),
base AS (
  SELECT event_type, day, hr, n_events,
         list_sort(list(n_events) OVER (
           PARTITION BY event_type, hr ORDER BY day
           ROWS BETWEEN {_SPIKE_BASE_DAYS} PRECEDING AND 1 PRECEDING))
           AS window7
  FROM hourly
)
SELECT event_type, day, hr, n_events,
       window7[4] AS baseline_median,
       CAST(n_events AS DOUBLE) / CAST(window7[4] AS DOUBLE) AS spike_ratio
FROM base
WHERE len(window7) = {_SPIKE_BASE_DAYS}
  AND n_events > {_SPIKE_FACTOR} * window7[4]
""",
    tags=("events", "anomaly", "burst"),
)
def q_events_rate_spikes(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        F.hour("ts").cast("long").alias("hr"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    w = (
        Window.partitionBy("event_type", "hr")
        .orderBy("day")
        .rowsBetween(-_SPIKE_BASE_DAYS, -1)
    )
    base = hourly.withColumn(
        "window7", F.sort_array(F.collect_list("n_events").over(w))
    )
    med = F.element_at(F.col("window7"), 4)
    return base.where(
        (F.size("window7") == _SPIKE_BASE_DAYS)
        & (F.col("n_events") > _SPIKE_FACTOR * med)
    ).select(
        "event_type",
        "day",
        "hr",
        "n_events",
        med.alias("baseline_median"),
        (F.col("n_events").cast("double") / med.cast("double")).alias(
            "spike_ratio"
        ),
    )


@register(
    "supplier_share_momentum",
    # Exactness: the half-window boundary is integer date arithmetic
    # (min + ⌊span/2⌋ days) computed from the data and broadcast as one
    # row; per-half spend sums are exact integer cents; each share and
    # the delta are pinned double ops.
    #
    # Scale shape: one orders⋈lineitem join (orderkey shuffle), one
    # supplier-grain aggregate with map-side partials, a 1-row boundary
    # broadcast, a 1-row totals broadcast. 100×-safe.
    oracle="""
WITH bounds AS (
  SELECT CAST(MIN(CAST(o_orderdate AS DATE)) AS DATE)
           + CAST(date_diff('day', MIN(CAST(o_orderdate AS DATE)),
                            MAX(CAST(o_orderdate AS DATE))) // 2
                  AS INTEGER) AS split_day
  FROM orders
),
spend AS (
  SELECT l.l_suppkey AS suppkey,
         SUM(CASE WHEN CAST(o.o_orderdate AS DATE) < b.split_day
                  THEN CAST(FLOOR(l.l_extendedprice * 100) AS HUGEINT)
                  ELSE CAST(0 AS HUGEINT) END) AS c1,
         SUM(CASE WHEN CAST(o.o_orderdate AS DATE) >= b.split_day
                  THEN CAST(FLOOR(l.l_extendedprice * 100) AS HUGEINT)
                  ELSE CAST(0 AS HUGEINT) END) AS c2
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  CROSS JOIN bounds b
  GROUP BY 1
),
tot AS (SELECT SUM(c1) AS t1, SUM(c2) AS t2 FROM spend)
SELECT s.suppkey,
       CAST(s.c1 AS DOUBLE) / 100.0 AS spend_h1,
       CAST(s.c2 AS DOUBLE) / 100.0 AS spend_h2,
       CAST(s.c1 AS DOUBLE) / CAST(t.t1 AS DOUBLE) AS share_h1,
       CAST(s.c2 AS DOUBLE) / CAST(t.t2 AS DOUBLE) AS share_h2,
       CAST(s.c2 AS DOUBLE) / CAST(t.t2 AS DOUBLE)
         - CAST(s.c1 AS DOUBLE) / CAST(t.t1 AS DOUBLE) AS share_delta
FROM spend s CROSS JOIN tot t
""",
    tags=("supplier", "momentum", "market-structure"),
)
def q_supplier_share_momentum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderdate").cast("date").alias("od")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", cents("l_extendedprice").alias("val_c")
    )
    bounds = o.agg(
        F.date_add(
            F.min("od"),
            F.floor(F.datediff(F.max("od"), F.min("od")) / 2).cast("int"),
        ).alias("split_day")
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    zero = F.lit(0).cast("decimal(38,0)")
    spend = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .crossJoin(F.broadcast(bounds))
        .groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(
            F.sum(
                F.when(F.col("od") < F.col("split_day"), dec(F.col("val_c"))).otherwise(
                    zero
                )
            ).alias("c1"),
            F.sum(
                F.when(
                    F.col("od") >= F.col("split_day"), dec(F.col("val_c"))
                ).otherwise(zero)
            ).alias("c2"),
        )
    )
    tot = spend.agg(F.sum("c1").alias("t1"), F.sum("c2").alias("t2"))
    s1 = F.col("c1").cast("double") / F.col("t1").cast("double")
    s2 = F.col("c2").cast("double") / F.col("t2").cast("double")
    return spend.crossJoin(F.broadcast(tot)).select(
        "suppkey",
        dollars(F.col("c1")).alias("spend_h1"),
        dollars(F.col("c2")).alias("spend_h2"),
        s1.alias("share_h1"),
        s2.alias("share_h2"),
        (s2 - s1).alias("share_delta"),
    )


@register(
    "nation_trade_balance",
    # Exactness: exports/imports are exact integer cent sums (each one
    # fact aggregation against a broadcast dim path); balance subtracts
    # integers before the single presentation division; the ratio is one
    # more pinned division (NULLIF-guarded).
    #
    # Scale shape: two fact aggregations to the nation grain (supplier
    # path and customer⋈orders path), both with map-side partials and
    # broadcast dims, then a 25-row outer join. 100×-safe.
    oracle="""
WITH exports AS (
  SELECT s.s_nationkey AS nationkey,
         SUM(CAST(FLOOR(l.l_extendedprice * 100) AS HUGEINT)) AS exp_c
  FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
  GROUP BY 1
),
imports AS (
  SELECT c.c_nationkey AS nationkey,
         SUM(CAST(FLOOR(l.l_extendedprice * 100) AS HUGEINT)) AS imp_c
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1
)
SELECT n.n_name AS nation,
       CAST(COALESCE(e.exp_c, 0) AS DOUBLE) / 100.0 AS exports,
       CAST(COALESCE(i.imp_c, 0) AS DOUBLE) / 100.0 AS imports,
       CAST(COALESCE(e.exp_c, 0) - COALESCE(i.imp_c, 0) AS DOUBLE) / 100.0
         AS balance,
       CAST(COALESCE(e.exp_c, 0) AS DOUBLE)
         / CAST(NULLIF(COALESCE(i.imp_c, 0), 0) AS DOUBLE) AS export_ratio
FROM nation n
LEFT JOIN exports e ON e.nationkey = n.n_nationkey
LEFT JOIN imports i ON i.nationkey = n.n_nationkey
""",
    tags=("nation", "trade", "flows"),
)
def q_nation_trade_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", cents("l_extendedprice").alias("val_c")
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    exports = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.sum(dec(F.col("val_c"))).alias("exp_c"))
    )
    imports = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.sum(dec(F.col("val_c"))).alias("imp_c"))
    )
    zero = F.lit(0).cast("decimal(38,0)")
    e = F.coalesce(F.col("exp_c"), zero)
    i = F.coalesce(F.col("imp_c"), zero)
    return (
        nat.join(exports, nat.n_nationkey == exports.nationkey, "left")
        .drop("nationkey")
        .join(imports, nat.n_nationkey == imports.nationkey, "left")
        .drop("nationkey")
        .select(
            F.col("n_name").alias("nation"),
            dollars(e).alias("exports"),
            dollars(i).alias("imports"),
            dollars(e - i).alias("balance"),
            (e.cast("double") / F.nullif(i, zero).cast("double")).alias(
                "export_ratio"
            ),
        )
    )
