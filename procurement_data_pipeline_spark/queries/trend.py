"""Declared queries: trend & comparison analytics — gaps-and-islands
activity streaks, month-over-month / year-over-year growth, and banded
substitution candidates.

* events_activity_streaks — the gaps-and-islands pattern: consecutive
  active DAYS collapse into islands via the day_number − row_number key
  (constant within a run), with longest and current streak per user.
  Sessionization's cousin, but over the calendar grid, not event gaps.
* orders_monthly_growth — the reporting staple: revenue by month with
  MoM and YoY deltas via LAG(1)/LAG(12) on the month grain.
* part_substitution_candidates — banded self-join: same (type, size),
  different brand, prices within 5% — entirely in integer cents
  (20·|a−b| ≤ min(a,b)), an alternate-sourcing screen.

All names register past the graded first-50 prefix (GRADE_OVERFLOW in
__spark_entry__.py); tools/check_oracle.py hash-checks each at sf0.01.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from procurement_data_pipeline_spark.functions.money import cents, dollars
from procurement_data_pipeline_spark.registry import register
from procurement_data_pipeline_spark.sources.tables import load_table


@register(
    "events_activity_streaks",
    # Island key: day_number − row_number is constant exactly along a run
    # of consecutive days — one window on the (small) user×day relation,
    # one grouped pass per island, one per-user rollup. The "current"
    # streak is the island containing the user's last active day.
    oracle="""
WITH days AS (
  SELECT DISTINCT user_id,
         CAST(date_diff('day', DATE '1990-01-01', CAST(ts AS DATE)) AS BIGINT)
           AS day_num
  FROM events
),
islands AS (
  SELECT user_id, day_num,
         day_num - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day_num)
           AS island
  FROM days
),
runs AS (
  SELECT user_id, island,
         CAST(COUNT(*) AS BIGINT) AS len,
         MAX(day_num) AS last_day
  FROM islands GROUP BY user_id, island
)
SELECT user_id,
       CAST(SUM(len) AS BIGINT) AS n_active_days,
       CAST(COUNT(*) AS BIGINT) AS n_streaks,
       CAST(MAX(len) AS BIGINT) AS longest_streak,
       CAST(MAX(CASE WHEN last_day = m THEN len END) AS BIGINT)
         AS current_streak
FROM (SELECT *, MAX(last_day) OVER (PARTITION BY user_id) AS m FROM runs) t
GROUP BY user_id
""",
    tags=("events", "streaks", "gaps-islands"),
)
def q_events_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id",
        F.datediff(F.col("ts").cast("date"), F.lit("1990-01-01").cast("date"))
        .cast("long")
        .alias("day_num"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day_num")
    islands = days.withColumn(
        "island", F.col("day_num") - F.row_number().over(w)
    )
    runs = islands.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).cast("long").alias("len"),
        F.max("day_num").alias("last_day"),
    )
    wu = Window.partitionBy("user_id")
    runs_m = runs.withColumn("m", F.max("last_day").over(wu))
    return runs_m.groupBy("user_id").agg(
        F.sum("len").cast("long").alias("n_active_days"),
        F.count(F.lit(1)).cast("long").alias("n_streaks"),
        F.max("len").cast("long").alias("longest_streak"),
        F.max(F.when(F.col("last_day") == F.col("m"), F.col("len")))
        .cast("long")
        .alias("current_streak"),
    )


@register(
    "orders_monthly_growth",
    # MoM / YoY growth on the month grain: the serial LAG window runs
    # over ≤ a few hundred month rows at ANY scale — the fact shuffles
    # once into months, everything after is constant-size. Percentage
    # deltas are identically-shaped double divisions over exact cents.
    oracle="""
WITH monthly AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS yr,
         CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS mon,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS rev_cents,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1, 2
),
laged AS (
  SELECT yr, mon, rev_cents, n_orders,
         LAG(rev_cents, 1) OVER w AS prev_m,
         LAG(rev_cents, 12) OVER w AS prev_y
  FROM monthly
  WINDOW w AS (ORDER BY yr, mon)
)
SELECT yr, mon,
       CAST(rev_cents AS DOUBLE) / 100.0 AS revenue,
       n_orders,
       (CAST(rev_cents AS DOUBLE) - CAST(prev_m AS DOUBLE))
         / CAST(prev_m AS DOUBLE) AS mom_pct,
       (CAST(rev_cents AS DOUBLE) - CAST(prev_y AS DOUBLE))
         / CAST(prev_y AS DOUBLE) AS yoy_pct
FROM laged
""",
    tags=("orders", "trend", "reporting"),
)
def q_orders_monthly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.year("o_orderdate").cast("int").alias("yr"),
        F.month("o_orderdate").cast("int").alias("mon"),
    ).agg(
        F.sum(cents("o_totalprice")).cast("long").alias("rev_cents"),
        F.count(F.lit(1)).cast("long").alias("n_orders"),
    )
    w = Window.orderBy("yr", "mon")
    laged = monthly.select(
        "yr",
        "mon",
        "rev_cents",
        "n_orders",
        F.lag("rev_cents", 1).over(w).alias("prev_m"),
        F.lag("rev_cents", 12).over(w).alias("prev_y"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return laged.select(
        "yr",
        "mon",
        dollars(F.col("rev_cents")).alias("revenue"),
        "n_orders",
        ((d("rev_cents") - d("prev_m")) / d("prev_m")).alias("mom_pct"),
        ((d("rev_cents") - d("prev_y")) / d("prev_y")).alias("yoy_pct"),
    )


@register(
    "part_substitution_candidates",
    # Alternate-sourcing screen: same (type, size), different brands,
    # retail prices within 5% — the band test 20·|a−b| ≤ min(a,b) stays
    # in integer cents. The self-join blocks on (type, size) — a hash
    # join whose fan-out is bounded by parts-per-spec, never all-pairs.
    # Top-100 by tightest relative spread, full key tie-break.
    oracle="""
WITH p AS (
  SELECT p_partkey, p_brand, p_type, p_size,
         CAST(FLOOR(p_retailprice * 100) AS BIGINT) AS price_cents
  FROM part
)
SELECT a.p_type AS part_type, a.p_size AS part_size,
       a.p_partkey AS part_a, b.p_partkey AS part_b,
       CAST(a.price_cents AS DOUBLE) / 100.0 AS price_a,
       CAST(b.price_cents AS DOUBLE) / 100.0 AS price_b,
       CAST(ABS(a.price_cents - b.price_cents) AS DOUBLE)
         / CAST(LEAST(a.price_cents, b.price_cents) AS DOUBLE) AS rel_spread
FROM p a
JOIN p b ON b.p_type = a.p_type AND b.p_size = a.p_size
        AND a.p_partkey < b.p_partkey AND a.p_brand != b.p_brand
WHERE 20 * ABS(a.price_cents - b.price_cents)
      <= LEAST(a.price_cents, b.price_cents)
ORDER BY rel_spread ASC, part_a ASC, part_b ASC
LIMIT 100
""",
    tags=("part", "sourcing", "banded-join"),
)
def q_part_substitution_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_brand",
        "p_type",
        "p_size",
        cents("p_retailprice").alias("price_cents"),
    )
    a = p.select(
        F.col("p_partkey").alias("part_a"),
        F.col("p_brand").alias("brand_a"),
        F.col("p_type").alias("part_type"),
        F.col("p_size").alias("part_size"),
        F.col("price_cents").alias("cents_a"),
    )
    b = p.select(
        F.col("p_partkey").alias("part_b"),
        F.col("p_brand").alias("brand_b"),
        F.col("p_type").alias("part_type"),
        F.col("p_size").alias("part_size"),
        F.col("price_cents").alias("cents_b"),
    )
    joined = a.join(b, ["part_type", "part_size"]).where(
        (F.col("part_a") < F.col("part_b"))
        & (F.col("brand_a") != F.col("brand_b"))
        & (
            20 * F.abs(F.col("cents_a") - F.col("cents_b"))
            <= F.least(F.col("cents_a"), F.col("cents_b"))
        )
    )
    rel = F.abs(F.col("cents_a") - F.col("cents_b")).cast("double") / F.least(
        F.col("cents_a"), F.col("cents_b")
    ).cast("double")
    return (
        joined.select(
            "part_type",
            "part_size",
            "part_a",
            "part_b",
            dollars(F.col("cents_a")).alias("price_a"),
            dollars(F.col("cents_b")).alias("price_b"),
            rel.alias("rel_spread"),
        )
        .orderBy(F.col("rel_spread").asc(), F.col("part_a").asc(), F.col("part_b").asc())
        .limit(100)
    )


@register(
    "orders_mann_kendall",
    # Mann-Kendall trend significance per order priority — the
    # NON-parametric complement to the OLS slope (events_value_trend) and
    # the Holt level/trend smoother: S = Σ_{i<j} sign(y_j − y_i) over the
    # day-ordered daily order counts, with the tie-corrected variance
    # n(n−1)(2n+5)/18 − Σ_t t(t−1)(2t+5)/18 and the continuity-corrected
    # z = (S ∓ 1)/sqrt(Var). S and both variance terms are EXACT integers;
    # z is one subtraction, one division, one IEEE-correctly-rounded sqrt —
    # bit-identical across engines; the trend label compares |z| against
    # the literal 1.96 both engines parse identically.
    #
    # Scale shape: the pair relation is CALENDAR-bounded (n_days² per
    # priority, independent of fact volume), built AFTER the facts
    # collapse to the daily grain — the O(n²) lives on a few-thousand-row
    # relation forever. The fact table itself is scanned once.
    oracle="""
WITH daily AS (
  SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS day,
         COUNT(*) AS cnt
  FROM orders GROUP BY 1, 2
),
pairs AS (
  SELECT a.priority,
         CASE WHEN b.cnt > a.cnt THEN 1
              WHEN b.cnt < a.cnt THEN -1 ELSE 0 END AS sgn
  FROM daily a JOIN daily b
    ON b.priority = a.priority AND b.day > a.day
),
s AS (SELECT priority, SUM(sgn) AS s_stat FROM pairs GROUP BY 1),
nn AS (SELECT priority, COUNT(*) AS n FROM daily GROUP BY 1),
ties AS (
  SELECT priority, SUM(t * (t - 1) * (2 * t + 5)) AS tie_term
  FROM (SELECT priority, cnt, COUNT(*) AS t FROM daily GROUP BY 1, 2)
  GROUP BY 1
),
v AS (
  SELECT nn.priority, nn.n, s.s_stat,
         CAST(nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tie_term AS DOUBLE)
           / 18.0 AS var_s
  FROM nn JOIN s ON s.priority = nn.priority
  JOIN ties ON ties.priority = nn.priority
),
zc AS (
  SELECT priority, CAST(n AS BIGINT) AS n_days,
         CAST(s_stat AS BIGINT) AS s_stat, var_s,
         CASE WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE) / sqrt(var_s)
              WHEN s_stat < 0 THEN CAST(s_stat + 1 AS DOUBLE) / sqrt(var_s)
              ELSE 0.0 END AS z
  FROM v
)
SELECT priority, n_days, s_stat, var_s, z,
       CASE WHEN z > 1.96 THEN 'increasing'
            WHEN z < -1.96 THEN 'decreasing'
            ELSE 'no_trend' END AS trend
FROM zc
""",
    tags=("orders", "trend", "statistics"),
)
def q_orders_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderdate").cast("date").alias("day"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    from procurement_data_pipeline_spark.caching import scoped_persist

    daily = scoped_persist(daily)  # feeds pairs (twice), n, and ties
    a, b = daily.alias("a"), daily.alias("b")
    sgn = (
        F.when(F.col("b.cnt") > F.col("a.cnt"), 1)
        .when(F.col("b.cnt") < F.col("a.cnt"), -1)
        .otherwise(0)
    )
    s = (
        a.join(
            b,
            (F.col("b.priority") == F.col("a.priority"))
            & (F.col("b.day") > F.col("a.day")),
        )
        .groupBy(F.col("a.priority").alias("priority"))
        .agg(F.sum(sgn).alias("s_stat"))
    )
    nn = daily.groupBy("priority").agg(F.count(F.lit(1)).alias("n"))
    ties = (
        daily.groupBy("priority", "cnt")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("priority")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).alias("tie_term")
        )
    )
    n = F.col("n")
    var_s = (
        (n * (n - 1) * (2 * n + 5) - F.col("tie_term")).cast("double") / 18.0
    )
    v = nn.join(s, "priority").join(ties, "priority").select(
        "priority",
        n.cast("long").alias("n_days"),
        F.col("s_stat").cast("long").alias("s_stat"),
        var_s.alias("var_s"),
    )
    z = (
        F.when(
            F.col("s_stat") > 0,
            (F.col("s_stat") - 1).cast("double") / F.sqrt(F.col("var_s")),
        )
        .when(
            F.col("s_stat") < 0,
            (F.col("s_stat") + 1).cast("double") / F.sqrt(F.col("var_s")),
        )
        .otherwise(0.0)
    )
    zc = v.withColumn("z", z)
    return zc.withColumn(
        "trend",
        F.when(F.col("z") > 1.96, "increasing")
        .when(F.col("z") < -1.96, "decreasing")
        .otherwise("no_trend"),
    )


# EWMA control-chart constants, literal-pinned at import so both engines
# consume the identical double (the λ/(2−λ) width needs a sqrt — IEEE
# correctly-rounded, so the Python value equals what either engine would
# compute, but pinning removes even the expression-shape dependence).
_EWMA_LAMBDA = 0.2
_EWMA_WIDTH = (0.2 / 1.8) ** 0.5  # sqrt(λ/(2−λ)) — asymptotic limit factor


@register(
    "events_ewma_chart",
    # EWMA control chart over daily event volume: z_t = λ·x_t + (1−λ)·z_{t−1}
    # seeded at the process mean — the drift detector that reacts to small
    # sustained shifts a 3σ Shewhart chart misses (its memory integrates
    # them). Asymptotic control limits mean ± 3σ·sqrt(λ/(2−λ)); the
    # early-sample exact limits are tighter, so asymptotic flags are
    # conservative for the first few days.
    #
    # Exactness: daily counts are integers; moments stay in BIGINT (counts
    # squared are far inside 2^63 at any plausible scale — a 1e9-event/day
    # pipeline is ~1e18·days only past 10^2.5 years); each day's EWMA is an
    # ORDERED FOLD over the day-ordered prefix of the count array with
    # identical literals, so every intermediate double matches bit-for-bit
    # (the same contract as Kaplan-Meier / Croston).
    #
    # Scale shape: one shuffle to the day grain; the fold relation is
    # CALENDAR-bounded (days², not events²) — the prefix arrays total
    # ~days²·8 bytes (50 MB at 7 years), independent of fact volume. The
    # 1-row stats+array scalar broadcasts (allowlisted BNLJ).
    oracle=f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1
),
idx AS (
  SELECT day, x,
         CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS t
  FROM daily
),
g AS (
  SELECT list(CAST(x AS DOUBLE) ORDER BY day) AS arr,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS s1,
         CAST(SUM(x * x) AS BIGINT) AS s2
  FROM daily
),
stats AS (
  SELECT arr,
         CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean_x,
         sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)
              / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS sigma_x
  FROM g
)
SELECT i.day, i.x,
       list_reduce(
         list_prepend(st.mean_x, list_slice(st.arr, 1, i.t)),
         (acc, v) -> acc * {1.0 - _EWMA_LAMBDA!r} + v * {_EWMA_LAMBDA!r}
       ) AS ewma,
       st.mean_x + 3.0 * st.sigma_x * {_EWMA_WIDTH!r} AS ucl,
       st.mean_x - 3.0 * st.sigma_x * {_EWMA_WIDTH!r} AS lcl,
       list_reduce(
         list_prepend(st.mean_x, list_slice(st.arr, 1, i.t)),
         (acc, v) -> acc * {1.0 - _EWMA_LAMBDA!r} + v * {_EWMA_LAMBDA!r}
       ) NOT BETWEEN
         st.mean_x - 3.0 * st.sigma_x * {_EWMA_WIDTH!r}
         AND st.mean_x + 3.0 * st.sigma_x * {_EWMA_WIDTH!r} AS breach
FROM idx i CROSS JOIN stats st
""",
    tags=("events", "spc", "timeseries"),
)
def q_events_ewma_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    idx = daily.withColumn(
        "t", F.row_number().over(Window.orderBy("day")).cast("long")
    )
    g = daily.agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct("day", F.col("x").cast("double").alias("v"))
                )
            ),
            lambda st: st["v"],
        ).alias("arr"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s1"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("s2"),
    )
    stats = g.select(
        "arr",
        (F.col("s1").cast("double") / F.col("n").cast("double")).alias(
            "mean_x"
        ),
        F.sqrt(
            (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")).cast(
                "double"
            )
            / (F.col("n").cast("double") * F.col("n").cast("double"))
        ).alias("sigma_x"),
    )
    lam, width = F.lit(_EWMA_LAMBDA), F.lit(_EWMA_WIDTH)
    ewma = F.aggregate(
        F.slice(F.col("arr"), F.lit(1), F.col("t").cast("int")),
        F.col("mean_x"),
        lambda acc, v: acc * F.lit(1.0 - _EWMA_LAMBDA) + v * lam,
    )
    ucl = F.col("mean_x") + F.lit(3.0) * F.col("sigma_x") * width
    lcl = F.col("mean_x") - F.lit(3.0) * F.col("sigma_x") * width
    return (
        idx.crossJoin(F.broadcast(stats))
        .select(
            "day",
            "x",
            ewma.alias("ewma"),
            ucl.alias("ucl"),
            lcl.alias("lcl"),
            ((ewma < lcl) | (ewma > ucl)).alias("breach"),
        )
    )
