"""Declared queries: growth & embedding-diagnostics analytics — label
outliers by exact centroid distance, new-vs-returning decomposition, and
the revenue cohort-LTV triangle.

* emb_label_outliers — per-label top-3 outliers by distance to the label
  centroid WITHOUT floating-point centroids: the integer identity
  n²·‖v − c‖² = Σ_i (q_i·n − s_i)² uses only the quantized per-dim sums
  s_i and count n, so the ranking is exact (128-bit accumulation; int64
  would overflow at cluster sizes ≥ ~10⁴ · dim 64).
* events_new_vs_returning — per-day activity split by whether the user is
  on their first active day; the standard growth-accounting input.
* orders_cohort_ltv — the cohort lifetime-value triangle: first-order
  quarter × age-in-quarters revenue matrix, exact cents.

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
    "emb_label_outliers",
    # Ranking is on the integer numerator (the shared n² denominator
    # cannot reorder it); the presentation distance is sqrt(num)/n/1e6 —
    # one identically-shaped double chain. Plan: one posexplode, one
    # (label,pos) aggregate (640 rows, broadcast), one join back, one
    # per-label rank window.
    oracle="""
WITH q AS (
  SELECT vec_id, label, pos - 1 AS pos,
         CAST(FLOOR(CAST(v AS DOUBLE) * 1000000) AS BIGINT) AS qv
  FROM (
    SELECT vec_id, label, unnest(embedding) AS v,
           generate_subscripts(embedding, 1) AS pos
    FROM embeddings
  ) t
),
sums AS (
  SELECT label, pos, CAST(SUM(qv) AS HUGEINT) AS s,
         CAST(COUNT(*) AS HUGEINT) AS n
  FROM q GROUP BY label, pos
),
nums AS (
  SELECT q.vec_id, q.label,
         SUM((CAST(q.qv AS HUGEINT) * n - s) * (CAST(q.qv AS HUGEINT) * n - s))
           AS num,
         MAX(n) AS n
  FROM q JOIN sums ON sums.label = q.label AND sums.pos = q.pos
  GROUP BY q.vec_id, q.label
),
ranked AS (
  SELECT vec_id, label, num, n,
         CAST(ROW_NUMBER() OVER (PARTITION BY label
                                 ORDER BY num DESC, vec_id ASC) AS INTEGER)
           AS rank
  FROM nums
)
SELECT label, vec_id, rank,
       sqrt(CAST(num AS DOUBLE)) / CAST(n AS DOUBLE) / 1000000.0
         AS centroid_dist
FROM ranked WHERE rank <= 3
""",
    tags=("similarity", "llm", "outliers"),
)
def q_emb_label_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("pos", "v"),
    ).select(
        "vec_id",
        "label",
        "pos",
        F.floor(F.col("v").cast("double") * 1000000).cast("long").alias("qv"),
    )
    sums = q.groupBy("label", "pos").agg(
        F.sum("qv").cast("decimal(38,0)").alias("s"),
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
    )
    term = F.col("qv").cast("decimal(38,0)") * F.col("n") - F.col("s")
    nums = (
        q.join(F.broadcast(sums), ["label", "pos"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum((term * term).cast("decimal(38,0)")).alias("num"),
            F.max("n").alias("n"),
        )
    )
    w = Window.partitionBy("label").orderBy(F.col("num").desc(), F.col("vec_id").asc())
    return (
        nums.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= 3)
        .select(
            "label",
            "vec_id",
            "rank",
            (
                F.sqrt(F.col("num").cast("double"))
                / F.col("n").cast("double")
                / F.lit(1000000.0)
            ).alias("centroid_dist"),
        )
    )


@register(
    "events_new_vs_returning",
    # Growth accounting: each day's activity split by first-active-day
    # users vs returning. first_day is one grouped min (user grain,
    # broadcast-joinable at dimension scale); the split is a join back +
    # one day-grain aggregate — two shuffles total on the fact.
    oracle="""
WITH firsts AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
  FROM events GROUP BY user_id
),
tagged AS (
  SELECT CAST(e.ts AS DATE) AS day, e.user_id,
         CASE WHEN CAST(e.ts AS DATE) = f.first_day THEN 1 ELSE 0 END AS is_new
  FROM events e JOIN firsts f ON f.user_id = e.user_id
)
SELECT day,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(*) FILTER (WHERE is_new = 1) AS BIGINT) AS n_events_new,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active_users,
       CAST(COUNT(DISTINCT CASE WHEN is_new = 1 THEN user_id END) AS BIGINT)
         AS n_new_users
FROM tagged
GROUP BY day
""",
    tags=("events", "growth"),
)
def q_events_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("day")
    )
    firsts = ev.groupBy("user_id").agg(F.min("day").alias("first_day"))
    tagged = ev.join(firsts, "user_id").withColumn(
        "is_new", F.when(F.col("day") == F.col("first_day"), 1).otherwise(0)
    )
    return tagged.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.count(F.when(F.col("is_new") == 1, 1)).cast("long").alias("n_events_new"),
        F.countDistinct("user_id").cast("long").alias("n_active_users"),
        F.countDistinct(F.when(F.col("is_new") == 1, F.col("user_id")))
        .cast("long")
        .alias("n_new_users"),
    )


@register(
    "orders_cohort_ltv",
    # Revenue LTV triangle: customers grouped by first-order quarter
    # (cohort), revenue rolled up by quarters-since-acquisition. Exact
    # cents; quarter index is integer arithmetic (year·4 + quarter). Two
    # fact shuffles: the first-order aggregate and the cohort rollup.
    oracle="""
WITH qo AS (
  SELECT o_custkey AS custkey,
         CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS price_cents,
         CAST(EXTRACT(year FROM o_orderdate) * 4
              + (EXTRACT(quarter FROM o_orderdate) - 1) AS BIGINT) AS qidx
  FROM orders
),
firstq AS (
  SELECT custkey, MIN(qidx) AS cohort_q FROM qo GROUP BY custkey
)
SELECT CAST(cohort_q // 4 AS INTEGER) AS cohort_year,
       CAST(cohort_q % 4 + 1 AS INTEGER) AS cohort_quarter,
       CAST(qo.qidx - f.cohort_q AS INTEGER) AS age_quarters,
       CAST(COUNT(DISTINCT qo.custkey) AS BIGINT) AS n_customers,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(price_cents) AS DOUBLE) / 100.0 AS revenue
FROM qo JOIN firstq f ON f.custkey = qo.custkey
GROUP BY cohort_q, age_quarters
""",
    tags=("orders", "cohort", "ltv"),
)
def q_orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    qo = o.select(
        F.col("o_custkey").alias("custkey"),
        cents("o_totalprice").alias("price_cents"),
        (F.year("o_orderdate") * 4 + (F.quarter("o_orderdate") - 1))
        .cast("long")
        .alias("qidx"),
    )
    firstq = qo.groupBy("custkey").agg(F.min("qidx").alias("cohort_q"))
    joined = qo.join(firstq, "custkey")
    return (
        joined.groupBy(
            "cohort_q",
            (F.col("qidx") - F.col("cohort_q")).cast("int").alias("age_quarters"),
        )
        .agg(
            F.countDistinct("custkey").cast("long").alias("n_customers"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            dollars(F.sum("price_cents")).alias("revenue"),
        )
        .select(
            F.floor(F.col("cohort_q") / 4).cast("int").alias("cohort_year"),
            (F.col("cohort_q") % 4 + 1).cast("int").alias("cohort_quarter"),
            "age_quarters",
            "n_customers",
            "n_orders",
            "revenue",
        )
    )


@register(
    "customer_first_value_repeat",
    # Does a bigger first order predict coming back? Customers bucket into
    # deciles of their FIRST order's value; each decile reports its
    # repeat-purchase share and average order count — the
    # acquisition-quality curve growth teams steer spend with. First
    # order = earliest (orderdate, orderkey) — a deterministic tie-break,
    # exact cents, and every share one integer division.
    oracle="""
WITH ranked AS (
  SELECT o_custkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rn,
         COUNT(*) OVER (PARTITION BY o_custkey) AS n_orders
  FROM orders
),
fv AS (
  SELECT o_custkey, CAST(n_orders AS BIGINT) AS n_orders,
         CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS first_cents
  FROM ranked WHERE rn = 1
),
tiled AS (
  SELECT n_orders, first_cents,
         NTILE(10) OVER (ORDER BY first_cents ASC, o_custkey ASC) AS decile
  FROM fv
)
SELECT decile,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(first_cents) AS DOUBLE) / COUNT(*) / 100.0
         AS avg_first_value,
       CAST(SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS repeat_share,
       CAST(SUM(n_orders) AS DOUBLE) / COUNT(*) AS avg_orders
FROM tiled GROUP BY decile
""",
    tags=("customer", "growth", "economics"),
)
def q_customer_first_value_repeat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One customer-grain shuffle finds first orders (min-struct, no
    second scan), a self-join fetches the first order's value, and the
    decile assignment uses the distributed exact NTILE
    (operators/ranks.py) — customer grain is sf-proportional, so the old
    no-partition Window was a single-partition sort at scale."""
    from procurement_data_pipeline_spark.caching import scoped_persist
    from procurement_data_pipeline_spark.operators.ranks import (
        with_global_ntile,
    )

    o = load_table(spark, sf_dir, "orders")
    wcust = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    fv = scoped_persist(
        o.select(
            "o_custkey",
            F.row_number().over(wcust).alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy("o_custkey")).alias("n_orders"),
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("first_cents"),
        )
        .where(F.col("rn") == 1)
        .select("o_custkey", F.col("n_orders").cast("long").alias("n_orders"), "first_cents")
    )
    tiled = with_global_ntile(
        fv, [F.col("first_cents").asc(), F.col("o_custkey").asc()], 10, "decile"
    ).select("n_orders", "first_cents", "decile")
    return tiled.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        (
            F.sum("first_cents").cast("double") / F.count(F.lit(1)) / F.lit(100.0)
        ).alias("avg_first_value"),
        (
            F.sum(F.when(F.col("n_orders") >= 2, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1))
        ).alias("repeat_share"),
        (F.sum("n_orders").cast("double") / F.count(F.lit(1))).alias("avg_orders"),
    )


_NTH_EVENT = 5


@register(
    "events_time_to_nth",
    # Activation speed: per user, the time from their FIRST event to
    # their Nth (N = 5) — then the distribution of those activation times
    # across users as exact decile order statistics. The product-growth
    # metric behind "how fast do users reach the aha moment". All times
    # are exact integer microseconds; deciles are element_at over the
    # sorted user-grain values (bounded far below fact volume).
    oracle=f"""
WITH ranked AS (
  SELECT user_id, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
),
per_user AS (
  SELECT user_id,
         epoch_us(MAX(CASE WHEN rn = {_NTH_EVENT} THEN ts END))
           - epoch_us(MAX(CASE WHEN rn = 1 THEN ts END)) AS t_us
  FROM ranked WHERE rn = 1 OR rn = {_NTH_EVENT}
  GROUP BY user_id
  HAVING MAX(CASE WHEN rn = {_NTH_EVENT} THEN ts END) IS NOT NULL
),
s AS (
  SELECT list_sort(list(t_us)) AS ts_sorted, CAST(COUNT(*) AS BIGINT) AS n
  FROM per_user
),
q AS (SELECT UNNEST(range(1, 10)) AS decile)
SELECT q.decile,
       s.n AS n_users,
       CAST(list_extract(s.ts_sorted,
            CAST(CEIL(q.decile * s.n / 10.0) AS INT)) AS DOUBLE)
         / 1000000.0 / 3600.0 AS hours_to_nth
FROM s CROSS JOIN q
""",
    tags=("events", "growth", "activation"),
)
def q_events_time_to_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One user_id window pass keeps only rows 1 and N per user, then a
    user-grain sorted fold + 9 order-statistic lookups."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ranked = ev.select(
        "user_id", "ts", F.row_number().over(w).alias("rn")
    ).where((F.col("rn") == 1) | (F.col("rn") == _NTH_EVENT))
    per_user = (
        ranked.groupBy("user_id")
        .agg(
            (
                F.unix_micros(F.max(F.when(F.col("rn") == _NTH_EVENT, F.col("ts"))))
                - F.unix_micros(F.max(F.when(F.col("rn") == 1, F.col("ts"))))
            ).alias("t_us"),
            F.max(F.when(F.col("rn") == _NTH_EVENT, F.col("ts"))).alias("_nth"),
        )
        .where(F.col("_nth").isNotNull())
        .select("t_us")
    )
    s = per_user.agg(
        F.sort_array(F.collect_list("t_us")).alias("ts_sorted"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    q = spark.createDataFrame([(d,) for d in range(1, 10)], "decile int")
    val = F.element_at(
        "ts_sorted", F.ceil(F.col("decile") * F.col("n") / F.lit(10.0)).cast("int")
    )
    return (
        s.crossJoin(F.broadcast(q))
        .groupBy("decile")
        .agg(
            F.max("n").alias("n_users"),
            F.max(val.cast("double") / F.lit(1000000.0) / F.lit(3600.0)).alias(
                "hours_to_nth"
            ),
        )
    )


@register(
    "customer_value_migration",
    # Segment-migration matrix: customers tercile by revenue in the FIRST
    # half of the order history, re-tercile in the SECOND half, and the
    # matrix counts who moved where (plus 'absent' for one-sided
    # customers) — the churn/upsell picture a single-period segmentation
    # hides. Terciles are exact ranks over the customer dim; shares one
    # division.
    oracle="""
WITH halves AS (
  SELECT o_custkey,
         SUM(CASE WHEN o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
             THEN CAST(FLOOR(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS c1,
         SUM(CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
             THEN CAST(FLOOR(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS c2
  FROM orders GROUP BY o_custkey
),
seg AS (
  SELECT o_custkey,
         CASE WHEN c1 = 0 THEN 'absent' ELSE
           CASE NTILE(3) OVER (PARTITION BY CASE WHEN c1 = 0 THEN 1 ELSE 0 END
                               ORDER BY c1 ASC, o_custkey ASC)
                WHEN 1 THEN 'low' WHEN 2 THEN 'mid' ELSE 'high' END
         END AS seg1,
         CASE WHEN c2 = 0 THEN 'absent' ELSE
           CASE NTILE(3) OVER (PARTITION BY CASE WHEN c2 = 0 THEN 1 ELSE 0 END
                               ORDER BY c2 ASC, o_custkey ASC)
                WHEN 1 THEN 'low' WHEN 2 THEN 'mid' ELSE 'high' END
         END AS seg2
  FROM halves
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM seg)
SELECT s.seg1, s.seg2,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(COUNT(*) AS DOUBLE) / MAX(t.n) AS share
FROM seg s CROSS JOIN tot t
GROUP BY s.seg1, s.seg2
""",
    tags=("customer", "growth", "segmentation"),
)
def q_customer_value_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One customer-grain shuffle computes both halves' revenue; two
    rank windows over the customer dim (zero-revenue customers isolated
    into their own partition so ntile ranks only actives); a 4×4 rollup."""
    o = load_table(spark, sf_dir, "orders")
    split = F.lit("1998-01-01").cast("timestamp")
    cc = F.floor(F.col("o_totalprice") * 100).cast("long")
    zero = F.lit(0).cast("long")
    halves = o.groupBy("o_custkey").agg(
        F.sum(F.when(F.col("o_orderdate") < split, cc).otherwise(zero)).alias("c1"),
        F.sum(F.when(F.col("o_orderdate") >= split, cc).otherwise(zero)).alias("c2"),
    )

    def seg(col):
        active = F.when(F.col(col) == 0, 1).otherwise(0)
        w = Window.partitionBy(active).orderBy(
            F.col(col).asc(), F.col("o_custkey").asc()
        )
        t = F.ntile(3).over(w)
        return F.when(F.col(col) == 0, "absent").otherwise(
            F.when(t == 1, "low").when(t == 2, "mid").otherwise("high")
        )

    segs = halves.select(
        "o_custkey", seg("c1").alias("seg1"), seg("c2").alias("seg2")
    )
    tot = segs.agg(F.count(F.lit(1)).cast("long").alias("n"))
    return (
        segs.crossJoin(F.broadcast(tot))
        .groupBy("seg1", "seg2")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            (F.count(F.lit(1)).cast("double") / F.max("n")).alias("share"),
        )
    )


@register(
    "events_growth_accounting",
    # Daily growth accounting (the new/retained/resurrected/churned
    # decomposition): every DAU number explained as new + retained +
    # resurrected, with yesterday's churn alongside — the identity
    # dau_today = new + retained + resurrected (and
    # dau_yesterday = retained + churned) holds EXACTLY by construction,
    # so the decomposition self-audits. One dedup to (user, day) pairs,
    # one user-window pass computing previous-active-day and first-day,
    # one day-grain rollup — all exact integer counts.
    oracle="""
WITH pairs AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
  FROM events
),
flagged AS (
  SELECT user_id, day,
         LAG(day) OVER (PARTITION BY user_id ORDER BY day) AS prev_day,
         MIN(day) OVER (PARTITION BY user_id) AS first_day
  FROM pairs
),
classified AS (
  SELECT day,
         CASE WHEN day = first_day THEN 'new'
              WHEN prev_day = day - INTERVAL 1 DAY THEN 'retained'
              ELSE 'resurrected' END AS state
  FROM flagged
),
churn AS (
  -- active on day d, not on d+1 → churned as of d+1
  SELECT f.day + INTERVAL 1 DAY AS day, CAST(COUNT(*) AS BIGINT) AS churned
  FROM flagged f
  LEFT JOIN pairs p ON p.user_id = f.user_id
                   AND p.day = f.day + INTERVAL 1 DAY
  WHERE p.user_id IS NULL
  GROUP BY f.day + INTERVAL 1 DAY
),
rollup AS (
  SELECT day,
         CAST(SUM(CASE WHEN state = 'new' THEN 1 ELSE 0 END) AS BIGINT)
           AS new_users,
         CAST(SUM(CASE WHEN state = 'retained' THEN 1 ELSE 0 END) AS BIGINT)
           AS retained,
         CAST(SUM(CASE WHEN state = 'resurrected' THEN 1 ELSE 0 END) AS BIGINT)
           AS resurrected,
         CAST(COUNT(*) AS BIGINT) AS dau
  FROM classified GROUP BY day
)
SELECT CAST(r.day AS DATE) AS day, r.new_users, r.retained, r.resurrected,
       COALESCE(c.churned, 0) AS churned, r.dau
FROM rollup r LEFT JOIN churn c ON c.day = r.day
""",
    tags=("events", "growth", "accounting"),
)
def q_events_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (user, day) dedup is the only fact-sized shuffle; the state
    classification is one user-partition window; churn is an anti-join of
    the SAME pair relation against its day+1 shift."""
    ev = load_table(spark, sf_dir, "events")
    pairs = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).distinct()
    from procurement_data_pipeline_spark.caching import scoped_persist

    pairs = scoped_persist(pairs)
    w = Window.partitionBy("user_id").orderBy("day")
    flagged = pairs.select(
        "user_id",
        "day",
        F.lag("day").over(w).alias("prev_day"),
        F.min("day").over(Window.partitionBy("user_id")).alias("first_day"),
    )
    state = (
        F.when(F.col("day") == F.col("first_day"), "new")
        .when(F.col("prev_day") == F.date_sub(F.col("day"), 1), "retained")
        .otherwise("resurrected")
    )
    rollup = (
        flagged.select("day", state.alias("state"))
        .groupBy("day")
        .agg(
            F.sum(F.when(F.col("state") == "new", 1).otherwise(0))
            .cast("long")
            .alias("new_users"),
            F.sum(F.when(F.col("state") == "retained", 1).otherwise(0))
            .cast("long")
            .alias("retained"),
            F.sum(F.when(F.col("state") == "resurrected", 1).otherwise(0))
            .cast("long")
            .alias("resurrected"),
            F.count(F.lit(1)).cast("long").alias("dau"),
        )
    )
    nxt = pairs.select(
        F.col("user_id").alias("u2"), F.col("day").alias("d2")
    )
    churn = (
        flagged.join(
            nxt,
            (F.col("user_id") == F.col("u2"))
            & (F.col("d2") == F.date_add(F.col("day"), 1)),
            "left_anti",
        )
        .groupBy(F.date_add(F.col("day"), 1).alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("churned"))
    )
    return rollup.join(churn, "day", "left").select(
        "day",
        "new_users",
        "retained",
        "resurrected",
        F.coalesce(F.col("churned"), F.lit(0).cast("long")).alias("churned"),
        "dau",
    )


@register(
    "part_brand_return_rate",
    # Return-rate by brand: share of shipped quantity (and revenue) that
    # came back (l_returnflag = 'R') — the quality/fit signal behind
    # assortment reviews. Exact milli-quantities and cents; each share is
    # ONE integer division.
    oracle="""
WITH lines AS (
  SELECT p.p_brand,
         CAST(FLOOR(l.l_quantity * 1000) AS BIGINT) AS qm,
         CAST(FLOOR(l.l_extendedprice * 100) AS BIGINT) AS rc,
         CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
)
SELECT p_brand,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(ret) AS BIGINT) AS n_returned,
       CAST(SUM(ret * qm) AS DOUBLE) / SUM(qm) AS qty_return_share,
       CAST(SUM(ret * rc) AS DOUBLE) / SUM(rc) AS revenue_return_share
FROM lines GROUP BY p_brand
""",
    tags=("part", "quality", "retail"),
)
def q_part_brand_return_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One broadcast dim join + one brand-grain aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    lines = li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey")).select(
        "p_brand",
        F.floor(F.col("l_quantity") * 1000).cast("long").alias("qm"),
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("rc"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("ret"),
    )
    return lines.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum("ret").cast("long").alias("n_returned"),
        (
            F.sum(F.col("ret") * F.col("qm")).cast("double") / F.sum("qm")
        ).alias("qty_return_share"),
        (
            F.sum(F.col("ret") * F.col("rc")).cast("double") / F.sum("rc")
        ).alias("revenue_return_share"),
    )
