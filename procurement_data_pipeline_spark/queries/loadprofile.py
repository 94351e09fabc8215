"""Declared queries: load-shape analytics — spectral periodicity and
concurrency sweep-line, the two readouts a capacity planner runs on an
event stream.

* events_dft_daily_power — single-bin discrete Fourier transform of the
  hourly value series at the 24 h and 12 h periods: "how strongly daily
  (and half-daily) is this workload?" — the quantitative form of the
  seasonality eyeball. Transcendentals are BANNED in graded outputs (cos
  is not correctly rounded), so the phase table cos(2πi/P), sin(2πi/P)
  is computed ONCE in Python at import and embedded as INTEGER literals
  (round(1e6·x)) in both engines; every correlation Σ y·cos is then an
  exact integer sum, and the doubles appear only in the final pinned
  division/multiply chain. The phase index is the epoch-hour modulo the
  period — integer `div`/`%` on unix micros, identical in both engines.
* events_peak_concurrency — the classic interval sweep-line: how many
  30-min-gap sessions are simultaneously open, per day, at its daily
  peak. +1/−1 deltas at session start / end+1µs, NETTED PER TIMESTAMP
  before the running sum (so the instantaneous count is well-defined
  regardless of tie order), day-partitioned cumulative sums with a
  bounded day-level carry prefix — the 100 TB-shaped form of the single
  global running sum (which would need one task for the whole stream).
  Pure integer counts; no divisions at all.

All names register past the graded first-50 prefix (GRADE_OVERFLOW in
__spark_entry__.py); tools/check_oracle.py hash-checks each at sf0.01.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from procurement_data_pipeline_spark.functions.money import cents
from procurement_data_pipeline_spark.queries.events import SESSION_GAP_MIN
from procurement_data_pipeline_spark.registry import register
from procurement_data_pipeline_spark.sources.tables import load_table

_US_PER_HOUR = 3_600_000_000

# Literal-pinned quantized phase tables (round(1e6·cos), exact integers —
# the same pinning pattern as the NDCG/Benford log constants elsewhere).
_COS24 = [round(1e6 * math.cos(2 * math.pi * i / 24)) for i in range(24)]
_SIN24 = [round(1e6 * math.sin(2 * math.pi * i / 24)) for i in range(24)]
_COS12 = [round(1e6 * math.cos(2 * math.pi * i / 12)) for i in range(12)]
_SIN12 = [round(1e6 * math.sin(2 * math.pi * i / 12)) for i in range(12)]


def _sql_tab(tab: list[int], phase: str) -> str:
    return f"[{', '.join(str(v) for v in tab)}][{phase} + 1]"


@register(
    "events_dft_daily_power",
    # Exactness: hourly totals are integer cents; Σ y·coef products are
    # integers ≤ ~2e15 at sf1 (HUGEINT/decimal sums whose DOUBLE cast is
    # value-exact below 2^53); each Fourier coefficient is ONE division
    # by 1e8 (cents·1e6 quantization), power/amplitude are pinned
    # multiply/sqrt/divide chains (sqrt IS correctly rounded).
    #
    # Scale shape: one shuffle to (type, hour) grain with map-side
    # partials, then a per-type scalar rollup. The phase lookup is a
    # 24-element array literal — whole-stage codegen, no join. 100×-safe.
    oracle=f"""
WITH hourly AS (
  SELECT event_type,
         epoch_us(ts) // {_US_PER_HOUR} AS h,
         SUM(CAST(FLOOR(value * 100) AS HUGEINT)) AS y
  FROM events GROUP BY 1, 2
),
phased AS (
  SELECT event_type, y,
         CAST(h % 24 AS INTEGER) AS p24,
         CAST(h % 12 AS INTEGER) AS p12
  FROM hourly
),
corr AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_hours,
         SUM(y * {_sql_tab(_COS24, 'p24')}) AS ac24,
         SUM(y * {_sql_tab(_SIN24, 'p24')}) AS as24,
         SUM(y * {_sql_tab(_COS12, 'p12')}) AS ac12,
         SUM(y * {_sql_tab(_SIN12, 'p12')}) AS as12
  FROM phased GROUP BY 1
)
SELECT event_type, n_hours,
       CAST(ac24 AS DOUBLE) / 1e8 AS cos24,
       CAST(as24 AS DOUBLE) / 1e8 AS sin24,
       (CAST(ac24 AS DOUBLE) / 1e8) * (CAST(ac24 AS DOUBLE) / 1e8)
         + (CAST(as24 AS DOUBLE) / 1e8) * (CAST(as24 AS DOUBLE) / 1e8)
         AS power24,
       2.0 * SQRT((CAST(ac24 AS DOUBLE) / 1e8) * (CAST(ac24 AS DOUBLE) / 1e8)
                  + (CAST(as24 AS DOUBLE) / 1e8) * (CAST(as24 AS DOUBLE) / 1e8))
         / CAST(n_hours AS DOUBLE) AS amplitude24,
       CAST(ac12 AS DOUBLE) / 1e8 AS cos12,
       CAST(as12 AS DOUBLE) / 1e8 AS sin12,
       (CAST(ac12 AS DOUBLE) / 1e8) * (CAST(ac12 AS DOUBLE) / 1e8)
         + (CAST(as12 AS DOUBLE) / 1e8) * (CAST(as12 AS DOUBLE) / 1e8)
         AS power12,
       2.0 * SQRT((CAST(ac12 AS DOUBLE) / 1e8) * (CAST(ac12 AS DOUBLE) / 1e8)
                  + (CAST(as12 AS DOUBLE) / 1e8) * (CAST(as12 AS DOUBLE) / 1e8))
         / CAST(n_hours AS DOUBLE) AS amplitude12
FROM corr
""",
    tags=("events", "spectral", "seasonality"),
)
def q_events_dft_daily_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        F.expr(f"unix_micros(ts) div {_US_PER_HOUR}").alias("h"),
    ).agg(F.sum(cents("value").cast("decimal(38,0)")).alias("y"))
    phased = hourly.select(
        "event_type",
        "y",
        (F.col("h") % 24).cast("int").alias("p24"),
        (F.col("h") % 12).cast("int").alias("p12"),
    )

    def coef(tab: list[int], phase: str):
        return F.element_at(F.lit(tab), F.col(phase) + 1)

    corr = phased.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_hours"),
        F.sum(F.col("y") * coef(_COS24, "p24")).alias("ac24"),
        F.sum(F.col("y") * coef(_SIN24, "p24")).alias("as24"),
        F.sum(F.col("y") * coef(_COS12, "p12")).alias("ac12"),
        F.sum(F.col("y") * coef(_SIN12, "p12")).alias("as12"),
    )

    def outputs(pfx: str):
        a = F.col(f"ac{pfx}").cast("double") / F.lit(1e8)
        b = F.col(f"as{pfx}").cast("double") / F.lit(1e8)
        power = a * a + b * b
        amp = F.lit(2.0) * F.sqrt(a * a + b * b) / F.col("n_hours").cast("double")
        return [
            a.alias(f"cos{pfx}"),
            b.alias(f"sin{pfx}"),
            power.alias(f"power{pfx}"),
            amp.alias(f"amplitude{pfx}"),
        ]

    return corr.select("event_type", "n_hours", *outputs("24"), *outputs("12"))


@register(
    "events_peak_concurrency",
    # Exactness: pure integer sweep-line — session boundaries from the
    # same gap rule as events_sessionization, +1/−1 deltas netted per
    # microsecond timestamp, then day-local cumulative sums plus an
    # exclusive day-level carry prefix. No doubles anywhere.
    #
    # Scale shape: sessionization is one user_id shuffle; the sweep nets
    # per (day, ts) with map-side partials; the only ordered global pass
    # is over DAYS (bounded), broadcast back as carry. The single-task
    # alternative (one running sum over every boundary) is exactly what
    # this decomposition avoids at 100 TB.
    oracle=f"""
WITH pts AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER
                     (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                   > {SESSION_GAP_MIN} * 60 * 1000000
              OR LAG(epoch_us(ts)) OVER
                     (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                   IS NULL
              THEN 1 ELSE 0 END AS is_start
  FROM events
),
sess AS (
  SELECT user_id,
         SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                             ROWS UNBOUNDED PRECEDING) AS sess_no,
         ts_us
  FROM pts
),
bounds AS (
  SELECT MIN(ts_us) AS start_us, MAX(ts_us) + 1 AS end_us
  FROM sess GROUP BY user_id, sess_no
),
deltas AS (
  SELECT start_us AS ts_us, 1 AS delta, 1 AS started FROM bounds
  UNION ALL
  SELECT end_us AS ts_us, -1 AS delta, 0 AS started FROM bounds
),
netted AS (
  SELECT CAST(make_timestamp(ts_us) AS DATE) AS day, ts_us,
         CAST(SUM(delta) AS BIGINT) AS net,
         CAST(SUM(started) AS BIGINT) AS n_started
  FROM deltas GROUP BY 1, 2
),
daily AS (
  SELECT day, SUM(net) AS day_net FROM netted GROUP BY 1
),
carry AS (
  SELECT day,
         COALESCE(SUM(day_net) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS carry_in
  FROM daily
),
running AS (
  SELECT n.day,
         c.carry_in + SUM(n.net) OVER (PARTITION BY n.day ORDER BY n.ts_us
                       ROWS UNBOUNDED PRECEDING) AS conc,
         n.n_started
  FROM netted n JOIN carry c ON c.day = n.day
)
SELECT day,
       CAST(MAX(conc) AS BIGINT) AS peak_concurrency,
       CAST(SUM(n_started) AS BIGINT) AS sessions_started
FROM running GROUP BY 1
""",
    tags=("events", "sessions", "capacity", "sweep-line"),
)
def q_events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros(F.col("ts")).alias("ts_us"), "event_id"
    )
    by_user = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap_us = SESSION_GAP_MIN * 60 * 1_000_000
    prev = F.lag("ts_us").over(by_user)
    pts = ev.withColumn(
        "is_start",
        F.when(prev.isNull() | ((F.col("ts_us") - prev) > gap_us), 1).otherwise(0),
    )
    sess_w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = pts.withColumn("sess_no", F.sum("is_start").over(sess_w))
    bounds = sess.groupBy("user_id", "sess_no").agg(
        F.min("ts_us").alias("start_us"),
        (F.max("ts_us") + 1).alias("end_us"),
    )
    # Both sweep deltas fan out from ONE bounds row in-codegen (round 12):
    # the former two-branch union replayed the whole sessionization
    # window + groupBy subtree once per branch — same (ts_us, delta,
    # started) relation, half the session passes.
    deltas = bounds.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("start_us").alias("ts_us"),
                    F.lit(1).alias("delta"),
                    F.lit(1).alias("started"),
                ),
                F.struct(
                    F.col("end_us").alias("ts_us"),
                    F.lit(-1).alias("delta"),
                    F.lit(0).alias("started"),
                ),
            )
        ).alias("_d")
    ).select("_d.ts_us", "_d.delta", "_d.started")
    netted = deltas.groupBy(
        F.timestamp_micros(F.col("ts_us")).cast("date").alias("day"), "ts_us"
    ).agg(
        F.sum("delta").cast("long").alias("net"),
        F.sum("started").cast("long").alias("n_started"),
    )
    daily = netted.groupBy("day").agg(F.sum("net").alias("day_net"))
    carry_w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    carry = daily.select(
        "day",
        F.coalesce(F.sum("day_net").over(carry_w), F.lit(0)).alias("carry_in"),
    )
    run_w = (
        Window.partitionBy("day")
        .orderBy("ts_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = netted.join(carry, "day").select(
        "day",
        (F.col("carry_in") + F.sum("net").over(run_w)).alias("conc"),
        "n_started",
    )
    return running.groupBy("day").agg(
        F.max("conc").cast("long").alias("peak_concurrency"),
        F.sum("n_started").cast("long").alias("sessions_started"),
    )


_US_PER_DAY = 86_400_000_000


@register(
    "events_littles_law",
    # Little's law readout per day: L (time-average concurrent sessions),
    # λ (session starts per hour), W (mean duration of sessions started
    # that day) — the capacity-planning triple whose steady-state identity
    # L = λ·W tells a planner whether load comes from MORE sessions or
    # LONGER ones. The global conservation ∫active dt = Σ durations is
    # exact by Fubini and asserted in the model test.
    #
    # Exactness: sessions come from the SAME gap rule as
    # events_sessionization; per-day overlaps are pure integer microsecond
    # clips (LEAST/GREATEST of exact epochs) whose sum telescopes to the
    # exact duration; L/λ/W are pinned division chains over exact integers.
    #
    # Scale shape: one user_id shuffle to build sessions, an explode
    # bounded by days-per-session (gap-bounded sessions span ≤ 2 calendar
    # days), then day-grain rollups with map-side partials. No global
    # window, no carry pass — the integral is additive per (session, day).
    oracle=f"""
WITH pts AS (
  SELECT user_id, ts, epoch_us(ts) AS ts_us, event_id,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER
                     (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                   > {SESSION_GAP_MIN} * 60 * 1000000
              OR LAG(epoch_us(ts)) OVER
                     (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                   IS NULL
              THEN 1 ELSE 0 END AS is_start
  FROM events
),
sess AS (
  SELECT user_id, ts_us,
         SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                             ROWS UNBOUNDED PRECEDING) AS sess_no
  FROM pts
),
bounds AS (
  SELECT user_id, sess_no,
         CAST(MIN(ts_us) AS BIGINT) AS s_us,
         CAST(MAX(ts_us) AS BIGINT) AS e_us
  FROM sess GROUP BY 1, 2
),
clipped AS (
  SELECT CAST(u.g AS DATE) AS day,
         CAST(LEAST(b.e_us, epoch_us(CAST(u.g AS TIMESTAMP)) + {_US_PER_DAY})
              - GREATEST(b.s_us, epoch_us(CAST(u.g AS TIMESTAMP)))
              AS BIGINT) AS overlap_us,
         CASE WHEN CAST(u.g AS DATE) = CAST(make_timestamp(b.s_us) AS DATE)
              THEN 1 ELSE 0 END AS started,
         CASE WHEN CAST(u.g AS DATE) = CAST(make_timestamp(b.s_us) AS DATE)
              THEN b.e_us - b.s_us ELSE 0 END AS dur_started_us
  FROM bounds b,
       LATERAL (
         SELECT unnest(generate_series(
           CAST(make_timestamp(b.s_us) AS DATE),
           CAST(make_timestamp(b.e_us) AS DATE),
           INTERVAL 1 DAY)) AS g
       ) u
)
SELECT day,
       CAST(SUM(started) AS BIGINT) AS n_started,
       CAST(COUNT(*) AS BIGINT) AS n_active_sessions,
       CAST(SUM(overlap_us) AS BIGINT) AS active_us,
       CAST(SUM(overlap_us) AS DOUBLE) / {float(_US_PER_DAY)!r} AS l_avg,
       CAST(SUM(started) AS DOUBLE) / 24.0 AS lambda_starts_per_hour,
       CASE WHEN SUM(started) > 0 THEN
         (CAST(SUM(dur_started_us) AS DOUBLE)
            / CAST(SUM(started) AS DOUBLE)) / 60000000.0
       END AS w_mean_min
FROM clipped
GROUP BY day
""",
    tags=("events", "capacity", "littles-law"),
)
def q_events_littles_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros(F.col("ts")).alias("ts_us"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    pts = ev.withColumn(
        "is_start",
        F.when(
            F.lag("ts_us").over(w).isNull()
            | (
                F.col("ts_us") - F.lag("ts_us").over(w)
                > SESSION_GAP_MIN * 60 * 1_000_000
            ),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    sess = pts.withColumn(
        "sess_no",
        F.sum("is_start").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    bounds = sess.groupBy("user_id", "sess_no").agg(
        F.min("ts_us").cast("long").alias("s_us"),
        F.max("ts_us").cast("long").alias("e_us"),
    )
    clipped = bounds.select(
        F.explode(
            F.sequence(
                F.timestamp_micros(F.col("s_us")).cast("date"),
                F.timestamp_micros(F.col("e_us")).cast("date"),
            )
        ).alias("day"),
        "s_us",
        "e_us",
    ).select(
        "day",
        (
            F.least(
                F.col("e_us"),
                F.unix_micros(F.col("day").cast("timestamp"))
                + F.lit(_US_PER_DAY),
            )
            - F.greatest(
                F.col("s_us"), F.unix_micros(F.col("day").cast("timestamp"))
            )
        )
        .cast("long")
        .alias("overlap_us"),
        F.when(
            F.col("day") == F.timestamp_micros(F.col("s_us")).cast("date"),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("started"),
        F.when(
            F.col("day") == F.timestamp_micros(F.col("s_us")).cast("date"),
            F.col("e_us") - F.col("s_us"),
        )
        .otherwise(F.lit(0))
        .alias("dur_started_us"),
    )
    agg = clipped.groupBy("day").agg(
        F.sum("started").cast("long").alias("n_started"),
        F.count(F.lit(1)).cast("long").alias("n_active_sessions"),
        F.sum("overlap_us").cast("long").alias("active_us"),
        F.sum("dur_started_us").cast("long").alias("dur_started_us"),
    )
    return agg.select(
        "day",
        "n_started",
        "n_active_sessions",
        "active_us",
        (F.col("active_us").cast("double") / F.lit(float(_US_PER_DAY))).alias(
            "l_avg"
        ),
        (F.col("n_started").cast("double") / F.lit(24.0)).alias(
            "lambda_starts_per_hour"
        ),
        F.when(
            F.col("n_started") > 0,
            (
                F.col("dur_started_us").cast("double")
                / F.col("n_started").cast("double")
            )
            / F.lit(60000000.0),
        ).alias("w_mean_min"),
    )
