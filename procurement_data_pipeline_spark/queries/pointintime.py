"""Declared query: point-in-time (PIT) SCD2 join — feature-store
correctness for facts against dimension HISTORY.

events_scd2_pointintime — for every purchase, the user's browsing state
AS OF the purchase instant: which state (and which VERSION of it) was
live when the fact happened. Joining facts to a dimension's current row
leaks the future (training-serving skew, mis-restated history); the PIT
join is the pattern feature stores and auditable warehouses exist to
provide.

Composition of two existing operators, no new machinery: the SCD2
compactor (operators/cdc.scd2_compact) builds the versioned state
history from non-purchase events, and the as-of join
(operators/asof.asof_join — union + running-last, ONE shuffle on the
key, never an interval BNLJ) attaches the interval whose
[valid_from, valid_to) contains each purchase. The DuckDB oracle states
the SEMANTIC definition — a LEFT interval-containment join against the
same compacted history — so the hash check proves the shuffle-native
form implements the textbook definition exactly.

Registers past the graded first-50 prefix (GRADE_OVERFLOW in
__spark_entry__.py); tools/check_oracle.py hash-checks it at sf0.01.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from procurement_data_pipeline_spark.operators.asof import asof_join
from procurement_data_pipeline_spark.operators.cdc import scd2_compact
from procurement_data_pipeline_spark.registry import register
from procurement_data_pipeline_spark.sources.tables import load_table


@register(
    "events_scd2_pointintime",
    oracle="""
WITH base AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events
),
dim_src AS (SELECT * FROM base WHERE event_type <> 'purchase'),
flagged AS (
  SELECT user_id, event_id, event_type, ts_us,
         CASE WHEN LAG(event_type) OVER w IS NULL
                OR LAG(event_type) OVER w <> event_type
              THEN 1 ELSE 0 END AS is_change
  FROM dim_src
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
versioned AS (
  SELECT user_id, event_type, ts_us,
         CAST(SUM(is_change) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS INTEGER) AS version
  FROM flagged
),
scd2 AS (
  SELECT user_id, version, event_type, MIN(ts_us) AS valid_from_us,
         LEAD(MIN(ts_us)) OVER (PARTITION BY user_id ORDER BY version)
           AS valid_to_us
  FROM versioned GROUP BY user_id, version, event_type
)
SELECT f.event_id, f.user_id, f.ts_us,
       d.event_type AS state_at, d.version AS state_version,
       d.valid_from_us AS state_since_us
FROM (SELECT * FROM base WHERE event_type = 'purchase') f
LEFT JOIN scd2 d
  ON d.user_id = f.user_id
 AND d.valid_from_us <= f.ts_us
 AND (d.valid_to_us IS NULL OR f.ts_us < d.valid_to_us)
""",
    tags=("events", "scd2", "pit", "feature-store"),
)
def q_events_scd2_pointintime(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts")).alias("ts_us"),
    )
    dim = scd2_compact(
        ev.filter(F.col("event_type") != "purchase"),
        key_col="user_id",
        ts_col="ts_us",
        order_col="event_id",
        state_col="event_type",
    ).select(
        "user_id",
        F.col("valid_from").alias("ts_us"),
        F.col("event_type").alias("state"),
        "version",
    )
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us"
    )
    joined = asof_join(
        facts, dim, on="user_id", ts_col="ts_us", value_cols=["state", "version"]
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts_us",
        F.col("state_asof").alias("state_at"),
        F.col("version_asof").alias("state_version"),
        F.col("ts_us_asof").alias("state_since_us"),
    )


@register(
    "events_state_dwell_share",
    # Time-IN-state, not event counts: how long does the population sit in
    # each state? Interval dwell = valid_to − valid_from, with each user's
    # open interval closed at their last event (observed horizon). All
    # durations are exact integer micros; the share is one IEEE division.
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
         CAST(SUM(is_change) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS INTEGER) AS version
  FROM flagged
),
runs AS (
  SELECT user_id, version, event_type, MIN(ts_us) AS valid_from_us
  FROM versioned GROUP BY user_id, version, event_type
),
horizon AS (SELECT user_id, MAX(ts_us) AS last_ts FROM base GROUP BY user_id),
ivs AS (
  SELECT r.user_id, r.event_type, r.valid_from_us,
         COALESCE(LEAD(r.valid_from_us) OVER (PARTITION BY r.user_id
                                              ORDER BY r.version),
                  h.last_ts) AS valid_to_us
  FROM runs r JOIN horizon h ON h.user_id = r.user_id
),
agg AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_intervals,
         CAST(SUM(valid_to_us - valid_from_us) AS BIGINT) AS dwell_us
  FROM ivs GROUP BY event_type
)
SELECT event_type, n_intervals, dwell_us,
       CAST(dwell_us AS DOUBLE) / (SELECT CAST(SUM(dwell_us) AS DOUBLE) FROM agg)
         AS dwell_share
FROM agg
""",
    tags=("events", "scd2", "dwell"),
)
def q_events_state_dwell_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """scd2_compact gives the intervals; each user's open interval closes
    at their own last event (no global scalar needed — the horizon rides
    the same user-key shuffle). One tiny state-grain aggregate + a 1-row
    total broadcast finishes it."""
    from procurement_data_pipeline_spark.caching import scoped_persist

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts")).alias("ts_us"),
    )
    ivs = scd2_compact(
        ev, key_col="user_id", ts_col="ts_us", order_col="event_id",
        state_col="event_type",
    )
    horizon = ev.groupBy("user_id").agg(F.max("ts_us").alias("last_ts"))
    closed = ivs.join(horizon, "user_id").select(
        "event_type",
        (
            F.coalesce(F.col("valid_to"), F.col("last_ts")) - F.col("valid_from")
        ).alias("dwell"),
    )
    agg = scoped_persist(
        closed.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("long").alias("n_intervals"),
            F.sum(F.col("dwell").cast("decimal(38,0)")).cast("long").alias("dwell_us"),
        )
    )
    total = agg.agg(F.sum(F.col("dwell_us").cast("decimal(38,0)")).alias("t"))
    return agg.crossJoin(F.broadcast(total)).select(
        "event_type",
        "n_intervals",
        "dwell_us",
        (F.col("dwell_us").cast("double") / F.col("t").cast("double")).alias(
            "dwell_share"
        ),
    )
