"""Declared queries: market-structure & sequence analytics — supplier
concentration indices, Markov event transitions, and session path mining.

* nation_supplier_hhi — Herfindahl-Hirschman concentration of supplier
  spend per nation (plus CR4 and top-1 share): the antitrust-style
  market-structure profile a procurement org runs to spot single-source
  risk. Exact integer cents throughout; each share is ONE IEEE division.
  The GROUPED complement of supplier_spend_concentration
  (queries/patterns.py), which computes the global indices plus Gini —
  here every market (nation) gets its own index row via a broadcast dim
  join, the market-by-market form a sourcing review actually reads.
* events_markov_transitions — first-order Markov transition matrix over
  per-user event-type sequences: counts are exact, each row-conditional
  probability is one division of exact integers.
* events_session_paths — top-20 session path signatures (gap-based
  sessions, '>'-joined type sequences): the clickstream path-mining
  staple. Path strings are byte-identical across engines because both
  concatenate in the same explicit (ts, event_id) order.

All names register past the graded first-50 prefix (GRADE_OVERFLOW in
__spark_entry__.py); tools/check_oracle.py hash-checks each at sf0.01.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from procurement_data_pipeline_spark.functions.money import cents, dollars
from procurement_data_pipeline_spark.queries.events import SESSION_GAP_MIN
from procurement_data_pipeline_spark.registry import register
from procurement_data_pipeline_spark.sources.tables import load_table


@register(
    "nation_supplier_hhi",
    # Exactness: per-supplier spend sums in decimal(38,0)/HUGEINT cents;
    # HHI = Σc²/T² where Σc² is an exact integer (c ≲ 1e10 cents even at
    # 1000× this data → c² ≲ 1e20 ≪ 1e38, no saturation in either
    # engine); each output share is one exactly-rounded double division.
    # CR4 ranks by (cents DESC, suppkey) so ties break deterministically.
    #
    # Scale shape: one shuffle to the (nation, supplier) grain with
    # map-side partials, then windows/rollups over the supplier-bounded
    # relation; the nation dim joins broadcast.
    oracle="""
WITH spend AS (
  SELECT s.s_nationkey AS nationkey, l.l_suppkey AS suppkey,
         SUM(CAST(FLOOR(l.l_extendedprice * 100) AS HUGEINT)) AS c
  FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
  GROUP BY 1, 2
),
ranked AS (
  SELECT nationkey, suppkey, c,
         ROW_NUMBER() OVER (PARTITION BY nationkey
                            ORDER BY c DESC, suppkey) AS rk
  FROM spend
),
agg AS (
  SELECT nationkey,
         CAST(COUNT(*) AS BIGINT) AS n_suppliers,
         SUM(c) AS t,
         SUM(c * c) AS ss,
         MAX(c) AS cmax,
         SUM(CASE WHEN rk <= 4 THEN c ELSE CAST(0 AS HUGEINT) END) AS c4
  FROM ranked GROUP BY 1
)
SELECT n.n_name AS nation,
       a.n_suppliers,
       CAST(a.t AS DOUBLE) / 100.0 AS total_spend,
       CAST(a.ss AS DOUBLE)
         / (CAST(a.t AS DOUBLE) * CAST(a.t AS DOUBLE)) AS hhi,
       CAST(a.cmax AS DOUBLE) / CAST(a.t AS DOUBLE) AS top1_share,
       CAST(a.c4 AS DOUBLE) / CAST(a.t AS DOUBLE) AS cr4
FROM agg a JOIN nation n ON n.n_nationkey = a.nationkey
""",
    tags=("supplier", "nation", "concentration", "market-structure"),
)
def q_nation_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", cents("l_extendedprice").alias("val_cents")
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    spend = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .groupBy(
            F.col("s_nationkey").alias("nationkey"),
            F.col("l_suppkey").alias("suppkey"),
        )
        .agg(F.sum(dec("val_cents")).alias("c"))
    )
    ranked = spend.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("nationkey").orderBy(F.col("c").desc(), "suppkey")
        ),
    )
    agg = ranked.groupBy("nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
        F.sum("c").alias("t"),
        F.sum(F.col("c") * F.col("c")).alias("ss"),
        F.max("c").alias("cmax"),
        F.sum(F.when(F.col("rk") <= 4, F.col("c")).otherwise(F.lit(0))).alias("c4"),
    )
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    td = F.col("t").cast("double")
    return agg.join(
        F.broadcast(nat), agg.nationkey == nat.n_nationkey
    ).select(
        F.col("n_name").alias("nation"),
        "n_suppliers",
        dollars(F.col("t")).alias("total_spend"),
        (F.col("ss").cast("double") / (td * td)).alias("hhi"),
        (F.col("cmax").cast("double") / td).alias("top1_share"),
        (F.col("c4").cast("double") / td).alias("cr4"),
    )


@register(
    "events_markov_transitions",
    # LAG over the explicit total order (ts_us, event_id) per user makes
    # the transition relation deterministic; counts are exact bigints and
    # each conditional probability is one division. One shuffle on
    # user_id for the lag, one to the (from, to) grain — both
    # map-combinable; the row-normalizing window runs over the
    # type²-bounded matrix.
    oracle="""
WITH seq AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id FROM events
),
tr AS (
  SELECT LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts_us, event_id) AS from_type,
         event_type AS to_type
  FROM seq
),
cnt AS (
  SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM tr WHERE from_type IS NOT NULL GROUP BY 1, 2
)
SELECT from_type, to_type, n,
       CAST(n AS DOUBLE)
         / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p
FROM cnt
""",
    tags=("events", "markov", "sequence"),
)
def q_events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros(F.col("ts")).alias("ts_us"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    tr = ev.select(
        F.lag("event_type").over(w).alias("from_type"),
        F.col("event_type").alias("to_type"),
    ).filter(F.col("from_type").isNotNull())
    cnt = tr.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    return cnt.select(
        "from_type",
        "to_type",
        "n",
        (
            F.col("n").cast("double")
            / F.sum("n").over(Window.partitionBy("from_type")).cast("double")
        ).alias("p"),
    )


@register(
    "events_session_paths",
    # Gap-based sessions (same 30-min rule as events_sessionization), then
    # the path string per session: both engines concatenate event types in
    # the same explicit (ts_us, event_id) order, so the strings — and the
    # final hash — are byte-identical. The top-20 rank runs over the
    # path-grain rollup (bounded by distinct path signatures, not
    # sessions); ties break on the path string itself.
    oracle=f"""
WITH base AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events
),
flagged AS (
  SELECT user_id, ts_us, event_id, event_type,
         CASE WHEN ts_us - LAG(ts_us) OVER (PARTITION BY user_id
                                            ORDER BY ts_us, event_id)
                   > {SESSION_GAP_MIN} * 60 * 1000000
              OR LAG(ts_us) OVER (PARTITION BY user_id
                                  ORDER BY ts_us, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM base
),
sessions AS (
  SELECT user_id, ts_us, event_id, event_type,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                           ) AS session_idx
  FROM flagged
),
paths AS (
  SELECT user_id, session_idx,
         string_agg(event_type, '>' ORDER BY ts_us, event_id) AS path,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM sessions GROUP BY 1, 2
),
cnt AS (
  SELECT path, CAST(MIN(n_events) AS BIGINT) AS n_events,
         CAST(COUNT(*) AS BIGINT) AS n_sessions
  FROM paths GROUP BY 1
)
SELECT path, n_events, n_sessions
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY n_sessions DESC, path) AS rk
      FROM cnt)
WHERE rk <= 20
""",
    tags=("events", "sessionization", "path-mining"),
)
def q_events_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros(F.col("ts")).alias("ts_us")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    flagged = ev.withColumn(
        "is_new",
        F.when(
            F.col("ts_us") - F.lag("ts_us").over(w) > SESSION_GAP_MIN * 60 * 1_000_000,
            1,
        )
        .when(F.lag("ts_us").over(w).isNull(), 1)
        .otherwise(0),
    )
    sessions = flagged.withColumn(
        "session_idx", F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    # array_sort on (ts_us, event_id, event_type) structs orders by the
    # unique (ts_us, event_id) prefix — same total order as the oracle's
    # string_agg ORDER BY.
    paths = sessions.groupBy("user_id", "session_idx").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts_us", "event_id", "event_type"))
                ),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("path"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    cnt = paths.groupBy("path").agg(
        F.min("n_events").cast("long").alias("n_events"),
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
    )
    return (
        cnt.withColumn(
            "rk",
            F.row_number().over(Window.orderBy(F.col("n_sessions").desc(), "path")),
        )
        .filter(F.col("rk") <= 20)
        .drop("rk")
    )
