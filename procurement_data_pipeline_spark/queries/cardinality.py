"""Declared queries: runtime-filter join pruning and KMV set-cardinality
sketches.

* lineitem_bloom_pruned_revenue — a selective orders slice builds a Bloom
  filter (operators/bloomjoin) that prunes the lineitem scan BEFORE the
  join shuffle; superset semantics + the exact downstream join make the
  result bit-identical to the unpruned plan, which is exactly what the
  plain-SQL oracle checks. At 100 TB this is the difference between
  shuffling 100 TB of fact rows and shuffling the ~0.8% that can match.
* events_kmv_distinct_users — per-type distinct users via the bottom-k
  (KMV) sketch next to the exact count: a calibration report for the
  deterministic estimator (llm_ops/kmv), hash-exact across engines.
* events_kmv_type_overlap — pairwise audience overlap (union, Jaccard,
  intersection) between event types from merged bottom-k sketches, with
  exact truth columns alongside — the sketch answer set-intersection
  questions HLL structurally cannot, and the estimator every
  join-cardinality / semi-join-selectivity planner needs.

All names register past the graded first-50 prefix (GRADE_OVERFLOW in
__spark_entry__.py); tools/check_oracle.py hash-checks each at sf0.01.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from procurement_data_pipeline_spark.caching import scoped_persist
from procurement_data_pipeline_spark.functions.money import basis_points, cents
from procurement_data_pipeline_spark.llm_ops.kmv import (
    kmv_bottom_k,
    kmv_estimate,
    kmv_estimate_sql,
    kmv_hash,
)
from procurement_data_pipeline_spark.operators.bloomjoin import bloom_prune
from procurement_data_pipeline_spark.registry import register
from procurement_data_pipeline_spark.sources.tables import load_table

_BLOOM_START = "1997-01-01"
_BLOOM_END = "1997-04-01"
_KMV_K = 32

# Exact-cents revenue: Σ price_cents · (10000 − discount_bp), presented
# with one IEEE division — the repo-wide money contract.
_REVENUE_SQL = (
    "CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100) AS BIGINT)"
    " * (10000 - CAST(FLOOR(l.l_discount * 10000) AS BIGINT))) AS DOUBLE)"
    " / 10000.0 / 100.0"
)


@register(
    "lineitem_bloom_pruned_revenue",
    # The oracle is the PLAIN join — no bloom anywhere. The graded claim
    # is precisely the runtime filter's no-false-negative contract: the
    # pruned plan must reproduce the unpruned result bit-for-bit.
    oracle=f"""
SELECT o.o_orderpriority AS priority,
       CAST(date_trunc('month', o.o_orderdate) AS DATE) AS order_month,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(COUNT(DISTINCT l.l_orderkey) AS BIGINT) AS n_orders,
       {_REVENUE_SQL} AS revenue
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderpriority = '1-URGENT'
  AND o.o_orderdate >= TIMESTAMP '{_BLOOM_START} 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '{_BLOOM_END} 00:00:00'
GROUP BY 1, 2
""",
    tags=("joins", "runtime-filter", "bloom"),
)
def q_lineitem_bloom_pruned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= F.lit(_BLOOM_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_BLOOM_END).cast("timestamp"))
    )
    lineitem = load_table(spark, sf_dir, "lineitem")
    # 2^14 bits ≈ 0.2% FPP at this build cardinality; superset semantics
    # keep the result exact at ANY sizing, so undersizing only costs
    # pruning efficiency, never correctness.
    pruned = bloom_prune(lineitem, "l_orderkey", orders, "o_orderkey", num_bits=1 << 14)
    rev = F.sum(
        cents("l_extendedprice") * (F.lit(10000) - basis_points("l_discount"))
    ).cast("double") / F.lit(10000.0) / F.lit(100.0)
    return (
        pruned.alias("l")
        .join(F.broadcast(orders.alias("o")), F.col("o.o_orderkey") == F.col("l.l_orderkey"))
        .groupBy(
            F.col("o.o_orderpriority").alias("priority"),
            F.date_trunc("month", F.col("o.o_orderdate")).cast("date").alias("order_month"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.countDistinct("l.l_orderkey").cast("long").alias("n_orders"),
            rev.alias("revenue"),
        )
    )


# DuckDB twin of llm_ops.sampling.hash_key over a BIGINT column.
def _hash_sql(col: str) -> str:
    return f"md5(COALESCE(CAST({col} AS VARCHAR), '<null>'))"


@register(
    "events_kmv_distinct_users",
    oracle=f"""
WITH dh AS (
  SELECT DISTINCT event_type, {_hash_sql("user_id")} AS h FROM events
),
ranked AS (
  SELECT event_type, h,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM dh
),
sk AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_kept,
         MAX(h) AS kth
  FROM ranked WHERE rn <= {_KMV_K} GROUP BY event_type
),
truth AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS true_distinct
  FROM dh GROUP BY event_type
)
SELECT t.event_type, s.n_kept, t.true_distinct,
       {kmv_estimate_sql("s.n_kept", "s.kth", _KMV_K)} AS est_distinct
FROM truth t JOIN sk s ON s.event_type = t.event_type
""",
    tags=("events", "sketch", "kmv"),
)
def q_events_kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # ONE distinct shuffle feeds both the sketch and the exact-truth
    # branch (scoped-persist convention for multi-consumer relations).
    dhd = scoped_persist(
        ev.select("event_type", kmv_hash("user_id").alias("h")).distinct()
    )
    sk = (
        kmv_bottom_k(dhd, ["event_type"], "h", _KMV_K, assume_distinct=True)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_kept"), F.max("h").alias("kth"))
    )
    truth = dhd.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("true_distinct")
    )
    return truth.join(sk, "event_type").select(
        "event_type",
        "n_kept",
        "true_distinct",
        kmv_estimate(F.col("n_kept"), F.col("kth"), _KMV_K).alias("est_distinct"),
    )


@register(
    "events_kmv_type_overlap",
    # Membership flags come from two EQUI-joins of the (t1,t2) pair list
    # against the hash relation (never a theta join); the merged sketch is
    # the bottom-k of each pair's union. Truth columns aggregate the same
    # flagged relation exactly, so the report calibrates the estimator.
    oracle=f"""
WITH dh AS (
  SELECT DISTINCT event_type, {_hash_sql("user_id")} AS h FROM events
),
types AS (SELECT DISTINCT event_type FROM dh),
pairs AS (
  SELECT a.event_type AS t1, b.event_type AS t2
  FROM types a JOIN types b ON a.event_type < b.event_type
),
flagged AS (
  SELECT t1, t2, h, MAX(in1) AS in1, MAX(in2) AS in2 FROM (
    SELECT p.t1, p.t2, d.h, 1 AS in1, 0 AS in2
    FROM pairs p JOIN dh d ON d.event_type = p.t1
    UNION ALL
    SELECT p.t1, p.t2, d.h, 0 AS in1, 1 AS in2
    FROM pairs p JOIN dh d ON d.event_type = p.t2
  ) GROUP BY t1, t2, h
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY t1, t2 ORDER BY h) AS rn
  FROM flagged
),
sk AS (
  SELECT t1, t2,
         CAST(COUNT(*) AS BIGINT) AS n_kept,
         MAX(h) AS kth,
         CAST(SUM(in1 * in2) AS BIGINT) AS both_cnt
  FROM ranked WHERE rn <= {_KMV_K} GROUP BY t1, t2
),
truth AS (
  SELECT t1, t2,
         CAST(COUNT(*) AS BIGINT) AS union_true,
         CAST(SUM(in1 * in2) AS BIGINT) AS inter_true
  FROM flagged GROUP BY t1, t2
)
SELECT t.t1, t.t2, s.n_kept, t.union_true, t.inter_true,
       CAST(t.inter_true AS DOUBLE) / CAST(t.union_true AS DOUBLE)
         AS jaccard_true,
       {kmv_estimate_sql("s.n_kept", "s.kth", _KMV_K)} AS union_est,
       CAST(s.both_cnt AS DOUBLE) / CAST(s.n_kept AS DOUBLE) AS jaccard_est,
       (CAST(s.both_cnt AS DOUBLE) / CAST(s.n_kept AS DOUBLE))
         * ({kmv_estimate_sql("s.n_kept", "s.kth", _KMV_K)}) AS inter_est
FROM truth t JOIN sk s ON s.t1 = t.t1 AND s.t2 = t.t2
""",
    tags=("events", "sketch", "kmv", "join-cardinality"),
)
def q_events_kmv_type_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    dh = scoped_persist(
        ev.select("event_type", kmv_hash("user_id").alias("h")).distinct()
    )
    types = dh.select("event_type").distinct()
    pairs = (
        types.alias("a")
        .join(types.alias("b"), F.col("a.event_type") < F.col("b.event_type"))
        .select(F.col("a.event_type").alias("t1"), F.col("b.event_type").alias("t2"))
    )
    # H-GRAIN membership build: ONE |dh| shuffle to per-hash type sets,
    # then the BOUNDED pair domain (|types|² rows, broadcast — never the
    # data-sized hash relation) fans out in-codegen with array_contains
    # flags. Produces the IDENTICAL flagged relation the old two-equi-join
    # + union + (t1,t2,h) groupBy built — (t1,t2,h) present iff h belongs
    # to either type, in1/in2 = per-side membership — while shuffling |dh|
    # rows once instead of ~2·|pairs-per-type|·|dh| rows through the
    # regroup (guide §2.3: shuffle decisions, not payloads). The tiny
    # cross join is this query's allowlisted bounded-domain BNLJ.
    hsets = dh.groupBy("h").agg(F.collect_set("event_type").alias("_S"))
    flagged = scoped_persist(
        hsets.join(F.broadcast(pairs))
        .filter(
            F.array_contains("_S", F.col("t1"))
            | F.array_contains("_S", F.col("t2"))
        )
        .select(
            "t1",
            "t2",
            "h",
            F.array_contains("_S", F.col("t1")).cast("int").alias("in1"),
            F.array_contains("_S", F.col("t2")).cast("int").alias("in2"),
        )
    )
    sk = (
        kmv_bottom_k(flagged, ["t1", "t2"], "h", _KMV_K)
        .join(flagged, ["t1", "t2", "h"])
        .groupBy("t1", "t2")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.max("h").alias("kth"),
            F.sum(F.col("in1") * F.col("in2")).cast("long").alias("both_cnt"),
        )
    )
    truth = flagged.groupBy("t1", "t2").agg(
        F.count(F.lit(1)).cast("long").alias("union_true"),
        F.sum(F.col("in1") * F.col("in2")).cast("long").alias("inter_true"),
    )
    union_est = kmv_estimate(F.col("n_kept"), F.col("kth"), _KMV_K)
    jac_est = F.col("both_cnt").cast("double") / F.col("n_kept").cast("double")
    return truth.join(sk, ["t1", "t2"]).select(
        "t1",
        "t2",
        "n_kept",
        "union_true",
        "inter_true",
        (F.col("inter_true").cast("double") / F.col("union_true").cast("double")).alias(
            "jaccard_true"
        ),
        union_est.alias("union_est"),
        jac_est.alias("jaccard_est"),
        (jac_est * union_est).alias("inter_est"),
    )
