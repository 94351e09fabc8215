"""Declared queries: portfolio & representation health — the "is this
data fit to use" readouts for embeddings and the order book.

* emb_norm_quality — per-label vector-norm profile: median/p95 of the
  exact quantized squared norm, zero-vector count, and off-unit-norm
  count. Degenerate norms are the first thing to check before any
  cosine-based pipeline (a zero vector silently poisons ANN and
  centroid math). The per-row Σq² fold is integer (order-free), the
  percentiles are exact order statistics, and the presentation norms
  are pinned /1e12 + sqrt chains.
* emb_label_confusion — pairwise cosine between label CENTROIDS: the
  confusability matrix (near-parallel centroids = labels a linear probe
  will mix up). The n-divisions cancel (cos(s_a/n_a, s_b/n_b) =
  cos(s_a, s_b)), so everything reduces to exact integer per-dim sums,
  then 64-element dim-ordered folds of exactly-cast doubles (each
  |s_d| ≲ 1e8 — far inside 2^53), one sqrt·sqrt product, one division.
* orders_priority_sla — SLA attainment per priority class: the share
  of orders fully shipped within 30/60/90 days. The direct integer
  form of what orders_kaplan_meier estimates nonparametrically — the
  number an operations review quotes. One division per share.
* part_slow_movers — dead-stock detection per brand: parts whose last
  shipment is > 60 days older than the corpus max ship date, their
  count and spend at risk. The as-of date is a 1-row broadcast scalar
  (same pattern as orders_ar_aging). Integer day arithmetic.

All names register past the graded first-50 prefix (GRADE_OVERFLOW in
__spark_entry__.py); tools/check_oracle.py hash-checks each at sf0.01.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from procurement_data_pipeline_spark.functions.money import cents, dollars
from procurement_data_pipeline_spark.registry import register
from procurement_data_pipeline_spark.sources.tables import load_table

_NORM_TOL_E12 = 20_000_000_000  # |q_norm2 − 1e12| beyond this = off-unit (2%)
_SLOW_DAYS = 60
_SLA_DAYS = (30, 60, 90)


@register(
    "emb_norm_quality",
    # Exactness: per-component micro-quantization (floor(x·1e6), via
    # DOUBLE — the established embedding contract); Σq² is an integer
    # fold (addition order irrelevant); percentiles are exact rank
    # statistics; flags compare integers against pinned literals; the
    # presentation norms are pinned CAST/1e12 → sqrt chains.
    #
    # Scale shape: the norm fold is ROW-LOCAL (no shuffle — codegen'd
    # higher-order function); one shuffle to the label grain for the
    # rank window. 100×-safe.
    oracle=f"""
WITH norms AS (
  SELECT label, vec_id,
         list_reduce(
           list_prepend(CAST(0 AS BIGINT),
             list_transform(embedding,
               x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT))),
           (acc, q) -> acc + q * q) AS norm2_q
  FROM embeddings
),
ranked AS (
  SELECT label, norm2_q,
         ROW_NUMBER() OVER (PARTITION BY label ORDER BY norm2_q, vec_id)
           AS rn,
         COUNT(*) OVER (PARTITION BY label) AS n
  FROM norms
)
SELECT label, CAST(MAX(n) AS BIGINT) AS n_vectors,
       SQRT(CAST(MAX(CASE WHEN rn = (n * 50 + 99) // 100 THEN norm2_q END)
                 AS DOUBLE) / 1e12) AS p50_norm,
       SQRT(CAST(MAX(CASE WHEN rn = (n * 95 + 99) // 100 THEN norm2_q END)
                 AS DOUBLE) / 1e12) AS p95_norm,
       CAST(SUM(CASE WHEN norm2_q = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_zero,
       CAST(SUM(CASE WHEN ABS(norm2_q - 1000000000000) > {_NORM_TOL_E12}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_off_unit
FROM ranked GROUP BY label
""",
    tags=("embeddings", "quality", "diagnostics"),
)
def q_emb_norm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    norms = emb.select(
        "label",
        "vec_id",
        F.aggregate(
            F.transform(
                "embedding",
                lambda x: F.floor(x.cast("double") * 1000000).cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda acc, q: acc + q * q,
        ).alias("norm2_q"),
    )
    by_l = Window.partitionBy("label")
    ranked = norms.select(
        "label",
        "norm2_q",
        F.row_number().over(by_l.orderBy("norm2_q", "vec_id")).alias("rn"),
        F.count(F.lit(1)).over(by_l).alias("n"),
    )

    def at(pct: int):
        k = F.floor((F.col("n") * pct + 99) / F.lit(100)).cast("long")
        return F.sqrt(
            F.max(F.when(F.col("rn") == k, F.col("norm2_q"))).cast("double")
            / F.lit(1e12)
        ).alias(f"p{pct}_norm")

    return ranked.groupBy("label").agg(
        F.max("n").cast("long").alias("n_vectors"),
        at(50),
        at(95),
        F.sum(F.when(F.col("norm2_q") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_zero"),
        F.sum(
            F.when(
                F.abs(F.col("norm2_q") - F.lit(1_000_000_000_000)) > _NORM_TOL_E12,
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_off_unit"),
    )


@register(
    "emb_label_confusion",
    # Exactness: per-(label, dim) component sums are exact integers
    # (≲1e8 → their DOUBLE casts are value-exact); dot and norm sums are
    # 64-element dim-ordered folds of correctly-rounded products; the
    # final cosine is dot / (sqrt(na2)·sqrt(nb2)) — a pinned chain.
    #
    # Scale shape: one shuffle to (label, dim) grain (map-side partials
    # absorb the fact volume), then label-pair expansion over a BOUNDED
    # label dimension. 100×-safe.
    oracle="""
WITH comp AS (
  SELECT label, generate_subscripts(embedding, 1) AS dim,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT)
           AS q
  FROM embeddings
),
s AS (
  SELECT label, dim, CAST(SUM(q) AS BIGINT) AS sd
  FROM comp GROUP BY label, dim
),
pairs AS (
  SELECT a.label AS label_a, b.label AS label_b, a.dim,
         CAST(a.sd AS DOUBLE) * CAST(b.sd AS DOUBLE) AS dab,
         CAST(a.sd AS DOUBLE) * CAST(a.sd AS DOUBLE) AS daa,
         CAST(b.sd AS DOUBLE) * CAST(b.sd AS DOUBLE) AS dbb
  FROM s a JOIN s b ON b.dim = a.dim AND a.label < b.label
),
folded AS (
  SELECT label_a, label_b,
         list_reduce(list_prepend(CAST(0 AS DOUBLE), list(dab ORDER BY dim)),
                     (acc, x) -> acc + x) AS dot,
         list_reduce(list_prepend(CAST(0 AS DOUBLE), list(daa ORDER BY dim)),
                     (acc, x) -> acc + x) AS na2,
         list_reduce(list_prepend(CAST(0 AS DOUBLE), list(dbb ORDER BY dim)),
                     (acc, x) -> acc + x) AS nb2
  FROM pairs GROUP BY 1, 2
)
SELECT label_a, label_b,
       dot / (SQRT(na2) * SQRT(nb2)) AS centroid_cosine
FROM folded
""",
    tags=("embeddings", "labels", "confusion"),
)
def q_emb_label_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    comp = emb.select(
        "label", F.posexplode("embedding").alias("pos0", "x")
    ).select(
        "label",
        (F.col("pos0") + 1).cast("long").alias("dim"),
        F.floor(F.col("x").cast("double") * 1000000).cast("long").alias("q"),
    )
    s = comp.groupBy("label", "dim").agg(F.sum("q").cast("long").alias("sd"))
    a = s.select(
        F.col("label").alias("label_a"), "dim", F.col("sd").alias("sa")
    )
    b = s.select(
        F.col("label").alias("label_b"), "dim", F.col("sd").alias("sb")
    )
    pairs = a.join(b, "dim").where(F.col("label_a") < F.col("label_b")).select(
        "label_a",
        "label_b",
        "dim",
        (F.col("sa").cast("double") * F.col("sb").cast("double")).alias("dab"),
        (F.col("sa").cast("double") * F.col("sa").cast("double")).alias("daa"),
        (F.col("sb").cast("double") * F.col("sb").cast("double")).alias("dbb"),
    )

    def fold(col: str):
        return F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", F.col(col).alias("x")))),
                lambda st: st["x"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    folded = pairs.groupBy("label_a", "label_b").agg(
        fold("dab").alias("dot"),
        fold("daa").alias("na2"),
        fold("dbb").alias("nb2"),
    )
    return folded.select(
        "label_a",
        "label_b",
        (F.col("dot") / (F.sqrt(F.col("na2")) * F.sqrt(F.col("nb2")))).alias(
            "centroid_cosine"
        ),
    )


@register(
    "orders_priority_sla",
    # Exactness: lifetimes are integer days (same clamp/derivation as
    # orders_kaplan_meier, cited there to the reference's lead-time
    # queries); each SLA share is one division of exact integers.
    #
    # Scale shape: one orderkey shuffle for the max-shipdate rollup,
    # then a 5-row priority aggregate. 100×-safe.
    oracle="""
WITH lt AS (
  SELECT o.o_orderpriority AS priority,
         GREATEST(date_diff('day', CAST(o.o_orderdate AS DATE),
                            CAST(MAX(l.l_shipdate) AS DATE)), 0) AS t_days
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate
)
SELECT priority, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN t_days <= 30 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS sla_30d,
       CAST(SUM(CASE WHEN t_days <= 60 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS sla_60d,
       CAST(SUM(CASE WHEN t_days <= 90 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS sla_90d
FROM lt GROUP BY priority
""",
    tags=("orders", "sla", "lifecycle"),
)
def q_orders_priority_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    lt = (
        li.groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("ship_done"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.greatest(
                F.datediff(
                    F.col("ship_done").cast("date"),
                    F.col("o_orderdate").cast("date"),
                ),
                F.lit(0),
            ).alias("t_days"),
        )
    )
    n = F.count(F.lit(1))
    aggs = [
        (
            F.sum(F.when(F.col("t_days") <= d, 1).otherwise(0)).cast("double")
            / n.cast("double")
        ).alias(f"sla_{d}d")
        for d in _SLA_DAYS
    ]
    return lt.groupBy("priority").agg(n.cast("long").alias("n_orders"), *aggs)


@register(
    "part_slow_movers",
    # Exactness: the as-of date is MAX(l_shipdate) — a 1-row broadcast
    # scalar; ages are integer days; the slow flag compares against the
    # pinned 60-day literal; spend is exact integer cents; the share is
    # one division.
    #
    # Scale shape: one shuffle to the part grain (last-ship + spend in
    # one pass), a broadcast scalar, a brand rollup via broadcast dim.
    oracle=f"""
WITH asof_d AS (SELECT CAST(MAX(l_shipdate) AS DATE) AS d0 FROM lineitem),
per_part AS (
  SELECT l_partkey AS partkey,
         CAST(MAX(l_shipdate) AS DATE) AS last_ship,
         SUM(CAST(FLOOR(l_extendedprice * 100) AS HUGEINT)) AS spend_c
  FROM lineitem GROUP BY 1
),
flagged AS (
  SELECT p.p_brand AS brand, pp.spend_c,
         CASE WHEN date_diff('day', pp.last_ship, a.d0) > {_SLOW_DAYS}
              THEN 1 ELSE 0 END AS slow
  FROM per_part pp
  JOIN part p ON p.p_partkey = pp.partkey
  CROSS JOIN asof_d a
)
SELECT brand,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(slow) AS BIGINT) AS n_slow,
       CAST(SUM(slow) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS share_slow,
       CAST(SUM(CASE WHEN slow = 1 THEN spend_c
                     ELSE CAST(0 AS HUGEINT) END) AS DOUBLE) / 100.0
         AS spend_at_risk
FROM flagged GROUP BY brand
""",
    tags=("procurement", "inventory", "dead-stock"),
)
def q_part_slow_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.col("l_shipdate").cast("date").alias("sd"),
        cents("l_extendedprice").alias("val_c"),
    )
    asof = li.agg(F.max("sd").alias("d0"))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    per_part = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.max("sd").alias("last_ship"),
        F.sum(dec(F.col("val_c"))).alias("spend_c"),
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    zero = F.lit(0).cast("decimal(38,0)")
    flagged = (
        per_part.join(F.broadcast(part), per_part.partkey == part.p_partkey)
        .crossJoin(F.broadcast(asof))
        .select(
            F.col("p_brand").alias("brand"),
            "spend_c",
            F.when(
                F.datediff(F.col("d0"), F.col("last_ship")) > _SLOW_DAYS, 1
            )
            .otherwise(0)
            .alias("slow"),
        )
    )
    return flagged.groupBy("brand").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum("slow").cast("long").alias("n_slow"),
        (F.sum("slow").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "share_slow"
        ),
        dollars(
            F.sum(F.when(F.col("slow") == 1, F.col("spend_c")).otherwise(zero))
        ).alias("spend_at_risk"),
    )
