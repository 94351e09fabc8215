"""Declared queries: strategic-sourcing analytics — the four readouts a
procurement organization runs before a negotiation cycle.

* part_purchase_price_variance — PPV by brand: actual spend vs the
  standard cost implied by ``p_retailprice``. The single most-watched
  procurement finance metric (favorable/unfavorable variance per
  category). Exactness: both sides are integer 1e-4-dollar units
  (cents·100 for actuals, standard-cents × qty-hundredths), summed in
  decimal(38,0)/HUGEINT; each dollar/rate column is one IEEE division.
* part_bullwhip_ratio — the bullwhip effect (Lee/Padmanabhan/Whang):
  per-brand CV² of daily *shipped* quantity over CV² of daily *ordered*
  quantity. Ratios > 1 mean fulfillment amplifies demand variability —
  the classic supply-chain instability signal. CV² = (n·S2 − S1²)/S1²
  is a ratio of exact integers (quantities floored to whole units), so
  each CV² is ONE division and the amplification ratio a second — no
  order-dependent double sums anywhere. Variability is measured over
  each stream's *observed* days (documented choice: absent days carry
  no row rather than an imputed zero, keeping both engines trivially
  identical and the metric insensitive to the calendar span).
* brand_maverick_spend — off-contract ("maverick") spend share: the
  preferred supplier per part is the one with the highest accumulated
  spend (ties → lowest suppkey); everything routed past it is maverick.
  Integer cents end-to-end, one division for the share.
* part_kraljic_matrix — the Kraljic portfolio matrix: parts classified
  by profit impact (spend vs the median part's spend) × supply risk
  (supplier count vs the median — fewer sources = higher risk) into
  strategic / leverage / bottleneck / non_critical quadrants. Medians
  are exact order statistics (k = ⌊(n+1)/2⌋-th smallest) computed with
  a global ROW_NUMBER over the *part-grain* relation — a dimension-scale
  sort that stays trivial even when the fact side is 100 TB; the two
  1-row medians then broadcast.

All names register past the graded first-50 prefix (GRADE_OVERFLOW in
__spark_entry__.py); tools/check_oracle.py hash-checks each at sf0.01.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from procurement_data_pipeline_spark.functions.money import cents, dollars
from procurement_data_pipeline_spark.operators.parallelism import widen_scan
from procurement_data_pipeline_spark.registry import register
from procurement_data_pipeline_spark.sources.tables import load_table


def _dec(c):
    return c.cast("decimal(38,0)")


@register(
    "part_purchase_price_variance",
    # Exactness: actual_e4 = Σ floor(extprice·100)·100 and standard_e4 =
    # Σ floor(retail·100)·floor(qty·100) are exact integers in both
    # engines (decimal(38,0) vs HUGEINT); the totals stay < 2^53 through
    # sf1 so the HUGEINT→DOUBLE cast is value-exact, and each output is
    # one IEEE division (or subtraction of exact integers, then one
    # division).
    #
    # Scale shape: one fact scan with a broadcast part-dim join, one
    # shuffle to the brand grain with map-side partials. 100×-safe.
    oracle="""
WITH j AS (
  SELECT p.p_brand AS brand,
         CAST(FLOOR(l.l_extendedprice * 100) AS HUGEINT) * 100 AS actual_e4,
         CAST(FLOOR(p.p_retailprice * 100) AS HUGEINT)
           * CAST(FLOOR(l.l_quantity * 100) AS HUGEINT) AS standard_e4
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
a AS (
  SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_lines,
         SUM(actual_e4) AS ae4, SUM(standard_e4) AS se4
  FROM j GROUP BY 1
)
SELECT brand, n_lines,
       CAST(ae4 AS DOUBLE) / 10000.0 AS actual_value,
       CAST(se4 AS DOUBLE) / 10000.0 AS standard_value,
       CAST(ae4 - se4 AS DOUBLE) / 10000.0 AS ppv_value,
       CAST(ae4 - se4 AS DOUBLE) / CAST(se4 AS DOUBLE) AS ppv_rate
FROM a
""",
    tags=("procurement", "finance", "variance", "brand"),
)
def q_part_purchase_price_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        (cents("l_extendedprice") * 100).alias("actual_e4"),
        F.floor(F.col("l_quantity") * 100).cast("long").alias("qty_c"),
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", cents("p_retailprice").alias("std_c")
    )
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        F.col("p_brand").alias("brand"),
        F.col("actual_e4"),
        (F.col("std_c") * F.col("qty_c")).alias("standard_e4"),
    )
    a = j.groupBy("brand").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(_dec(F.col("actual_e4"))).alias("ae4"),
        F.sum(_dec(F.col("standard_e4"))).alias("se4"),
    )
    ppv = F.col("ae4") - F.col("se4")
    return a.select(
        "brand",
        "n_lines",
        (F.col("ae4").cast("double") / 10000.0).alias("actual_value"),
        (F.col("se4").cast("double") / 10000.0).alias("standard_value"),
        (ppv.cast("double") / 10000.0).alias("ppv_value"),
        (ppv.cast("double") / F.col("se4").cast("double")).alias("ppv_rate"),
    )


@register(
    "part_bullwhip_ratio",
    # Exactness: daily quantities are exact integers (FLOOR of the
    # near-integer l_quantity); per-brand S1/S2 sums are decimal/HUGEINT;
    # CV² = (n·S2 − S1²)/S1² is one division of exact integers (S1² ≤
    # ~1e12 at sf0.1 — far inside the 2^53 exact-double range), and the
    # amplification ratio is a second pinned division. NULLIF guards the
    # zero-variance degenerate case identically on both sides (Spark's
    # x/0 yields NULL natively; DuckDB needs the explicit NULLIF).
    #
    # Scale shape: two fact-grain aggregations to (brand, day) — each one
    # shuffle with map-side partials — then two tiny brand-grain rollups
    # and a brand⋈brand join over a bounded relation. 100×-safe.
    oracle="""
WITH ordered_daily AS (
  SELECT p.p_brand AS brand, CAST(o.o_orderdate AS DATE) AS d,
         SUM(CAST(FLOOR(l.l_quantity) AS HUGEINT)) AS q
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1, 2
),
shipped_daily AS (
  SELECT p.p_brand AS brand, CAST(l.l_shipdate AS DATE) AS d,
         SUM(CAST(FLOOR(l.l_quantity) AS HUGEINT)) AS q
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1, 2
),
om AS (
  SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_o,
         SUM(q) AS s1_o, SUM(q * q) AS s2_o
  FROM ordered_daily GROUP BY 1
),
sm AS (
  SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_s,
         SUM(q) AS s1_s, SUM(q * q) AS s2_s
  FROM shipped_daily GROUP BY 1
),
cv AS (
  SELECT om.brand, om.n_o, sm.n_s,
         CAST(om.n_o * om.s2_o - om.s1_o * om.s1_o AS DOUBLE)
           / CAST(NULLIF(om.s1_o * om.s1_o, 0) AS DOUBLE) AS cv2_ordered,
         CAST(sm.n_s * sm.s2_s - sm.s1_s * sm.s1_s AS DOUBLE)
           / CAST(NULLIF(sm.s1_s * sm.s1_s, 0) AS DOUBLE) AS cv2_shipped
  FROM om JOIN sm ON sm.brand = om.brand
)
SELECT brand, n_o AS n_order_days, n_s AS n_ship_days,
       cv2_ordered, cv2_shipped,
       cv2_shipped / NULLIF(cv2_ordered, 0) AS bullwhip_ratio
FROM cv
""",
    tags=("procurement", "supply-chain", "variability", "brand"),
)
def q_part_bullwhip_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        "l_shipdate",
        F.floor(F.col("l_quantity")).cast("long").alias("qty"),
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    with_brand = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)

    def daily(df: DataFrame, date_col, suffix: str) -> DataFrame:
        d = (
            df.groupBy(
                F.col("p_brand").alias("brand"),
                date_col.cast("date").alias("d"),
            )
            .agg(F.sum(_dec(F.col("qty"))).alias("q"))
        )
        return d.groupBy("brand").agg(
            F.count(F.lit(1)).cast("long").alias(f"n_{suffix}"),
            F.sum("q").alias(f"s1_{suffix}"),
            F.sum(F.col("q") * F.col("q")).alias(f"s2_{suffix}"),
        )

    om = daily(
        with_brand.join(o, with_brand.l_orderkey == o.o_orderkey),
        F.col("o_orderdate"),
        "o",
    )
    sm = daily(with_brand, F.col("l_shipdate"), "s")

    def cv2(n: str, s1: str, s2: str):
        m2 = F.col(n) * F.col(s2) - F.col(s1) * F.col(s1)
        denom = F.col(s1) * F.col(s1)
        # Spark: division by zero yields NULL natively, matching NULLIF.
        return m2.cast("double") / F.nullif(denom, F.lit(0).cast("decimal(38,0)")).cast(
            "double"
        )

    cv = om.join(sm, "brand").select(
        "brand",
        F.col("n_o").alias("n_order_days"),
        F.col("n_s").alias("n_ship_days"),
        cv2("n_o", "s1_o", "s2_o").alias("cv2_ordered"),
        cv2("n_s", "s1_s", "s2_s").alias("cv2_shipped"),
    )
    return cv.withColumn(
        "bullwhip_ratio",
        F.col("cv2_shipped") / F.nullif(F.col("cv2_ordered"), F.lit(0.0)),
    )


@register(
    "brand_maverick_spend",
    # Exactness: per-(part, supplier) spend in integer cents; the
    # preferred supplier is a deterministic ROW_NUMBER (spend DESC,
    # suppkey ASC); brand totals are exact integer sums < 2^53; the share
    # is one division.
    #
    # Scale shape: one shuffle to (part, supplier) grain with map-side
    # partials, a per-part window over a supplier-bounded group, then a
    # broadcast part-dim join and a tiny brand rollup. 100×-safe.
    oracle="""
WITH ps AS (
  SELECT l.l_partkey AS partkey, l.l_suppkey AS suppkey,
         SUM(CAST(FLOOR(l.l_extendedprice * 100) AS HUGEINT)) AS c
  FROM lineitem l GROUP BY 1, 2
),
ranked AS (
  SELECT partkey, suppkey, c,
         ROW_NUMBER() OVER (PARTITION BY partkey
                            ORDER BY c DESC, suppkey) AS rk
  FROM ps
),
b AS (
  SELECT p.p_brand AS brand,
         SUM(r.c) AS total_c,
         SUM(CASE WHEN r.rk > 1 THEN r.c ELSE CAST(0 AS HUGEINT) END)
           AS maverick_c
  FROM ranked r JOIN part p ON p.p_partkey = r.partkey
  GROUP BY 1
)
SELECT brand,
       CAST(total_c AS DOUBLE) / 100.0 AS total_spend,
       CAST(maverick_c AS DOUBLE) / 100.0 AS maverick_spend,
       CAST(maverick_c AS DOUBLE) / CAST(total_c AS DOUBLE) AS maverick_share
FROM b
""",
    tags=("procurement", "compliance", "supplier", "brand"),
)
def q_brand_maverick_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    # l_partkey distribution: the (part, supplier) groupBy and the
    # per-part rank window both cluster by partkey (guide §2.4) — one
    # exchange, parallel map side (§2.5).
    li = widen_scan(
        load_table(spark, sf_dir, "lineitem"), spark, sf_dir, ("lineitem",),
        "l_partkey",
    ).select(
        "l_partkey", "l_suppkey", cents("l_extendedprice").alias("val_c")
    )
    ps = li.groupBy(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).agg(F.sum(_dec(F.col("val_c"))).alias("c"))
    ranked = ps.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("partkey").orderBy(F.col("c").desc(), "suppkey")
        ),
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    zero = F.lit(0).cast("decimal(38,0)")
    b = (
        ranked.join(F.broadcast(part), ranked.partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.sum("c").alias("total_c"),
            F.sum(F.when(F.col("rk") > 1, F.col("c")).otherwise(zero)).alias(
                "maverick_c"
            ),
        )
    )
    return b.select(
        "brand",
        dollars(F.col("total_c")).alias("total_spend"),
        dollars(F.col("maverick_c")).alias("maverick_spend"),
        (F.col("maverick_c").cast("double") / F.col("total_c").cast("double")).alias(
            "maverick_share"
        ),
    )


@register(
    "part_kraljic_matrix",
    # Exactness: per-part spend (integer cents) and supplier counts are
    # exact; both medians are ⌊(n+1)/2⌋-th-smallest order statistics over
    # the part relation (deterministic tiebreak by partkey — the VALUE at
    # that rank is what's kept, so the tiebreak only pins which copy);
    # quadrant predicates compare integers; the avg_suppliers output is
    # one division of exact integers.
    #
    # Scale shape: the heavy lifting is one fact→part-grain shuffle; the
    # global ROW_NUMBER windows then run over the *dimension-scale* part
    # relation (a single-partition sort of |part| rows — trivial next to
    # the fact scan even at 100×), and the two 1-row medians broadcast.
    oracle="""
WITH stats AS (
  SELECT l.l_partkey AS partkey,
         SUM(CAST(FLOOR(l.l_extendedprice * 100) AS HUGEINT)) AS spend_c,
         CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS n_supp
  FROM lineitem l GROUP BY 1
),
ms AS (
  SELECT spend_c AS v FROM (
    SELECT spend_c,
           ROW_NUMBER() OVER (ORDER BY spend_c, partkey) AS rn,
           COUNT(*) OVER () AS n
    FROM stats
  ) WHERE rn = CAST(FLOOR((n + 1) / 2.0) AS BIGINT)
),
mn AS (
  SELECT n_supp AS v FROM (
    SELECT n_supp,
           ROW_NUMBER() OVER (ORDER BY n_supp, partkey) AS rn,
           COUNT(*) OVER () AS n
    FROM stats
  ) WHERE rn = CAST(FLOOR((n + 1) / 2.0) AS BIGINT)
),
classified AS (
  SELECT s.partkey, s.spend_c, s.n_supp,
         CASE
           WHEN s.spend_c > ms.v AND s.n_supp < mn.v THEN 'strategic'
           WHEN s.spend_c > ms.v THEN 'leverage'
           WHEN s.n_supp < mn.v THEN 'bottleneck'
           ELSE 'non_critical'
         END AS quadrant
  FROM stats s CROSS JOIN ms CROSS JOIN mn
)
SELECT quadrant,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(spend_c) AS DOUBLE) / 100.0 AS total_spend,
       CAST(SUM(n_supp) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         AS avg_suppliers
FROM classified GROUP BY 1
""",
    tags=("procurement", "portfolio", "classification", "part"),
)
def q_part_kraljic_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # l_partkey distribution: both phases of the part-grain groupBy
    # (countDistinct expand included) cluster by partkey (guide §2.4), and
    # the single-split scan's map side parallelizes (§2.5).
    li = widen_scan(li, spark, sf_dir, ("lineitem",), "l_partkey").select(
        "l_partkey", "l_suppkey", cents("l_extendedprice").alias("val_c")
    )
    from procurement_data_pipeline_spark.caching import scoped_persist
    from procurement_data_pipeline_spark.operators.ranks import (
        with_global_rank,
    )

    stats = scoped_persist(
        li.groupBy(F.col("l_partkey").alias("partkey")).agg(
            F.sum(_dec(F.col("val_c"))).alias("spend_c"),
            F.countDistinct("l_suppkey").cast("long").alias("n_supp"),
        )
    )

    def median_of(col: str) -> DataFrame:
        # lower-median order statistic via the DISTRIBUTED exact rank
        # (operators/ranks.py) — part grain is sf-proportional, so the
        # old no-partition row_number window sorted it in one task
        ranked = with_global_rank(
            stats.select("partkey", F.col(col).alias("v")),
            [F.col("v").asc(), F.col("partkey").asc()],
            "rn",
        )
        n = stats.agg(F.count(F.lit(1)).alias("n"))
        return (
            ranked.crossJoin(F.broadcast(n))
            .filter(
                F.col("rn") == F.floor((F.col("n") + 1) / F.lit(2.0)).cast("long")
            )
            .select("v")
        )

    ms = median_of("spend_c").withColumnRenamed("v", "med_spend")
    mn = median_of("n_supp").withColumnRenamed("v", "med_supp")
    classified = (
        stats.crossJoin(F.broadcast(ms))
        .crossJoin(F.broadcast(mn))
        .select(
            "spend_c",
            "n_supp",
            F.when(
                (F.col("spend_c") > F.col("med_spend"))
                & (F.col("n_supp") < F.col("med_supp")),
                "strategic",
            )
            .when(F.col("spend_c") > F.col("med_spend"), "leverage")
            .when(F.col("n_supp") < F.col("med_supp"), "bottleneck")
            .otherwise("non_critical")
            .alias("quadrant"),
        )
    )
    return classified.groupBy("quadrant").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        dollars(F.sum("spend_c")).alias("total_spend"),
        (
            F.sum("n_supp").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("avg_suppliers"),
    )


_UNIT_SCALE = 1_000_000  # unit-cost quantization: micro-cents per unit


@register(
    "supplier_disruption_premium",
    # What-if resilience costing: if each part's CHEAPEST supplier
    # disappeared, what would shifting its whole volume to the runner-up
    # cost? The sourcing-risk number a resilience review pairs with the
    # Kraljic matrix (bottleneck quadrant + high premium = the real
    # exposure). Single-sourced parts have no runner-up — counted
    # separately as the unbounded-risk bucket.
    #
    # Exactness: per-(part, supplier) unit cost is quantized to integer
    # micro-cents (FLOOR of ONE correctly-rounded division of exact cent
    # and unit totals — identical in both engines); cheapest/runner-up
    # are deterministic ranks (unit cost, suppkey); the switch cost
    # Σ qty·(u2−u1) is an exact integer; presentation dollars and the
    # share are pinned division chains.
    #
    # Scale shape: one shuffle to (part, supplier) grain with map-side
    # partials, a supplier-bounded window per part, a broadcast dim, a
    # brand rollup. 100×-safe.
    oracle=f"""
WITH ps AS (
  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
         SUM(CAST(FLOOR(l_extendedprice * 100) AS HUGEINT)) AS spend_c,
         SUM(CAST(FLOOR(l_quantity) AS HUGEINT)) AS qty
  FROM lineitem GROUP BY 1, 2
),
unit AS (
  SELECT partkey, suppkey, spend_c, qty,
         CAST(FLOOR(CAST(spend_c AS DOUBLE) / CAST(qty AS DOUBLE)
                    * {_UNIT_SCALE}) AS BIGINT) AS u
  FROM ps WHERE qty > 0
),
ranked AS (
  SELECT partkey, suppkey, spend_c, qty, u,
         ROW_NUMBER() OVER (PARTITION BY partkey ORDER BY u, suppkey) AS rk,
         COUNT(*) OVER (PARTITION BY partkey) AS n_supp,
         SUM(qty) OVER (PARTITION BY partkey) AS part_qty
  FROM unit
),
per_part AS (
  SELECT partkey,
         MAX(n_supp) AS n_supp,
         MAX(part_qty) AS part_qty,
         MAX(CASE WHEN rk = 1 THEN u END) AS u1,
         MAX(CASE WHEN rk = 2 THEN u END) AS u2,
         SUM(spend_c) AS spend_c
  FROM ranked GROUP BY partkey
),
b AS (
  SELECT p.p_brand AS brand,
         CAST(COUNT(*) AS BIGINT) AS n_parts,
         CAST(SUM(CASE WHEN pp.n_supp = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_single_sourced,
         SUM(pp.spend_c) AS spend_c,
         SUM(CASE WHEN pp.n_supp > 1
                  THEN pp.part_qty * (pp.u2 - pp.u1)
                  ELSE CAST(0 AS HUGEINT) END) AS switch_e6
  FROM per_part pp JOIN part p ON p.p_partkey = pp.partkey
  GROUP BY 1
)
SELECT brand, n_parts, n_single_sourced,
       CAST(spend_c AS DOUBLE) / 100.0 AS total_spend,
       CAST(switch_e6 AS DOUBLE) / {_UNIT_SCALE}.0 / 100.0 AS switch_cost,
       CAST(switch_e6 AS DOUBLE) / {_UNIT_SCALE}.0
         / CAST(spend_c AS DOUBLE) AS switch_cost_share
FROM b
""",
    tags=("procurement", "risk", "what-if", "supplier"),
)
def q_supplier_disruption_premium(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Same l_partkey distribution as maverick_spend: (part, supplier)
    # groupBy + per-part windows + per-part rollup all ride one exchange
    # (guide §2.4), with a parallel map side (§2.5).
    li = widen_scan(
        load_table(spark, sf_dir, "lineitem"), spark, sf_dir, ("lineitem",),
        "l_partkey",
    ).select(
        "l_partkey",
        "l_suppkey",
        cents("l_extendedprice").alias("val_c"),
        F.floor(F.col("l_quantity")).cast("long").alias("qty"),
    )
    ps = li.groupBy(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).agg(
        F.sum(_dec(F.col("val_c"))).alias("spend_c"),
        F.sum(_dec(F.col("qty"))).alias("qty"),
    )
    unit = ps.where(F.col("qty") > 0).withColumn(
        "u",
        F.floor(
            F.col("spend_c").cast("double")
            / F.col("qty").cast("double")
            * _UNIT_SCALE
        ).cast("long"),
    )
    by_part = Window.partitionBy("partkey")
    ranked = unit.select(
        "partkey",
        "spend_c",
        "qty",
        "u",
        F.row_number().over(by_part.orderBy("u", "suppkey")).alias("rk"),
        F.count(F.lit(1)).over(by_part).alias("n_supp"),
        F.sum("qty").over(by_part).alias("part_qty"),
    )
    per_part = ranked.groupBy("partkey").agg(
        F.max("n_supp").alias("n_supp"),
        F.max("part_qty").alias("part_qty"),
        F.max(F.when(F.col("rk") == 1, F.col("u"))).alias("u1"),
        F.max(F.when(F.col("rk") == 2, F.col("u"))).alias("u2"),
        F.sum("spend_c").alias("spend_c"),
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    zero = F.lit(0).cast("decimal(38,0)")
    b = (
        per_part.join(F.broadcast(part), per_part.partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum(F.when(F.col("n_supp") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_single_sourced"),
            F.sum("spend_c").alias("spend_c"),
            F.sum(
                F.when(
                    F.col("n_supp") > 1,
                    F.col("part_qty") * (F.col("u2") - F.col("u1")),
                ).otherwise(zero)
            ).alias("switch_e6"),
        )
    )
    return b.select(
        "brand",
        "n_parts",
        "n_single_sourced",
        dollars(F.col("spend_c")).alias("total_spend"),
        (
            F.col("switch_e6").cast("double") / F.lit(float(_UNIT_SCALE)) / 100.0
        ).alias("switch_cost"),
        (
            F.col("switch_e6").cast("double")
            / F.lit(float(_UNIT_SCALE))
            / F.col("spend_c").cast("double")
        ).alias("switch_cost_share"),
    )
