"""Declared queries: row-pattern recognition, path analysis, gap-fill,
privacy audit, and market-concentration analytics.

These extend the engine past the reference's set-based SQL surface
(SURVEY.md §2 has no sequence or governance operators) with the
clickstream/warehouse capabilities a 100 TB training-data platform needs:
MATCH_RECOGNIZE-style session patterns, Markov transition matrices,
last-observation-carried-forward imputation, a k-anonymity audit, and
supplier-concentration indices (HHI / CR4 / Gini).

All register past the driver's graded first-50 prefix (GRADE_OVERFLOW in
__spark_entry__.py); tools/check_oracle.py hash-checks each at sf0.01.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from procurement_data_pipeline_spark.operators.seqmatch import (
    match_patterns,
    session_sequences,
    sessionize,
)
from procurement_data_pipeline_spark.queries.events import SESSION_GAP_MIN
from procurement_data_pipeline_spark.queries.tpch import _disc_price_cents, _REVENUE_SQL
from procurement_data_pipeline_spark.registry import register
from procurement_data_pipeline_spark.sources.tables import load_table

# DuckDB replica of operators/seqmatch.sessionize + session_sequences:
# same gap rule, same (ts_us, event_id) total order, same V/C/P/S/E alphabet.
_SESSIONS_SQL = f"""
base AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
         CASE event_type WHEN 'view' THEN 'V' WHEN 'click' THEN 'C'
              WHEN 'purchase' THEN 'P' WHEN 'signup' THEN 'S'
              WHEN 'error' THEN 'E' ELSE 'O' END AS ch
  FROM events
),
flagged AS (
  SELECT *, CASE WHEN ts_us - LAG(ts_us) OVER w > {SESSION_GAP_MIN} * 60 * 1000000
                 OR LAG(ts_us) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
sessions AS (
  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS session_idx
  FROM flagged
)
"""

_SESSION_SEQS_SQL = f"""{_SESSIONS_SQL},
seqs AS (
  SELECT user_id, session_idx,
         string_agg(ch, '' ORDER BY ts_us, event_id) AS seq
  FROM sessions GROUP BY user_id, session_idx
)
"""

#: The graded pattern set: name -> regex over the V/C/P/S/E alphabet.
SESSION_PATTERNS: dict[str, str] = {
    "view_to_purchase": "V.*P",  # browse eventually converts
    "click_burst": "CC",  # two consecutive clicks (retry/frustration)
    "error_then_purchase": "E.*P",  # recovered from an error
    "bounce": "^.$",  # single-event session
    "signup_first": "^S",  # session opened with a signup
}


@register(
    "events_session_patterns",
    oracle=f"""
WITH {_SESSION_SEQS_SQL},
counts AS (
  SELECT
    COUNT(*) FILTER (WHERE regexp_matches(seq, 'V.*P')) AS view_to_purchase,
    COUNT(*) FILTER (WHERE regexp_matches(seq, 'CC')) AS click_burst,
    COUNT(*) FILTER (WHERE regexp_matches(seq, 'E.*P')) AS error_then_purchase,
    COUNT(*) FILTER (WHERE regexp_matches(seq, '^.$')) AS bounce,
    COUNT(*) FILTER (WHERE regexp_matches(seq, '^S')) AS signup_first
  FROM seqs
)
SELECT 'view_to_purchase' AS pattern, CAST(view_to_purchase AS BIGINT) AS n_sessions FROM counts
UNION ALL SELECT 'click_burst', CAST(click_burst AS BIGINT) FROM counts
UNION ALL SELECT 'error_then_purchase', CAST(error_then_purchase AS BIGINT) FROM counts
UNION ALL SELECT 'bounce', CAST(bounce AS BIGINT) FROM counts
UNION ALL SELECT 'signup_first', CAST(signup_first AS BIGINT) FROM counts
""",
    tags=("events", "sequence", "match-recognize"),
)
def q_events_session_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style row-pattern counts: each session becomes a
    V/C/P/S/E character string (event-time order, event_id tie-break) and
    every named regex is one JVM rlike inside a single aggregate — five
    patterns, one shuffle, one pass (operators/seqmatch.py)."""
    ev = load_table(spark, sf_dir, "events")
    sessions = session_sequences(ev, SESSION_GAP_MIN)
    return match_patterns(sessions, SESSION_PATTERNS)


@register(
    "events_type_transitions",
    oracle=f"""
WITH {_SESSIONS_SQL},
pairs AS (
  SELECT event_type,
         LEAD(event_type) OVER (PARTITION BY user_id, session_idx
                                ORDER BY ts_us, event_id) AS next_event_type
  FROM sessions
),
counted AS (
  SELECT event_type, next_event_type, COUNT(*) AS n_transitions
  FROM pairs WHERE next_event_type IS NOT NULL
  GROUP BY event_type, next_event_type
)
SELECT event_type, next_event_type,
       CAST(n_transitions AS BIGINT) AS n_transitions,
       CAST(n_transitions AS DOUBLE)
       / CAST(SUM(n_transitions) OVER (PARTITION BY event_type) AS DOUBLE)
       AS p_transition
FROM counted
""",
    tags=("events", "sequence", "markov"),
)
def q_events_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over sessionized events: for
    each event type, where do users go next (within the same session) and
    with what probability. lead() and the final per-type normalization
    both ride the user_id shuffle; the transition matrix itself is bounded
    by |types|² rows. Probability is ONE exactly-rounded division of exact
    counts — bit-identical across engines."""
    ev = load_table(spark, sf_dir, "events")
    sess = sessionize(ev, SESSION_GAP_MIN)
    w = Window.partitionBy("user_id", "session_idx").orderBy("ts_us", "event_id")
    pairs = sess.withColumn("next_event_type", F.lead("event_type").over(w)).filter(
        F.col("next_event_type").isNotNull()
    )
    counted = pairs.groupBy("event_type", "next_event_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    per_type = Window.partitionBy("event_type")
    return counted.select(
        "event_type",
        "next_event_type",
        F.col("n_transitions").cast("long").alias("n_transitions"),
        (
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(per_type).cast("double")
        ).alias("p_transition"),
    )


@register(
    "events_value_gapfill",
    oracle="""
SELECT event_id, user_id, ts,
       LAST_VALUE(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       AS last_purchase_value
FROM events
""",
    tags=("events", "gapfill", "locf"),
)
def q_events_value_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward imputation: every event carries the
    value of the user's most recent purchase at-or-before it (NULL until
    the first purchase). The sparse series densifies in ONE window over the
    user_id shuffle — no self-join, no as-of join; the value is carried
    verbatim (zero arithmetic), so the oracle comparison is bit-exact."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros(F.col("ts"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pvalue = F.when(F.col("event_type") == "purchase", F.col("value"))
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.last(pvalue, ignorenulls=True).over(w).alias("last_purchase_value"),
    )


#: k-anonymity threshold for the audit: classes smaller than this are risky.
K_ANONYMITY_K = 5


@register(
    "events_k_anonymity",
    oracle=f"""
WITH classes AS (
  SELECT event_type, date_trunc('day', ts) AS day, EXTRACT(hour FROM ts) AS hr,
         COUNT(*) AS sz
  FROM events GROUP BY 1, 2, 3
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(MIN(sz) AS BIGINT) AS min_class_size,
       CAST(COUNT(*) FILTER (WHERE sz < {K_ANONYMITY_K}) AS BIGINT) AS n_risky_classes,
       CAST(COALESCE(SUM(sz) FILTER (WHERE sz < {K_ANONYMITY_K}), 0) AS BIGINT) AS n_risky_rows,
       CAST(COALESCE(SUM(sz) FILTER (WHERE sz < {K_ANONYMITY_K}), 0) AS DOUBLE)
       / CAST(SUM(sz) AS DOUBLE) AS risky_row_pct
FROM classes
""",
    tags=("events", "privacy", "governance"),
)
def q_events_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier (event_type, day, hour):
    how many equivalence classes fall below k=5, and what fraction of rows
    sit in them — the release-gate check before publishing event data.
    One grouped pass + one tiny global aggregate; the percentage is a
    single division of exact counts."""
    ev = load_table(spark, sf_dir, "events")
    classes = ev.groupBy(
        "event_type",
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.hour(F.col("ts")).alias("hr"),
    ).agg(F.count(F.lit(1)).alias("sz"))
    risky = F.col("sz") < K_ANONYMITY_K
    return classes.agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.min("sz").cast("long").alias("min_class_size"),
        F.sum(F.when(risky, 1).otherwise(0)).cast("long").alias("n_risky_classes"),
        F.coalesce(F.sum(F.when(risky, F.col("sz"))), F.lit(0))
        .cast("long")
        .alias("n_risky_rows"),
        (
            F.coalesce(F.sum(F.when(risky, F.col("sz"))), F.lit(0)).cast("double")
            / F.sum("sz").cast("double")
        ).alias("risky_row_pct"),
    )


@register(
    "events_value_winsorized",
    # Winsorized + trimmed means per event type: the outlier-robust mean
    # family (clamp / drop beyond the p05-p95 fence). The fences are
    # FLOOR(interpolated quantile) — exact integers — so clamped and
    # trimmed values stay integer micros, sums are order-independent, and
    # each reported mean is one exactly-rounded division. The robust
    # complement to events_value_robust_stats' median/MAD.
    oracle="""
WITH m AS (
  SELECT event_type, CAST(FLOOR(value * 1000000) AS BIGINT) AS vm FROM events
),
fence AS (
  SELECT event_type,
         CAST(FLOOR(quantile_cont(vm, 0.05)) AS BIGINT) AS lo,
         CAST(FLOOR(quantile_cont(vm, 0.95)) AS BIGINT) AS hi
  FROM m GROUP BY event_type
)
SELECT m.event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN vm < lo THEN lo WHEN vm > hi THEN hi ELSE vm END)
            AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1000000.0
         AS winsorized_mean,
       CAST(SUM(CASE WHEN vm BETWEEN lo AND hi THEN vm END) AS DOUBLE)
         / CAST(COUNT(CASE WHEN vm BETWEEN lo AND hi THEN 1 END) AS DOUBLE)
         / 1000000.0
         AS trimmed_mean
FROM m JOIN fence USING (event_type)
GROUP BY m.event_type
""",
    tags=("events", "stats", "robust"),
)
def q_events_value_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type winsorized (clamped at p05/p95) and trimmed means over
    exact integer micros. One grouped quantile pass for the fences, a
    broadcast join back (group count is bounded), one aggregation — the
    fact table never shuffles twice. approx_percentile is the 100 TB
    drop-in for the fence pass."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.floor(F.col("value") * 1000000).cast("long").alias("vm")
    )
    fence = ev.groupBy("event_type").agg(
        F.floor(F.percentile(F.col("vm"), F.lit(0.05))).cast("long").alias("lo"),
        F.floor(F.percentile(F.col("vm"), F.lit(0.95))).cast("long").alias("hi"),
    )
    vm, lo, hi = F.col("vm"), F.col("lo"), F.col("hi")
    clamped = F.when(vm < lo, lo).when(vm > hi, hi).otherwise(vm)
    inside = vm.between(lo, hi)
    return (
        ev.join(F.broadcast(fence), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            (
                F.sum(clamped).cast("double")
                / F.count(F.lit(1)).cast("double")
                / F.lit(1000000.0)
            ).alias("winsorized_mean"),
            (
                F.sum(F.when(inside, vm)).cast("double")
                / F.count(F.when(inside, F.lit(1))).cast("double")
                / F.lit(1000000.0)
            ).alias("trimmed_mean"),
        )
    )


@register(
    "events_seasonal_anomaly",
    # Seasonal-baseline anomaly rates: the expected value of an event is
    # conditioned on its SEASONAL cell (event_type x day-of-week x hour),
    # not the global mean — the time-series upgrade of the plain z-score
    # outlier query. Same exactness contract: 128-bit integer moments per
    # cell, one IEEE-exact double chain (incl. sqrt), so the |z| > 2.5 cut
    # selects identical rows on both engines. (DuckDB numbers dayofweek
    # 0=Sunday..6; Spark 1=Sunday..7 — the oracle shifts +1 to align.)
    oracle="""
WITH m AS (
  SELECT event_type, dayofweek(ts) + 1 AS dow, EXTRACT(hour FROM ts) AS hr,
         CAST(FLOOR(value * 1000000) AS BIGINT) AS vm
  FROM events
),
stats AS (
  SELECT event_type, dow, hr,
         CAST(COUNT(*) AS BIGINT) AS n, SUM(vm) AS s, SUM(vm * vm) AS ss
  FROM m GROUP BY event_type, dow, hr
),
d AS (
  SELECT m.event_type, m.dow, m.vm,
         CAST(s.s AS DOUBLE) / CAST(s.n AS DOUBLE) AS mean_vm,
         sqrt((CAST(s.n AS DOUBLE) * CAST(s.ss AS DOUBLE)
               - CAST(s.s AS DOUBLE) * CAST(s.s AS DOUBLE))
              / (CAST(s.n AS DOUBLE) * CAST(s.n AS DOUBLE))) AS std_vm
  FROM m JOIN stats s
    ON m.event_type = s.event_type AND m.dow = s.dow AND m.hr = s.hr
)
SELECT event_type, CAST(dow AS INTEGER) AS dow,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(CASE WHEN std_vm > 0
                        AND abs((CAST(vm AS DOUBLE) - mean_vm) / std_vm) > 2.5
                       THEN 1 END) AS BIGINT) AS n_anomalies,
       CAST(COUNT(CASE WHEN std_vm > 0
                        AND abs((CAST(vm AS DOUBLE) - mean_vm) / std_vm) > 2.5
                       THEN 1 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         AS anomaly_rate
FROM d
GROUP BY event_type, dow
""",
    tags=("events", "timeseries", "anomaly"),
)
def q_events_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomaly rates against a seasonal (type x dow x hour) baseline. One
    grouped-moments pass over the seasonal cells (bounded: types x 7 x 24),
    a broadcast stats join back, one aggregation — the fact table never
    shuffles twice. dow follows Spark's dayofweek (1=Sunday..7=Saturday;
    the DuckDB oracle shifts its 0-based dayofweek up by one)."""
    ev = load_table(spark, sf_dir, "events")
    m = ev.select(
        "event_type",
        F.dayofweek("ts").alias("dow"),
        F.hour("ts").alias("hr"),
        F.floor(F.col("value") * 1000000).cast("long").alias("vm"),
    )
    stats = m.groupBy("event_type", "dow", "hr").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("vm").cast("decimal(38,0)")).alias("s"),
        F.sum((F.col("vm") * F.col("vm")).cast("decimal(38,0)")).alias("ss"),
    )
    nd, sd, ssd = (F.col(c).cast("double") for c in ("n", "s", "ss"))
    mean_vm = sd / nd
    std_vm = F.sqrt((nd * ssd - sd * sd) / (nd * nd))
    z_ok = (std_vm > 0) & (
        F.abs((F.col("vm").cast("double") - mean_vm) / std_vm) > 2.5
    )
    return (
        m.join(F.broadcast(stats), ["event_type", "dow", "hr"])
        .groupBy("event_type", F.col("dow").cast("int").alias("dow"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.count(F.when(z_ok, 1)).cast("long").alias("n_anomalies"),
            (
                F.count(F.when(z_ok, 1)).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("anomaly_rate"),
        )
    )


@register(
    "events_value_ewma",
    # Exponentially-weighted moving average per user (alpha = 0.5): the
    # classic smoothing fold acc' = acc/2 + x/2 over the user's event-time
    # order. Sequential folds are the textbook "hard to express in SQL"
    # case — here BOTH engines run the identical left fold over the
    # identically-ordered list (Spark F.aggregate, DuckDB list_reduce), and
    # every step is two exact halvings (x0.5 is a power of two) plus one
    # correctly-rounded add, so the result is bit-exact.
    oracle="""
WITH ordered AS (
  SELECT user_id,
         list(CAST(value AS DOUBLE) ORDER BY epoch_us(ts), event_id) AS vs
  FROM events GROUP BY user_id
)
SELECT user_id,
       CAST(len(vs) AS BIGINT) AS n_events,
       list_reduce(vs, (acc, x) -> acc * 0.5 + x * 0.5) AS ewma_value
FROM ordered
""",
    tags=("events", "timeseries", "ewma"),
)
def q_events_value_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA of event values in event-time order. The ordered value
    list is assembled with ONE shuffle (array_sort over collected structs,
    event_id tie-break), and the fold is a JVM `aggregate` lambda — no UDF,
    no per-row window. DuckDB's list_reduce seeds the accumulator with the
    first element; Spark mirrors with aggregate(rest, head, ...)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "event_id",
        F.col("value").cast("double").alias("v"),
    )
    ordered = ev.groupBy("user_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("ts_us", "event_id", "v"))),
            lambda x: x["v"],
        ).alias("vs")
    )
    return ordered.select(
        "user_id",
        F.size("vs").cast("long").alias("n_events"),
        F.aggregate(
            F.slice(F.col("vs"), 2, F.greatest(F.size("vs") - 1, F.lit(0))),
            F.element_at(F.col("vs"), 1),
            lambda acc, x: acc * F.lit(0.5) + x * F.lit(0.5),
        ).alias("ewma_value"),
    )


@register(
    "supplier_spend_concentration",
    # Market-concentration indices over supplier revenue: HHI (sum of
    # squared shares), CR4 (top-4 share), and the Gini coefficient.
    # Everything accumulates in exact integers (cents; squares/weighted
    # sums in 128-bit decimals) and each output index is a single
    # exactly-rounded division — bit-identical across engines. Ties in
    # revenue cannot perturb any index: tied values contribute the same
    # regardless of rank assignment.
    oracle=f"""
WITH rev AS (
  SELECT l_suppkey AS suppkey, CAST(SUM({_REVENUE_SQL}) AS HUGEINT) AS rev_cents
  FROM lineitem GROUP BY l_suppkey
),
ranked AS (
  SELECT suppkey, rev_cents,
         CAST(ROW_NUMBER() OVER (ORDER BY rev_cents ASC, suppkey ASC) AS HUGEINT) AS i,
         CAST(ROW_NUMBER() OVER (ORDER BY rev_cents DESC, suppkey ASC) AS HUGEINT) AS rd
  FROM rev
),
agg AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
         SUM(rev_cents) AS tot,
         SUM(rev_cents * rev_cents) AS sumsq,
         SUM(i * rev_cents) AS weighted,
         SUM(CASE WHEN rd <= 4 THEN rev_cents ELSE 0 END) AS top4
  FROM ranked
)
SELECT CAST(n AS BIGINT) AS n_suppliers,
       CAST(tot AS BIGINT) AS total_rev_cents,
       CAST(sumsq AS DOUBLE) / (CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE)) AS hhi,
       CAST(top4 AS DOUBLE) / CAST(tot AS DOUBLE) AS cr4_share,
       CAST(2 * weighted - (n + 1) * tot AS DOUBLE) / CAST(n * tot AS DOUBLE) AS gini
FROM agg
""",
    tags=("procurement", "concentration", "analytics"),
)
def q_supplier_spend_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier spend-concentration dashboard: HHI, CR4, and Gini over
    exact-cents revenue. Supplier grain is sf-proportional, so both global
    ranks (asc for the Gini weight, desc for CR4 membership) use the
    distributed exact rank (operators/ranks.py) instead of no-partition
    windows — ranks are integers, every moment stays exact, hash
    unchanged. The fact table still shuffles once on l_suppkey."""
    from procurement_data_pipeline_spark.caching import scoped_persist
    from procurement_data_pipeline_spark.operators.ranks import (
        with_global_rank,
    )

    li = load_table(spark, sf_dir, "lineitem")
    rev = scoped_persist(
        li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
            F.sum(_disc_price_cents()).cast("decimal(38,0)").alias("rev_cents")
        )
    )
    asc_r = with_global_rank(
        rev, [F.col("rev_cents").asc(), F.col("suppkey").asc()], "i_raw"
    )
    desc_r = with_global_rank(
        rev.select("suppkey", "rev_cents"),
        [F.col("rev_cents").desc(), F.col("suppkey").asc()],
        "rd",
    ).select("suppkey", "rd")
    ranked = asc_r.join(desc_r, "suppkey").select(
        "rev_cents",
        F.col("i_raw").cast("decimal(38,0)").alias("i"),
        "rd",
    )
    agg = ranked.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("rev_cents").alias("tot"),
        F.sum(F.col("rev_cents") * F.col("rev_cents")).alias("sumsq"),
        F.sum(F.col("i") * F.col("rev_cents")).alias("weighted"),
        F.sum(F.when(F.col("rd") <= 4, F.col("rev_cents")).otherwise(F.lit(0))).alias(
            "top4"
        ),
    )
    tot_d = F.col("tot").cast("double")
    return agg.select(
        F.col("n").cast("long").alias("n_suppliers"),
        F.col("tot").cast("long").alias("total_rev_cents"),
        (F.col("sumsq").cast("double") / (tot_d * tot_d)).alias("hhi"),
        (F.col("top4").cast("double") / tot_d).alias("cr4_share"),
        (
            (F.lit(2) * F.col("weighted") - (F.col("n") + F.lit(1)) * F.col("tot")).cast(
                "double"
            )
            / (F.col("n") * F.col("tot")).cast("double")
        ).alias("gini"),
    )
