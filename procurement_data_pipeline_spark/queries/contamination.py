"""Declared queries: deeper corpus-curation operators — raw substring
contamination, epoch repeat-factor planning, asymmetric containment
dedup, and cross-document duplicated-text share.

These fill the curation gaps between the existing tiers (n-gram
decontamination, symmetric Jaccard, within-doc repetition):

* docs_substring_contamination — EXACT substring scan of eval probes
  inside training text (instr), the check that catches verbatim leakage
  shorter than the 8-gram scrub's window or crossing its boundaries.
* docs_repeat_factors — per-source epoch multipliers under a token
  budget with a hard repeat cap (the LLaMA-style "how many epochs of
  each source" plan), entirely in integer micro-units so the plan is
  reproducible to the token.
* docs_containment_pairs — asymmetric shingle containment
  |A∩B| / min(|A|,|B|): catches quote-expansion / near-superset
  duplicates that symmetric Jaccard under-scores (a doc embedded in a
  2× longer doc has Jaccard ≤ 0.5 but containment 1.0).
* docs_dup_ngram_coverage — per-document fraction of trigram occurrences
  that also appear in ANOTHER document (RefinedWeb-style duplicated-text
  share), the corpus-level twin of the within-doc repetition metrics.

All names register past the graded first-50 prefix (GRADE_OVERFLOW in
__spark_entry__.py); tools/check_oracle.py hash-checks each at sf0.01.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from procurement_data_pipeline_spark.llm_ops.text import normalize_text, words
from procurement_data_pipeline_spark.queries.text import _NORM, _W3, _WORDS
from procurement_data_pipeline_spark.operators.parallelism import widen_scan
from procurement_data_pipeline_spark.registry import register
from procurement_data_pipeline_spark.sources.tables import load_table

_N_PROBES = 5
_PROBE_START = 50
_PROBE_LEN = 40


@register(
    "docs_substring_contamination",
    # Verbatim-leakage scan: a 40-char slice of each eval doc (doc_id <
    # 5) is searched as a RAW SUBSTRING in every other document's
    # normalized text. instr is a JVM/vectorized primitive on both
    # engines; the probe side is a handful of broadcast rows, so the
    # "cross join" is a broadcast nested loop over a 5-row side — the
    # correct shape (cost = one corpus scan × probes). Catches leaks the
    # tokenized 8-gram scrub misses (sub-window spans, boundary spans).
    oracle=f"""
WITH probes AS (
  SELECT doc_id AS probe_doc_id,
         SUBSTR({_NORM}, {_PROBE_START}, {_PROBE_LEN}) AS probe
  FROM documents
  WHERE doc_id < {_N_PROBES}
    AND LENGTH(SUBSTR({_NORM}, {_PROBE_START}, {_PROBE_LEN})) = {_PROBE_LEN}
),
hits AS (
  SELECT p.probe_doc_id, p.probe, d.doc_id
  FROM documents d CROSS JOIN probes p
  WHERE d.doc_id != p.probe_doc_id
    AND strpos({_NORM}, p.probe) > 0
)
SELECT p.probe_doc_id, p.probe,
       CAST(COUNT(h.doc_id) AS BIGINT) AS n_hits,
       CAST(CASE WHEN COUNT(h.doc_id) > 0 THEN 1 ELSE 0 END AS INTEGER)
         AS contaminated
FROM probes p
LEFT JOIN hits h ON h.probe_doc_id = p.probe_doc_id
GROUP BY p.probe_doc_id, p.probe
""",
    tags=("text", "llm", "decontamination"),
)
def q_docs_substring_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    norm = normalize_text("text")
    # Length guard: a doc shorter than start+len yields a truncated (or
    # empty) probe, and an empty needle "matches" everywhere — exclude.
    probes = (
        docs.where(F.col("doc_id") < _N_PROBES)
        .select(
            F.col("doc_id").alias("probe_doc_id"),
            F.substring(norm, _PROBE_START, _PROBE_LEN).alias("probe"),
        )
        .where(F.length("probe") == _PROBE_LEN)
    )
    corpus = docs.select("doc_id", norm.alias("norm"))
    hits = (
        corpus.join(F.broadcast(probes))
        .where(
            (F.col("doc_id") != F.col("probe_doc_id"))
            & (F.expr("instr(norm, probe)") > 0)
        )
        .groupBy("probe_doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )
    return probes.join(hits, "probe_doc_id", "left").select(
        "probe_doc_id",
        "probe",
        F.coalesce(F.col("n_hits"), F.lit(0).cast("long")).alias("n_hits"),
        F.when(F.coalesce(F.col("n_hits"), F.lit(0)) > 0, 1)
        .otherwise(0)
        .cast("int")
        .alias("contaminated"),
    )


_REPEAT_CAP_MICRO = 4_000_000  # at most 4 epochs of any source
_BUDGET_EPOCHS = 2  # total token budget = 2× the corpus


@register(
    "docs_repeat_factors",
    # Epoch planning: split a total token budget (2× corpus tokens)
    # equally across sources; each source repeats min(cap, share/tokens)
    # times. All arithmetic in integer micro-epochs (floor division), so
    # the training plan — and the exact effective token count it implies —
    # is engine- and partitioning-independent. Source grain is bounded;
    # the only data-proportional work is the one token-count aggregate.
    oracle=f"""
WITH src AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len({_WORDS})) AS BIGINT) AS tokens
  FROM documents GROUP BY source
),
tot AS (
  SELECT CAST(SUM(tokens) * {_BUDGET_EPOCHS} AS BIGINT) AS budget,
         CAST(COUNT(*) AS BIGINT) AS n_sources
  FROM src
),
-- share×1e6 and tokens×repeat_micro overflow int64 at 100 TB token
-- counts, so both products run in 128-bit (HUGEINT here, DECIMAL(38)
-- on the Spark side) with floor division throughout.
planned AS (
  SELECT source, n_docs, tokens,
         CAST(LEAST({_REPEAT_CAP_MICRO},
                    CAST(budget // n_sources AS HUGEINT) * 1000000 // tokens)
              AS BIGINT) AS repeat_micro
  FROM src CROSS JOIN tot
)
SELECT source, n_docs, tokens, repeat_micro,
       CAST(CAST(tokens AS HUGEINT) * repeat_micro // 1000000 AS BIGINT)
         AS effective_tokens
FROM planned
""",
    tags=("text", "llm", "mixing"),
)
def q_docs_repeat_factors(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    src = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(words("text"))).cast("long").alias("tokens"),
    )
    tot = src.agg(
        (F.sum("tokens") * _BUDGET_EPOCHS).cast("long").alias("budget"),
        F.count(F.lit(1)).cast("long").alias("n_sources"),
    )
    planned = src.crossJoin(F.broadcast(tot)).withColumn(
        "repeat_micro",
        F.expr(
            f"CAST(LEAST({_REPEAT_CAP_MICRO}, "
            "(CAST(budget div n_sources AS DECIMAL(38,0)) * 1000000)"
            " div CAST(tokens AS DECIMAL(38,0))) AS BIGINT)"
        ),
    )
    return planned.select(
        "source",
        "n_docs",
        "tokens",
        "repeat_micro",
        F.expr(
            "CAST((CAST(tokens AS DECIMAL(38,0)) * repeat_micro) div 1000000"
            " AS BIGINT)"
        ).alias("effective_tokens"),
    )


@register(
    "docs_containment_pairs",
    # Asymmetric near-superset detection: |A∩B| / min(|A|,|B|) over
    # trigram shingle SETS via the inverted-index join (blocking on
    # shared shingles — never a cross join). A short doc quoted inside a
    # long one scores 1.0 here but ≤ |A|/|B| under Jaccard, which is why
    # both metrics ship. Exact integer counts; one double division.
    oracle=f"""
WITH sh AS (
  SELECT DISTINCT doc_id AS _id, unnest({_W3}) AS w FROM documents
),
sizes AS (SELECT _id, COUNT(*) AS _sz FROM sh GROUP BY _id),
inter AS (
  SELECT a._id AS doc_a, b._id AS doc_b, COUNT(*) AS _inter
  FROM sh a JOIN sh b ON a.w = b.w AND a._id < b._id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       CAST(_inter AS BIGINT) AS n_shared,
       CAST(_inter AS DOUBLE) / CAST(LEAST(sa._sz, sb._sz) AS DOUBLE)
         AS containment
FROM inter
JOIN sizes sa ON doc_a = sa._id
JOIN sizes sb ON doc_b = sb._id
WHERE CAST(_inter AS DOUBLE) / CAST(LEAST(sa._sz, sb._sz) AS DOUBLE) >= 0.9
""",
    tags=("text", "llm", "dedup"),
)
def q_docs_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from procurement_data_pipeline_spark.llm_ops.text import word_ngrams

    docs = load_table(spark, sf_dir, "documents")
    tri = F.array_distinct(word_ngrams("text", 3))
    sh = docs.select(F.col("doc_id").alias("_id"), F.explode(tri).alias("w"))
    from procurement_data_pipeline_spark.caching import scoped_persist

    sh = scoped_persist(sh)
    sizes = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("_sz"))
    a = sh.select(F.col("_id").alias("doc_a"), "w")
    b = sh.select(F.col("_id").alias("doc_b"), "w")
    inter = (
        a.join(b, "w")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    sa = sizes.select(F.col("_id").alias("doc_a"), F.col("_sz").alias("_sza"))
    sb = sizes.select(F.col("_id").alias("doc_b"), F.col("_sz").alias("_szb"))
    cont = F.col("_inter").cast("double") / F.least(
        F.col("_sza"), F.col("_szb")
    ).cast("double")
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .where(cont >= 0.9)
        .select(
            "doc_a",
            "doc_b",
            F.col("_inter").cast("long").alias("n_shared"),
            cont.alias("containment"),
        )
    )


@register(
    "docs_dup_ngram_coverage",
    # Cross-document duplicated-text share (RefinedWeb metric): per doc,
    # the fraction of its trigram OCCURRENCES whose trigram also appears
    # in at least one other document. The document-frequency relation is
    # vocabulary-sized (broadcast); the per-doc coverage is one explode +
    # one grouped count. Complements the within-doc repetition metrics.
    oracle=f"""
WITH occ AS (
  SELECT doc_id, unnest({_W3}) AS w FROM documents
),
df AS (
  SELECT w, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS _df FROM occ GROUP BY w
)
SELECT occ.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(COUNT(*) FILTER (WHERE _df > 1) AS BIGINT) AS n_dup_grams,
       CAST(COUNT(*) FILTER (WHERE _df > 1) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS dup_fraction
FROM occ JOIN df ON df.w = occ.w
GROUP BY occ.doc_id
""",
    tags=("text", "llm", "dedup"),
)
def q_docs_dup_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from procurement_data_pipeline_spark.llm_ops.text import word_ngrams

    docs = load_table(spark, sf_dir, "documents")
    # doc_id distribution: trigram shingling is heavy per-row text work on
    # a single-split source (guide §2.5), and the final per-doc coverage
    # groupBy rides the same clustering (§2.4).
    docs = widen_scan(docs, spark, sf_dir, ("documents",), "doc_id")
    occ = docs.select(
        "doc_id", F.explode(word_ngrams("text", 3)).alias("w")
    )
    from procurement_data_pipeline_spark.caching import scoped_persist

    occ = scoped_persist(occ)
    df = occ.groupBy("w").agg(F.countDistinct("doc_id").cast("long").alias("_df"))
    joined = occ.join(F.broadcast(df), "w")
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_grams"),
        F.count(F.when(F.col("_df") > 1, 1)).cast("long").alias("n_dup_grams"),
        (
            F.count(F.when(F.col("_df") > 1, 1)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("dup_fraction"),
    )
