"""Declared queries: lexical-statistics diagnostics over the corpus.

* docs_zipf_deviation — does the corpus obey Zipf's law? Composes the
  DECLARED docs_vocab_topk oracle verbatim (top-30 words), then scores
  each rank against the Zipfian expectation f(r) ≈ f(1)/r. Instead of
  fitting a log-log slope (ln is not correctly rounded → banned in graded
  outputs), the deviation is the EXACT INTEGER r·f(r) − f(1) and the
  ratio r·f(r)/f(1) one IEEE division — a natural-corpus check (synthetic
  or template-generated text shows flat, non-Zipfian ratios) that needs
  no transcendentals at all.
* docs_readability_cli — Coleman–Liau readability index per document:
  CLI = 0.0588·L − 0.296·S − 15.8 where L = letters per 100 words and
  S = sentences per 100 words. Chosen over Flesch-Kincaid precisely
  because it needs NO syllable model — only three exact counts per row
  (letters, words, sentence marks), so the whole score is two divisions
  and a pinned-literal linear form: hash-identical, and a pure
  whole-stage-codegen column expression at any scale (no shuffle at the
  document grain; the summary groups by source).

* docs_lexical_diversity — type-token ratio and hapax share per source
  (see its registration comment).

All names register past the graded first-50 prefix (GRADE_OVERFLOW in
__spark_entry__.py); tools/check_oracle.py hash-checks each at sf0.01.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from procurement_data_pipeline_spark.llm_ops.text import normalize_text, word_count
from procurement_data_pipeline_spark.registry import REGISTRY, register
from procurement_data_pipeline_spark.sources.tables import load_table

# DuckDB twins of the Spark expressions below (regexp_replace needs the
# explicit 'g' flag in DuckDB; Spark's is global by default).
_NORM = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
_LETTERS = f"length(regexp_replace({_NORM}, '[^a-z]', '', 'g'))"
_SENTENCES = "GREATEST(length(regexp_replace(text, '[^.!?]', '', 'g')), 1)"
_WORDS_N = f"len(string_split({_NORM}, ' '))"


@register(
    "docs_zipf_deviation",
    oracle=f"""
WITH topk AS ({REGISTRY['docs_vocab_topk'].oracle}),
ranked AS (
  SELECT word, n_occurrences,
         ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, word ASC) AS rank,
         MAX(n_occurrences) OVER () AS f1
  FROM topk
)
SELECT word, CAST(rank AS BIGINT) AS rank, n_occurrences,
       CAST(rank * n_occurrences - f1 AS BIGINT) AS zipf_deviation,
       CAST(rank * n_occurrences AS DOUBLE) / f1 AS zipf_ratio
FROM ranked
""",
    tags=("llm", "text", "diagnostics"),
)
def q_docs_zipf_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consumes the declared vocab query's DataFrame directly; the Zipf
    math is window expressions over its 30 rows — zero extra passes over
    the corpus beyond the one docs_vocab_topk already makes."""
    topk = REGISTRY["docs_vocab_topk"].builder(spark, sf_dir)
    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("word").asc())
    full = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ranked = topk.select(
        "word",
        "n_occurrences",
        F.row_number().over(w).alias("rank"),
        F.max("n_occurrences").over(full).alias("f1"),
    )
    rf = F.col("rank") * F.col("n_occurrences")
    return ranked.select(
        "word",
        F.col("rank").cast("long").alias("rank"),
        "n_occurrences",
        (rf - F.col("f1")).cast("long").alias("zipf_deviation"),
        (rf.cast("double") / F.col("f1")).alias("zipf_ratio"),
    )


# Coleman–Liau coefficients, literal-pinned identically on both sides.
_CLI_L = 0.0588
_CLI_S = 0.296
_CLI_C = 15.8


@register(
    "docs_readability_cli",
    oracle=f"""
WITH counts AS (
  SELECT source,
         CAST({_LETTERS} AS BIGINT) AS letters,
         CAST({_WORDS_N} AS BIGINT) AS n_words,
         CAST({_SENTENCES} AS BIGINT) AS sentences
  FROM documents
),
scored AS (
  SELECT source,
         {_CLI_L!r} * (100.0 * letters / n_words)
           - {_CLI_S!r} * (100.0 * sentences / n_words) - {_CLI_C!r} AS cli
  FROM counts WHERE n_words > 0
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       MIN(cli) AS min_cli,
       MAX(cli) AS max_cli
FROM scored GROUP BY source
""",
    tags=("llm", "text", "quality"),
)
def q_docs_readability_cli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row CLI is pure codegen column math (three counts, two
    divisions, pinned linear form); the summary reports the per-source
    envelope via MIN/MAX — order-free aggregates, so no double-sum
    ordering hazard ever arises."""
    docs = load_table(spark, sf_dir, "documents")
    norm = normalize_text("text")
    letters = F.length(F.regexp_replace(norm, "[^a-z]", "")).cast("long")
    sentences = F.greatest(
        F.length(F.regexp_replace(F.col("text"), "[^.!?]", "")), F.lit(1)
    ).cast("long")
    counts = docs.select(
        "source",
        letters.alias("letters"),
        word_count("text").cast("long").alias("n_words"),
        sentences.alias("sentences"),
    ).where(F.col("n_words") > 0)
    cli = (
        F.lit(_CLI_L) * (F.lit(100.0) * F.col("letters") / F.col("n_words"))
        - F.lit(_CLI_S) * (F.lit(100.0) * F.col("sentences") / F.col("n_words"))
        - F.lit(_CLI_C)
    )
    return (
        counts.select("source", cli.alias("cli"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("cli").alias("min_cli"),
            F.max("cli").alias("max_cli"),
        )
    )


@register(
    "docs_lexical_diversity",
    # Type-token ratio + hapax share per source — the lexical-diversity
    # signals of corpus curation (template-generated text shows low TTR
    # and a thin hapax tail). Both are exact integer ratios: distinct
    # types, hapax types (frequency = 1), and token totals all come from
    # one (source, word) aggregation; divisions happen once per source.
    oracle=f"""
WITH toks AS (
  SELECT source, unnest(string_split({_NORM}, ' ')) AS w
  FROM documents
),
wf AS (
  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS f
  FROM toks GROUP BY source, w
)
SELECT source,
       CAST(SUM(f) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       CAST(COUNT(*) AS DOUBLE) / CAST(SUM(f) AS BIGINT) AS ttr,
       CAST(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
         AS hapax_share
FROM wf GROUP BY source
""",
    tags=("llm", "text", "diversity"),
)
def q_docs_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One explode + one (source, word) shuffle + one source-grain
    combine. The word-frequency relation is vocabulary-bounded per
    source — the aggregation Spark map-side-combines hardest."""
    from procurement_data_pipeline_spark.llm_ops.text import words

    docs = load_table(spark, sf_dir, "documents")
    wf = (
        docs.select("source", F.explode(words("text")).alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
    )
    hapax = F.when(F.col("f") == 1, 1).otherwise(0)
    return wf.groupBy("source").agg(
        F.sum("f").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(hapax).cast("long").alias("n_hapax"),
        (F.count(F.lit(1)).cast("double") / F.sum("f").cast("long")).alias("ttr"),
        (F.sum(hapax).cast("double") / F.count(F.lit(1))).alias("hapax_share"),
    )
