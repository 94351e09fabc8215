"""Curriculum scheduling: phase a corpus by quality for staged training.

LLM training curricula order data from "everything" to "only the best"
(or the reverse) across training phases. The schedulable unit here is a
(phase, keep-rate) assignment computed from the corpus itself:

* each document gets the repo's heuristic quality score
  (``llm_ops.text.quality_score`` — the same expression the graded
  ``docs_quality_score`` query hash-verifies against DuckDB);
* fixed score thresholds assign a phase (literal cut points — a
  DATA-INDEPENDENT rule, so the assignment is a pure row-local
  expression: no global sort, no NTILE over one partition, nothing whose
  parallelism is bounded by the number of phases — the shape that
  survives 100 TB);
* each phase downsamples DETERMINISTICALLY to its configured keep-rate
  via the md5-fraction filter (``llm_ops.kmv.hash_frac``, the engine's
  portable sampling primitive): re-running the schedule selects the SAME
  documents, and the selection shards with the data.

The declared query reports the schedule audit (docs/chars, selected
docs/chars per phase) — the number a data engineer checks before
launching a run. The DuckDB oracle reproduces score, phase, and md5
selection bit-for-bit (all three reuse already-hash-verified contracts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from procurement_data_pipeline_spark.llm_ops.kmv import (
    hash_frac,
    hash_frac_sql,
)
from procurement_data_pipeline_spark.llm_ops.sampling import hash_key
from procurement_data_pipeline_spark.llm_ops.text import quality_score
from procurement_data_pipeline_spark.queries.text import _EN, _WORDS
from procurement_data_pipeline_spark.registry import register
from procurement_data_pipeline_spark.sources.tables import load_table

# (phase, min quality inclusive, deterministic keep rate). NULL/low scores
# fall through to the tail phase on both engines (CASE over NULL is not
# true). Literal, documented config — the data-independent assignment rule.
_PHASES = (
    ("p1_high", 0.80, 1.0),
    ("p2_mid", 0.55, 0.5),
    ("p3_tail", None, 0.2),
)
_SALT = "curriculum-v1"

_QUALITY_SQL = f"""
  LEAST(1.0, wc / 100.0) * 0.4
  + LEAST(1.0, (sw / wc) * 4.0) * 0.3
  + LEAST(1.0, (chars / wc) / 8.0) * 0.3
"""


@register(
    "docs_curriculum_schedule",
    oracle=f"""
WITH feats AS (
  SELECT doc_id, n_chars,
         CAST(len({_WORDS}) AS DOUBLE) AS wc,
         CAST(len(list_filter({_WORDS}, w -> list_contains([{_EN}], w))) AS DOUBLE) AS sw,
         CAST(length(text) AS DOUBLE) AS chars
  FROM documents
),
scored AS (
  SELECT doc_id, n_chars, {_QUALITY_SQL} AS q FROM feats
),
assigned AS (
  SELECT doc_id, n_chars,
         CASE WHEN q >= 0.80 THEN 'p1_high'
              WHEN q >= 0.55 THEN 'p2_mid'
              ELSE 'p3_tail' END AS phase,
         CASE WHEN q >= 0.80 THEN 1.0
              WHEN q >= 0.55 THEN 0.5
              ELSE 0.2 END AS keep_rate,
         {hash_frac_sql(f"md5(COALESCE(CAST(doc_id AS VARCHAR), '<null>') || '{_SALT}')")} AS u
  FROM scored
)
SELECT phase,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS chars_total,
       CAST(SUM(CASE WHEN u < keep_rate THEN 1 ELSE 0 END) AS BIGINT) AS n_selected,
       CAST(SUM(CASE WHEN u < keep_rate THEN n_chars ELSE 0 END) AS BIGINT) AS chars_selected
FROM assigned
GROUP BY phase
ORDER BY phase
""",
    tags=("text", "llm", "curriculum", "sampling"),
)
def q_docs_curriculum_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-phase schedule audit: corpus volume and the deterministic
    selection each training phase would actually load."""
    docs = load_table(spark, sf_dir, "documents")
    q = quality_score("text")
    phase = (
        F.when(q >= _PHASES[0][1], F.lit(_PHASES[0][0]))
        .when(q >= _PHASES[1][1], F.lit(_PHASES[1][0]))
        .otherwise(F.lit(_PHASES[2][0]))
    )
    rate = (
        F.when(q >= _PHASES[0][1], F.lit(_PHASES[0][2]))
        .when(q >= _PHASES[1][1], F.lit(_PHASES[1][2]))
        .otherwise(F.lit(_PHASES[2][2]))
    )
    u = hash_frac(hash_key("doc_id", salt=_SALT))
    sel = u < rate
    return (
        docs.select(
            phase.alias("phase"),
            F.col("n_chars"),
            sel.alias("_sel"),
        )
        .groupBy("phase")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("chars_total"),
            F.sum(F.when(F.col("_sel"), 1).otherwise(0))
            .cast("long")
            .alias("n_selected"),
            F.sum(F.when(F.col("_sel"), F.col("n_chars")).otherwise(0))
            .cast("long")
            .alias("chars_selected"),
        )
        .orderBy("phase")
    )
