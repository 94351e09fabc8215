"""End-to-end training-data curation pipeline (the LLM-ops flagship DAG).

The procurement DAG (plans/procurement.py) is the reference-parity
orchestration; this is its beyond-reference sibling: the full raw-corpus →
training-set flow every large-scale pretraining pipeline runs, composed
from the engine's own operators and executed through the same Pipeline
runner (per-task failure isolation, retries, context hand-off):

    gate → dedup → decontaminate → mix → split → pack → report

* gate          — expectations engine: non-null text, sane length, known
                  source (violations quarantined, not dropped silently)
* dedup         — exact-content dedup (min-id survivor per fingerprint)
* decontaminate — drop docs sharing any word 8-gram with the eval source
* mix           — temperature (sqrt) rebalance of the source distribution
* split         — leakage-safe train/eval holdout on the content hash
* pack          — fixed-token-budget sequence packing of the train side
* report        — one summary row per stage with its surviving doc count
                  (the audit artifact: where did the corpus shrink, and
                  every stage's delta is attributable)

Every stage is a pure DataFrame→DataFrame function, so the same DAG
backfills batch or rides foreachBatch incrementally. Stage outputs are
scoped-persisted: downstream stages and the report read each boundary once
instead of replaying the whole upstream lineage per consumer (the report
alone counts six stages — unpersisted, that would recompute the dedup +
decontamination chain six times). At warehouse scale, swap the persist for
a parquet checkpoint per stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from procurement_data_pipeline_spark.llm_ops.curation import (
    corpus_mix,
    decontaminate,
    pack_sequences,
    temperature_weights,
)
from procurement_data_pipeline_spark.llm_ops.dedup import drop_exact_duplicates
from procurement_data_pipeline_spark.llm_ops.sampling import split_train_eval
from procurement_data_pipeline_spark.caching import scoped_persist
from procurement_data_pipeline_spark.operators.expectations import (
    check,
    in_range,
    isin,
    not_null,
)
from procurement_data_pipeline_spark.plans.runner import Pipeline


def build_training_data_pipeline(
    spark: SparkSession,
    documents: DataFrame,
    eval_source: str = "src0",
    known_sources: list[str] | None = None,
    eval_fraction: float = 0.1,
    seq_len: int = 512,
) -> Pipeline:
    """Assemble the curation DAG over ``documents`` (doc_id, text, source,
    n_chars). Run with ``pipe.run()``; the context carries each stage's
    output under its task name, with the final packed training set at
    ``ctx['pack']`` and the per-stage audit at ``ctx['report']``."""
    pipe = Pipeline(name="training_data_curation")

    @pipe.task("gate")
    def gate(ctx):
        expectations = [
            not_null("text"),
            in_range("n_chars", 1, 1_000_000),
        ]
        if known_sources is not None:
            expectations.append(isin("source", known_sources))
        clean, quarantine, summary = check(documents, expectations)
        ctx["gate_quarantine"] = quarantine
        ctx["gate_summary"] = summary
        return scoped_persist(clean)

    @pipe.task("dedup", deps=("gate",))
    def dedup(ctx):
        return scoped_persist(drop_exact_duplicates(ctx["gate"]))

    @pipe.task("decontaminate", deps=("dedup",))
    def decon(ctx):
        # eqNullSafe: a NULL source is NOT the eval source — plain != would
        # evaluate to NULL and silently drop such docs from BOTH sides.
        train = ctx["dedup"].filter(
            ~F.col("source").eqNullSafe(F.lit(eval_source))
        )
        eval_df = ctx["dedup"].filter(
            F.col("source").eqNullSafe(F.lit(eval_source))
        )
        flags = decontaminate(train, eval_df)
        clean_ids = flags.filter(~F.col("contaminated")).select("doc_id")
        return scoped_persist(train.join(clean_ids, "doc_id", "left_semi"))

    @pipe.task("mix", deps=("decontaminate",))
    def mix(ctx):
        d = ctx["decontaminate"]
        return scoped_persist(corpus_mix(d, temperature_weights(d, alpha=0.5)))

    @pipe.task("split", deps=("mix",))
    def split(ctx):
        train, holdout = split_train_eval(ctx["mix"], "doc_id", eval_fraction)
        ctx["holdout"] = holdout
        return scoped_persist(train)

    @pipe.task("pack", deps=("split",))
    def pack(ctx):
        return pack_sequences(ctx["split"], seq_len=seq_len)

    @pipe.task(
        "report",
        deps=("gate", "dedup", "decontaminate", "mix", "split", "pack"),
    )
    def report(ctx):
        rows = []
        for stage in ("gate", "dedup", "decontaminate", "mix", "split"):
            rows.append((stage, ctx[stage].count()))
        rows.append(("holdout", ctx["holdout"].count()))
        rows.append(("pack", ctx["pack"].count()))
        return spark.createDataFrame(rows, "stage string, n_docs long")

    return pipe


__all__ = ["build_training_data_pipeline"]
