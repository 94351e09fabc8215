"""End-to-end training-data curation DAG: every stage's contract holds on
the real documents table, and the report explains every document lost."""

from __future__ import annotations

from pyspark.sql import functions as F

from procurement_data_pipeline_spark.llm_ops.text import fingerprint
from procurement_data_pipeline_spark.plans.training_data import (
    build_training_data_pipeline,
)
from procurement_data_pipeline_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_training_data_pipeline_end_to_end(spark):
    docs = load_table(spark, SF_DIR, "documents")
    pipe = build_training_data_pipeline(spark, docs)
    ctx: dict = {}
    results = pipe.run(ctx)
    assert all(r.status == "success" for r in results.values()), results

    counts = {r["stage"]: r["n_docs"] for r in ctx["report"].collect()}
    # Monotone shrinkage with attributable deltas.
    assert counts["gate"] >= counts["dedup"] >= counts["decontaminate"]
    assert counts["decontaminate"] >= counts["mix"]
    assert counts["mix"] == counts["split"] + counts["holdout"]
    assert counts["pack"] == counts["split"]  # packing is one row per doc

    # Stage contracts on the actual outputs:
    # 1. no exact duplicates survive
    dedup = ctx["dedup"]
    assert (
        dedup.select(fingerprint("text")).distinct().count() == dedup.count()
    )
    # 2. nothing from the eval source remains after decontamination
    assert ctx["decontaminate"].filter(F.col("source") == "src0").count() == 0
    # 3. train/holdout are disjoint and exhaustive over the mixed corpus
    train_ids = {r["doc_id"] for r in ctx["split"].select("doc_id").collect()}
    hold_ids = {r["doc_id"] for r in ctx["holdout"].select("doc_id").collect()}
    mix_ids = {r["doc_id"] for r in ctx["mix"].select("doc_id").collect()}
    assert train_ids.isdisjoint(hold_ids)
    assert train_ids | hold_ids == mix_ids
    # 4. packing layout is well-formed: every start offset inside [0, 512)
    #    and every document carries a positive token count
    pack = ctx["pack"]
    assert pack.filter(
        (F.col("seq_offset") < 0) | (F.col("seq_offset") >= 512)
    ).count() == 0
    assert pack.filter(F.col("tok_count") <= 0).count() == 0
    # 5. the quality gate quarantined nothing silently
    assert "gate_summary" in ctx and ctx["gate_summary"].count() >= 2


def test_training_data_pipeline_gate_quarantines_bad_rows(spark):
    docs = spark.createDataFrame(
        [
            (1, "good text here", "srcA", 14),
            (2, None, "srcA", 0),  # null text -> quarantined
            (3, "also fine", "srcB", 9),
        ],
        "doc_id long, text string, source string, n_chars long",
    )
    pipe = build_training_data_pipeline(
        spark, docs, eval_source="srcB", known_sources=["srcA", "srcB"]
    )
    ctx: dict = {}
    results = pipe.run(ctx)
    assert all(r.status == "success" for r in results.values()), results
    assert {r["doc_id"] for r in ctx["gate_quarantine"].collect()} == {2}
    gated = {r["doc_id"] for r in ctx["gate"].collect()}
    assert gated == {1, 3}
