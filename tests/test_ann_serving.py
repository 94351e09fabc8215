"""End-to-end test for the ANN serving DAG: build → persist → append →
evaluate → report, with a recall floor and stage-count reconciliation."""

from __future__ import annotations

from pyspark.sql import functions as F

from procurement_data_pipeline_spark.plans.ann_serving import (
    ann_recall_at_k,
    build_ann_serving_pipeline,
)
from procurement_data_pipeline_spark.sources.tables import load_table


def test_ann_serving_pipeline_end_to_end(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings")
    seed = emb.where(F.col("vec_id") % 2 == 0)
    fresh = emb.where(F.col("vec_id") % 2 == 1)
    probes = emb.where(F.col("vec_id") < 8)
    pipe = build_ann_serving_pipeline(
        spark,
        seed,
        fresh,
        probes,
        str(tmp_path / "idx"),
        k=10,
        nprobe=16,
    )
    ctx: dict = {}
    results = pipe.run(ctx)
    assert all(r.status == "success" for r in results.values()), results
    assert ctx["build"] == seed.count()
    assert ctx["append"] == fresh.count()
    # Recall of the served (frozen-codebook, appended) index against the
    # exact brute force over the FULL corpus: PQ at m=8/k=64 on 64-dim
    # vectors is lossy, but must stay well above chance.
    assert 0.3 <= ctx["recall"] <= 1.0, ctx["recall"]
    report = {r.stage: r.value for r in ctx["report"].collect()}
    assert report["recall_at_k"] == ctx["recall"]
    assert report["build"] + report["append"] == emb.count()


def test_ann_recall_at_k_exact_on_identical_inputs(spark):
    rows = [(q, v, r) for q in range(3) for r, v in enumerate(range(10, 15), 1)]
    df = spark.createDataFrame(rows, "query_id long, vec_id long, rank int")
    assert ann_recall_at_k(df, df, k=5) == 1.0
    # Disjoint served set → zero recall.
    other = df.withColumn("vec_id", F.col("vec_id") + 100)
    assert ann_recall_at_k(other, df, k=5) == 0.0
