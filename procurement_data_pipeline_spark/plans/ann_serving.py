"""ANN index-serving DAG: build → persist → incremental append → recall
evaluation — the lifecycle a production vector-search deployment runs.

Stages (plans/runner.Pipeline, same D1-D4 semantics as the procurement
and training-data DAGs):

* build    — train coarse centroids + PQ codebooks on the seed corpus and
             encode it (one distributed pass; bounded driver-side samples)
* persist  — write the cell-partitioned codes + metadata to the index path
* append   — encode the day's new vectors under the FROZEN codebooks and
             append (O(new) — llm_ops/pq.append_to_ivf_pq_index)
* evaluate — measure recall@k of the SERVED index against exact
             brute-force cosine over a probe sample; the go/no-go number
             that decides whether drift has eaten the index and a rebuild
             (re-running `build`) is due
* report   — one row per stage (counts + recall), the audit a scheduler
             records per run

The recall evaluation is the operational core: appending under frozen
codebooks trades freshness for drift, and this DAG makes the trade
measurable instead of silent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from procurement_data_pipeline_spark.plans.runner import Pipeline


def ann_recall_at_k(
    served: DataFrame, truth: DataFrame, k: int
) -> float:
    """Fraction of exact top-k neighbors the served index returned.

    Both inputs carry (query_id, vec_id, rank ≤ k); the join is on the
    pair — one tiny shuffle over probe×k rows."""
    s = served.where(F.col("rank") <= k).select("query_id", "vec_id")
    t = truth.where(F.col("rank") <= k).select("query_id", "vec_id")
    hits = t.join(s, ["query_id", "vec_id"]).count()
    total = t.count()
    return hits / total if total else 0.0


def build_ann_serving_pipeline(
    spark: SparkSession,
    seed_corpus: DataFrame,
    new_vectors: DataFrame,
    probes: DataFrame,
    index_path: str,
    k: int = 10,
    nlist: int = 16,
    m: int = 8,
    codebook_k: int = 64,
    nprobe: int = 8,
) -> Pipeline:
    from procurement_data_pipeline_spark.llm_ops.pq import (
        append_to_ivf_pq_index,
        build_ivf_pq_index,
        ivf_pq_search,
        load_ivf_pq_index,
        save_ivf_pq_index,
    )
    from procurement_data_pipeline_spark.llm_ops.similarity import knn_bruteforce

    pipe = Pipeline("ann_serving")

    @pipe.task("build")
    def build(ctx):
        index, encoded = build_ivf_pq_index(
            seed_corpus, nlist=nlist, m=m, codebook_k=codebook_k
        )
        ctx["index"], ctx["encoded"] = index, encoded
        return seed_corpus.count()

    @pipe.task("persist", deps=("build",))
    def persist(ctx):
        save_ivf_pq_index(ctx["index"], ctx["encoded"], index_path)
        return index_path

    @pipe.task("append", deps=("persist",), retries=1)
    def append(ctx):
        return append_to_ivf_pq_index(spark, index_path, new_vectors)

    @pipe.task("evaluate", deps=("append",))
    def evaluate(ctx):
        index, encoded = load_ivf_pq_index(spark, index_path)
        served = ivf_pq_search(index, encoded, probes, k=k, nprobe=nprobe)
        full = seed_corpus.unionByName(new_vectors)
        truth = knn_bruteforce(full, probes, k=k)
        ctx["recall"] = ann_recall_at_k(served, truth, k)
        return ctx["recall"]

    @pipe.task("report", deps=("evaluate",))
    def report(ctx):
        rows = [
            ("build", float(ctx["build"])),
            ("append", float(ctx["append"])),
            ("recall_at_k", float(ctx["recall"])),
        ]
        return spark.createDataFrame(rows, "stage string, value double")

    return pipe
