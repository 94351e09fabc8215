"""Distributed link analysis (PageRank) with a portable integer contract.

Spark has no built-in graph operators; GraphX is RDD/Scala-side and GraphFrames
is an external package. Weighted PageRank decomposes into exactly the
primitives this engine is built on: an edge-list join, a grouped sum, and a
rank-update projection — one shuffle per iteration, which is also how
Pregel-style systems schedule it (public literature: Page et al. 1999,
Malewicz et al. 2010).

Arithmetic contract (what makes the iterative algorithm ORACLE-CHECKABLE,
same device as llm_ops/similarity.kmeans): ranks live in integer MICROS
(initial mass 1,000,000 per node) and every update is integer multiply /
integer floor-divide —

    contribution(u->v) = (rank_u * w_uv) div out_w_u
    rank'_v            = (15·1e6 + 85·incoming_v) div 100      (d = 0.85)

No floating point anywhere, so DuckDB replays the full iteration chain
bit-exactly with unrolled CTEs. All quantities stay positive, making Spark's
truncating ``div`` and DuckDB's flooring ``//`` agree. Overflow headroom:
rank_u is bounded by total graph mass (n_nodes·1e6); rank_u · w_uv must stay
under 2^63 — at 10^9 nodes and 10^4 max edge weight that is 10^19 ≈ the
int64 edge, so trim edge weights (cap or rescale) beyond that regime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from procurement_data_pipeline_spark.caching import scoped_persist

#: Damping in percent (d = 0.85) and the per-node initial mass in micros.
DAMPING_PCT = 85
INIT_MICROS = 1_000_000


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
) -> DataFrame:
    """Weighted PageRank over a directed edge list; returns (node, rank_micros).

    The caller supplies edges in BOTH directions for an undirected graph.
    Every node is assumed to have at least one out-edge (true by
    construction for undirected inputs); rank mass is conserved up to the
    deliberate floor-division shavings.

    Plan per iteration: edges ⋈ ranks (equi-join on src, same partitioning
    each round) -> groupBy(dst) sum -> left join back onto the node set.
    The edge relation and per-node out-weights are computed once and
    persisted; iteration count is fixed and small (the contract is "k
    Jacobi sweeps", not convergence detection — the 100 TB form runs each
    sweep as one shuffle stage).
    """
    e = scoped_persist(
        edges.select(
            F.col(src).alias("_src"), F.col(dst).alias("_dst"), F.col(weight).alias("_w")
        )
    )
    outw = e.groupBy("_src").agg(F.sum("_w").alias("_out_w"))
    nodes = scoped_persist(e.select(F.col("_src").alias("node")).distinct())
    ranks = nodes.withColumn("rank_micros", F.lit(INIT_MICROS).cast("long"))
    weighted = e.join(outw, "_src")
    for _ in range(iterations):
        contrib = (
            weighted.join(ranks, weighted["_src"] == ranks["node"])
            .select(
                F.col("_dst").alias("node"),
                F.expr("(rank_micros * _w) div _out_w").alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").alias("_incoming"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            F.expr(
                f"({100 - DAMPING_PCT} * {INIT_MICROS}L"
                f" + {DAMPING_PCT} * coalesce(_incoming, 0L)) div 100"
            )
            .cast("long")
            .alias("rank_micros"),
        )
    return ranks
