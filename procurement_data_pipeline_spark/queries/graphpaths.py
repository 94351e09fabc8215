"""Declared query: bounded breadth-first search over the co-purchase graph.

part_copurchase_bfs — shortest-hop distance (≤ 3 hops) from the
highest-volume part to every part reachable through the co-purchase
graph (two parts are adjacent when some order contains both). The
"customers who bought X also bought…" expansion, and the repo's first
graded BOUNDED-ITERATION BFS: the Spark side unrolls three frontier
join+min-hop rounds (the Pregel pattern with a compile-time hop budget),
while the DuckDB oracle runs a genuine ``WITH RECURSIVE`` CTE — the
iterative DataFrame form is hash-checked against the declarative
recursive-SQL definition, the same evidence pattern the connected-
components oracle uses (queries/curation.py cluster_safe_split).

Exactness: everything is integer (part keys, hop counts, MIN) — no
float anywhere.

Scale shape: building the edge set is the dominant cost — a self-join of
lineitem on orderkey (orders hold ≤ 7 lines in TPC-H-shaped data, so the
blowup is bounded per order) followed by one distinct; the same shape
part_affinity_rules ships. Each BFS round then shuffles only the
CURRENT frontier joined to edges on the part key — frontier size is
bounded by |V|, independent of fact volume, and the hop budget bounds
the number of rounds. Edges are scoped-persisted across the three
rounds so the fact-side join runs once, and each round's distance
relation is persisted so lineage stays linear (no exponential replay).

Registers past the graded first-50 prefix (GRADE_OVERFLOW in
__spark_entry__.py); tools/check_oracle.py hash-checks it at sf0.01.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from procurement_data_pipeline_spark.caching import scoped_persist
from procurement_data_pipeline_spark.registry import register
from procurement_data_pipeline_spark.sources.tables import load_table

_MAX_HOPS = 3


@register(
    "part_copurchase_bfs",
    oracle=f"""
WITH RECURSIVE
edges AS (
  SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
),
seed AS (
  SELECT l_partkey AS part FROM lineitem
  GROUP BY 1
  ORDER BY SUM(CAST(l_quantity AS BIGINT)) DESC, l_partkey
  LIMIT 1
),
reach(part, hop) AS (
  SELECT part, 0 FROM seed
  UNION
  SELECT e.pb, r.hop + 1
  FROM reach r JOIN edges e ON e.pa = r.part
  WHERE r.hop < {_MAX_HOPS}
)
SELECT part, CAST(MIN(hop) AS INTEGER) AS hops
FROM reach GROUP BY part
""",
    tags=("part", "graph", "bfs"),
)
def q_part_copurchase_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    a = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa")
    )
    b = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb")
    )
    edges = scoped_persist(
        a.join(b, "ok").filter(F.col("pa") != F.col("pb")).select("pa", "pb").distinct()
    )
    seed = (
        li.groupBy(F.col("l_partkey").alias("part"))
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("q"))
        .orderBy(F.desc("q"), "part")
        .limit(1)
        .select("part")
    )
    dist = seed.select("part", F.lit(0).alias("hops"))
    for h in range(1, _MAX_HOPS + 1):
        frontier = dist.filter(F.col("hops") == h - 1)
        nxt = frontier.join(edges, frontier["part"] == edges["pa"]).select(
            F.col("pb").alias("part"), F.lit(h).alias("hops")
        )
        dist = scoped_persist(
            dist.unionByName(nxt).groupBy("part").agg(F.min("hops").alias("hops"))
        )
    return dist.select("part", F.col("hops").cast("int").alias("hops"))
