"""Declared query: distributed PCA (dominant principal direction) via an
integer-contract power iteration — the third iterative-algorithm oracle in
the repo after k-means and PageRank.

The contract that makes an ITERATIVE linear-algebra routine hash-exact
across engines:

* vectors quantize to integer micros (floor(v·1e6));
* the second-moment (Gram) matrix G[i][j] = Σ q_i·q_j accumulates in
  128-bit integers (HUGEINT / DECIMAL(38,0) — int64 overflows past ~1e5
  rows at dim 64);
* each power step u = G·w is an integer matrix-vector product, and the
  renormalization w' = trunc(|u|·1e6 / max|u|)·sign(u) uses TRUNCATING
  division spelled sign·(abs // m) on both engines (bare floor-division
  would disagree with Spark's `div` on negatives);
* three unrolled iterations — DuckDB replays them as chained CTEs.

Spark plan shape: ONE data-proportional job (the Gram aggregate — a
self-join on vec_id bounded by dim² per row, one shuffle); every
iteration after that runs on the 64×64 matrix and a 64-row vector
(broadcast joins), i.e. the iteration cost is independent of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from procurement_data_pipeline_spark.registry import register
from procurement_data_pipeline_spark.sources.tables import load_table

_N_ITER = 3


def _iter_sql(k: int, prev_w: str) -> str:
    return f"""
u{k} AS (
  SELECT i, SUM(g * w) AS u FROM g JOIN {prev_w} ON {prev_w}.j = g.j GROUP BY i
),
m{k} AS (SELECT MAX(ABS(u)) AS m FROM u{k}),
w{k} AS (
  SELECT i AS j,
         (CASE WHEN u < 0 THEN -1 ELSE 1 END)
           * ((ABS(u) * 1000000) // m) AS w
  FROM u{k} CROSS JOIN m{k}
)"""


_PCA_SQL = (
    """
WITH q AS (
  SELECT vec_id, pos - 1 AS pos,
         CAST(FLOOR(CAST(v AS DOUBLE) * 1000000) AS HUGEINT) AS qv
  FROM (
    SELECT vec_id, unnest(embedding) AS v,
           generate_subscripts(embedding, 1) AS pos
    FROM embeddings
  ) t
),
g AS (
  SELECT a.pos AS i, b.pos AS j, SUM(a.qv * b.qv) AS g
  FROM q a JOIN q b ON a.vec_id = b.vec_id
  GROUP BY 1, 2
),
w0 AS (SELECT DISTINCT pos AS j, CAST(1000000 AS HUGEINT) AS w FROM q),"""
    + ",".join(_iter_sql(k, f"w{k - 1}") for k in range(1, _N_ITER + 1))
    + f"""
SELECT CAST(j AS INTEGER) AS pos,
       CAST(w AS BIGINT) AS weight_micro,
       CAST(w AS DOUBLE) / 1000000.0 AS weight
FROM w{_N_ITER}
"""
)


@register(
    "emb_pca_power",
    oracle=_PCA_SQL,
    tags=("similarity", "llm", "pca", "iterative"),
)
def q_emb_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant principal direction of the embedding second-moment matrix
    by 3 power-iteration sweeps under the integer contract (module
    docstring). The Gram matrix is persisted once; each sweep is a
    64-row broadcast join."""
    from procurement_data_pipeline_spark.caching import scoped_persist

    emb = load_table(spark, sf_dir, "embeddings")
    # The Gram matrix is built as VECTORIZED PARTIALS: each Arrow batch
    # computes its own dim×dim QᵀQ with one int64 numpy matmul inside
    # mapInPandas, and only the dim² partial rows (4096 per batch) cross
    # the wire into the decimal-sum merge — the dim²-per-vector blow-up
    # never materializes row-wise. This is the "built-ins can't express
    # it efficiently" case the Pandas-UDF tier exists for: the explode or
    # self-join formulations shuffle n·dim² rows; this shuffles
    # batches·dim². Exactness: per-batch int64 sums are exact (chunks
    # capped at 20k rows × product ≤ ~1e13 ≈ 2e17 < 2⁶³; the quantized
    # magnitude is asserted, not assumed), and the cross-batch merge
    # widens to DECIMAL(38,0) where real-scale overflow lives.
    import numpy as np
    import pandas as pd

    q = emb.select(
        F.transform(
            F.col("embedding"),
            lambda v: F.floor(v.cast("double") * 1000000).cast("long"),
        ).alias("q")
    )

    def gram_partials(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            full = np.array(pdf["q"].tolist(), dtype=np.int64)
            # Adaptive chunking keeps every per-entry partial sum exact:
            # chunk_rows × max|q|² must stay below 2⁶² (headroom under
            # int64). Computed from the OBSERVED magnitude, not assumed.
            maxq = int(np.abs(full).max(initial=1)) or 1
            chunk = max(1, min(20_000, (2**62) // (maxq * maxq)))
            if maxq * maxq >= 2**62:
                raise ValueError(
                    "quantized magnitude exceeds the int64-exact bound"
                )
            for start in range(0, len(full), chunk):
                mat = full[start : start + chunk]
                gram = mat.T @ mat
                ii, jj = np.indices(gram.shape)
                yield pd.DataFrame(
                    {
                        "i": ii.ravel().astype(np.int32),
                        "j": jj.ravel().astype(np.int32),
                        "p": gram.ravel(),
                    }
                )

    # the Gram agg is the only data-proportional job; its OUTPUT is dim²
    # rows (4096), corpus-independent — coalesce(1) so every iteration
    # below runs as single-partition 64-row arithmetic instead of paying
    # 32-task shuffle overhead per step (the right shape at ANY corpus
    # size: iteration cost is a function of dim, not rows)
    g = scoped_persist(
        q.mapInPandas(gram_partials, "i int, j int, p long")
        .groupBy("i", "j")
        .agg(F.sum(F.col("p").cast("decimal(38,0)")).alias("g"))
        .coalesce(1)
    )
    w = g.select("j").distinct().select(
        "j", F.lit(1000000).cast("decimal(38,0)").alias("w")
    )
    for _ in range(_N_ITER):
        # u feeds BOTH m's aggregate and the renormalized w — persist it
        # or the unpersisted subtree is evaluated twice per iteration and
        # the duplication COMPOUNDS through the unrolled lineage
        # (2^k re-evaluations of the first sweep by iteration k; measured
        # at sf0.1 round 7: warm 6.0 s → 0.8 s, cold 16.5 s → 9.7 s)
        u = scoped_persist(
            g.join(F.broadcast(w), "j")
            .groupBy("i")
            .agg(F.sum((F.col("g") * F.col("w")).cast("decimal(38,0)")).alias("u"))
        )
        m = u.agg(F.max(F.abs(F.col("u"))).alias("m"))
        w = (
            u.crossJoin(F.broadcast(m))
            .select(
                F.col("i").alias("j"),
                (
                    F.when(F.col("u") < 0, -1).otherwise(1).cast("decimal(38,0)")
                    * F.expr(
                        "CAST((ABS(u) * 1000000) div m AS DECIMAL(38,0))"
                    )
                ).alias("w"),
            )
        )
    return w.select(
        F.col("j").cast("int").alias("pos"),
        F.col("w").cast("long").alias("weight_micro"),
        (F.col("w").cast("double") / 1000000.0).alias("weight"),
    )
