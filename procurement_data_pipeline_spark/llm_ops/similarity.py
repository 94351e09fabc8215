"""Similarity search over embedding columns (array<float>).

Two tiers:
* brute-force cosine top-k — exact baseline: broadcast the (small) query
  set against the corpus, dot products via JVM array lambdas
  (zip_with/aggregate — no Python in the loop), top-k via window rank.
* random-hyperplane LSH ANN — the scale path: 16-bit signatures bucket the
  corpus; candidates = bucket collisions (multi-probe over exact signature),
  exact rerank of candidates only.

The oracle-facing variant quantizes vector components to 1e-6 before the
dot product so scores are exact integer math (order-insensitive and
engine-portable); the unquantized functions are the production forms.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SCALE = 1_000_000


def _micro(col: Column) -> Column:
    """array<float> → array<bigint> of FLOOR(x*1e6) (exact quantization)."""
    return F.transform(col, lambda x: F.floor(x.cast("double") * SCALE).cast("long"))


def quantized_dot(a: Column, b: Column) -> Column:
    """Exact integer dot product of two quantized vectors (bigint)."""
    return F.aggregate(
        F.zip_with(_micro(a), _micro(b), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def quantized_norm_sq(a: Column) -> Column:
    return F.aggregate(
        F.transform(_micro(a), lambda x: x * x),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def dot(a: Column, b: Column) -> Column:
    """Production (float) dot product — JVM lambda, no UDF."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (
        F.sqrt(dot(a, a)) * F.sqrt(dot(b, b))
    )


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantized: bool = True,
) -> DataFrame:
    """Exact cosine top-k for each query vector.

    Plan shape: broadcast-nested-loop of corpus × (tiny) queries — the right
    shape when |queries| is small; for large query sets use lsh_ann. Output:
    (query_id, vec_id, score) with k rows per query, ties broken by vec_id.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
    )
    joined = corpus.select(id_col, vec_col).join(F.broadcast(q)).filter(
        F.col(id_col) != F.col("query_id")
    )
    if quantized:
        score = quantized_dot(F.col(vec_col), F.col("_qvec")).cast("double") / (
            F.sqrt(quantized_norm_sq(F.col(vec_col)).cast("double"))
            * F.sqrt(quantized_norm_sq(F.col("_qvec")).cast("double"))
        )
    else:
        score = cosine(F.col(vec_col), F.col("_qvec"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        joined.withColumn("score", score)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "score", F.col("rank").cast("int").alias("rank"))
    )


def label_centroids(
    embeddings: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Element-wise mean vector per label via posexplode + groupBy.

    Sums run over exact quantized integers, so the result is deterministic
    under any partitioning/aggregation order (float sums are not). Output:
    (label, pos, centroid) — flat form; collect to array with
    ``sort_array(collect_list(struct(pos, centroid)))`` when needed.
    """
    exploded = embeddings.select(
        F.col(label_col).alias("label"),
        F.posexplode(_micro(F.col(vec_col))).alias("pos", "v"),
    )
    return exploded.groupBy("label", "pos").agg(
        (
            F.sum("v").cast("double") / F.count(F.lit(1)) / F.lit(float(SCALE))
        ).alias("centroid")
    )


def _hyperplanes(dim: int, nbits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (Box-Muller over an LCG) —
    reproducible across runs without numpy state."""
    import math

    state = seed
    planes: list[list[float]] = []

    def _next() -> float:
        nonlocal state
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        return (state >> 11) / float(1 << 52)  # uniform [0,1)

    for _ in range(nbits):
        plane = []
        for _ in range((dim + 1) // 2):
            u1, u2 = max(_next(), 1e-12), _next()
            r = math.sqrt(-2.0 * math.log(u1))
            plane.append(r * math.cos(2 * math.pi * u2))
            plane.append(r * math.sin(2 * math.pi * u2))
        planes.append(plane[:dim])
    return planes


def _signatures_pandas_udf(per_table: list[list[list[float]]]):
    """Arrow-vectorized signature computation: ALL tables' hyperplane dots
    collapse into one (batch × dim) @ (dim × L·nbits) numpy matmul per Arrow
    batch — the pattern for work the JVM expression engine can't vectorize.
    Returns a pandas_udf: array<float> → array<bigint> of L signatures."""
    from pyspark.sql.functions import pandas_udf

    tables = len(per_table)
    nbits = len(per_table[0])
    # dim × (tables·nbits) plane matrix, column-major by (table, bit)
    mat = np.array([plane for table in per_table for plane in table], dtype=np.float64).T
    weights = (1 << np.arange(nbits, dtype=np.int64))

    @pandas_udf("array<bigint>")
    def sigs(emb: pd.Series) -> pd.Series:
        x = np.vstack(emb.to_numpy()).astype(np.float64)  # batch × dim
        bits = (x @ mat) > 0  # batch × tables·nbits
        sig = (bits.reshape(len(x), tables, nbits) * weights).sum(axis=2)
        return pd.Series(list(sig.astype(np.int64)))

    return sigs


def lsh_signature(vec_col: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane signature: bit i = sign(dot(plane_i, v))."""
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    vec_col,
                    F.array(*[F.lit(p) for p in plane]),
                    lambda x, y: x.cast("double") * y,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            > 0,
            F.lit(1 << i).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        for i, plane in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_ann(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    nbits: int = 6,
    tables: int = 32,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: multi-table hyperplane LSH.

    L independent signature tables; a corpus vector is a candidate for a
    query if their signatures collide in ANY table (the standard
    recall-amplification construction: per-neighbor recall
    1-(1-p^nbits)^tables for per-bit agreement p = 1-θ/π). Candidates are
    exact-reranked with full-precision cosine.

    Plan shape: corpus side explodes to L rows (one per table) and joins the
    broadcast query signatures on (table, sig) — shuffle-free when queries
    are small; candidate volume, not corpus², bounds the rerank.
    """
    per_table = [
        _hyperplanes(dim, nbits, seed + 1000 * t) for t in range(tables)
    ]
    sig_udf = _signatures_pandas_udf(per_table)
    c = corpus.select(id_col, vec_col).select(
        id_col, vec_col, F.posexplode(sig_udf(F.col(vec_col))).alias("_table", "_sig")
    )
    q = (
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec"))
        .select(
            "query_id",
            "_qvec",
            F.posexplode(sig_udf(F.col("_qvec"))).alias("_table", "_sig"),
        )
    )
    cand = (
        c.join(F.broadcast(q), ["_table", "_sig"])
        .filter(F.col(id_col) != F.col("query_id"))
        .select("query_id", "_qvec", id_col, vec_col)
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        cand.withColumn("score", cosine(F.col(vec_col), F.col("_qvec")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "score", F.col("rank").cast("int").alias("rank"))
    )
