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

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SCALE = 1_000_000

# float64 accumulates integer dot products EXACTLY while every partial sum
# stays below 2^53 (all integers ≤ 2^53 are representable and integer
# add/multiply on them is closed) — the guard bound for using BLAS matmul
# on quantized vectors instead of the (slower) int64 matmul path.
_GRAM_EXACT_BOUND = float(2**53)


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
    if quantized:
        return _knn_bruteforce_gram(corpus, queries, k, id_col, vec_col)
    # Norms are precomputed per row BEFORE the pair join: each corpus norm is
    # evaluated once instead of once per query (and vice versa) — the same
    # IEEE sqrt(dot) either way, so scores are bit-identical to the oracle.
    norm = lambda c: F.sqrt(dot(c, c))  # noqa: E731
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
        norm(F.col(vec_col)).alias("_qn"),
    )
    joined = (
        corpus.select(id_col, vec_col, norm(F.col(vec_col)).alias("_cn"))
        .join(F.broadcast(q))
        .filter(F.col(id_col) != F.col("query_id"))
    )
    score = dot(F.col(vec_col), F.col("_qvec")) / (F.col("_cn") * F.col("_qn"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        joined.withColumn("score", score)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "score", F.col("rank").cast("int").alias("rank"))
    )


def _knn_bruteforce_gram(
    corpus: DataFrame, queries: DataFrame, k: int, id_col: str, vec_col: str
) -> DataFrame:
    """Quantized exact top-k as one integer Gram matmul per Arrow batch.

    Replaces the broadcast-nested-loop + per-pair zip_with/aggregate lambda
    (d interpreted steps per candidate pair) with ``C @ Qᵀ`` over the
    micro-quantized matrices — the same rewrite the SemDeDup pair scan got
    (guide §4.2 batchwise native code). Scores are the IDENTICAL doubles:
    FLOOR(x·1e6) int64 components, exact integer dots (float64 BLAS while
    every intermediate stays under 2^53 — see ``_GRAM_EXACT_BOUND`` — int64
    matmul beyond), then the same cast-to-double division by the norm
    product, so oracle hashes are unchanged.

    The query set is bounded by contract (the docstring's "small query
    set"; large sets route through lsh_ann), so collecting it once is the
    same boundedness trade the broadcast made — precedent: PQ codebooks.
    Each batch emits only its own exact top-k per query under Spark's
    (score DESC NULLS/NaN-first, id ASC) total order, so the final global
    window ranks ≤ batches·k candidates per query instead of the whole
    corpus — the shuffle carries survivors, not pairs (guide §2.3)."""
    qrows = queries.select(F.col(id_col), F.col(vec_col)).collect()
    spark = corpus.sparkSession
    out_schema = f"query_id long, {id_col} long, score double"
    if not qrows:
        empty_ranked = spark.createDataFrame(
            [], out_schema + ", rank int"
        )
        return empty_ranked.select("query_id", id_col, "score", "rank")
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    Q = np.floor(
        np.array([np.asarray(r[1], dtype=np.float64) for r in qrows]) * SCALE
    )
    d = Q.shape[1]
    kk = int(k)

    def _score_batches(batches):
        for pdf in batches:
            m = len(pdf)
            if m == 0:
                continue
            ids = pdf[id_col].to_numpy()
            C = np.floor(
                np.array(
                    [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
                )
                * SCALE
            )
            amax = max(
                float(np.abs(C).max()) if m else 0.0,
                float(np.abs(Q).max()) if len(Q) else 0.0,
            )
            exact64 = d * amax * amax < _GRAM_EXACT_BOUND
            Cm = C if exact64 else C.astype(np.int64)
            Qm = Q if exact64 else Q.astype(np.int64)
            cn = np.sqrt(np.asarray((Cm * Cm).sum(axis=1), dtype=np.float64))
            qn = np.sqrt(np.asarray((Qm * Qm).sum(axis=1), dtype=np.float64))
            out_q: list[np.ndarray] = []
            out_c: list[np.ndarray] = []
            out_s: list[np.ndarray] = []
            for s in range(0, m, 4096):
                e = min(s + 4096, m)
                G = Cm[s:e] @ Qm.T
                score = np.asarray(G, dtype=np.float64) / (
                    cn[s:e, None] * qn[None, :]
                )
                bids = ids[s:e]
                for j in range(len(qids)):
                    col = score[:, j]
                    keep = bids != qids[j]
                    cand_ids, cand_s = bids[keep], col[keep]
                    if not len(cand_ids):
                        continue
                    # Spark's (score DESC, id ASC) puts NaN first (NaN is
                    # the largest double in Spark's ordering) — mirror it
                    # so batch pruning never drops a row the global window
                    # would rank inside the top k.
                    key = np.where(np.isnan(cand_s), -np.inf, -cand_s)
                    order = np.lexsort((cand_ids, key))[:kk]
                    out_q.append(np.full(len(order), qids[j], dtype=np.int64))
                    out_c.append(cand_ids[order].astype(np.int64))
                    out_s.append(cand_s[order])
            if out_q:
                yield pd.DataFrame(
                    {
                        "query_id": np.concatenate(out_q),
                        id_col: np.concatenate(out_c),
                        "score": np.concatenate(out_s),
                    }
                )

    scored = corpus.select(id_col, vec_col).mapInPandas(
        _score_batches, out_schema
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
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


def _seq_dot(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """Row-wise dot(A[i], B[i]) with the JVM fold's EXACT IEEE order.

    ``dot()``'s interpreted lambda folds acc = acc + a[j]*b[j] for j in
    index order, each step one correctly-rounded multiply and add; the
    per-dimension numpy loop performs the identical operation sequence
    vectorized ACROSS rows, so every row's result is bit-identical to the
    JVM's (verified on 1,999 real pairs in round 11). ``np.dot`` would NOT
    be: BLAS reassociates the reduction."""
    acc = np.zeros(len(A), dtype=np.float64)
    for j in range(A.shape[1]):
        acc = acc + A[:, j] * B[:, j]
    return acc


def _rank_topk(scored: DataFrame, k: int, id_col: str) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", id_col, "score", F.col("rank").cast("int").alias("rank")
        )
    )


def _batch_topk_emit(
    qids: np.ndarray,
    ids: np.ndarray,
    score: np.ndarray,
    cand_mask: np.ndarray,
    kk: int,
    id_col: str,
):
    """Per-batch exact top-k per query under Spark's (score DESC — NaN
    greatest — id ASC) total order over the candidate-masked score matrix
    (rows × queries). Emitting only each batch's top-k means the global
    rank window shuffles ≤ batches·k survivors per query (guide §2.3);
    the batch winner set always contains the global winners, so the final
    window output is unchanged."""
    out_q: list[np.ndarray] = []
    out_c: list[np.ndarray] = []
    out_s: list[np.ndarray] = []
    for j in range(len(qids)):
        keep = cand_mask[:, j] & (ids != qids[j])
        if not keep.any():
            continue
        cand_ids, cand_s = ids[keep], score[keep, j]
        key = np.where(np.isnan(cand_s), -np.inf, -cand_s)
        order = np.lexsort((cand_ids, key))[:kk]
        out_q.append(np.full(len(order), qids[j], dtype=np.int64))
        out_c.append(cand_ids[order].astype(np.int64))
        out_s.append(cand_s[order])
    if not out_q:
        return None
    return pd.DataFrame(
        {
            "query_id": np.concatenate(out_q),
            id_col: np.concatenate(out_c),
            "score": np.concatenate(out_s),
        }
    )


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

    Shape (guide §4.2, the knn_bruteforce rewrite applied here): the
    bounded query set is collected once (same contract the previous
    broadcast made), its signatures computed with the IDENTICAL numpy
    expression the corpus UDF uses, and ONE ``mapInPandas`` stage fuses
    corpus signatures + any-table collision detection + the exact cosine
    rerank — replacing two ArrowEvalPython stages, a 32-way posexplode of
    the corpus, the broadcast collision join, the per-pair interpreted
    ``zip_with``/``aggregate`` cosine, and the dedup groupBy. Scores are
    bit-identical (sequential-order fold, see ``_seq_dot``); each pair is
    scored once, so no min() dedup is needed; per-batch top-k emission
    bounds the final window's input by batches·k per query.
    """
    per_table = [
        _hyperplanes(dim, nbits, seed + 1000 * t) for t in range(tables)
    ]
    n_tables = len(per_table)
    # dim × (tables·nbits), column-major by (table, bit) — the EXACT matrix
    # (same construction) _signatures_pandas_udf builds, so signatures of
    # corpus batches here and of query rows below match the UDF path.
    mat = np.array(
        [plane for table in per_table for plane in table], dtype=np.float64
    ).T
    weights = 1 << np.arange(nbits, dtype=np.int64)

    def _sigs(X: np.ndarray) -> np.ndarray:
        bits = (X @ mat) > 0
        return (bits.reshape(len(X), n_tables, nbits) * weights).sum(axis=2)

    spark = corpus.sparkSession
    out_schema = f"query_id long, {id_col} long, score double"
    qrows = queries.select(F.col(id_col), F.col(vec_col)).collect()
    if not qrows:
        return spark.createDataFrame([], out_schema + ", rank int")
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    Q = np.array([np.asarray(r[1], dtype=np.float64) for r in qrows])
    qsig = _sigs(Q)  # nq × tables
    qn = np.sqrt(_seq_dot(Q, Q))
    kk = int(k)

    def _score_batches(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            C = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            csig = _sigs(C)  # m × tables
            # any-table collision: (m × nq) bool
            coll = (csig[:, None, :] == qsig[None, :, :]).any(axis=2)
            if not coll.any():
                continue
            cn = np.sqrt(_seq_dot(C, C))
            # score only colliding pairs, row-major through the query loop
            score = np.full((len(C), len(qids)), np.nan)
            for j in range(len(qids)):
                rows = coll[:, j]
                if rows.any():
                    score[rows, j] = _seq_dot(
                        C[rows], np.broadcast_to(Q[j], C[rows].shape)
                    ) / (cn[rows] * qn[j])
            out = _batch_topk_emit(qids, ids, score, coll, kk, id_col)
            if out is not None:
                yield out

    scored = corpus.select(id_col, vec_col).mapInPandas(
        _score_batches, out_schema
    )
    return _rank_topk(scored, k, id_col)


def cosine_neardup_pairs(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs (id_a < id_b, cos ≥ θ).

    All-pairs baseline: norms are computed once per vector, then the
    self-join scores each candidate pair with the exact quantized dot
    product. O(n²) by construction — correct at any scale but only *sized*
    for corpora that fit a nested-loop join; the 100TB path is
    :func:`cosine_neardup_lsh`, which blocks candidates by hyperplane
    signature first and exact-verifies only collisions.
    """
    base = embeddings.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        F.sqrt(
            quantized_norm_sq(F.col(vec_col)).cast("double")
        ).alias("_nrm"),
    )
    a = base.select(
        F.col("_id").alias("vec_a"), F.col("_v").alias("_va"), F.col("_nrm").alias("_na")
    )
    b = base.select(
        F.col("_id").alias("vec_b"), F.col("_v").alias("_vb"), F.col("_nrm").alias("_nb")
    )
    score = quantized_dot(F.col("_va"), F.col("_vb")).cast("double") / (
        F.col("_na") * F.col("_nb")
    )
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("cosine", score)
        .filter(F.col("cosine") >= F.lit(threshold))
        .select("vec_a", "vec_b", "cosine")
    )


def cosine_neardup_lsh(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    nbits: int = 6,
    tables: int = 32,
    seed: int = 42,
) -> DataFrame:
    """Approximate near-dup pairs: hyperplane-LSH self-join blocking.

    Candidate pairs = signature collisions in any of L tables (per-pair
    recall 1-(1-p^nbits)^L, p = 1-θ_angle/π); each candidate is
    exact-verified with full-precision cosine, so there are no false
    positives — only (bounded-probability) misses. The self-join shuffles
    on (table, signature): bucket sizes, not corpus², bound the work.
    """
    per_table = [_hyperplanes(dim, nbits, seed + 1000 * t) for t in range(tables)]
    sig_udf = _signatures_pandas_udf(per_table)
    sigs = embeddings.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        F.posexplode(sig_udf(F.col(vec_col))).alias("_table", "_sig"),
    )
    left = sigs.select(
        "_table", "_sig", F.col("_id").alias("vec_a"), F.col("_v").alias("_va")
    )
    right = sigs.select(
        "_table", "_sig", F.col("_id").alias("vec_b"), F.col("_v").alias("_vb")
    )
    cand = (
        left.join(right, ["_table", "_sig"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "_va", "vec_b", "_vb")
        .distinct()
    )
    return (
        cand.withColumn("cosine", cosine(F.col("_va"), F.col("_vb")))
        .filter(F.col("cosine") >= F.lit(threshold))
        .select("vec_a", "vec_b", "cosine")
    )


def _lloyd_centroids(
    sample: np.ndarray, nlist: int, iters: int = 10, seed: int = 42
) -> np.ndarray:
    """K-means on a driver-side sample (numpy Lloyd iterations, seeded
    k-means++ init). The sample is O(nlist)·bounded — driver work stays
    constant as the corpus grows. Returns L2-normalized (nlist × dim)."""
    rng = np.random.default_rng(seed)
    x = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    # k-means++ seeding
    centroids = [x[rng.integers(len(x))]]
    for _ in range(nlist - 1):
        d2 = np.min(
            [1.0 - x @ c for c in centroids], axis=0
        )  # cosine distance to nearest seed
        d2 = np.maximum(d2, 0)
        probs = d2 / d2.sum() if d2.sum() > 0 else None
        centroids.append(x[rng.choice(len(x), p=probs)])
    cents = np.array(centroids)
    for _ in range(iters):
        assign = np.argmax(x @ cents.T, axis=1)
        for j in range(nlist):
            members = x[assign == j]
            if len(members):
                cents[j] = members.mean(axis=0)
        cents /= np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
    return cents


def _cell_udfs(cents: np.ndarray, nprobe: int):
    """Pandas UDFs closing over the (broadcast-small) centroid matrix:
    top-1 cell for corpus rows, top-nprobe probe list for queries."""
    from pyspark.sql.functions import pandas_udf

    mat = cents.T.astype(np.float64)  # dim × nlist

    @pandas_udf("int")
    def cell(emb: pd.Series) -> pd.Series:
        x = np.vstack(emb.to_numpy()).astype(np.float64)
        x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(x @ mat, axis=1).astype(np.int32))

    @pandas_udf("array<int>")
    def probes(emb: pd.Series) -> pd.Series:
        x = np.vstack(emb.to_numpy()).astype(np.float64)
        x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        scores = x @ mat
        top = np.argsort(-scores, axis=1)[:, :nprobe].astype(np.int32)
        return pd.Series(list(top))

    return cell, probes


def train_ivf_centroids(
    corpus: DataFrame,
    vec_col: str = "embedding",
    nlist: int = 32,
    sample_size: int = 2048,
    seed: int = 42,
) -> np.ndarray:
    """Train the IVF coarse quantizer: Lloyd k-means over a bounded sample.

    The sample is ``limit(n)`` on the source — first-partitions read, NO
    global sort/TakeOrdered over the corpus (deterministic on a stable
    parquet source, and O(sample) work regardless of corpus size). Returns
    the L2-normalized (nlist × dim) centroid matrix, reusable across
    queries — train once, index/search many times."""
    sample_rows = corpus.select(vec_col).limit(sample_size).collect()
    sample = np.array([r[0] for r in sample_rows], dtype=np.float64)
    return _lloyd_centroids(sample, nlist, seed=seed)


def ivf_ann(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 32,
    nprobe: int = 8,
    sample_size: int = 2048,
    seed: int = 42,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the coarse-quantizer scale
    path complementing :func:`lsh_ann`.

    Train: :func:`train_ivf_centroids` (skipped when ``centroids`` is
    passed — repeated query batches reuse one trained quantizer).
    Index: each corpus vector lands in its nearest-centroid cell (one Arrow
    matmul per batch; the cell column is the natural partition/bucket key
    for a persisted index). Search: each query probes its nprobe nearest
    cells; exact cosine rerank within ~nprobe/nlist of the corpus.
    """
    cents = (
        centroids
        if centroids is not None
        else train_ivf_centroids(corpus, vec_col, nlist, sample_size, seed)
    )
    # Fused index+search (guide §4.2, the lsh_ann/knn rewrite): the bounded
    # query set is collected once (the same contract its broadcast made),
    # its probe lists computed with the IDENTICAL numpy expressions
    # _cell_udfs used, and ONE mapInPandas stage assigns each corpus
    # batch's cells, matches them against the probe lists, and exact-
    # reranks the candidates with the sequential-order fold (_seq_dot —
    # bit-identical to the interpreted zip_with/aggregate cosine). This
    # removes two ArrowEvalPython stages, the broadcast cell join, and the
    # per-candidate interpreted lambdas; per-batch top-k emission bounds
    # the final rank window's input by batches·k per query (§2.3).
    mat = cents.T.astype(np.float64)  # dim × nlist
    spark = corpus.sparkSession
    out_schema = f"query_id long, {id_col} long, score double"
    qrows = queries.select(F.col(id_col), F.col(vec_col)).collect()
    if not qrows:
        return spark.createDataFrame([], out_schema + ", rank int")
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    Q = np.array([np.asarray(r[1], dtype=np.float64) for r in qrows])
    xq = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    qprobes = np.argsort(-(xq @ mat), axis=1)[:, :nprobe].astype(np.int32)
    qn = np.sqrt(_seq_dot(Q, Q))
    kk = int(k)

    def _score_batches(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            C = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            x = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
            cell = np.argmax(x @ mat, axis=1).astype(np.int32)
            # candidate iff the corpus row's cell is in the query's probe
            # list: (m × nq) bool
            cand = (cell[:, None, None] == qprobes[None, :, :]).any(axis=2)
            if not cand.any():
                continue
            cn = np.sqrt(_seq_dot(C, C))
            score = np.full((len(C), len(qids)), np.nan)
            for j in range(len(qids)):
                rows = cand[:, j]
                if rows.any():
                    score[rows, j] = _seq_dot(
                        C[rows], np.broadcast_to(Q[j], C[rows].shape)
                    ) / (cn[rows] * qn[j])
            out = _batch_topk_emit(qids, ids, score, cand, kk, id_col)
            if out is not None:
                yield out

    scored = corpus.select(id_col, vec_col).mapInPandas(
        _score_batches, out_schema
    )
    return _rank_topk(scored, k, id_col)


def random_projection(
    corpus: DataFrame,
    out_dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    normalize: bool = True,
    in_dim: int | None = None,
) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction: project every vector
    through a seed-deterministic Gaussian matrix scaled by 1/sqrt(out_dim)
    (pairwise distances/angles preserved within ~1/sqrt(out_dim) — the JL
    guarantee, bounded in tests).

    The training-data use: shrink stored embeddings (e.g. 64 -> 16 dims =
    4x the vectors per shuffle byte) before brute-force or IVF stages whose
    cost is linear in dimension. One Arrow-batched matmul pass — a narrow
    projection, NO shuffle; the matrix rides the pandas_udf closure exactly
    like the LSH hyperplane tables (deterministic from the seed, so reruns
    and retries emit identical projections).
    """
    from pyspark.sql.functions import pandas_udf

    rng = np.random.default_rng(seed)
    if in_dim is None:
        # Probe the dimension with a 1-row job at build time (same bounded
        # driver-work contract as the IVF/PQ trainers); pass in_dim
        # explicitly to keep plan construction job-free.
        first = corpus.select(vec_col).first()
        if first is None or first[0] is None:
            raise ValueError(
                "cannot infer in_dim from an empty corpus — pass in_dim explicitly"
            )
        in_dim = len(first[0])
    mat = rng.standard_normal((in_dim, out_dim)) / np.sqrt(out_dim)

    @pandas_udf("array<float>")
    def project(emb: pd.Series) -> pd.Series:
        x = np.vstack(emb.to_numpy()).astype(np.float64)
        y = x @ mat
        if normalize:
            y /= np.maximum(np.linalg.norm(y, axis=1, keepdims=True), 1e-12)
        return pd.Series(list(y.astype(np.float32)))

    return corpus.select(
        F.col(id_col), project(F.col(vec_col)).alias(vec_col)
    )


def kmeans_assign(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probes: int = 1,
) -> DataFrame:
    """Distributed Lloyd's k-means: ``iters`` assignment rounds over the full
    corpus, returning each point's final cluster id.

    Engine-portable exactness contract (so a DuckDB oracle can replay it):
      * points are micro-quantized (FLOOR(x*1e6) per component, bigint);
      * squared distances are pure integer sums — with |component| <= ~2e3
        micros max ~2e9, (p-c)^2 <= ~1.6e13 and a 64-dim sum <= ~1e15,
        comfortably inside int64;
      * updated centroids re-quantize via FLOOR(SUM(p_i)/n) — the division
        is one exactly-rounded double op on integers < 2^53, so both
        engines floor the same value;
      * argmin ties break toward the smallest cluster id (struct ordering).

    Plan shape per iteration (the textbook scalable form):
      * assignment: centroids are LITERAL arrays baked into a projection —
        zero shuffle, zero join, whole-stage codegen over the scan;
      * update: posexplode -> groupBy(cluster, pos) -> floor-mean — one
        shuffle of n*d skinny rows with map-side partial aggregation.
    Driver state between rounds is the k x d centroid table (a few KB) —
    the same bounded-collect contract as the IVF/PQ trainers. Clusters that
    lose every member simply drop out of the next round (both engines).

    ``probes > 1`` (SemDeDup multi-probe, VERDICT r8 item 6) returns the
    top-``probes`` nearest clusters per point as (id, cluster, probe)
    rows, probe 0 = the argmin assignment. Lloyd's updates between rounds
    still use the argmin only — multi-probe changes the FINAL emission,
    never the training trajectory, so probe-0 rows equal the probes=1
    assignment bit-for-bit. Ordering stays integer-exact ((dist, cluster)
    struct sort), so a SQL oracle replays it with ``rn <= probes``.
    """
    if probes < 1:
        # probes=0 would silently omit the probe column (only probes>1
        # emits it) and downstream filters on it would fail with an opaque
        # unresolved-column error (ADVICE r10) — refuse up front
        raise ValueError(f"probes must be >= 1, got {probes}")
    pts = embeddings.select(F.col(id_col), F.col(vec_col).alias("_e"))
    # Deterministic seeding: the k lowest-id vectors are centroids 0..k-1.
    seeds = pts.orderBy(F.col(id_col).asc()).limit(k).collect()
    ordered = sorted(seeds, key=lambda r: r[0])
    labels = list(range(len(ordered)))
    cents = [
        np.floor(np.asarray(list(r[1]), dtype=np.float64) * SCALE).astype(
            np.int64
        )
        for r in ordered
    ]

    # Distance computation moved from per-row Catalyst zip_with/aggregate
    # lambdas (interpreted, k·d element ops per row) to batchwise numpy
    # (guide §4.2): micro-quantize the batch (FLOOR(x*1e6) — the same
    # exact int64 contract), then squared L2 to every centroid. In the
    # common regime every term stays below 2^53 so float64 matmul is
    # EXACT; otherwise fall back to the int64 difference path. Both give
    # the identical integers the SQL oracle computes.
    def _batch_dists(X: np.ndarray, C: np.ndarray) -> np.ndarray:
        amax = max(
            float(np.abs(X).max(initial=0.0)), float(np.abs(C).max(initial=0))
        )
        if X.shape[1] * (2.0 * amax) * (2.0 * amax) < _GRAM_EXACT_BOUND:
            Cf = C.astype(np.float64)
            return (
                (X * X).sum(axis=1)[:, None]
                - 2.0 * (X @ Cf.T)
                + (Cf * Cf).sum(axis=1)[None, :]
            )
        Xi = X.astype(np.int64)
        d = Xi[:, None, :] - C[None, :, :]
        return (d * d).sum(axis=2)

    def _micro_np(col: pd.Series) -> np.ndarray:
        return np.floor(
            np.array([np.asarray(v, dtype=np.float64) for v in col]) * SCALE
        )

    for _ in range(iters - 1):
        # Lloyd update: per-batch partial (cluster, componentwise int64
        # sum, count) via mapInPandas — the exact partial-aggregation
        # shape (guide §2.3) with k·d rows per batch instead of the old
        # posexplode of n·d rows through a shuffle. Totals merge on the
        # driver in arbitrary-precision ints; floor(double(sum)/count)
        # reproduces the engine contract bit-for-bit.
        C = np.stack(cents)
        labs = list(labels)

        def _partials(it):
            for pdf in it:
                if not len(pdf):
                    continue
                X = _micro_np(pdf["_e"])
                a = np.argmin(_batch_dists(X, C), axis=1)
                Xi = X.astype(np.int64)
                rows = []
                for idx in range(len(labs)):
                    mask = a == idx
                    cnt = int(mask.sum())
                    if cnt:
                        s = Xi[mask].sum(axis=0)
                        rows.append((labs[idx], cnt, [int(v) for v in s]))
                if rows:
                    yield pd.DataFrame(
                        {
                            "cluster": [r[0] for r in rows],
                            "n": [r[1] for r in rows],
                            "s": [r[2] for r in rows],
                        }
                    )

        update = pts.select("_e").mapInPandas(
            _partials, "cluster int, n long, s array<long>"
        ).collect()
        sums: dict[int, list[int]] = {}
        cnts: dict[int, int] = {}
        for row in update:
            j, n, s = row["cluster"], row["n"], row["s"]
            if j in sums:
                sums[j] = [a + b for a, b in zip(sums[j], s)]
                cnts[j] += n
            else:
                sums[j] = list(s)
                cnts[j] = n
        labels = sorted(sums)
        cents = [
            np.array(
                [int(math.floor(float(v) / cnts[j])) for v in sums[j]],
                dtype=np.int64,
            )
            for j in labels
        ]

    C = np.stack(cents)
    labs = np.array(labels, dtype=np.int64)
    n_probe = min(probes, len(labels))

    if probes > 1:

        def _emit_probes(it):
            for pdf in it:
                if not len(pdf):
                    continue
                X = _micro_np(pdf["_e"])
                dists = _batch_dists(X, C)
                # (dist, cluster) struct order == lexsort by dist then
                # cluster id (labels ascend with the column index)
                order = np.argsort(dists, axis=1, kind="stable")[:, :n_probe]
                m = len(pdf)
                yield pd.DataFrame(
                    {
                        id_col: np.repeat(
                            pdf[id_col].to_numpy(), n_probe
                        ),
                        "cluster": labs[order].reshape(-1).astype(np.int32),
                        "probe": np.tile(
                            np.arange(n_probe, dtype=np.int32), m
                        ),
                    }
                )

        return pts.mapInPandas(
            _emit_probes, f"{id_col} long, cluster int, probe int"
        )

    @F.pandas_udf("int")
    def _assign(col: pd.Series) -> pd.Series:
        X = _micro_np(col)
        return pd.Series(
            labs[np.argmin(_batch_dists(X, C), axis=1)].astype(np.int32)
        )

    return pts.select(F.col(id_col), _assign(F.col("_e")).alias("cluster"))


def semantic_decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    threshold: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-level benchmark decontamination: for every corpus vector,
    its max cosine similarity to ANY evaluation vector, flagged when it
    crosses ``threshold`` — the semantic complement of the n-gram
    ``decontaminate`` scrub (a paraphrased eval question shares no 8-gram
    but sits next to its source in embedding space).

    Shape: broadcast the (small) eval set against the corpus — one scan,
    no shuffle of the corpus, a per-id max over |eval| candidate scores
    computed inside the projection (aggregate over a collected struct
    array would be overkill; the groupBy on id is a bounded |corpus| keys
    aggregation). Scores use the quantized-dot exactness contract so the
    flag is engine-portable. For an eval set too large to broadcast, route
    through lsh_ann instead (bucketed candidates, then this same rerank).
    """
    # Constant-key LEFT join (not a bare cross): an EMPTY eval set must
    # yield contaminated=0 for every corpus row, not silently drop the
    # corpus — and the constant equi-key lets Spark plan a broadcast HASH
    # join instead of a nested loop.
    e = eval_df.select(
        F.lit(1).alias("_k"),
        F.col(vec_col).alias("_evec"),
        F.sqrt(quantized_norm_sq(F.col(vec_col)).cast("double")).alias("_en"),
    )
    c = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        F.sqrt(quantized_norm_sq(F.col(vec_col)).cast("double")).alias("_cn"),
        F.lit(1).alias("_k"),
    )
    score = quantized_dot(F.col(vec_col), F.col("_evec")).cast("double") / (
        F.col("_cn") * F.col("_en")
    )
    return (
        c.join(F.broadcast(e), "_k", "left")
        .select(id_col, score.alias("_s"))
        .groupBy(id_col)
        .agg(F.max("_s").alias("max_eval_cos"))
        .select(
            id_col,
            "max_eval_cos",
            F.when(F.col("max_eval_cos") >= threshold, 1)
            .otherwise(0)
            .cast("int")
            .alias("contaminated"),
        )
    )


def semantic_dedup(
    embeddings: DataFrame,
    threshold: float,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probes: int = 1,
) -> DataFrame:
    """SemDeDup-shaped semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the corpus with k-means, then search for
    near-duplicate pairs ONLY within each cluster — the clustering turns
    the O(n²) all-pairs cosine scan into O(Σ|cluster|²), which is the
    published recipe for embedding-level dedup at web-corpus scale (pick
    k so clusters stay bounded; at 100 TB k grows with the corpus and the
    per-cluster work stays constant).

    Keep-first convention (same as exact dedup's keep-min-id): a point is
    a duplicate iff some SMALLER-id point in the SAME cluster has cosine
    ≥ ``threshold``. Output is corpus-shaped — every id, its cluster, how
    many smaller co-clustered near-dups it has, and the flag — so the
    "kept" set is exactly ``is_dup = 0``.

    Recall contract (tested): within a cluster the scan is exact, so every
    exact near-dup pair the clustering co-locates is found and no false
    positive is possible; pairs SPLIT across clusters are missed — that is
    the SemDeDup trade, and the miss rate falls as the threshold rises
    (true near-dups land in the same cell; at the registered fixture
    τ=0.5 recall is 1.0, at the deliberately-low τ=0.35 the survey-wide
    figure is ~0.37 because weakly-similar pairs do not co-cluster).

    Plan shape: one k-means assignment (literal-centroid projection — see
    :func:`kmeans_assign`), one self-join shuffled on ``cluster``, one
    per-id count aggregate, one left join back to the corpus-shaped base.
    Scores ride the quantized-dot contract, counts/flags are integers, so
    a DuckDB oracle replays the whole pipeline bit-for-bit.

    ``probes > 1`` is the MULTI-PROBE variant (VERDICT r8 item 6): each
    point is a member of its top-``probes`` nearest cells, and a pair is
    compared when it shares ANY co-probed cell — cutting the
    cross-cluster miss rate at low thresholds (boundary points see their
    second-nearest cell's members). Pairs sharing two cells count ONCE
    (distinct-partner count); the reported ``cluster`` stays the
    probe-0 (argmin) assignment, so the corpus shape is unchanged. Cost
    is O(Σ|cell-membership|²) with membership ≤ probes·n — the declared
    ~probes² constant over the single-probe scan, still never O(n²).
    """
    if probes < 1:
        # mirror kmeans_assign's guard here too: semantic_dedup only
        # normalizes the probe column when probes == 1, so an invalid
        # probes would otherwise surface as an unresolved-column error
        # deep in the pair scan (ADVICE r10)
        raise ValueError(f"probes must be >= 1, got {probes}")

    asg = kmeans_assign(
        embeddings,
        k=k,
        iters=iters,
        id_col=id_col,
        vec_col=vec_col,
        probes=probes,
    )
    if probes == 1:
        # single-probe assignment has no probe column; normalizing here
        # lets ONE pipeline below serve both regimes (code-review r9: the
        # two near-verbatim branches would drift apart) — the literal
        # folds away under codegen, and countDistinct == count when every
        # pair shares exactly one cell
        asg = asg.withColumn("probe", F.lit(0).cast("int"))
    base = embeddings.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
    )
    # persisted: the cluster-tagged relation feeds both the pair scan AND
    # the corpus-shaped output — without the persist the kmeans assignment
    # projection would re-run twice
    from procurement_data_pipeline_spark.caching import scoped_persist

    pts = scoped_persist(
        base.join(asg.withColumnRenamed(id_col, "_id"), "_id")
    )
    # Within-cell pair scan as ONE integer Gram matrix per cell (numpy)
    # instead of a self-join evaluating a d-element zip_with/aggregate
    # lambda per candidate pair: the scores are the identical doubles —
    # micro-quantization (FLOOR(x*1e6), exact int64), dot products as
    # matmul (see _GRAM_EXACT_BOUND: every intermediate is an integer
    # below 2^53, so float64 BLAS is EXACT; larger quantities fall back
    # to int64 matmul), then the same cast-to-double division by the
    # norm product. Emitting only the surviving (larger-id, smaller-id)
    # pairs keeps the shuffle O(duplicates) instead of O(candidate
    # pairs × d) — per guide §4.2 (batchwise native code) and §2.3
    # (shuffle decisions, not payloads).
    pair_schema = "_ida long, _idb long"
    thr = float(threshold)

    empty = pd.DataFrame(
        {
            "_ida": np.array([], dtype=np.int64),
            "_idb": np.array([], dtype=np.int64),
        }
    )

    def _cell_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        m = len(pdf)
        if m < 2:
            return empty
        ids = pdf["_id"].to_numpy()
        V = np.floor(
            np.array([np.asarray(v, dtype=np.float64) for v in pdf["_v"]])
            * SCALE
        )
        # exactness guard: d * max|a| * max|b| must stay below 2^53 for
        # float64 accumulation to be exact; otherwise use int64 matmul
        amax = float(np.abs(V).max()) if m else 0.0
        exact64 = V.shape[1] * amax * amax < _GRAM_EXACT_BOUND
        M = V if exact64 else V.astype(np.int64)
        # norm follows the same engine contract: exact int64 sum of
        # squares, cast to double, sqrt (in the exact64 regime the float64
        # sum IS that integer; the fallback reproduces Java long wrap)
        nrm = np.sqrt(np.asarray((M * M).sum(axis=1), dtype=np.float64))
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        for s in range(0, m, 2048):
            e = min(s + 2048, m)
            G = M[s:e] @ M.T
            score = np.asarray(G, dtype=np.float64) / (
                nrm[s:e, None] * nrm[None, :]
            )
            ai, bj = np.nonzero(
                (score >= thr) & (ids[None, :] < ids[s:e, None])
            )
            if len(ai):
                out_a.append(ids[s:e][ai])
                out_b.append(ids[bj])
        if not out_a:
            return empty
        return pd.DataFrame(
            {
                "_ida": np.concatenate(out_a).astype(np.int64),
                "_idb": np.concatenate(out_b).astype(np.int64),
            }
        )

    pair_src = pts.select("_id", "_v", "cluster")
    pairs = pair_src.groupBy("cluster").applyInPandas(_cell_pairs, pair_schema)
    # a pair co-probed in TWO shared cells must count once — countDistinct
    # for multi-probe; with one probe each pair appears exactly once, so
    # plain count is the same VALUE without the distinct-aggregation
    # exchange
    partner_count = (
        F.countDistinct("_idb") if probes > 1 else F.count("_idb")
    )
    dups = pairs.groupBy("_ida").agg(
        partner_count.cast("long").alias("n_dup_smaller")
    )
    return (
        pts.filter(F.col("probe") == 0)
        .select(F.col("_id").alias(id_col), "cluster")
        .join(dups.withColumnRenamed("_ida", id_col), id_col, "left")
        .select(
            id_col,
            "cluster",
            F.coalesce(F.col("n_dup_smaller"), F.lit(0))
            .cast("long")
            .alias("n_dup_smaller"),
            F.when(F.coalesce(F.col("n_dup_smaller"), F.lit(0)) > 0, 1)
            .otherwise(0)
            .cast("int")
            .alias("is_dup"),
        )
    )


def mmr_rerank(
    corpus: DataFrame,
    query_vec: list[float],
    k: int = 10,
    pool: int = 100,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance (Carbonell & Goldstein): a diverse top-k.

    Plain cosine top-k returns near-duplicates of the best hit; MMR
    greedily picks argmax of ``λ·relevance − (1−λ)·max_sim_to_selected``,
    trading relevance against redundancy — the standard second-stage
    reranker over a first-stage retriever (ANN or brute-force).

    Two-stage shape, each stage honest about its scale:

    * relevance stage — distributed: one scan scoring every corpus row
      against the broadcast query literal (JVM lambda dot, no UDF), then
      TakeOrdered for the ``pool`` candidates (ties by id);
    * greedy stage — the ``pool × pool`` similarity matrix and k greedy
      passes run driver-side in numpy over the BOUNDED candidate set
      (same bounded-collect class as the ANN query sets in llm_ops.pq).
      Rerankers are pool-bounded by definition — the stage's cost never
      grows with corpus size, only with ``pool``.

    Output: (rank, id, relevance, mmr_score) with rank 1..k in selection
    order. Deterministic: ties break on id at both stages.
    """
    import numpy as np

    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    if k > pool:
        raise ValueError(f"k {k} must be ≤ pool {pool}")
    q = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.sqrt((q * q).sum()))
    if qn == 0.0:
        raise ValueError("query vector must be non-zero")
    qlit = F.lit([float(v) for v in query_vec])
    # A zero-norm (or NULL) embedding has no direction: it is not rankable.
    # Filter BEFORE the division — under ANSI mode a 0-norm divide throws,
    # and under non-ANSI its NULL would poison the numpy stage.
    cands = (
        corpus.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("vec"),
            F.sqrt(dot(F.col(vec_col), F.col(vec_col))).alias("_n"),
            dot(F.col(vec_col), qlit).alias("_d"),
        )
        .filter(F.col("_n") > 0)
        .select("id", "vec", (F.col("_d") / (F.col("_n") * qn)).alias("rel"))
        .orderBy(F.desc("rel"), "id")
        .limit(pool)
        .collect()
    )
    if not cands:
        return corpus.sparkSession.createDataFrame(
            [], "rank int, id long, relevance double, mmr_score double"
        )
    ids = [r["id"] for r in cands]
    rels = np.array([r["rel"] for r in cands])
    mat = np.array([r["vec"] for r in cands], dtype=np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))
    norms[norms == 0.0] = 1.0
    unit = mat / norms[:, None]
    sims = unit @ unit.T  # pool × pool, bounded
    selected: list[int] = []
    # max over selected of RAW cosine — negative similarity is a diversity
    # reward and must not clamp to zero; -inf is replaced by the first
    # pick's row before it is ever read (rank 1 scores on relevance only).
    max_sim = np.full(len(cands), -np.inf)
    out = []
    for rank in range(1, min(k, len(cands)) + 1):
        if selected:
            score = lam * rels - (1.0 - lam) * max_sim
            score[selected] = -np.inf
        else:
            score = rels.copy()  # first pick: pure relevance (and the
            # -inf max_sim never meets arithmetic — 0·−inf would be NaN)
        best = int(np.argmax(score))  # candidates pre-sorted (-rel, id) →
        # argmax's first-index tie-break IS the smallest-id tie-break
        selected.append(best)
        out.append((rank, int(ids[best]), float(rels[best]), float(score[best])))
        max_sim = np.maximum(max_sim, sims[best])
    return corpus.sparkSession.createDataFrame(
        out, "rank int, id long, relevance double, mmr_score double"
    )
