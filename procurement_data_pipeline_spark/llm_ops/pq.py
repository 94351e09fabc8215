"""Product quantization (PQ) — compressed ANN for 100 TB embedding stores.

At 100 TB, float32 embeddings are the storage AND shuffle bottleneck: a
64-dim vector is 256 bytes, its PQ code is M bytes (32× smaller at M=8).
PQ splits each L2-normalized vector into M subvectors, k-means-quantizes
each subspace to K centroids (K ≤ 256 → one byte per subvector), and stores
only the code. Search uses **asymmetric distance computation** (ADC): the
query stays full-precision, one M×K lookup table of
``dot(query_subvector, centroid)`` is built per query, and a corpus
vector's approximate score is the sum of M table lookups — no float vector
ever leaves storage.

Spark mapping:
* train   — driver-side Lloyd per subspace over a bounded sample (same
            bounded-driver-work contract as IVF's coarse quantizer);
* encode  — one Arrow-batched pandas UDF: (batch × dim) matmuls per
            subspace, argmin per row → ``array<smallint>`` codes;
* search  — broadcast the query lookup tables; one pandas UDF turns a
            batch of codes into scores via numpy fancy indexing; exact
            top-k per query via window rank.

Recall is bounded by quantization error, so the operator is declared
without an oracle (like LSH/IVF) and carries recall-floor tests against
brute force; compose with :mod:`similarity`'s IVF cells for IVF-PQ.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _l2_lloyd(x: np.ndarray, k: int, iters: int = 15, seed: int = 42) -> np.ndarray:
    """Plain L2 k-means (k-means++ init) on a driver-side sample."""
    rng = np.random.default_rng(seed)
    cents = [x[rng.integers(len(x))]]
    for _ in range(k - 1):
        d2 = np.min(
            [((x - c) ** 2).sum(axis=1) for c in cents], axis=0
        )
        probs = d2 / d2.sum() if d2.sum() > 0 else None
        cents.append(x[rng.choice(len(x), p=probs)])
    cents = np.array(cents)
    for _ in range(iters):
        d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d, axis=1)
        for j in range(k):
            members = x[assign == j]
            if len(members):
                cents[j] = members.mean(axis=0)
    return cents


def train_pq_codebooks(
    corpus: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 256,
    sample_size: int = 2048,
    seed: int = 42,
) -> np.ndarray:
    """Train M per-subspace codebooks over a bounded sample → (m, k, dim/m)
    array. Vectors are L2-normalized first so ADC scores approximate
    cosine. ``limit(n)`` sampling — no global sort, O(sample) driver work."""
    rows = corpus.select(vec_col).limit(sample_size).collect()
    x = np.array([r[0] for r in rows], dtype=np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    k = min(k, len(x))
    if k > 32767:
        # pq_encode stores codes as int16 (array<smallint>) — a larger
        # codebook would silently WRAP indices negative and ADC would
        # read the wrong centroids' dot products (code-review r8). PQ
        # codebooks are 256-4096 entries in practice; refuse loudly.
        raise ValueError(f"codebook k={k} exceeds the int16 code range")
    return np.stack(
        [
            _l2_lloyd(x[:, j * sub : (j + 1) * sub], k, seed=seed + j)
            for j in range(m)
        ]
    )


def pq_encode(
    corpus: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    extra_cols: dict | None = None,
) -> DataFrame:
    """(id, code: array<smallint>) — one code per subspace per vector.

    One Arrow batch → M (batch × sub) @ (sub × k) matmuls; nearest centroid
    per subspace by expanded L2 (argmax of dot − ½‖c‖², since the batch
    row's own norm is constant across candidates).

    ``extra_cols`` ({name: Column over the corpus row}) rides the SAME
    projection — the IVF cell assignment is row-local, and attaching it by
    re-selecting the corpus and joining on id cost a full corpus shuffle
    per index build (code-review r8)."""
    from pyspark.sql.functions import pandas_udf

    m, k, sub = codebooks.shape
    mats = codebooks.transpose(0, 2, 1)  # m × sub × k
    half_sq = 0.5 * (codebooks**2).sum(axis=2)  # m × k

    @pandas_udf("array<smallint>")
    def encode(emb: pd.Series) -> pd.Series:
        x = np.vstack(emb.to_numpy()).astype(np.float64)
        x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        codes = np.empty((len(x), m), dtype=np.int16)
        for j in range(m):
            scores = x[:, j * sub : (j + 1) * sub] @ mats[j] - half_sq[j]
            codes[:, j] = np.argmax(scores, axis=1).astype(np.int16)
        return pd.Series(list(codes))

    return corpus.select(
        F.col(id_col),
        encode(F.col(vec_col)).alias("code"),
        *[v.alias(n) for n, v in (extra_cols or {}).items()],
    )


def pq_ann(
    encoded_corpus: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k by ADC over PQ codes.

    Query lookup tables (n_queries × m × K) are built driver-side (queries
    are the small side by contract, same as the other ANN operators) and
    broadcast inside one pandas UDF closure; each Arrow batch of corpus
    codes scores against ALL queries via fancy indexing — the per-row cost
    is M adds per query, independent of the original dimension."""
    from pyspark.sql.functions import pandas_udf

    m, kk, sub = codebooks.shape
    q_rows = queries.select(id_col, vec_col).collect()
    q_ids = [r[0] for r in q_rows]
    qx = np.array([r[1] for r in q_rows], dtype=np.float64)
    qx /= np.maximum(np.linalg.norm(qx, axis=1, keepdims=True), 1e-12)
    # tables[q, j, c] = dot(query_q's j-th subvector, codebook_j[c])
    tables = np.stack(
        [qx[:, j * sub : (j + 1) * sub] @ codebooks[j].T for j in range(m)],
        axis=1,
    )
    n_q = len(q_ids)

    @pandas_udf("array<double>")
    def adc_scores(code: pd.Series) -> pd.Series:
        codes = np.vstack(code.to_numpy()).astype(np.int64)  # batch × m
        out = np.zeros((len(codes), n_q), dtype=np.float64)
        for j in range(m):
            # tables[:, j, codes[:, j]] → (n_q × batch); accumulate transposed
            out += tables[:, j, codes[:, j]].T
        return pd.Series(list(out))

    scored = encoded_corpus.select(
        id_col, F.posexplode(adc_scores(F.col("code"))).alias("_qi", "score")
    )
    qmap = F.array(*[F.lit(q) for q in q_ids])
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("query_id", qmap[F.col("_qi")])
        .filter(F.col(id_col) != F.col("query_id"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "score", F.col("rank").cast("int").alias("rank"))
    )


def pq_ann_end_to_end(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    codebook_k: int = 256,
    sample_size: int = 2048,
    seed: int = 42,
) -> DataFrame:
    """Train → encode → ADC search in one call (tests/declared query);
    production splits the stages and persists the encoded corpus."""
    cb = train_pq_codebooks(corpus, vec_col, m, codebook_k, sample_size, seed)
    enc = pq_encode(corpus, cb, id_col, vec_col)
    return pq_ann(enc, queries, cb, k, id_col, vec_col)


class IvfPqIndex:
    """Driver-side metadata of a trained IVF-PQ index: the coarse-quantizer
    centroids (nlist × dim) and the PQ codebooks (m × k × dim/m). The
    per-vector state — (id, code, _cell), M+4 bytes each — stays a
    DataFrame and is persisted as plain parquet, so at 100 TB the index
    build is paid ONCE and every query session reads only the compact
    codes; the float embeddings never need to be rescanned."""

    def __init__(self, centroids: np.ndarray, codebooks: np.ndarray):
        self.centroids = centroids
        self.codebooks = codebooks


def build_ivf_pq_index(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 32,
    m: int = 8,
    codebook_k: int = 256,
    sample_size: int = 2048,
    seed: int = 42,
) -> tuple[IvfPqIndex, DataFrame]:
    """Train coarse centroids + PQ codebooks (bounded driver-side samples),
    then encode the full corpus in one distributed pass → (index metadata,
    encoded DataFrame with columns (id, code, _cell))."""
    from procurement_data_pipeline_spark.llm_ops.similarity import (
        _cell_udfs,
        train_ivf_centroids,
    )

    cents = train_ivf_centroids(corpus, vec_col, nlist, sample_size, seed)
    codebooks = train_pq_codebooks(
        corpus, vec_col, m, codebook_k, sample_size, seed
    )
    cell_udf, _ = _cell_udfs(cents, nprobe=1)
    encoded = pq_encode(
        corpus,
        codebooks,
        id_col,
        vec_col,
        extra_cols={"_cell": cell_udf(F.col(vec_col))},
    )
    return IvfPqIndex(cents, codebooks), encoded


def save_ivf_pq_index(index: IvfPqIndex, encoded: DataFrame, path: str) -> None:
    """Persist the index: codes to ``path/codes`` partitioned by cell (a
    probe reads only its nprobe/nlist fraction of files — partition pruning
    does the IVF pruning at the STORAGE layer), metadata (centroids +
    codebooks as flattened rows) to ``path/meta``."""
    spark = encoded.sparkSession
    encoded.write.mode("overwrite").partitionBy("_cell").parquet(f"{path}/codes")
    meta_rows = [
        ("centroid", int(i), 0, [float(v) for v in c])
        for i, c in enumerate(index.centroids)
    ] + [
        ("codebook", int(j), int(c), [float(v) for v in vec])
        for j in range(index.codebooks.shape[0])
        for c, vec in enumerate(index.codebooks[j])
    ]
    spark.createDataFrame(
        meta_rows, "kind string, i int, j int, vec array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")


def load_ivf_pq_index(spark, path: str) -> tuple[IvfPqIndex, DataFrame]:
    """Rehydrate (index metadata, encoded codes DataFrame) from parquet.
    Metadata is tiny (nlist + m·k rows) — a bounded driver collect; the
    codes stay distributed."""
    meta = spark.read.parquet(f"{path}/meta").collect()
    cents = np.array(
        [r["vec"] for r in sorted(
            (r for r in meta if r["kind"] == "centroid"), key=lambda r: r["i"]
        )]
    )
    cb_rows = sorted(
        (r for r in meta if r["kind"] == "codebook"),
        key=lambda r: (r["i"], r["j"]),
    )
    m = 1 + max(r["i"] for r in cb_rows)
    k = 1 + max(r["j"] for r in cb_rows)
    codebooks = np.array([r["vec"] for r in cb_rows]).reshape(m, k, -1)
    return IvfPqIndex(cents, codebooks), spark.read.parquet(f"{path}/codes")


def ivf_pq_search(
    index: IvfPqIndex,
    encoded: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC search over a PREBUILT index — IVF cells prune the corpus to
    ~nprobe/nlist, then ADC scores only the surviving PQ codes.

    Query probes explode to their nprobe cells, the broadcast cell
    equi-join yields candidates (with partitioned codes, cell pruning
    reaches the file scan), and one Arrow-batched UDF turns (query-index,
    code) pairs into ADC scores. Exact top-k per query by window rank."""
    from pyspark.sql.functions import pandas_udf

    from procurement_data_pipeline_spark.llm_ops.similarity import _cell_udfs

    codebooks = index.codebooks
    m, _, sub = codebooks.shape
    _, probes_udf = _cell_udfs(index.centroids, nprobe)

    q_rows = queries.select(id_col, vec_col).collect()
    q_ids = [r[0] for r in q_rows]
    qx = np.array([r[1] for r in q_rows], dtype=np.float64)
    qx /= np.maximum(np.linalg.norm(qx, axis=1, keepdims=True), 1e-12)
    tables = np.stack(
        [qx[:, j * sub : (j + 1) * sub] @ codebooks[j].T for j in range(m)],
        axis=1,
    )

    probed = queries.select(
        F.col(id_col).alias("query_id"),
        F.explode(probes_udf(F.col(vec_col))).alias("_cell"),
    )
    qidx = F.map_from_arrays(
        F.array(*[F.lit(q) for q in q_ids]),
        F.array(*[F.lit(i) for i in range(len(q_ids))]),
    )
    cand = encoded.join(F.broadcast(probed), "_cell").filter(
        F.col(id_col) != F.col("query_id")
    ).withColumn("_qi", qidx[F.col("query_id")])

    @pandas_udf("double")
    def adc_pair(qi: pd.Series, code: pd.Series) -> pd.Series:
        codes = np.vstack(code.to_numpy()).astype(np.int64)
        qis = qi.to_numpy().astype(np.int64)
        out = np.zeros(len(codes), dtype=np.float64)
        for j in range(m):
            out += tables[qis, j, codes[:, j]]
        return pd.Series(out)

    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        cand.withColumn("score", adc_pair(F.col("_qi"), F.col("code")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "score", F.col("rank").cast("int").alias("rank"))
    )


def ivf_pq_ann(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 32,
    nprobe: int = 8,
    m: int = 8,
    codebook_k: int = 256,
    sample_size: int = 2048,
    seed: int = 42,
) -> DataFrame:
    """Build-then-search convenience for the declared query and tests.
    Production trains once via :func:`build_ivf_pq_index`, persists with
    :func:`save_ivf_pq_index`, and serves every query session from
    :func:`load_ivf_pq_index` + :func:`ivf_pq_search`."""
    index, encoded = build_ivf_pq_index(
        corpus, id_col, vec_col, nlist, m, codebook_k, sample_size, seed
    )
    return ivf_pq_search(index, encoded, queries, k, nprobe, id_col, vec_col)


def append_to_ivf_pq_index(
    spark,
    path: str,
    new_vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """Incrementally add vectors to a PERSISTED index — no retrain.

    The centroids and codebooks are frozen (rehydrated from ``path/meta``);
    the new vectors are encoded and cell-assigned under them in one
    distributed pass and APPENDED to the cell-partitioned codes directory.
    This is the standing index-maintenance operation: a daily ingest adds
    its vectors in O(new) work, and searches immediately see them through
    the same partition-pruned read path. Drift is the documented trade —
    when the data distribution moves, recall decays and a rebuild
    (build_ivf_pq_index) re-trains; this function never does silently.

    Returns the number of appended codes.
    """
    from procurement_data_pipeline_spark.llm_ops.similarity import _cell_udfs

    from procurement_data_pipeline_spark.caching import scoped_persist

    index, _ = load_ivf_pq_index(spark, path)
    cell_udf, _ = _cell_udfs(index.centroids, nprobe=1)
    # Persist before counting: the encode (M matmuls per batch) + cell
    # UDF + join would otherwise run twice — once for the count, once for
    # the write — doubling the O(new) maintenance cost.
    encoded = scoped_persist(
        pq_encode(
            new_vectors,
            index.codebooks,
            id_col,
            vec_col,
            extra_cols={"_cell": cell_udf(F.col(vec_col))},
        )
    )
    n = encoded.count()
    encoded.write.mode("append").partitionBy("_cell").parquet(f"{path}/codes")
    return n


def pq_reconstruction_cosine(
    corpus: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cosine between the vector and its PQ reconstruction) — the
    quantization-quality diagnostic: mean ≈ 1 means the codebooks fit."""
    from pyspark.sql.functions import pandas_udf

    m, kk, sub = codebooks.shape

    @pandas_udf("double")
    def recon_cos(emb: pd.Series) -> pd.Series:
        x = np.vstack(emb.to_numpy()).astype(np.float64)
        x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        rec = np.empty_like(x)
        for j in range(m):
            seg = x[:, j * sub : (j + 1) * sub]
            d = ((seg[:, None, :] - codebooks[j][None, :, :]) ** 2).sum(axis=2)
            rec[:, j * sub : (j + 1) * sub] = codebooks[j][np.argmin(d, axis=1)]
        rec_n = rec / np.maximum(np.linalg.norm(rec, axis=1, keepdims=True), 1e-12)
        return pd.Series((x * rec_n).sum(axis=1))

    return corpus.select(F.col(id_col), recon_cos(F.col(vec_col)).alias("recon_cosine"))


__all__ = [
    "train_pq_codebooks",
    "pq_encode",
    "pq_ann",
    "pq_ann_end_to_end",
    "IvfPqIndex",
    "build_ivf_pq_index",
    "save_ivf_pq_index",
    "load_ivf_pq_index",
    "ivf_pq_search",
    "ivf_pq_ann",
    "pq_reconstruction_cosine",
]
