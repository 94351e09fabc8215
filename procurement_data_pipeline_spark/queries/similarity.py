"""Declared similarity-search queries over the embeddings table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from procurement_data_pipeline_spark.llm_ops.similarity import (
    knn_bruteforce,
    label_centroids,
    lsh_ann,
)
from procurement_data_pipeline_spark.caching import scoped_persist
from procurement_data_pipeline_spark.registry import REGISTRY, register
from procurement_data_pipeline_spark.sources.tables import load_table

N_QUERY_VECS = 5
TOP_K = 10

# DuckDB: exact integer dot product of 1e-6-quantized vectors
_QDOT = (
    "list_sum(list_transform(list_zip({a}, {b}),"
    " s -> CAST(FLOOR(CAST(s[1] AS DOUBLE) * 1000000) AS BIGINT)"
    " * CAST(FLOOR(CAST(s[2] AS DOUBLE) * 1000000) AS BIGINT)))"
)


@register(
    "emb_knn_bruteforce",
    oracle=f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qvec
  FROM embeddings WHERE vec_id < {N_QUERY_VECS}
),
scored AS (
  SELECT q.query_id, e.vec_id,
         CAST({_QDOT.format(a='e.embedding', b='q.qvec')} AS DOUBLE)
         / (sqrt(CAST({_QDOT.format(a='e.embedding', b='e.embedding')} AS DOUBLE))
            * sqrt(CAST({_QDOT.format(a='q.qvec', b='q.qvec')} AS DOUBLE))) AS score
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id != q.query_id
),
ranked AS (
  SELECT query_id, vec_id, score,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY score DESC, vec_id ASC) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, vec_id, score, rank FROM ranked WHERE rank <= {TOP_K}
""",
    tags=("similarity", "llm"),
    bench=True,
)
def q_emb_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-{10} for 5 query vectors — broadcast-queries pattern,
    quantized dot products so the oracle hash is exact."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    return knn_bruteforce(emb, queries, k=TOP_K)


@register(
    "emb_label_centroids",
    oracle="""
SELECT label, pos - 1 AS pos,
       CAST(SUM(CAST(FLOOR(CAST(v AS DOUBLE) * 1000000) AS BIGINT)) AS DOUBLE)
       / COUNT(*) / 1000000.0 AS centroid
FROM (
  SELECT label, unnest(embedding) AS v,
         generate_subscripts(embedding, 1) AS pos
  FROM embeddings
) t
GROUP BY label, pos
""",
    tags=("similarity", "llm"),
)
def q_emb_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean embedding (flat (label,pos,centroid) form), exact
    integer sums so the result is partitioning-independent."""
    return label_centroids(load_table(spark, sf_dir, "embeddings"))


@register(
    "emb_lsh_ann",
    oracle=None,  # approximate — recall vs brute force asserted in tests
    tags=("similarity", "llm", "ann"),
    bench=True,
)
def q_emb_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table hyperplane-LSH approximate top-k (bucket join + exact
    rerank; signatures via one Arrow-batched numpy matmul per batch)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    return lsh_ann(emb, queries, k=TOP_K)


NEARDUP_THRESHOLD = 0.35


@register(
    "emb_cosine_neardup",
    oracle=f"""
WITH n AS (
  SELECT vec_id, embedding,
         sqrt(CAST({_QDOT.format(a='embedding', b='embedding')} AS DOUBLE)) AS nrm
  FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       CAST({_QDOT.format(a='a.embedding', b='b.embedding')} AS DOUBLE)
       / (a.nrm * b.nrm) AS cosine
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE CAST({_QDOT.format(a='a.embedding', b='b.embedding')} AS DOUBLE)
      / (a.nrm * b.nrm) >= {NEARDUP_THRESHOLD}
""",
    tags=("similarity", "llm", "dedup"),
)
def q_emb_cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs (all-pairs baseline;
    the LSH-blocked variant below is the at-scale form)."""
    from procurement_data_pipeline_spark.llm_ops.similarity import (
        cosine_neardup_pairs,
    )

    return cosine_neardup_pairs(
        load_table(spark, sf_dir, "embeddings"), threshold=NEARDUP_THRESHOLD
    )


@register(
    "emb_cosine_neardup_lsh",
    oracle=None,  # approximate (bounded-miss) — recall vs exact asserted in tests
    tags=("similarity", "llm", "dedup", "ann"),
)
def q_emb_cosine_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-blocked cosine near-dup pairs: signature-bucket self-join for
    candidates, exact cosine verification — the O(n·bucket) scale path."""
    from procurement_data_pipeline_spark.llm_ops.similarity import (
        cosine_neardup_lsh,
    )

    return cosine_neardup_lsh(
        load_table(spark, sf_dir, "embeddings"), threshold=NEARDUP_THRESHOLD
    )


@register(
    "emb_ivf_ann",
    oracle=None,  # approximate — recall vs brute force asserted in tests
    tags=("similarity", "llm", "ann"),
    bench=True,
)
def q_emb_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse-quantizer approximate top-k (sampled k-means centroids,
    cell-bucketed candidate join, exact rerank)."""
    from procurement_data_pipeline_spark.llm_ops.similarity import ivf_ann

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    return ivf_ann(emb, queries, k=TOP_K)


@register(
    "emb_pq_ann",
    oracle=None,  # approximate — recall vs brute force asserted in tests
    tags=("similarity", "llm", "ann", "pq"),
)
def q_emb_pq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC top-k: per-subspace codebooks compress each
    vector to M bytes; queries score corpus CODES via M table lookups per
    row (llm_ops/pq.py) — the storage-bound ANN tier (32x smaller than
    float32 at M=8), composable with the IVF cells for IVF-PQ."""
    from procurement_data_pipeline_spark.llm_ops.pq import pq_ann_end_to_end

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    return pq_ann_end_to_end(emb, queries, k=TOP_K, m=8, codebook_k=64)


@register(
    "emb_ivf_pq_ann",
    oracle=None,  # approximate — recall vs brute force asserted in tests
    tags=("similarity", "llm", "ann", "pq"),
)
def q_emb_ivf_pq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composition: coarse cells prune to ~nprobe/nlist of the
    corpus, ADC scores only surviving M-byte codes — the billion-scale
    index layout (cell + code = M+4 bytes/vector after the float
    embedding is dropped)."""
    from procurement_data_pipeline_spark.llm_ops.pq import ivf_pq_ann

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    return ivf_pq_ann(emb, queries, k=TOP_K, nlist=16, nprobe=8, m=8, codebook_k=64)


@register(
    "emb_random_projection",
    oracle=None,  # driver-side Gaussian matrix — JL guarantee pytest-bounded
    tags=("embeddings", "llm", "projection"),
)
def q_emb_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL random projection 64 -> 16 dims (4x density for downstream ANN
    stages; llm_ops/similarity.random_projection — one matmul pass, no
    shuffle, seed-deterministic). Emitted as exploded (vec_id, pos, value)
    scalars: the driver's row canonicalizer cannot hash array cells."""
    from procurement_data_pipeline_spark.llm_ops.similarity import random_projection

    emb = load_table(spark, sf_dir, "embeddings")
    proj = random_projection(emb, out_dim=16)
    return proj.select(
        "vec_id", F.posexplode("embedding").alias("pos", "value")
    )


@register(
    "emb_kmeans",
    # Two Lloyd rounds, exact integer-arithmetic contract (see
    # llm_ops/similarity.kmeans_assign): micro-quantized points, integer
    # squared distances, floor-quantized centroid updates — every step is
    # bit-portable, so the full iterative algorithm replays in SQL. Seeds =
    # the 8 lowest vec_ids as clusters 0..7.
    oracle="""
WITH pts AS (
  SELECT vec_id,
         list_transform(embedding,
                        v -> CAST(FLOOR(CAST(v AS DOUBLE) * 1000000) AS BIGINT)) AS p
  FROM embeddings
),
pe AS (
  SELECT vec_id, generate_subscripts(p, 1) AS pos, unnest(p) AS v FROM pts
),
seeds AS (
  SELECT vec_id, CAST(ROW_NUMBER() OVER (ORDER BY vec_id ASC) - 1 AS INTEGER)
           AS cluster
  FROM pts ORDER BY vec_id ASC LIMIT 8
),
c0 AS (
  SELECT s.cluster, pe.pos, pe.v FROM seeds s JOIN pe USING (vec_id)
),
d1 AS (
  SELECT pe.vec_id, c.cluster, SUM((pe.v - c.v) * (pe.v - c.v)) AS dist
  FROM pe JOIN c0 c ON pe.pos = c.pos
  GROUP BY pe.vec_id, c.cluster
),
a1 AS (
  SELECT vec_id, cluster FROM (
    SELECT vec_id, cluster,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY dist ASC, cluster ASC) AS rn
    FROM d1
  ) WHERE rn = 1
),
c1 AS (
  SELECT a1.cluster, pe.pos,
         CAST(FLOOR(CAST(SUM(pe.v) AS DOUBLE) / COUNT(*)) AS BIGINT) AS v
  FROM a1 JOIN pe USING (vec_id)
  GROUP BY a1.cluster, pe.pos
),
d2 AS (
  SELECT pe.vec_id, c.cluster, SUM((pe.v - c.v) * (pe.v - c.v)) AS dist
  FROM pe JOIN c1 c ON pe.pos = c.pos
  GROUP BY pe.vec_id, c.cluster
)
SELECT vec_id, cluster FROM (
  SELECT vec_id, cluster,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY dist ASC, cluster ASC) AS rn
  FROM d2
) WHERE rn = 1
""",
    tags=("similarity", "llm", "clustering"),
)
def q_emb_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed k-means (k=8, 2 Lloyd rounds) over the embedding corpus:
    semantic clustering for corpus bucketing / diversity sampling. The
    assignment pass is a shuffle-free literal-centroid projection; the
    update pass is one skinny posexplode aggregation per round."""
    from procurement_data_pipeline_spark.llm_ops.similarity import kmeans_assign

    return kmeans_assign(load_table(spark, sf_dir, "embeddings"), k=8, iters=2)


@register(
    "emb_semantic_decontaminate",
    # Eval set = the 10 lowest vec_ids; corpus = the rest. Max-cosine per
    # corpus vector against the broadcast eval set, flag at >= 0.8. Scores
    # ride the same quantized-dot contract as emb_knn_bruteforce, so MAX
    # and the threshold cut agree bit-exactly across engines.
    oracle=f"""
WITH ev AS (
  SELECT vec_id AS _eid, embedding AS _evec,
         sqrt(CAST({_QDOT.format(a='embedding', b='embedding')} AS DOUBLE)) AS _en
  FROM embeddings WHERE vec_id < 10
),
scored AS (
  SELECT c.vec_id,
         CAST({_QDOT.format(a='c.embedding', b='ev._evec')} AS DOUBLE)
         / (sqrt(CAST({_QDOT.format(a='c.embedding', b='c.embedding')} AS DOUBLE))
            * ev._en) AS _s
  FROM embeddings c CROSS JOIN ev
  WHERE c.vec_id >= 10
)
SELECT vec_id, MAX(_s) AS max_eval_cos,
       CAST(CASE WHEN MAX(_s) >= 0.8 THEN 1 ELSE 0 END AS INTEGER)
         AS contaminated
FROM scored GROUP BY vec_id
""",
    tags=("similarity", "llm", "decontamination"),
)
def q_emb_semantic_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic decontamination: max cosine of each corpus embedding to the
    (broadcast) eval set, flagged at 0.8 — catches paraphrased leakage the
    8-gram scrub misses. Broadcast-eval pattern; corpus never shuffles
    except the bounded per-id max."""
    from procurement_data_pipeline_spark.llm_ops.similarity import (
        semantic_decontaminate,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_decontaminate(
        emb.filter(F.col("vec_id") >= 10),
        emb.filter(F.col("vec_id") < 10),
        threshold=0.8,
    )


@register(
    "emb_int8_quantize",
    # Per-dimension min/max int8 quantization of the embedding corpus —
    # the 4x storage/bandwidth compression an ANN serving tier applies
    # before PQ. All arithmetic is exact: micro-quantized components,
    # integer (v-min)*255, one exactly-rounded double division + floor.
    # Constant dimensions (span 0) quantize to 0.
    oracle="""
WITH pts AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS p
  FROM embeddings
),
pe AS (
  SELECT vec_id, generate_subscripts(p, 1) AS pos, unnest(p) AS v FROM pts
),
b AS (
  SELECT pos, MIN(v) AS mn, MAX(v) AS mx FROM pe GROUP BY pos
)
SELECT pe.vec_id, CAST(pe.pos - 1 AS INTEGER) AS pos,
       CAST(CASE WHEN b.mx > b.mn
                 THEN FLOOR(CAST((pe.v - b.mn) * 255 AS DOUBLE)
                            / CAST(b.mx - b.mn AS DOUBLE)) - 128
                 ELSE 0 END AS INTEGER) AS q
FROM pe JOIN b USING (pos)
""",
    tags=("similarity", "llm", "quantization"),
)
def q_emb_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus int8 quantization: one skinny posexplode pass computes the
    per-dimension bounds (64 groups), a broadcast join maps every
    component to its int8 code. At serving scale the codes re-pack to an
    array<byte> column; the long-form rows here are the hash-gradeable
    layout."""
    from procurement_data_pipeline_spark.llm_ops.similarity import _micro

    emb = load_table(spark, sf_dir, "embeddings")
    pe = emb.select(
        "vec_id", F.posexplode(_micro(F.col("embedding"))).alias("pos", "v")
    )
    b = pe.groupBy("pos").agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
    q = (
        F.when(
            F.col("mx") > F.col("mn"),
            F.floor(
                ((F.col("v") - F.col("mn")) * 255).cast("double")
                / (F.col("mx") - F.col("mn")).cast("double")
            )
            - 128,
        )
        .otherwise(0)
        .cast("int")
    )
    return pe.join(F.broadcast(b), "pos").select(
        "vec_id", F.col("pos").cast("int").alias("pos"), q.alias("q")
    )


@register(
    "emb_mmr_rerank",
    oracle=None,  # greedy sequential selection — reference-replay + diversity
    # properties asserted in tests/test_mmr.py (rows-only driver check)
    tags=("similarity", "llm", "rerank", "mmr"),
)
def q_emb_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diverse top-10 for a fixed probe direction: distributed relevance
    scan + TakeOrdered candidate pool, then the bounded greedy MMR stage
    (llm_ops.similarity.mmr_rerank). The probe is the all-ones direction —
    deterministic without reading any row first."""
    from procurement_data_pipeline_spark.llm_ops.similarity import mmr_rerank

    emb = load_table(spark, sf_dir, "embeddings")
    first = emb.select("embedding").first()
    dim = len(first[0]) if first is not None and first[0] is not None else 1
    # empty table → mmr_rerank's empty-candidates path returns the typed
    # empty frame
    return mmr_rerank(emb, [1.0] * dim, k=10, pool=100, lam=0.7)


@register(
    "emb_minmax_scale",
    # Per-dimension min-max feature scaling — the ML-prep normalizer that
    # needs GLOBAL per-dimension statistics, i.e. the classic two-pass
    # fit/transform: one posexplode pass aggregates each dimension's
    # min/max (dimension-count rows — tiny, broadcast), one pass rescales.
    # Exact: float32 values cast to double exactly; min/max are exact
    # selections; (x−mn)/(mx−mn) is two IEEE ops both engines perform
    # identically; a degenerate constant dimension maps to 0.5 by
    # convention on BOTH sides (guarded — ANSI division would throw).
    # Output is the FLAT (vec_id, pos, sx) grain bounded to vec_id < 50 —
    # full scaled vectors under the hash without array-typed cells (the
    # driver's canonicalizer hashes scalars).
    oracle="""
WITH dims AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
),
stats AS (
  SELECT pos, MIN(x) AS mn, MAX(x) AS mx FROM dims GROUP BY pos
),
scaled AS (
  SELECT d.vec_id, d.pos,
         CASE WHEN s.mx > s.mn THEN (d.x - s.mn) / (s.mx - s.mn)
              ELSE 0.5 END AS sx
  FROM dims d JOIN stats s ON s.pos = d.pos
)
SELECT vec_id, CAST(pos AS BIGINT) AS pos, sx
FROM scaled WHERE vec_id < 50
""",
    tags=("similarity", "llm", "scaling"),
)
def q_emb_minmax_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "xf")
    ).select("vec_id", "pos", F.col("xf").cast("double").alias("x"))
    stats = dims.groupBy("pos").agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    scaled = dims.join(F.broadcast(stats), "pos").select(
        "vec_id",
        "pos",
        F.when(
            F.col("mx") > F.col("mn"),
            (F.col("x") - F.col("mn")) / (F.col("mx") - F.col("mn")),
        )
        .otherwise(0.5)
        .alias("sx"),
    )
    return scaled.filter(F.col("vec_id") < 50).select(
        "vec_id", (F.col("pos") + 1).cast("long").alias("pos"), "sx"
    )


@register(
    "emb_quantile_normalize",
    # Rank-based quantile normalization per dimension — the heavy-tail
    # flattener (each dim's values map to their empirical quantile
    # rank/(n+1)), standard feature prep before distance-based methods
    # when dims have wildly different scales/outliers. Ranks are exact
    # integers with a deterministic (vm, vec_id) tie-break; the quantile
    # is ONE IEEE division. Flat (vec_id, pos) grain on a vec_id < 50
    # slice so the driver hashes scalars (the emb_minmax_scale precedent).
    oracle="""
WITH dims AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT)
           AS vm
  FROM embeddings
),
ranked AS (
  SELECT vec_id, pos,
         ROW_NUMBER() OVER (PARTITION BY pos ORDER BY vm, vec_id) AS rnk,
         COUNT(*) OVER (PARTITION BY pos) AS n
  FROM dims
)
SELECT vec_id, CAST(pos AS BIGINT) AS pos,
       CAST(rnk AS DOUBLE) / (n + 1) AS qn
FROM ranked WHERE vec_id < 50
""",
    tags=("similarity", "llm", "scaling"),
)
def q_emb_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One posexplode + one shuffle on pos (d partitions, each ranking its
    own dimension independently — embarrassingly parallel in d). The
    output filter is a slice of the ranked relation, not a re-rank."""
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos0", "xf")
    ).select(
        "vec_id",
        (F.col("pos0") + 1).cast("long").alias("pos"),
        F.floor(F.col("xf").cast("double") * 1000000).cast("long").alias("vm"),
    )
    w = Window.partitionBy("pos").orderBy("vm", "vec_id")
    ranked = dims.select(
        "vec_id",
        "pos",
        F.row_number().over(w).alias("rnk"),
        F.count(F.lit(1)).over(Window.partitionBy("pos")).alias("n"),
    )
    return ranked.where(F.col("vec_id") < 50).select(
        "vec_id",
        "pos",
        (F.col("rnk").cast("double") / (F.col("n") + 1)).alias("qn"),
    )


@register(
    "emb_kmeans_silhouette",
    # Simplified (centroid-based) silhouette for the k-means clustering —
    # the clustering-quality readout (a = distance to own centroid, b =
    # distance to the nearest OTHER centroid, s = (b−a)/max(a,b)). The
    # full silhouette is all-pairs (O(n²)); the centroid form is the one
    # that scales, and under the kmeans integer contract it is also
    # hash-exact: integer squared distances, correctly-rounded IEEE sqrt,
    # one subtraction and one division per point. Composes the DECLARED
    # emb_kmeans oracle so the assignment can never drift. Emitted on the
    # vec_id < 50 slice (flat scalars for the driver's canonicalizer).
    oracle=f"""
WITH asg AS ({{KMEANS}}),
pts AS (
  SELECT vec_id,
         list_transform(embedding,
                        v -> CAST(FLOOR(CAST(v AS DOUBLE) * 1000000) AS BIGINT)) AS p
  FROM embeddings
),
pe AS (
  SELECT vec_id, generate_subscripts(p, 1) AS pos, unnest(p) AS v FROM pts
),
cfinal AS (
  SELECT asg.cluster, pe.pos,
         CAST(FLOOR(CAST(SUM(pe.v) AS DOUBLE) / COUNT(*)) AS BIGINT) AS v
  FROM asg JOIN pe USING (vec_id)
  GROUP BY asg.cluster, pe.pos
),
dist AS (
  SELECT pe.vec_id, c.cluster,
         CAST(SUM((pe.v - c.v) * (pe.v - c.v)) AS BIGINT) AS d2
  FROM pe JOIN cfinal c ON pe.pos = c.pos
  GROUP BY pe.vec_id, c.cluster
),
ab AS (
  SELECT d.vec_id, a.cluster,
         sqrt(CAST(MAX(CASE WHEN d.cluster = a.cluster THEN d.d2 END)
                   AS DOUBLE)) AS a_dist,
         sqrt(CAST(MIN(CASE WHEN d.cluster != a.cluster THEN d.d2 END)
                   AS DOUBLE)) AS b_dist
  FROM dist d JOIN asg a ON a.vec_id = d.vec_id
  GROUP BY d.vec_id, a.cluster
)
SELECT vec_id, cluster, a_dist, b_dist,
       CASE WHEN GREATEST(a_dist, b_dist) > 0 THEN
         (b_dist - a_dist) / GREATEST(a_dist, b_dist)
       ELSE 0.0 END AS silhouette
FROM ab WHERE vec_id < 50
""".replace("{KMEANS}", REGISTRY["emb_kmeans"].oracle),
    tags=("similarity", "llm", "clustering", "evaluation"),
)
def q_emb_kmeans_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assignment reuses the declared kmeans builder; centroids are one
    skinny posexplode aggregate; a/b distances are a points × k·d
    broadcast projection — no point-pair join anywhere, which is exactly
    why the centroid silhouette is the 100 TB form."""
    emb = load_table(spark, sf_dir, "embeddings")
    asg = scoped_persist(REGISTRY["emb_kmeans"].builder(spark, sf_dir))
    pe = scoped_persist(
        emb.select(
            "vec_id", F.posexplode("embedding").alias("pos0", "xf")
        ).select(
            "vec_id",
            (F.col("pos0") + 1).alias("pos"),
            F.floor(F.col("xf").cast("double") * 1000000).cast("long").alias("v"),
        )
    )
    cfinal = (
        asg.join(pe, "vec_id")
        .groupBy("cluster", "pos")
        .agg(
            F.floor(
                F.sum("v").cast("double") / F.count(F.lit(1))
            ).cast("long").alias("cv")
        )
    )
    dist = (
        pe.join(F.broadcast(cfinal.withColumnRenamed("cluster", "c")), "pos")
        .groupBy("vec_id", "c")
        .agg(
            F.sum((F.col("v") - F.col("cv")) * (F.col("v") - F.col("cv")))
            .cast("long")
            .alias("d2")
        )
    )
    own = F.when(F.col("c") == F.col("cluster"), F.col("d2"))
    other = F.when(F.col("c") != F.col("cluster"), F.col("d2"))
    ab = (
        dist.join(asg, "vec_id")
        .groupBy("vec_id", "cluster")
        .agg(
            F.sqrt(F.max(own).cast("double")).alias("a_dist"),
            F.sqrt(F.min(other).cast("double")).alias("b_dist"),
        )
    )
    mx = F.greatest(F.col("a_dist"), F.col("b_dist"))
    return ab.where(F.col("vec_id") < 50).select(
        "vec_id",
        "cluster",
        "a_dist",
        "b_dist",
        F.when(mx > 0, (F.col("b_dist") - F.col("a_dist")) / mx)
        .otherwise(F.lit(0.0))
        .alias("silhouette"),
    )


@register(
    "emb_label_centroid_drift",
    # Embedding-distribution drift monitor: per label, the Euclidean
    # distance between the centroids of the even- and odd-id halves of
    # the corpus (two "batches" under a deterministic split — in
    # production, yesterday's vs today's ingest). The per-dimension gap
    # uses the common-denominator identity s1/n1 − s2/n2 =
    # (s1·n2 − s2·n1)/(n1·n2): exact integers through ONE double division
    # per dimension, then the 64 squared terms fold in pos order (the
    # ordered-fold contract — double addition is order-dependent) and one
    # correctly-rounded sqrt. A label whose halves disagree is a feature
    # regression or an ingest mix shift.
    oracle="""
WITH pe AS (
  SELECT label, vec_id % 2 AS half, generate_subscripts(embedding, 1) AS pos,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS v
  FROM embeddings
),
counts AS (
  SELECT label,
         CAST(COUNT(DISTINCT CASE WHEN half = 0 THEN vec_id END) AS BIGINT)
           AS n_even,
         CAST(COUNT(DISTINCT CASE WHEN half = 1 THEN vec_id END) AS BIGINT)
           AS n_odd
  FROM (SELECT label, vec_id, vec_id % 2 AS half FROM embeddings)
  GROUP BY label
),
sums AS (
  SELECT label, pos,
         CAST(SUM(CASE WHEN half = 0 THEN v ELSE 0 END) AS BIGINT) AS s1,
         CAST(SUM(CASE WHEN half = 1 THEN v ELSE 0 END) AS BIGINT) AS s2
  FROM pe GROUP BY label, pos
),
terms AS (
  SELECT s.label, s.pos, c.n_even, c.n_odd,
         CAST(s.s1 * c.n_odd - s.s2 * c.n_even AS DOUBLE)
           / (CAST(c.n_even AS DOUBLE) * c.n_odd) AS t
  FROM sums s JOIN counts c ON c.label = s.label
  WHERE c.n_even > 0 AND c.n_odd > 0
)
SELECT label, n_even, n_odd,
       sqrt(list_reduce(list(t * t ORDER BY pos), (a, b) -> a + b)) / 1000000.0
         AS centroid_drift
FROM terms
GROUP BY label, n_even, n_odd
""",
    tags=("similarity", "llm", "monitoring", "drift"),
)
def q_emb_label_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One posexplode + one (label, pos) aggregate + a label-grain fold
    over d terms — no vector pairs, no re-scan: drift monitoring at the
    cost of one skinny aggregation regardless of corpus size."""
    emb = load_table(spark, sf_dir, "embeddings")
    half = (F.col("vec_id") % 2).alias("half")
    counts = emb.select("label", "vec_id", half).groupBy("label").agg(
        F.count_distinct(F.when(F.col("half") == 0, F.col("vec_id")))
        .cast("long")
        .alias("n_even"),
        F.count_distinct(F.when(F.col("half") == 1, F.col("vec_id")))
        .cast("long")
        .alias("n_odd"),
    )
    pe = emb.select(
        "label", half, F.posexplode("embedding").alias("pos0", "xf")
    ).select(
        "label",
        "half",
        (F.col("pos0") + 1).alias("pos"),
        F.floor(F.col("xf").cast("double") * 1000000).cast("long").alias("v"),
    )
    zero = F.lit(0).cast("long")
    sums = pe.groupBy("label", "pos").agg(
        F.sum(F.when(F.col("half") == 0, F.col("v")).otherwise(zero))
        .cast("long")
        .alias("s1"),
        F.sum(F.when(F.col("half") == 1, F.col("v")).otherwise(zero))
        .cast("long")
        .alias("s2"),
    )
    t = (F.col("s1") * F.col("n_odd") - F.col("s2") * F.col("n_even")).cast(
        "double"
    ) / (F.col("n_even").cast("double") * F.col("n_odd"))
    terms = (
        sums.join(F.broadcast(counts), "label")
        .where((F.col("n_even") > 0) & (F.col("n_odd") > 0))
        .select("label", "n_even", "n_odd", "pos", t.alias("t"))
    )
    return terms.groupBy("label", "n_even", "n_odd").agg(
        (
            F.sqrt(
                F.aggregate(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col("t")))
                    ),
                    F.lit(0.0),
                    lambda acc, s: acc + s["t"] * s["t"],
                )
            )
            / F.lit(1000000.0)
        ).alias("centroid_drift")
    )


@register(
    "emb_semantic_dedup",
    # SemDeDup (Abbas et al. 2023): k-means-bucketed near-dup detection —
    # the published recipe for embedding dedup at web-corpus scale. The
    # oracle composes the DECLARED emb_kmeans oracle (assignment can never
    # drift), scores within-cluster pairs under the quantized-dot contract
    # used by emb_cosine_neardup, and emits corpus-shaped integer flags:
    # keep-first semantics (a point is dup iff a smaller-id co-clustered
    # point is within the threshold), so kept set == is_dup = 0.
    oracle=f"""
WITH asg AS ({{KMEANS}}),
n AS (
  SELECT vec_id, embedding,
         sqrt(CAST({_QDOT.format(a='embedding', b='embedding')} AS DOUBLE)) AS nrm
  FROM embeddings
),
dup AS (
  SELECT aa.vec_id AS vid, CAST(COUNT(*) AS BIGINT) AS n_dup_smaller
  FROM asg aa
  JOIN asg bb ON aa.cluster = bb.cluster AND bb.vec_id < aa.vec_id
  JOIN n a ON a.vec_id = aa.vec_id
  JOIN n b ON b.vec_id = bb.vec_id
  WHERE CAST({_QDOT.format(a='a.embedding', b='b.embedding')} AS DOUBLE)
        / (a.nrm * b.nrm) >= {NEARDUP_THRESHOLD}
  GROUP BY aa.vec_id
)
SELECT asg.vec_id, asg.cluster,
       CAST(COALESCE(dup.n_dup_smaller, 0) AS BIGINT) AS n_dup_smaller,
       CAST(CASE WHEN COALESCE(dup.n_dup_smaller, 0) > 0 THEN 1 ELSE 0 END
            AS INTEGER) AS is_dup
FROM asg LEFT JOIN dup ON dup.vid = asg.vec_id
""".replace("{KMEANS}", REGISTRY["emb_kmeans"].oracle),
    tags=("similarity", "llm", "dedup", "clustering"),
)
def q_emb_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: within-k-means-cluster exact near-dup flags — the
    clustering bounds the pair scan (O(Σ|cluster|²), not O(n²)); within a
    cluster no false positive is possible and every co-clustered exact
    pair is found (recall contract in llm_ops.similarity.semantic_dedup).
    Registered at the same τ as emb_cosine_neardup so the two queries
    measure the same ground truth through exact vs bucketed plans."""
    from procurement_data_pipeline_spark.llm_ops.similarity import semantic_dedup

    return semantic_dedup(
        load_table(spark, sf_dir, "embeddings"), threshold=NEARDUP_THRESHOLD
    )


def _kmeans_top2_oracle() -> str:
    """The emb_kmeans oracle with ONLY its FINAL argmin emission widened
    to the top-2 nearest clusters: (vec_id, cluster, rn), rn in {1, 2}.
    Surgery on the declared oracle text (rpartition hits the LAST
    emission; the Lloyd-update argmin at a1 is untouched) so the two
    assignments can never drift apart."""
    km = REGISTRY["emb_kmeans"].oracle
    head, sep, tail = km.rpartition("SELECT vec_id, cluster FROM (")
    assert sep and "WHERE rn = 1" in tail, "emb_kmeans oracle shape changed"
    return (
        head
        + "SELECT vec_id, cluster, rn FROM ("
        + tail.replace("WHERE rn = 1", "WHERE rn <= 2")
    )


@register(
    "emb_semantic_dedup_multiprobe",
    # Multi-probe SemDeDup (VERDICT r8 item 6): each point is a member of
    # its TOP-2 nearest k-means cells, and a pair is compared when it
    # shares ANY co-probed cell — cutting the cross-cluster miss rate at
    # the low tau=0.35 (recall 0.32 -> 0.77 at sf0.001 in the pinned
    # test) while keeping the exact-within-candidate-set contract. A pair
    # sharing two cells counts ONCE (distinct partners); the reported
    # cluster stays the argmin assignment, so output shape matches
    # emb_semantic_dedup. The oracle composes the DECLARED emb_kmeans
    # oracle with its final emission widened to rn <= 2.
    oracle=f"""
WITH probe AS ({{KMEANS2}}),
n AS (
  SELECT vec_id, embedding,
         sqrt(CAST({_QDOT.format(a='embedding', b='embedding')} AS DOUBLE)) AS nrm
  FROM embeddings
),
dup AS (
  SELECT aa.vec_id AS vid,
         CAST(COUNT(DISTINCT bb.vec_id) AS BIGINT) AS n_dup_smaller
  FROM probe aa
  JOIN probe bb ON aa.cluster = bb.cluster AND bb.vec_id < aa.vec_id
  JOIN n a ON a.vec_id = aa.vec_id
  JOIN n b ON b.vec_id = bb.vec_id
  WHERE CAST({_QDOT.format(a='a.embedding', b='b.embedding')} AS DOUBLE)
        / (a.nrm * b.nrm) >= {NEARDUP_THRESHOLD}
  GROUP BY aa.vec_id
)
SELECT p1.vec_id, p1.cluster,
       CAST(COALESCE(dup.n_dup_smaller, 0) AS BIGINT) AS n_dup_smaller,
       CAST(CASE WHEN COALESCE(dup.n_dup_smaller, 0) > 0 THEN 1 ELSE 0 END
            AS INTEGER) AS is_dup
FROM (SELECT vec_id, cluster FROM probe WHERE rn = 1) p1
LEFT JOIN dup ON dup.vid = p1.vec_id
""".replace("{KMEANS2}", _kmeans_top2_oracle()),
    tags=("similarity", "llm", "dedup", "clustering"),
)
def q_emb_semantic_dedup_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup with top-2 cell multi-probe: the low-threshold recall
    path (llm_ops.similarity.semantic_dedup probes=2). Same corpus-shaped
    output as emb_semantic_dedup; candidate cost ~probes^2 x the
    single-probe scan, still O(sum |cell|^2), never O(n^2)."""
    from procurement_data_pipeline_spark.llm_ops.similarity import semantic_dedup

    return semantic_dedup(
        load_table(spark, sf_dir, "embeddings"),
        threshold=NEARDUP_THRESHOLD,
        probes=2,
    )
