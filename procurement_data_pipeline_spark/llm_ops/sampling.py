"""Deterministic, oracle-checkable sampling for training-data pipelines.

Training corpora need samples that are (a) reproducible across reruns and
engines (a retried task must emit the same rows — the same property the
dedup salts rely on), and (b) cheap at scale (no global sort, no second
pass). Both operators key on a portable content hash: the ``md5`` hex
digest, which is bit-identical in Spark and DuckDB AND whose hex chars
order lexicographically exactly like the number they encode — so "hash <
threshold" is a plain string comparison both engines agree on, and the
sampling decision itself is oracle-verifiable. ``rand()``-based sampling
can't be cross-checked and changes under retry; hash sampling is a pure
projection/filter (no shuffle at all for :func:`hash_sample`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def _contains_map(dt: "T.DataType") -> bool:
    """True if ``dt`` is or nests a MapType (Spark rejects hash exprs
    over maps at any depth — map equality is undefined)."""
    if isinstance(dt, T.MapType):
        return True
    if isinstance(dt, T.ArrayType):
        return _contains_map(dt.elementType)
    if isinstance(dt, T.StructType):
        return any(_contains_map(f.dataType) for f in dt.fields)
    return False

_PREFIX_LEN = 8  # hex chars compared; 16^8 = 2^32 buckets


NULL_KEY_SENTINEL = "<null>"


def hash_key(col: str | Column, salt: str = "") -> Column:
    """md5(value ‖ salt) hex digest — the portable sampling key.

    NULL keys hash via a sentinel instead of propagating NULL (a NULL hash
    fails every comparison, which would silently drop NULL-key rows from
    BOTH sides of a split — breaking the exhaustiveness contract).
    (DuckDB side: ``md5(COALESCE(CAST(x AS VARCHAR), '<null>') || salt)``.)"""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(
        F.concat(
            F.coalesce(c.cast("string"), F.lit(NULL_KEY_SENTINEL)), F.lit(salt)
        )
    )


def fraction_threshold(fraction: float) -> str:
    """Hex-string threshold t such that P(md5 prefix < t) = ``fraction``."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    if fraction == 1.0:
        return "g" * _PREFIX_LEN  # 'g' > 'f': admits every hex prefix
    return format(int(fraction * (1 << (4 * _PREFIX_LEN))), f"0{_PREFIX_LEN}x")


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep ~``fraction`` of rows, decided per row by content hash.

    A pure filter — fully parallel, no shuffle, reproducible, and stable
    under retries AND under corpus growth (a row's keep/drop never changes
    as other rows arrive, unlike rank-based sampling). Different ``salt``
    values draw independent samples."""
    t = fraction_threshold(fraction)
    return df.filter(
        F.substring(hash_key(key_col, salt), 1, _PREFIX_LEN) < F.lit(t)
    )


def stratified_sample_n(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    n_per_stratum: int,
    salt: str = "",
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum (fewer if the stratum is
    smaller), chosen as the n smallest content hashes — a deterministic
    reservoir. One shuffle on the stratum key; the rank window never sees
    more than a stratum's rows. For balanced class-capped training mixes
    (cap every source/language/label at n examples).

    Determinism holds even when ``key_col`` values repeat within a
    stratum: a whole-row hash breaks the (hash, key) tie, so a retried
    task keeps the same rows at the reservoir boundary (code-review r8 —
    row_number's physical-order tie-break was rerun-dependent). Rows that
    are full duplicates still tie, and then either copy is the same row.

    MapType columns are excluded from the tie hash (advice r9): Spark
    rejects hash expressions over maps (map equality is undefined), and
    hashing them would AnalysisException the whole sample. Their values
    still can't flip the outcome — ties beyond the remaining columns are
    full-duplicate rows for every hashable field, and picking either
    copy yields the same sampled content for every deterministic column.
    """
    hashable = [
        f.name for f in df.schema.fields if not _contains_map(f.dataType)
    ]
    tie = (
        F.xxhash64(*[F.col(c) for c in sorted(hashable)])
        if hashable
        else F.lit(0)
    )
    w = Window.partitionBy(strata_col).orderBy(
        hash_key(key_col, salt).asc(), F.col(key_col).asc(), tie.asc()
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_stratum)
        .drop("_rk")
    )


def split_train_eval(
    df: DataFrame, key_col: str, eval_fraction: float, salt: str = "split"
) -> tuple[DataFrame, DataFrame]:
    """Disjoint, exhaustive train/eval split by content hash — the standard
    leakage-safe holdout: a document's side is a pure function of its key,
    so regenerating the corpus (or sampling it first) never migrates rows
    across the boundary."""
    t = fraction_threshold(eval_fraction)
    in_eval = F.substring(hash_key(key_col, salt), 1, _PREFIX_LEN) < F.lit(t)
    return df.filter(~in_eval), df.filter(in_eval)


def cluster_safe_split(
    clustered: DataFrame,
    cluster_col: str = "cluster_id",
    eval_fraction: float = 0.2,
    salt: str = "split",
) -> DataFrame:
    """Leakage-safe split at CLUSTER granularity: every member of a
    near-duplicate cluster lands on the same side, so the eval set can
    never contain a near-copy of a training document (the failure mode a
    plain per-document hash split cannot prevent — two 0.95-Jaccard docs
    hash independently and straddle the boundary).

    Input is any relation carrying ``cluster_col`` (e.g. the output of
    :func:`~procurement_data_pipeline_spark.llm_ops.dedup.dedup_clusters`);
    output appends a ``split`` column ('train' | 'eval'). The decision is
    the same portable md5-threshold used everywhere else, applied to the
    cluster id — a pure projection, no shuffle beyond what produced the
    clusters. Eval mass tracks ``eval_fraction`` in clusters (not
    documents); heavy-tailed cluster sizes shift document mass, which is
    inherent to any group-level split.
    """
    t = fraction_threshold(eval_fraction)
    in_eval = F.substring(hash_key(cluster_col, salt), 1, _PREFIX_LEN) < F.lit(t)
    return clustered.withColumn(
        "split", F.when(in_eval, F.lit("eval")).otherwise(F.lit("train"))
    )
