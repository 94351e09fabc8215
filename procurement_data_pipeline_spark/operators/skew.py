"""Skew-aware join/aggregation utilities for hot-key workloads.

AQE's skew-join splitting (on in session.py) handles moderate skew at
runtime by splitting oversized shuffle partitions. These helpers cover the
cases AQE cannot fix:

* a shuffle join where ONE key holds a double-digit percentage of the fat
  side (AQE splits the partition, but every split still pairs with the full
  matching build rows) → :func:`salted_join` spreads the hot key across N
  subkeys and replicates the slim side N×.
* hot-key ``collect_list``/exact-distinct style aggregations with no partial
  push-down → :func:`two_phase_count_distinct` shards the key space before
  the final combine.

Salts are deterministic (hash of row content, not rand()), so retried tasks
and replayed stages produce identical results — a correctness requirement
under speculative execution at cluster scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_col(df: DataFrame, n_salt: int) -> Column:
    """Deterministic per-row salt in [0, n_salt): hash of all columns.
    Row-content hashing keeps the salt stable under retries/replays (unlike
    rand() or monotonically_increasing_id, which depend on split order)."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salt)).cast(
        "int"
    )


def salted_join(
    fat: DataFrame,
    slim: DataFrame,
    on: str | list[str],
    how: str = "inner",
    n_salt: int = 16,
) -> DataFrame:
    """Equi-join with the fat (skewed) side salted into ``n_salt`` subkeys.

    The fat side gets a deterministic salt column; the slim side is
    replicated once per salt value (an ``explode`` of a literal range — a
    narrow, shuffle-free N× blowup of the SMALLER input). Joining on
    (keys…, salt) spreads each hot key over ``n_salt`` shuffle partitions.

    Use when one key dominates the fat side; the slim side must tolerate
    N× replication (dimension-sized, not fact-sized). Supported ``how``:
    inner / left (left = fat side preserved).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    fat_s = fat.withColumn("_salt", _salt_col(fat, n_salt))
    slim_s = slim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return fat_s.join(slim_s, [*keys, "_salt"], how).drop("_salt")


def two_phase_count_distinct(
    df: DataFrame,
    group_cols: str | list[str],
    distinct_col: str,
    n_salt: int = 32,
) -> DataFrame:
    """Exact COUNT(DISTINCT x) per group, sharded for hot groups.

    Phase 1 dedups (group, salt-of-x, x) — the hot group's distinct set is
    spread over ``n_salt`` partitions; phase 2 counts per (group, salt) and
    sums shards. Same result as ``countDistinct`` with the single-partition
    hot-group bottleneck removed: NULL x rows survive phase 1 (so all-NULL
    groups still appear) but ``count(x)`` skips them, matching
    COUNT(DISTINCT x)'s NULL exclusion. Output: group cols + ``n_distinct``.
    """
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    shard = F.pmod(F.xxhash64(F.col(distinct_col)), F.lit(n_salt)).cast("int")
    per_shard = (
        df.select(*groups, F.col(distinct_col), shard.alias("_shard"))
        .distinct()
        .groupBy(*groups, "_shard")
        .agg(F.count(F.col(distinct_col)).alias("_n"))
    )
    return per_shard.groupBy(*groups).agg(
        F.sum("_n").cast("long").alias("n_distinct")
    )
