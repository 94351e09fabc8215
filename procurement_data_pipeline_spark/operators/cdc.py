"""Change-data-capture derivation: diff two snapshots of a keyed relation
into an insert/update/delete changelog.

The warehouse pattern: master-data arrives as full snapshots (the
reference's daily postgres dimension dumps); downstream consumers want the
DELTA — which keys appeared, which changed, which vanished — to drive SCD2
appends, cache invalidation, or incremental recomputes. ``snapshot_diff``
derives it with one full outer join on the key:

* key only in ``new``      → ``insert``
* key only in ``old``      → ``delete``
* key in both, any compared column differs (null-safe) → ``update``
* identical rows are dropped (the changelog is the non-trivial delta).

Scale: one shuffle per side on the key (sort-merge for fact-sized
snapshots, broadcast when one side is a bounded dimension); the null-safe
comparison is a pure projection. Composes with
``operators/incremental.incremental_refresh`` (feed the changed keys'
partitions) and ``catalog.merge_upsert`` (apply the delta).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Changelog rows: key columns, ``old_<c>``/``new_<c>`` per compared
    column, and ``change_type`` in ('insert', 'update', 'delete')."""
    if compare_cols is None:
        compare_cols = [c for c in new.columns if c not in key_cols]
    missing = [c for c in compare_cols if c not in old.columns or c not in new.columns]
    if missing:
        raise ValueError(f"compare columns absent from a snapshot: {missing}")

    o = old.select(
        *key_cols,
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
        F.lit(1).alias("_in_old"),
    )
    n = new.select(
        *key_cols,
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
        F.lit(1).alias("_in_new"),
    )
    joined = o.join(n, key_cols, "full_outer")
    differs = reduce(
        lambda a, b: a | b,
        [
            ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
            for c in compare_cols
        ],
        F.lit(False),
    )
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("insert"))
        .when(F.col("_in_new").isNull(), F.lit("delete"))
        .when(differs, F.lit("update"))
    )  # unchanged → NULL → filtered
    return (
        joined.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(
            *key_cols,
            *[f"old_{c}" for c in compare_cols],
            *[f"new_{c}" for c in compare_cols],
            "change_type",
        )
    )


__all__ = ["snapshot_diff"]
