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
from pyspark.sql.window import Window


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


def scd2_compact(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    order_col: str,
    state_col: str,
) -> DataFrame:
    """Collapse a (key, ts, state) stream into SCD Type-2 intervals.

    Output: (key, version, state, valid_from, valid_to, n_events,
    is_current) with half-open [valid_from, valid_to) validity; the open
    interval carries valid_to NULL and is_current 1. ``order_col`` breaks
    timestamp ties deterministically. ONE shuffle on the key serves every
    window (lag flag, running version, per-run aggregate, lead close).

    This is the shared core of the events_user_state_scd2 query and the
    point-in-time join (events_scd2_pointintime): dimension HISTORY is
    built once, then any fact stream can be joined as-of against it.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, order_col)
    flagged = df.withColumn(
        "is_change",
        F.when(
            F.lag(state_col).over(w).isNull()
            | (F.lag(state_col).over(w) != F.col(state_col)),
            1,
        ).otherwise(0),
    )
    versioned = flagged.withColumn(
        "version",
        F.sum("is_change")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("int"),
    )
    runs = versioned.groupBy(key_col, "version", state_col).agg(
        F.min(ts_col).alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    wv = Window.partitionBy(key_col).orderBy("version")
    return runs.select(
        key_col,
        "version",
        state_col,
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
        "n_events",
        F.when(F.lead("valid_from").over(wv).isNull(), 1)
        .otherwise(0)
        .cast("int")
        .alias("is_current"),
    )
