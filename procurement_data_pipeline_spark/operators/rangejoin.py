"""Range (interval) join — bucketed equi-join instead of a nested loop.

Spark plans a plain ``start <= ts AND ts <= end`` join as a
BroadcastNestedLoopJoin (or cartesian) — O(|intervals| × |points|) and the
classic 100 TB scale-killer. The bucketed form restores an equi-join:

1. pick a bucket width ``w`` (≈ the typical interval length),
2. each interval explodes into its covered buckets
   (``floor(start/w) .. floor(end/w)`` — ~(len/w)+1 rows),
3. each point maps to exactly ONE bucket (``floor(ts/w)``),
4. hash-join on (key, bucket), then apply the exact range predicate.

Because a point lives in a single bucket, every qualifying
(interval, point) pair meets exactly once — no dedup pass. Candidate
volume is bounded by interval-length/w × point density per bucket, not by
|intervals| × |points|; the join shuffles on (key, bucket), so wide keys
(a hot user) spread across their time buckets — bucketing doubles as skew
mitigation on the time axis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket_axis(df: DataFrame, col_name: str):
    """Numeric (seconds) view of a bound column, for bucket arithmetic.

    Timestamp columns go through epoch micros — ``CAST(ts AS DOUBLE)`` is
    legal for TIMESTAMP_LTZ but not TIMESTAMP_NTZ, so routing through
    ``unix_micros`` makes the operator encoding-agnostic (NTZ→LTZ is
    interpreted in the session timezone, pinned UTC by the session factory).
    Numeric columns cast straight to double, so ``bucket_seconds`` doubles
    as a plain bucket width for non-time axes.
    """
    dt = dict(df.dtypes)[col_name]
    c = F.col(col_name)
    if dt in ("timestamp", "timestamp_ntz"):
        return F.unix_micros(c.cast("timestamp")) / F.lit(1e6)
    return c.cast("double")


def range_join(
    intervals: DataFrame,
    points: DataFrame,
    on: list[str],
    start_col: str,
    end_col: str,
    ts_col: str,
    bucket_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """Join each point to every interval (same ``on`` keys) containing it:
    ``start <= ts AND ts <= end``, both bounds inclusive.

    ``how='left'`` keeps intervals with no points (point columns NULL) —
    implemented as the inner bucketed join plus an anti-join union, so the
    outer form never falls back to a nested loop either. Pick
    ``bucket_seconds`` near the typical interval length: too small explodes
    the interval side, too large floods candidates per bucket.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how}")
    w = float(bucket_seconds)

    def _inner(iv: DataFrame) -> DataFrame:
        # Inverted intervals (end < start) are unsatisfiable — and if
        # allowed into sequence() they'd step DOWNWARD, exploding one
        # corrupt row into ~start/w bucket rows (the same
        # descending-sequence blow-up word_ngrams guards against). Filter
        # them out before the explode; under how='left' they resurface
        # from the anti-join with NULL point columns.
        ie = iv.filter(F.col(end_col) >= F.col(start_col)).withColumn(
            "_b",
            F.explode(
                F.sequence(
                    F.floor(_bucket_axis(iv, start_col) / w).cast("long"),
                    F.floor(_bucket_axis(iv, end_col) / w).cast("long"),
                )
            ),
        )
        pe = points.withColumn(
            "_b", F.floor(_bucket_axis(points, ts_col) / w).cast("long")
        )
        return (
            ie.join(pe, [*on, "_b"])
            .filter(
                (F.col(ts_col) >= F.col(start_col))
                & (F.col(ts_col) <= F.col(end_col))
            )
            .drop("_b")
        )

    if how == "inner":
        return _inner(intervals)
    # how='left': a unique per-interval tag makes the unmatched anti-join
    # both NULL-safe and duplicate-safe (code-review r8). Anti-joining on
    # ALL interval columns used null-unsafe equality, so a matched
    # interval carrying any NULL column compared unequal to itself and
    # was re-emitted as a spurious NULL-point row; duplicate interval
    # rows likewise collapsed. Persisted so the nondeterministic id is
    # pinned across the inner and anti branches.
    from procurement_data_pipeline_spark.caching import scoped_persist

    tagged = scoped_persist(
        intervals.withColumn("_iid", F.monotonically_increasing_id())
    )
    inner_t = _inner(tagged)
    point_cols = [c for c in points.columns if c not in on]
    unmatched = (
        tagged.join(inner_t.select("_iid").distinct(), "_iid", "left_anti")
        .drop("_iid")
        .select(
            "*",
            *[
                F.lit(None).cast(points.schema[c].dataType).alias(c)
                for c in point_cols
            ],
        )
    )
    return inner_t.drop("_iid").unionByName(unmatched)
