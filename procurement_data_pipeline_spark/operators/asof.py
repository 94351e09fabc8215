"""As-of (point-in-time) join — an operator Spark's join zoo lacks.

For each left row, attach the most recent right row with the same key and
``right.ts <= left.ts`` (backward as-of, inclusive). The naive form is a
range join that explodes into O(left × right-per-key) comparisons; the
scalable Spark-native form used here is the **union + running-last trick**:

1. tag right rows side=0 and left rows side=1,
2. union them into one relation,
3. one window per key ordered by (ts, side) carries the last side-0 payload
   forward (``last(..., ignorenulls=True)``),
4. keep only side-1 rows.

Cost: ONE shuffle on the key (the window sort), no join at all — the same
shape a time-series engine's as-of merge uses, and it inherits Spark's skew
handling on the window shuffle. An optional ``tolerance`` bounds staleness
(matches older than ``tolerance`` seconds are nulled out), mirroring pandas
``merge_asof``'s argument.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str,
    value_cols: list[str] | None = None,
    tolerance_seconds: int | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join: left rows + the latest right row at-or-before.

    Output: every ``left`` column, plus for each of the right side's
    ``value_cols`` a ``<col><suffix>`` column (NULL when no right row
    precedes), plus ``<ts_col><suffix>`` — the matched right timestamp.

    Ties (right.ts == left.ts) match, per the inclusive bound; among
    several right rows sharing the winning timestamp the LAST under a
    deterministic (ts, value-struct) ordering wins, so results are stable
    run to run.
    """
    value_cols = value_cols or []
    l_cols = left.columns

    # SQL join semantics: NULL never equals NULL. Window.partitionBy
    # groups NULL keys into one partition, so without this filter a
    # NULL-keyed left row would silently take the payload of a NULL-keyed
    # RIGHT row (code-review r8). Dropping NULL-keyed right rows up front
    # leaves NULL-keyed left rows naturally unmatched (their partition has
    # no side-0 rows) — exactly what the equivalent range-join returns.
    right = right.filter(F.col(on).isNotNull())

    payload = F.struct(
        F.col(ts_col).alias("_ts"), *[F.col(c) for c in value_cols]
    )
    r = right.select(
        F.col(on).alias("_k"),
        F.col(ts_col).alias("_t"),
        F.lit(0).alias("_side"),
        payload.alias("_p"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in l_cols],
    )
    l = left.select(
        F.col(on).alias("_k"),
        F.col(ts_col).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_p"].dataType).alias("_p"),
        *[F.col(c).alias(f"_l_{c}") for c in l_cols],
    )
    # side 0 sorts before side 1 at equal ts → inclusive bound; _p last in
    # the ordering makes the winner among equal-ts right rows deterministic.
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_side").asc(), F.col("_p").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        r.unionByName(l)
        .withColumn("_m", F.last("_p", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    if tolerance_seconds is not None:
        # seconds view of the time axis — TIMESTAMP_NTZ cannot cast to
        # numeric directly (code-review r8: the straight double cast
        # crashed on NTZ inputs the sibling range_join handles); route
        # through unix_micros exactly like rangejoin._bucket_axis
        dt = dict(left.dtypes).get(ts_col)

        def _secs(c):
            if dt in ("timestamp", "timestamp_ntz", "date"):
                return F.unix_micros(c.cast("timestamp")) / F.lit(1e6)
            return c.cast("double")

        fresh = (
            _secs(F.col("_t")) - _secs(F.col("_m._ts"))
        ) <= F.lit(float(tolerance_seconds))
        matched = matched.withColumn(
            "_m", F.when(fresh, F.col("_m"))
        )
    return matched.select(
        *[F.col(f"_l_{c}").alias(c) for c in l_cols],
        F.col("_m._ts").alias(f"{ts_col}{suffix}"),
        *[F.col(f"_m.{c}").alias(f"{c}{suffix}") for c in value_cols],
    )
