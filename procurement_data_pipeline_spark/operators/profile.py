"""One-pass table profiling (per-column summary statistics).

The standard first step of any large-scale data-quality pipeline: row
count, null count, distinct count, min/max per column — computed in ONE
aggregation job over the table (not one scan per column). Output is long
format, one row per profiled column.

Scale notes: multi-column exact distincts ride Spark's Expand operator —
one scan, rows multiplied by n_cols before partial aggregation. At 100 TB
switch ``exact_distinct=False`` to HyperLogLog sketches
(approx_count_distinct, default 5% rsd) and the Expand disappears into
plain partial aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """Profile ``columns`` (default: all) → (column, n_rows, n_nulls,
    n_distinct, min_value, max_value), min/max rendered as strings so one
    schema covers every input type."""
    cols = columns or df.columns
    distinct = F.countDistinct if exact_distinct else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("_rows")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"_null_{c}"),
            distinct(F.col(c)).alias(f"_dist_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_max_{c}"),
        ]
    row = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("_rows").cast("long").alias("n_rows"),
                F.col(f"_null_{c}").cast("long").alias("n_nulls"),
                F.col(f"_dist_{c}").cast("long").alias("n_distinct"),
                F.col(f"_min_{c}").alias("min_value"),
                F.col(f"_max_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return row.select(F.inline(entries))
