"""Date-range backfill planner over the incremental-maintenance layer.

The operational gap between "refresh one day" (operators/incremental) and
"rebuild 3 years" is a planner: enumerate the date range, batch it into
bounded chunks (each chunk = one incremental_refresh call = one bounded
Spark job), run the chunks through the Pipeline runner so failures isolate
per chunk and retries re-run only their chunk — which is safe because
partition-overwrite refreshes are idempotent. A 1000-day backfill becomes
~34 independent 30-day jobs instead of one monolithic recompute whose
failure at hour nine loses everything.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from procurement_data_pipeline_spark.operators.incremental import (
    incremental_refresh,
)
from procurement_data_pipeline_spark.plans.runner import Pipeline, Task


def date_chunks(
    start: str, end: str, chunk_days: int = 30
) -> list[list[str]]:
    """Inclusive [start, end] ISO-date range, split into <=chunk_days runs."""
    if chunk_days < 1:
        raise ValueError("chunk_days must be >= 1")
    d0 = dt.date.fromisoformat(start)
    d1 = dt.date.fromisoformat(end)
    if d1 < d0:
        raise ValueError(f"end {end} before start {start}")
    days = [
        (d0 + dt.timedelta(days=i)).isoformat()
        for i in range((d1 - d0).days + 1)
    ]
    return [days[i : i + chunk_days] for i in range(0, len(days), chunk_days)]


def backfill_rollup(
    spark: SparkSession,
    facts: DataFrame,
    rollup_fn: Callable[[DataFrame], DataFrame],
    rollup_path: str,
    partition_col: str,
    start: str,
    end: str,
    chunk_days: int = 30,
    fact_date_col: str | None = None,
    retries: int = 1,
) -> dict:
    """Backfill ``rollup_path`` for [start, end], one Pipeline task per
    chunk. Returns {chunk_name: TaskResult}; a failed chunk never blocks
    its siblings (chunks are independent — no inter-chunk deps), so a
    partial backfill is resumable by re-running with the same arguments:
    already-converged chunks rewrite their partitions byte-for-byte."""
    pipe = Pipeline(name=f"backfill:{rollup_path}")
    for chunk in date_chunks(start, end, chunk_days):
        name = f"refresh_{chunk[0]}_{chunk[-1]}"

        def fn(_ctx, _dates=tuple(chunk)):
            incremental_refresh(
                spark,
                facts,
                rollup_fn,
                rollup_path,
                partition_col,
                list(_dates),
                fact_date_col=fact_date_col,
            )

        pipe.add(Task(name=name, fn=fn, retries=retries))
    return pipe.run()


__all__ = ["backfill_rollup", "date_chunks"]
