"""Pipeline telemetry via Spark's Observation API — metrics without jobs.

The naive way to audit a stage (``df.count()`` after the write) RE-RUNS the
stage's whole lineage: at 100 TB every audit doubles the pipeline. The
Observation API attaches aggregate metrics to the SAME action that
materializes the data — the row counts/sums ride the write job's existing
pass and cost nothing extra. This is how the reference's row-count echo
tasks (procurement_dag.py:47-56) should look at scale.

``with_observed_write`` wraps the pattern: observe declared metrics on a
DataFrame, run the parquet write, return the metrics dict.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def with_observed_write(
    df: DataFrame,
    path: str,
    metrics: dict[str, Column] | None = None,
    mode: str = "overwrite",
) -> dict:
    """Write ``df`` to parquet while collecting ``metrics`` (named aggregate
    expressions) from the same job; returns {metric_name: value} plus an
    always-on ``n_rows``. One pass total — the audit is free."""
    exprs = [F.count(F.lit(1)).alias("n_rows")]
    for name, col in (metrics or {}).items():
        if name == "n_rows":
            raise ValueError("metric name n_rows is reserved")
        exprs.append(col.alias(name))
    obs = Observation()
    df.observe(obs, *exprs).write.mode(mode).parquet(path)
    return dict(obs.get)


__all__ = ["with_observed_write"]
