"""JDBC dimension source — the cluster path for the reference's federated
Postgres master data (SURVEY.md §2.1 S4).

In the self-contained engine the dims are parquet/derived DataFrames; on a
real deployment this loader replaces them 1:1 (the consuming operators take
DataFrames, so the swap is invisible to them). Kept as a thin, explicit
wrapper so the scale-relevant options are impossible to forget:

* ``pushDownPredicate`` is on by default — the `is_active = TRUE` filters
  of net_demand.sql:77-78 execute inside the database.
* A partitioned read (``partitionColumn``/bounds/``numPartitions``) splits
  a big table across executors; without it the whole table streams through
  ONE task — fine for 5-row dims, a bottleneck for anything real.

No database ships in the test container, so this module is exercised on a
cluster, not in tests; it contains no logic beyond option assembly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def load_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    user: str | None = None,
    password: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    fetch_size: int = 10_000,
) -> DataFrame:
    """Read a JDBC table as a DataFrame (predicate pushdown on).

    For tables beyond dimension size, pass ``partition_column`` (an indexed
    numeric column, e.g. the primary key) plus bounds so the scan becomes
    ``num_partitions`` parallel range queries.
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", str(fetch_size))
    )
    if user is not None:
        reader = reader.option("user", user)
    if password is not None:
        reader = reader.option("password", password)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError(
                "partitioned JDBC read needs partition_column, lower_bound,"
                " upper_bound, and num_partitions together"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader.load()
