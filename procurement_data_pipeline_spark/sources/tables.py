"""Readers for the driver-provided parquet tables.

The benchmark corpus (TESTDATA.md) is one parquet file per table under an
``sf*`` directory. Reads go through ``spark.read.parquet`` so Catalyst gets
native column pruning / filter pushdown; no schema is imposed on read (the
files carry their own), but ``configure_runtime`` pins the session timezone
first so timestamp→date casts are stable.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from procurement_data_pipeline_spark.session import configure_runtime

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    configure_runtime(spark)
    if name == "events":
        # events.parquet carries TIMESTAMP(NANOS) which the vectorized reader
        # rejects; read nanos as long and truncate to microseconds (exactly
        # what DuckDB's reader does, so oracle comparisons agree).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        if dict(df.dtypes).get("ts") == "bigint":
            from pyspark.sql import functions as F

            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(load_table(spark, sf_dir, n) for n in names)
