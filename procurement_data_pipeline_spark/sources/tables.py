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
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(load_table(spark, sf_dir, n) for n in names)
