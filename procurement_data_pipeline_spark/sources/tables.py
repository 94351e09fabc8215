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
        # The corpus has shipped `ts` under three encodings across driver
        # regenerations: TIMESTAMP(NANOS) (vectorized reader rejects it →
        # read nanos as long), timestamp[us] with no timezone (Spark reads
        # TIMESTAMP_NTZ), and plain TIMESTAMP_LTZ. Normalize ALL of them to
        # TIMESTAMP_LTZ here, at the load boundary, so every downstream
        # expression (unix_micros, window ranges, date casts) sees one type.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        ts_type = dict(df.dtypes).get("ts")
        from pyspark.sql import functions as F

        if ts_type == "bigint":
            # nanos-as-long → truncate to micros (DuckDB's reader truncates
            # identically, so oracle comparisons agree).
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # NTZ→LTZ cast interprets the naive value in the session
            # timezone; configure_runtime pins it to UTC, matching DuckDB's
            # naive-as-UTC read, so epoch-based oracles stay hash-identical.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(load_table(spark, sf_dir, n) for n in names)
