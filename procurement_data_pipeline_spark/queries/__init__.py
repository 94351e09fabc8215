"""Declared-query modules. Importing this package registers every query."""

from procurement_data_pipeline_spark.queries import parity, tpch  # noqa: F401
