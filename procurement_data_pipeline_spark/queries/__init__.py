"""Declared-query modules. Importing this package registers every query."""

from procurement_data_pipeline_spark.queries import (  # noqa: F401
    events,
    parity,
    similarity,
    text,
    tpch,
    tpch_advanced,
    augment,
    curation,
    patterns,
    retrieval,
    lifecycle,
    textmining,
    planning,
    audit,
    estimation,
    inventory,
    contamination,
    growth,
    pca,
    reshape,
)
