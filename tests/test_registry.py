"""Registry contract tests: every declared query builds a plan, runs at
sf0.001, and oracle SQL column names line up with the Spark schema."""

from __future__ import annotations

import re

import pytest

from procurement_data_pipeline_spark.registry import load_all


@pytest.fixture(scope="module")
def specs():
    return load_all()


def test_registry_nonempty(specs):
    assert len(specs) >= 20


def test_every_query_builds_and_runs_smoke(spark, sf_dir, specs):
    for name, spec in specs.items():
        df = spec.builder(spark, sf_dir)
        assert df.columns, name
        assert df.count() >= 0, name


def test_oracle_queries_select_matching_columns(spark, sf_dir, specs):
    """Cheap static guard: Spark schema column names must appear in the
    oracle SQL text (the driver hashes columns sorted by name)."""
    for name, spec in specs.items():
        if spec.oracle is None:
            continue
        df = spec.builder(spark, sf_dir)
        sql = spec.oracle.lower()
        for col in df.columns:
            assert re.search(rf"\b{re.escape(col.lower())}\b", sql), (
                f"{name}: column {col} not mentioned in oracle SQL"
            )


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    qs, osql = e.queries(), e.oracle_sql()
    assert set(osql) <= set(qs)
    assert all(callable(f) for f in qs.values())
