"""Declared-query registry.

Every operator claimed as implemented (SURVEY.md §2 plus the LLM-data
extensions) is declared here as a :class:`QuerySpec`: an idiomatic PySpark
DataFrame builder plus, where SQL-expressible, an equivalent DuckDB oracle
SQL string over the same parquet tables. ``__spark_entry__.py`` exposes this
registry to the correctness driver; ``bench.py`` runs the subset tagged
``bench=True``.

Column-name contract: the Spark builder and the oracle SQL must produce the
same column names (the driver sorts columns by name before value-hashing), so
every computed column is aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None  # DuckDB SQL; None → driver records rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[Builder], Builder]:
    """Decorator: declare a query. ``@register("q", oracle="SELECT …")``."""

    def deco(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, builder=fn, oracle=oracle, tags=tags, bench=bench)
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every query module so registration side effects run."""
    from procurement_data_pipeline_spark import queries  # noqa: F401

    return REGISTRY
