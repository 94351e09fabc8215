"""Exact money / fixed-point column arithmetic.

Aggregating IEEE doubles is order-dependent (a+b+c ≠ c+a+b in floating
point), so at 1000-executor scale the same query can hash differently run
to run. Every money-valued aggregation in this engine therefore runs over
exact integers — cents (1e2), basis points (1e4), or micros (1e6) — with a
single IEEE division for presentation at the very end. That keeps results
partitioning-independent AND engine-portable (the DuckDB oracle computes
the identical integers).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def cents(col: str | Column) -> Column:
    """Dollars-valued double → exact integer cents (FLOOR(x·100) as long)."""
    return F.floor(_col(col) * 100).cast("long")


def basis_points(col: str | Column) -> Column:
    """Rate-valued double → exact integer basis points (FLOOR(x·1e4))."""
    return F.floor(_col(col) * 10000).cast("long")


def micros(col: str | Column) -> Column:
    """Value-column double → exact integer micro-units (FLOOR(x·1e6))."""
    return F.floor(_col(col) * 1000000).cast("long")


def dollars(c: Column) -> Column:
    """Integer cents → presentation dollars (the one allowed IEEE division)."""
    return c.cast("double") / F.lit(100.0)


def mrp_net_demand(
    total_demand: Column,
    safety_stock: Column,
    safety_stock_fallback: Column,
    available_qty: Column,
    reserved_qty: Column,
) -> Column:
    """The reference's MRP core formula (docker/dags/sql/net_demand.sql:52-57):

    ``GREATEST(0, COALESCE(demand,0) + COALESCE(safety, fallback)
                - (COALESCE(available,0) - COALESCE(reserved,0)))``

    Null semantics matter: the COALESCEs absorb the LEFT-JOIN nulls for
    products with no demand or no inventory snapshot.
    """
    zero = F.lit(0)
    return F.greatest(
        zero,
        F.coalesce(total_demand, zero)
        + F.coalesce(safety_stock, safety_stock_fallback)
        - (F.coalesce(available_qty, zero) - F.coalesce(reserved_qty, zero)),
    ).cast("int")
